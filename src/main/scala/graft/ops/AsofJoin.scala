package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * the same key and `rightTime <= leftTime` (market-data / feature-store
  * point-in-time joins).
  *
  * Spark has no native as-of operator; the composed plan here is the
  * scale-right one: tag and union both sides, ONE shuffle on the key, and
  * a running `last(_, ignoreNulls)` window carries each right payload
  * forward onto subsequent left rows. That beats the join-then-rank
  * formulation (two shuffles + a pair blow-up on hot keys), and AQE/salting
  * apply to the single union shuffle as usual. */
object AsofJoin {

  /** @param tolerance max allowed age `leftTime - rightTime` in seconds;
    *                  matches older than this surface as null. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("_ts", col(leftTime))
      .withColumn("_is_left", lit(1))
      .withColumn("_rt", lit(null).cast(right.schema(rightTime).dataType))
    val taggedRight = payloadCols.foldLeft(
        right
          .withColumn("_ts", col(rightTime))
          .withColumn("_is_left", lit(0))
          .withColumn("_rt", col(rightTime))
      )((df, c) => df.withColumnRenamed(c, s"_p_$c"))

    val unioned = taggedLeft.unionByName(taggedRight.drop(rightTime), allowMissingColumns = true)

    // right rows (0) sort before left rows (1) at equal timestamps, so a
    // right row AT the left timestamp is visible to it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (payloadCols.map(c => s"_p_$c") :+ "_rt").foldLeft(unioned)(
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val inTolerance: Column = tolerance match {
      case Some(secs) =>
        col("_rt").isNotNull &&
          col("_ts").cast("long") - col("_rt").cast("long") <= secs
      case None => col("_rt").isNotNull
    }

    val out = payloadCols.foldLeft(carried.filter(col("_is_left") === 1))(
      (df, c) => df.withColumn(s"$rightPrefix$c",
        when(inTolerance, col(s"_p_$c")).otherwise(lit(null))))
      .withColumn(s"${rightPrefix}time", when(inTolerance, col("_rt")).otherwise(lit(null)))

    out.select((leftCols.map(col) ++ payloadCols.map(c => col(s"$rightPrefix$c"))
      :+ col(s"${rightPrefix}time")): _*)
  }
}
