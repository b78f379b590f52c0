package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the nearest right row with the same
  * key: backward (`rightTime <= leftTime`, market-data / feature-store
  * point-in-time joins) or forward (`rightTime >= leftTime`, next-event
  * joins).
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
  ): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPrefix, tolerance,
      forward = false)

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * the same key and `rightTime >= leftTime` (next-event joins:
    * first response after a request, next maintenance after a failure).
    * Same single-shuffle tag-union plan as [[asofBackward]], with the
    * carry window reversed; `tolerance` bounds `rightTime - leftTime`. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String = "asof_",
      tolerance: Option[Long] = None
  ): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPrefix, tolerance,
      forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPrefix: String,
      tolerance: Option[Long],
      forward: Boolean
  ): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val leftCols = left.columns.toSeq

    // the right payload travels as ONE struct so the carry-forward is
    // row-atomic: a newer right row with null payload fields must not
    // resurrect older values column-by-column (no torn composite rows)
    val payloadStruct = struct(col(rightTime).as("_rt") +:
      payloadCols.map(c => col(c).as(s"_p_$c")): _*)
    val taggedLeft = left
      .select(col("*"), col(leftTime).as("_ts"), lit(1).as("_is_left"))
    val taggedRight = right
      .select(keys.map(col) :+ col(rightTime).as("_ts") :+ lit(0).as("_is_left")
        :+ payloadStruct.as("_payload"): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right rows (0) sort before left rows (1) at equal timestamps, so a
    // right row AT the left timestamp is visible to it; the payload
    // struct is the final tiebreak so two right rows with identical
    // (key, ts) resolve deterministically (largest payload wins) rather
    // than by shuffle order. Forward direction = the same running
    // carry over the REVERSED time order: the last right row seen in
    // descending order is the smallest rightTime >= leftTime.
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_is_left").asc, col("_payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned.withColumn("_payload",
      last(col("_payload"), ignoreNulls = true).over(w))

    val matchedRt = col("_payload").getField("_rt")
    val age: Column =
      if (forward) matchedRt.cast("long") - col("_ts").cast("long")
      else col("_ts").cast("long") - matchedRt.cast("long")
    val inTolerance: Column = tolerance match {
      case Some(secs) => matchedRt.isNotNull && age <= secs
      case None       => matchedRt.isNotNull
    }

    val out = payloadCols.foldLeft(carried.filter(col("_is_left") === 1))(
      (df, c) => df.withColumn(s"$rightPrefix$c",
        when(inTolerance, col("_payload").getField(s"_p_$c")).otherwise(lit(null))))
      .withColumn(s"${rightPrefix}time", when(inTolerance, matchedRt).otherwise(lit(null)))

    out.select((leftCols.map(col) ++ payloadCols.map(c => col(s"$rightPrefix$c"))
      :+ col(s"${rightPrefix}time")): _*)
  }
}
