package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * Writing both sides of a hot join bucketed (and sorted) on the join key
  * lets Spark sort-merge-join them with ZERO exchanges — at 100 TB the
  * difference between re-shuffling both inputs on every run and reading
  * pre-partitioned data. Bucketing is the static complement to AQE: pay
  * the shuffle once at write time, never again at read time.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Bucket count should
    * target HDFS-block-ish file sizes at the expected data volume. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int,
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    require(keys.nonEmpty, "bucket keys must not be empty")
    df.write.format(format).mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. When both sides are
    * bucketed identically this plans as an exchange-free sort-merge join
    * (verify with [[joinHasShuffle]]). */
  def bucketedJoin(spark: SparkSession, left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** Whether the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for co-location tests and plan audits. */
  def joinHasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
}
