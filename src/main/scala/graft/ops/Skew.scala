package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for shuffle joins whose key distribution is
  * heavy-tailed (the classic 100 TB failure mode AQE's skew-join split
  * doesn't always catch, e.g. aggregation-free joins or stateful stages).
  *
  * `saltedJoin` spreads each hot left-side key over `salts` shuffle
  * partitions by appending a salt to the join key and replicating the
  * right side once per salt value. Right-side replication costs
  * `salts ×` that side, so use it with a modest factor on the smaller
  * input — or pre-filter to only the known-hot keys. */
object Skew {

  /** Inner-join `left` with `right` on `keys`, salting the shuffle.
    *
    * The left side gets a uniform random-ish salt derived from a stable
    * row hash (deterministic per row content, no `rand()` so retries and
    * speculative tasks agree); the right side is exploded across all
    * salt values. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int = 8
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts))
    val saltedLeft = left.withColumn("_graft_salt", saltCol)
    val saltedRight = right.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(saltedRight, keys :+ "_graft_salt")
      .drop("_graft_salt")
  }

  /** Keys whose frequency exceeds `threshold` rows — the candidates for
    * salting or separate broadcast handling. One aggregation pass. */
  def hotKeys(df: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= threshold)

  /** Two-path skew join: hot keys (from a one-pass frequency count)
    * broadcast-join, the long tail shuffle-joins, results unioned.
    * The standard plan for star joins with a handful of mega-keys.
    *
    * Broadcasting `rightHot` assumes dimension-shaped hot rows on the
    * right; a hot key with high RIGHT-side multiplicity would blow the
    * broadcast. The guard counts the right's hot rows (one semi-join
    * pass, pruned to the key columns) and falls back to [[saltedJoin]]
    * — same output, skew handled by salting instead of broadcast — when
    * they exceed `broadcastMaxRows`.
    *
    * The guard makes this an EAGER call: it runs one Spark job before
    * returning the plan. `hot` and `rightHot` are persisted (MEMORY_AND_DISK,
    * Dataset.persist's default — memory pressure spills instead of
    * evicting correctness) so the guard job's work is reused by the
    * returned join instead of recomputed. On the broadcast path the two
    * hot-key-sized cached frames stay in the block manager until the
    * ContextCleaner GCs the plan — a session that calls this in a loop
    * without executing/releasing the results should `spark.catalog
    * .clearCache()` between batches or unpersist via its own handle. */
  def hotColdJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      hotThreshold: Long,
      broadcastMaxRows: Long = 4L << 20
  ): DataFrame = {
    val hot = Caching.ensureCachedLazy(
      hotKeys(left, keys, hotThreshold).select(keys.map(col): _*))
    val rightHot = Caching.ensureCachedLazy(
      right.join(broadcast(hot), keys, "left_semi"))
    val rightHotRows = rightHot.count()
    if (rightHotRows > broadcastMaxRows) {
      hot.unpersist(); rightHot.unpersist()
      saltedJoin(left, right, keys)
    } else {
      val leftHot = left.join(broadcast(hot), keys, "left_semi")
      val leftCold = left.join(broadcast(hot), keys, "left_anti")
      leftHot.join(broadcast(rightHot), keys)
        .unionByName(leftCold.join(right, keys))
    }
  }
}
