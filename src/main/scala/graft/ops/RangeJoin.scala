package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Bucketed range join: points ⨝ intervals on containment, without an
  * equi-key.
  *
  * Spark plans a bare `p BETWEEN s AND e` join as BroadcastNestedLoop (or
  * a cartesian product) — O(|points| × |intervals|) comparisons, the
  * classic 100 TB cliff for telemetry-vs-maintenance-window,
  * event-vs-session, and IP-vs-CIDR-range workloads. Discretising the
  * range domain into fixed-width buckets turns it into an equi-join:
  * each interval is replicated into every bucket it overlaps, each point
  * belongs to exactly ONE bucket, and the equi-join on bucket followed by
  * the exact containment filter produces each qualifying pair exactly
  * once (no distinct needed). Work becomes
  * O(|points| + |intervals| × avg_span/width + true_matches), all of it
  * shuffle-partitionable on the bucket key.
  *
  * Pick `bucketWidth` ≈ the typical interval length: much smaller wastes
  * replicas (span/width copies per interval); much larger packs unrelated
  * rows into the same bucket and degrades toward the cross product within
  * a bucket. Degenerate long intervals (span ≫ typical) are better split
  * out and broadcast separately — the replication factor IS the knob that
  * keeps per-bucket work bounded. A time-skewed workload (one hot hour)
  * shows up as a hot bucket; compose with [[Skew.saltedJoin]]-style
  * salting on the point side if a single bucket dominates.
  */
object RangeJoin {

  /** Inner-joins `points` to `intervals` where
    * `startExpr <= pointExpr <= endExpr` (inclusive bounds).
    *
    * `pointExpr` / `startExpr` / `endExpr` must be integral (cast
    * timestamps with `unix_micros` etc.); rows with a null point or null
    * bounds never match, as in a plain inner range join. The result
    * carries every column of both inputs — disambiguate colliding names
    * before calling. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointExpr: Column, startExpr: Column, endExpr: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pt = points
      .withColumn("_rj_p", pointExpr.cast(LongType))
      .withColumn("_rj_b", floorDiv("_rj_p", bucketWidth))
    val iv = intervals
      .withColumn("_rj_s", startExpr.cast(LongType))
      .withColumn("_rj_e", endExpr.cast(LongType))
      .filter(col("_rj_s") <= col("_rj_e"))
      // one copy of the interval per overlapped bucket; sequence() is
      // evaluated per row with span/width elements — the replication
      // factor callers size via bucketWidth
      .withColumn("_rj_b",
        explode(sequence(floorDiv("_rj_s", bucketWidth),
          floorDiv("_rj_e", bucketWidth))))
    pt.join(iv, Seq("_rj_b"))
      .filter(col("_rj_s") <= col("_rj_p") && col("_rj_p") <= col("_rj_e"))
      .drop("_rj_b", "_rj_p", "_rj_s", "_rj_e")
  }

  /** Inner-joins two INTERVAL sets on overlap:
    * `lStart <= rEnd AND rStart <= lEnd` (inclusive) — the
    * session-vs-session / window-vs-window sibling of
    * [[pointInInterval]], which Spark likewise plans as a nested-loop
    * cross product when written as a bare non-equi join.
    *
    * Both sides replicate into every bucket they overlap, and a
    * qualifying pair — which may share MANY buckets — is emitted exactly
    * once without any distinct: only in the first bucket both occupy,
    * `max(bucket(lStart), bucket(rStart))`. (That bucket holds
    * `max(lStart, rStart)`, which overlap guarantees lies inside both
    * intervals, so both replicas exist there; every earlier shared
    * bucket is excluded by the filter, every later one by maximality.)
    * Same integral-domain contract and `bucketWidth` sizing trade as
    * [[pointInInterval]]; degenerate spans and hot buckets carry the
    * same caveats. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: Column, lEnd: Column,
                      rStart: Column, rEnd: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left
      .withColumn("_rj_ls", lStart.cast(LongType))
      .withColumn("_rj_le", lEnd.cast(LongType))
      .filter(col("_rj_ls") <= col("_rj_le"))
      .withColumn("_rj_b",
        explode(sequence(floorDiv("_rj_ls", bucketWidth),
          floorDiv("_rj_le", bucketWidth))))
    val r = right
      .withColumn("_rj_rs", rStart.cast(LongType))
      .withColumn("_rj_re", rEnd.cast(LongType))
      .filter(col("_rj_rs") <= col("_rj_re"))
      .withColumn("_rj_b",
        explode(sequence(floorDiv("_rj_rs", bucketWidth),
          floorDiv("_rj_re", bucketWidth))))
    l.join(r, Seq("_rj_b"))
      .filter(col("_rj_ls") <= col("_rj_re") && col("_rj_rs") <= col("_rj_le"))
      .filter(col("_rj_b") ===
        greatest(floorDiv("_rj_ls", bucketWidth), floorDiv("_rj_rs", bucketWidth)))
      .drop("_rj_b", "_rj_ls", "_rj_le", "_rj_rs", "_rj_re")
  }

  /** Epoch microseconds for a timestamp column of either flavor:
    * `unix_micros` itself accepts only TIMESTAMP, so a parquet source
    * whose timestamps are tz-naive (read as TIMESTAMP_NTZ) breaks the
    * bare call at analysis time. Casting through TimestampType first is
    * an identity for TIMESTAMP and interprets NTZ wall-clock in the
    * session time zone — graft sessions pin UTC, which matches how
    * engines without a tz-aware type (e.g. the DuckDB oracle) extract
    * epochs from the same naive values. */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Floor division that stays in Long arithmetic end to end — `x / w` on
    * longs yields a double (precision loss past 2^53; epoch micros are
    * past it), and SQL `div` alone truncates toward zero. Subtracting the
    * (non-negative) pmod first makes the numerator an exact multiple, so
    * the truncating `div` IS floor division. */
  private def floorDiv(name: String, w: Long): Column =
    expr(s"($name - pmod($name, ${w}L)) div ${w}L")
}
