package graft.stream

import java.time.Duration
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.RangeJoin]]: stream-stream
  * point-in-interval join with watermark-bounded, bucket-partitioned
  * state.
  *
  * Two constraints shape this operator:
  *
  *  - Spark REFUSES stream-stream joins without an equality predicate
  *    (state would be all-pairs). The same bucket discretisation the
  *    batch operator uses supplies one: points key to their time bucket,
  *    intervals replicate into each bucket they overlap, and the bucket
  *    equality partitions the symmetric-hash-join state exactly like it
  *    partitions the batch shuffle.
  *  - State is evicted only when the join condition bounds each side's
  *    EVENT TIME against the other by a constant, so an open-ended
  *    `point <= end` alone would buffer intervals forever. `maxSpan`
  *    supplies the constant bound (`point <= start + maxSpan`, a
  *    timestamp-plus-literal-interval pattern the streaming watermark
  *    analyzer recognises); the exact `point <= end` containment check
  *    rides along as a residual predicate. State per side is then
  *    O(rate × (watermark + maxSpan)) — fixed, not growing with stream
  *    age.
  *
  * Both inputs MUST carry `withWatermark` on their timestamp columns.
  * Late rows beyond the watermark are dropped by the engine, matching
  * the batch operator on the in-watermark subset. Intervals longer than
  * `maxSpan` are truncated by the eviction bound — the price of bounded
  * state; size `maxSpan` to the true maximum interval length.
  */
object StreamRangeJoin {

  /** Inner-joins streaming `points` to streaming `intervals` where
    * `startTs <= pointTs <= min(endTs, startTs + maxSpan)`. `maxSpan`
    * must be positive whole seconds. Column names must be disjoint
    * across the two inputs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startTs: String, endTs: String,
                      maxSpan: Duration): DataFrame = {
    require(!maxSpan.isNegative && !maxSpan.isZero, "maxSpan must be positive")
    require(maxSpan.getNano == 0, "maxSpan must be whole seconds")
    val w = maxSpan.getSeconds * 1000000L // bucket width = maxSpan, in micros
    val span = expr(s"INTERVAL '${maxSpan.getSeconds}' SECOND")
    // Long-exact floor division (see RangeJoin.floorDiv: `/` on longs
    // yields a double and epoch micros brush against 2^53)
    def bucket(tsExpr: String): Column = {
      // cast-through-timestamp so tz-naive (TIMESTAMP_NTZ) event times
      // work too — see RangeJoin.epochMicros
      val us = s"unix_micros(cast(($tsExpr) as timestamp))"
      expr(s"($us - pmod($us, ${w}L)) div ${w}L")
    }
    val pt = points.withColumn("_srj_b", bucket(pointTs))
    // an interval truncated to maxSpan overlaps at most 2 width-maxSpan
    // buckets; sequence() covers the general case exactly
    val iv = intervals.withColumn("_srj_b",
      explode(sequence(bucket(startTs), bucket(s"$startTs + INTERVAL '${maxSpan.getSeconds}' SECOND"))))
    pt.join(iv,
        pt("_srj_b") === iv("_srj_b") &&
          col(pointTs) >= col(startTs) &&
          col(pointTs) <= col(startTs) + span &&
          col(pointTs) <= col(endTs))
      .drop("_srj_b")
  }
}
