package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — the O(1)-state twin of
  * [[graft.analytics.Analytics.ewma]]: per user, fold arriving values
  * through the SAME exact-integer recurrence
  * (`e' = e + (x − e) div 2^halvings`, values fixed-pointed at 6 dp)
  * and emit the running average per event. Because the fold is pure
  * integer arithmetic, streaming state after any prefix equals the
  * batch fold over that prefix BIT FOR BIT (spec-pinned) — the same
  * stream-admissibility argument as the sketch family, applied to a
  * sequential recurrence.
  *
  * Arrival-order contract (the [[StreamFunnel]] precedent): an EWMA is
  * order-sensitive by definition; under event-time-ordered arrival per
  * user the streamed rows equal the batch operator's. Same-batch
  * arrivals are processed in (ts, event_id) order. State per user is
  * one (init, e) pair. */
object StreamEwma {

  def track(events: DataFrame, halvings: Int = 4): DataFrame = {
    require(halvings >= 1 && halvings <= 30, "halvings must be in [1, 30]")
    val shift = 1L << halvings
    val keyed = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id").cast("long"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("us"),
        col("event_id").cast("long"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("xs"))
      .as[(Long, Long, Long, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong))
    keyed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, evs: Iterator[(Long, Long, Long, Long)],
         state: GroupState[(Boolean, Long)]) => {
          var (init, e) = state.getOption.getOrElse((false, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          for ((_, _, eid, xs) <- evs.toSeq.sortBy(t => (t._2, t._3))) {
            e = if (init) e + (xs - e) / shift else xs
            init = true
            out += ((user, eid, e))
          }
          state.update((init, e))
          out.iterator
        })(Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong),
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
            Encoders.scalaLong))
      .toDF("user_id", "event_id", "ewma_s6")
  }
}
