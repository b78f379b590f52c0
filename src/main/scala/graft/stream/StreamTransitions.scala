package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transition-pair extraction — the ingest-time sibling of
  * [[graft.analytics.Analytics.transitions]]: per user, emit one
  * (from_type, to_type) pair per consecutive event as it arrives. The
  * pair stream feeds any downstream streaming aggregation (the matrix
  * counts in update mode) or lands raw; the batch operator over the
  * stored stream is the exact replay.
  *
  * Arrival-order contract (the [[StreamFunnel]] precedent): under
  * event-time-ordered arrival per user the emitted pairs equal the
  * batch lead-window pairs exactly (spec-pinned across batch
  * boundaries); same-batch arrivals are processed in (ts, event_id)
  * order. State per user is ONE last-event-type string — O(1),
  * independent of history length. */
object StreamTransitions {

  def pairs(events: DataFrame): DataFrame = {
    val keyed = events.filter(col("ts").isNotNull)
      .select(col("user_id").cast("long"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.STRING))
    keyed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, evs: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Boolean, String)]) => {
          var (init, last) = state.getOption.getOrElse((false, null: String))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
          for ((_, _, _, typ) <- evs.toSeq.sortBy(t => (t._2, t._3))) {
            if (init) out += ((user, last, typ))
            last = typ; init = true
          }
          state.update((init, last))
          out.iterator
        })(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING),
          Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING))
      .toDF("user_id", "from_type", "to_type")
  }
}
