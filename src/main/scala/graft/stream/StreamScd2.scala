package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 tracking — the ingest-time sibling of
  * [[graft.analytics.Analytics.scd2]]: per key, watch the attribute
  * stream and emit one row per CLOSED version (a run of equal values
  * that ended because a different value arrived). Append mode can't
  * retract, so the OPEN version lives only in state — exactly the CDC
  * contract: closed history flows downstream, the current value is the
  * state, and the batch operator over the stored stream is the exact
  * replay (its `is_current = false` rows equal the streamed rows,
  * spec-pinned under event-time-ordered arrival per key).
  *
  * Arrival-order contract (the [[StreamFunnel]] precedent): when
  * arrivals are event-time-ordered per key, streamed closed versions
  * match the batch history bit for bit. Under reordering a late event
  * would belong to an already-closed run; this operator — like every
  * CDC consumer — applies it in arrival order (versions only ever
  * advance). Events for one key arriving within a micro-batch are
  * processed in (order, tie) order, so same-batch races resolve
  * deterministically.
  *
  * State per key is ONE (attr, validFromUs, version) triple — O(1),
  * independent of how many events or versions the key has seen. */
object StreamScd2 {

  /** Closed-version events: (key, attr, valid_from_us, valid_to_us,
    * version). `attrCol` is null-safe: a null attribute is a value that
    * opens its own run, not a wildcard. */
  def track(df: DataFrame, keyCol: String, attrCol: String,
            orderCol: String, tieCol: String): DataFrame = {
    val keyed = df.filter(col(orderCol).isNotNull)
      .select(col(keyCol).cast("long"), col(attrCol).cast("string"),
        graft.ops.RangeJoin.epochMicros(col(orderCol)).as("us"),
        col(tieCol).cast("long"))
      .as[(Long, String, Long, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaLong))
    keyed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, evs: Iterator[(Long, String, Long, Long)],
         state: GroupState[(Boolean, String, Long, Long)]) => {
          // (hasRun, attr — nullable by design, validFromUs, version)
          var (has, attr, fromUs, ver) =
            state.getOption.getOrElse((false, null: String, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long, Long)]
          // same-batch determinism: process in (order, tie) order
          for ((_, a, us, _) <- evs.toSeq.sortBy(e => (e._3, e._4))) {
            if (!has) { has = true; attr = a; fromUs = us; ver = 1L }
            else if (a != attr) { // Scala == is null-safe on Strings
              out += ((key, attr, fromUs, us, ver))
              attr = a; fromUs = us; ver += 1L
            }
          }
          state.update((has, attr, fromUs, ver))
          out.iterator
        })(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaLong),
          Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
            Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF(keyCol, attrCol, "valid_from_us", "valid_to_us", "version")
  }
}
