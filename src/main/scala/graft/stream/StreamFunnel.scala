package graft.stream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking — the ingest-time sibling of
  * [[graft.analytics.Analytics.funnel]]: per user, advance through the
  * stage list as qualifying events arrive, emitting one row per stage
  * COMPLETION (append mode can't retract, so progress is the event).
  *
  * Arrival-order contract (the [[StreamQuota]] precedent): the batch
  * operator picks each stage's EARLIEST strictly-after match corpus-wide;
  * a stream can only judge events as they arrive. When arrivals are
  * event-time-ordered per user, the streaming funnel completes exactly
  * the stages the batch operator reports, with the same timestamps
  * (spec-pinned). Under reordering, a stage may complete on a later
  * event than batch would pick — monotone progress is preserved (stages
  * only ever advance, each completion's timestamp strictly after its
  * predecessor's), and the batch operator over the stored stream is the
  * exact replay.
  *
  * State per user is ONE (stageIndex, lastTsMicros) pair — O(1),
  * stream-lifetime (funnels are conversion windows; apply a timeout
  * variant when a business window applies). Events for a user arriving
  * within one micro-batch are processed in (ts, event_id) order, so
  * same-batch races resolve deterministically. */
object StreamFunnel {

  /** Per-stage completion events: (user_id, stage_index, stage_name,
    * ts_us) — stage_index is 1-based completed-count after this event.
    * `maxGapUs` bounds each advance to the batch funnel's conversion
    * window (a stage only counts within the gap of the previous
    * stage's completion; the first stage is unbounded). */
  def track(events: DataFrame,
            stages: Seq[String] = Seq("view", "click", "purchase"),
            maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "stages must not be empty")
    require(maxGapUs.forall(_ > 0), "maxGapUs must be positive when set")
    val stageArr = stages.toArray
    val keyed = events
      .filter(col("ts").isNotNull && col("event_type").isin(stages.map(lit): _*))
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
         state: GroupState[(Int, Long)]) => {
          var (idx, lastUs) = state.getOption.getOrElse((0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String, Long)]
          // same-batch determinism: process in (ts, event_id) order
          for ((_, us, _, typ) <- evs.toSeq.sortBy(e => (e._2, e._3))
               if idx < stageArr.length) {
            val gapOk = idx == 0 ||
              maxGapUs.forall(g => us - lastUs <= g)
            if (typ == stageArr(idx) && us > lastUs && gapOk) {
              idx += 1; lastUs = us
              out += ((user, idx, typ, us))
            }
          }
          state.update((idx, lastUs))
          out.iterator
        })(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong),
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
            Encoders.STRING, Encoders.scalaLong))
      .toDF("user_id", "stage", "stage_name", "ts_us")
  }
}
