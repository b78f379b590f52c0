package graft.stream

import graft.ops.UrlOps
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Streaming frontier admission — the arrival-side twin of the batch
  * crawl loop: URLs discovered on a stream flow permission-join →
  * politeness WITHOUT a batch window.
  *
  * Why the batch operators can't stream: [[UrlOps.robotsAllowed]]
  * aggregates each URL's rule matches after the join fans them out (an
  * aggregation-then-join-back no append stream admits), and
  * [[UrlOps.crawlSchedule]]'s `row_number` window has no streaming
  * equivalent at all. The reformulation:
  *
  *  - [[permit]] joins arrivals against [[UrlOps.compiledRobots]] —
  *    per-host rule ARRAYS, robots-sized — so the verdict (longest
  *    matching rule per direction, allow wins ties, no-rules → allowed)
  *    is a per-row fold over the host's array: a stateless
  *    stream-static join, the [[graft.ops.MinhashIndex.probe]] posture.
  *    Spec-pinned verdict-identical to `robotsAllowed` on the same
  *    rows, in both wildcard modes (the compiled form encodes the mode:
  *    a non-wildcard rule is one unanchored segment, which the linear
  *    glob fold treats as a literal prefix).
  *  - [[schedule]] assigns per-host fetch slots via
  *    `flatMapGroupsWithState` — state is ONE monotone counter per host
  *    (the [[StreamQuota.capPerStratum]] state shape, O(1) per host),
  *    so slots are strictly increasing across micro-batches and
  *    `offset_s = slot × delay_s` keeps honouring the host's
  *    crawl-delay for the stream's life. Within a micro-batch rows are
  *    slotted in `urlIdCol` order (deterministic replay — a restarted
  *    batch re-slots identically); memory per host is bounded by its
  *    per-batch frontier, the same bound the batch window carries.
  *
  * 100 TB shape: the compiled-rules side is (hosts × rules)-sized and
  * hash-joins on the host key (broadcast when small); the arrival
  * stream never aggregates and never shuffles except the one keyed
  * state exchange in `schedule` — the natural per-host crawl
  * partitioning. Checkpoint recovery is the standard state-store
  * contract (spec-pinned: counters survive a restart).
  */
object StreamFrontier {

  /** Arrivals plus `(allowed, delay_s)` from a stream-static join
    * against `compiled` ([[UrlOps.compiledRobots]] output). URLs whose
    * host has no compiled row are allowed with a null delay (the RFC
    * default); `delay_s` is the host's effective crawl-delay, null when
    * the host published none (schedule applies its `defaultDelay`).
    * Works identically on batch frames (spec-pinned against
    * `robotsAllowed`). */
  def permit(urls: DataFrame, compiled: DataFrame,
             keyCol: String = "doc_id", pathCol: String = "path"): DataFrame = {
    // the same collision contract as schedule(): the working columns
    // and the outputs about to be added must not already exist on the
    // input — withColumn would replace them in place and the trailing
    // drop would silently delete the caller's column
    val reserved = Seq("_sf_key", "_sf_rules", "_sf_la", "_sf_ld",
      "allowed", "delay_s").filter(urls.columns.contains)
    require(reserved.isEmpty,
      s"permit reserves column names ${reserved.mkString(", ")} — rename " +
        "them on the input frame first")
    // a stream-static join re-evaluates the static plan every
    // micro-batch; the compiled frame is (hosts × rules)-sized, so pin
    // it in the cache once rather than re-running the robots parse +
    // group selection per trigger for the stream's life
    if (urls.isStreaming) graft.ops.Caching.ensureCached(compiled)
    val c = compiled.select(col(keyCol).as("_sf_key"),
      col("rules").as("_sf_rules"), col("delay_s"))
    val path = urls(pathCol)
    def lenOf(dir: String): Column = array_max(transform(
      filter(col("_sf_rules"), r =>
        r.getField("dir") === dir &&
          UrlOps.globMatches(path, r.getField("segs"), r.getField("anch"))),
      r => length(r.getField("rule"))))
    urls.join(c, urls(keyCol) === col("_sf_key"), "left")
      .withColumn("_sf_la", lenOf("allow"))
      .withColumn("_sf_ld", lenOf("disallow"))
      .withColumn("allowed",
        col("_sf_rules").isNull ||
          col("_sf_ld").isNull ||
          (col("_sf_la").isNotNull && col("_sf_la") >= col("_sf_ld")))
      .drop("_sf_key", "_sf_rules", "_sf_la", "_sf_ld")
  }

  /** Per-host monotone fetch slots for (already-permitted) arrivals:
    * adds `(slot, offset_s)` and coalesces `delay_s` to `defaultDelay`.
    * Slots continue where the host's counter left off — across
    * micro-batches and across checkpointed restarts; the first
    * micro-batch reproduces [[UrlOps.crawlSchedule]]'s assignment
    * exactly (same `urlIdCol` order, same `slot × delay` offsets).
    * Input must carry a `delay_s` column ([[permit]] emits it). */
  def schedule(permitted: DataFrame, keyCol: String = "doc_id",
               urlIdCol: String = "url_id",
               defaultDelay: Double = 1.0): DataFrame = {
    // the working columns are APPENDED (withColumn replaces in place when
    // the name already exists, which would silently shift keyIdx/uidIdx
    // onto the wrong positions), and slot/offset_s are about to be added
    // to the output schema — reject collisions loudly instead
    val reserved = Seq("_sf_skey", "_sf_uid", "slot", "offset_s")
      .filter(permitted.columns.contains)
    require(reserved.isEmpty,
      s"schedule reserves column names ${reserved.mkString(", ")} — rename " +
        "them on the input frame first")
    val keyed = permitted
      .withColumn("delay_s",
        coalesce(col("delay_s").cast(DoubleType), lit(defaultDelay)))
      .withColumn("_sf_skey", col(keyCol).cast("string"))
      .withColumn("_sf_uid", col(urlIdCol).cast(LongType))
    val delayIdx = keyed.columns.indexOf("delay_s")
    val keyIdx = keyed.columns.length - 2
    val uidIdx = keyed.columns.length - 1
    val outSchema = keyed.schema
      .add("slot", LongType).add("offset_s", DoubleType)
    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)
    keyed
      .groupByKey((r: Row) => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[Long]) => {
          val start = state.getOption.getOrElse(0L)
          // buffered to sort by url id: bounded by the host's per-batch
          // frontier (the batch window's own partition bound). NULL ids
          // sort FIRST — crawlSchedule's asc_nulls_first window order —
          // so a join-missed or uncastable id mis-slots one URL instead
          // of a getLong NPE killing the whole streaming query
          val sorted = rows.toIndexedSeq.sortBy(r =>
            (!r.isNullAt(uidIdx), if (r.isNullAt(uidIdx)) 0L else r.getLong(uidIdx)))
          val out = sorted.zipWithIndex.map { case (r, i) =>
            val slot = start + i
            Row.fromSeq(r.toSeq :+ slot :+ slot * r.getDouble(delayIdx))
          }
          state.update(start + sorted.size)
          out.iterator
        })(Encoders.scalaLong, outEnc)
      .drop("_sf_skey", "_sf_uid")
  }

  /** The composed admission chain: permit → keep allowed → schedule —
    * one call from discovered URLs to dispatchable
    * `(slot, delay_s, offset_s)` rows. */
  def frontier(urls: DataFrame, compiled: DataFrame,
               keyCol: String = "doc_id", pathCol: String = "path",
               urlIdCol: String = "url_id",
               defaultDelay: Double = 1.0): DataFrame =
    schedule(permit(urls, compiled, keyCol, pathCol).filter(col("allowed")),
      keyCol, urlIdCol, defaultDelay)
}
