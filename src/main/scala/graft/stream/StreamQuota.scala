package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum quota admission — the ingest-time sibling of
  * [[graft.ops.Curate.capPerSource]]: admit the first `cap` documents of
  * each stratum across the stream's life, drop the rest at the door.
  * The batch operator keeps the LOWEST-id k (a corpus-wide property); a
  * stream cannot know future ids, so arrival order is the only total
  * order available — this is the standard admission-control trade, and
  * what makes the operator O(1) state per stratum (one counter).
  *
  * Within a micro-batch the admitted subset follows the iterator order
  * Spark hands the group (shuffle-order-dependent, like any streaming
  * arrival race across concurrent producers); across batches admission
  * is strictly monotone — once a stratum's quota is spent, nothing else
  * ever enters. State is ONE Long per stratum, no timeout: quotas are
  * meant to persist for the stream's life (re-run the batch quota over
  * the stored corpus when ids matter more than arrival order). */
object StreamQuota {

  /** Admit up to `cap` rows per distinct value combination of
    * `strataCols` from a streaming frame. Rows pass through unchanged
    * (carried on their own Row encoder — no serialisation detour); the
    * stratum key is length-prefix encoded like `Curate.stratifiedSample`
    * so free-form string combinations cannot collide. */
  /** Streaming weighted-sample ADMISSION — the ingest-time sibling of
    * [[graft.ops.Curate.weightedSample]]: admit a row iff its
    * sequential-Poisson priority `hash(salt, id) div weight` ranks among
    * the `k` smallest its stratum has seen SO FAR. Append mode cannot
    * retract, so the admitted set is a SUPERSET of the final batch top-k
    * (early rows later displaced stay admitted) with one guarantee that
    * makes it useful: a row the batch operator would keep is NEVER
    * dropped — at its arrival fewer than k smaller priorities can exist,
    * so it always ranks in. Replay the batch operator over the stored
    * corpus when the exact-k set matters; use this to bound ingest
    * volume to ~k per stratum online.
    *
    * State per stratum is the bounded k-priority buffer (same MinK
    * insert contract as [[graft.ops.TopK.MinKIds]]); rows with null or
    * non-positive weight never admit (the batch contract). */
  def weightedSamplePerStratum(docs: DataFrame, strataCols: Seq[String], k: Int,
                               weightCol: String, idCol: String = "doc_id",
                               mode: graft.ops.HashMode = graft.ops.HashMode.Default,
                               salt: String = "wsamp"): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must not be empty")
    require(k > 0, "k must be positive")
    val stratum: Column = strataCols.map { c =>
      coalesce(concat(length(col(c).cast("string")).cast("string"), lit("|"),
        col(c).cast("string")), lit("-|"))
    }.reduce(concat(_, _))
    val keyed = docs
      .filter(col(weightCol).isNotNull && col(weightCol).cast("long") > 0)
      .withColumn("_wq_key", stratum)
      .withColumn("_wq_h", mode.nonNegHash(lit(salt), col(idCol)))
      .withColumn("_wq_w", col(weightCol).cast("long"))
      .withColumn("_wq_pri", expr("_wq_h div _wq_w"))
      .drop("_wq_h", "_wq_w")
    val keyIdx = keyed.columns.length - 2
    val priIdx = keyed.columns.length - 1
    implicit val outEnc: Encoder[Row] = Encoders.row(keyed.schema)
    implicit val bufEnc: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    keyed
      .groupByKey((r: Row) => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[List[Long]]) => {
          var buf = state.getOption.getOrElse(Nil)
          val admitted = rows.filter { r =>
            val pri = r.getLong(priIdx)
            val in = buf.lengthCompare(k) < 0 || pri < buf.last
            if (in) {
              val (pre, post) = buf.span(_ < pri)
              val merged = pre ::: (pri :: post)
              buf = if (merged.lengthCompare(k) > 0) merged.take(k) else merged
            }
            in
          }.toList
          state.update(buf)
          admitted.iterator
        })(bufEnc, outEnc)
      .drop("_wq_key", "_wq_pri")
  }

  def capPerStratum(docs: DataFrame, strataCols: Seq[String], cap: Int): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must not be empty")
    require(cap > 0, "cap must be positive")
    val stratum: Column = strataCols.map { c =>
      coalesce(concat(length(col(c).cast("string")).cast("string"), lit("|"),
        col(c).cast("string")), lit("-|"))
    }.reduce(concat(_, _))
    val keyed = docs.withColumn("_sq_key", stratum)
    val keyIdx = keyed.columns.length - 1
    implicit val outEnc: Encoder[Row] = Encoders.row(keyed.schema)
    keyed
      .groupByKey((r: Row) => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[Long]) => {
          val already = state.getOption.getOrElse(0L)
          val room = math.max(0L, cap.toLong - already)
          val admitted = rows.take(room.toInt).toList
          state.update(already + admitted.length)
          admitted.iterator
        })(Encoders.scalaLong, outEnc)
      .drop("_sq_key")
  }
}
