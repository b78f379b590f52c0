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
