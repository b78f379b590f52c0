package graft.io

import graft.contracts.Contract
import org.apache.spark.sql.DataFrame

/** What an interceptor sees about the operation in flight — twin of the
  * reference's `InterceptorContext` (`spark/io/interceptors.py:18`). */
final case class InterceptorContext(
    operation: String, // "read" | "write"
    datasetId: Option[String],
    path: Option[String],
    contract: Option[Contract])

/** Hooks around governed reads/writes (reference `GovernanceInterceptor`,
  * `spark/io/interceptors.py:43-77`): the post-read / pre-write hooks may
  * rewrite the frame (masking, tagging, repartitioning); the others are
  * side-effect points (audit, lineage). All default to pass-through. */
trait GovernanceInterceptor {
  def preRead(context: InterceptorContext): Unit = ()
  def postRead(context: InterceptorContext, df: DataFrame): DataFrame = df
  def preWrite(context: InterceptorContext, df: DataFrame): DataFrame = df
  def postWrite(context: InterceptorContext, result: WriteResult): Unit = ()
}

/** Contract-status gating on read — twin of `DefaultReadStatusStrategy`
  * (`spark/io/status.py:42`): only contracts whose lifecycle status is in
  * the allowed set may serve reads; unknown status is allowed only when
  * `allowMissingStatus`. */
final case class ReadStatusPolicy(
    allowedStatuses: Set[String] = Set("active"),
    allowMissingStatus: Boolean = true) {
  def check(contract: Contract): Unit = contract.status.map(_.toLowerCase) match {
    case Some(s) if !allowedStatuses.contains(s) =>
      throw new IllegalStateException(
        s"contract ${contract.id}:${contract.version} has status '$s', " +
          s"not allowed for reads (allowed: ${allowedStatuses.mkString(", ")})")
    case None if !allowMissingStatus =>
      throw new IllegalStateException(
        s"contract ${contract.id}:${contract.version} has no status and the policy requires one")
    case _ => ()
  }
}
