package graft.governance

import graft.contracts.Contract
import graft.quality.{FieldSnapshot, ValidationResult}

/** `evaluateAndRecord`'s combined answer: the RECORDED status plus the
  * contract's OUTSTANDING draft versions after this evaluation — every
  * unreviewed draft for the contract, including ones proposed by
  * earlier runs, not only a draft this call minted. */
final case class GovernanceEvaluation(status: DatasetStatus, ok: Boolean,
                                      draftVersions: Seq[String])

/** The governance surface a PIPELINE binds to — the reference's
  * local/remote client symmetry (`dc43-service-clients/.../governance/
  * client/local.py` vs `remote.py`: one protocol, two transports).
  * Implemented in-process by [[GovernanceBackend]] and over the wire by
  * `graft.service.HttpGovernanceClient`, so switching a pipeline to a
  * deployed facade is a constructor swap. The evaluation entry point
  * takes OBSERVATIONS (contract + schema snapshot + one-pass metrics),
  * never data — the only shape that survives 100 TB inputs, and exactly
  * what crosses the wire in remote mode.
  *
  * The richer browse/audit surface (status matrix filters, full
  * dataset records with activity, telemetry hooks) stays on the
  * concrete implementations — this trait is the pipeline contract. */
trait GovernanceService {
  def getStatus(datasetId: String, datasetVersion: String): Option[DatasetStatus]
  def listDatasets(): Seq[String]
  def linkDatasetContract(datasetId: String, contractId: String,
                          contractVersion: String, datasetVersion: String = ""): Unit
  def linkedContract(datasetId: String): Option[(String, String)]
  def listDraftVersions(contractId: String): Seq[String]
  def reviewDraft(contractId: String, version: String, approve: Boolean): Contract

  /** Persist an edited draft revision IN PLACE — the reference
    * contracts-app's draft-workspace edit flow (`server.py` draft
    * editing), reduced to its semantics: the reviewer may rewrite the
    * draft's schema/rules/description before approving, but the edit
    * can never move the draft (id and version are pinned to the
    * addressed ones) nor skip review (status stays `draft` — approval
    * is [[reviewDraft]]'s job). Returns the stored revision. */
  def updateDraft(contractId: String, version: String, edited: Contract): Contract
  def statusMatrix(): Seq[DatasetStatus]
  def metricHistory(datasetId: String): Seq[MetricObservation]

  /** Evaluate observations, RECORD the verdict against the dataset
    * version (auto-drafting on feedback where supported), and report
    * the contract's outstanding drafts — the reference's
    * `/governance/evaluate` round trip in one call. */
  def evaluateAndRecord(datasetId: String, datasetVersion: String,
                        contract: Contract,
                        schema: Map[String, FieldSnapshot],
                        metrics: Map[String, Any]): GovernanceEvaluation

  /** Record an already-computed validation — [[graft.io.GovernedIO]]'s
    * write path, which needs the verdict for its violation strategy
    * BEFORE recording. In-process this persists the result as-is; over
    * the wire the validation's own schema snapshot + metrics are
    * shipped as observations and the server re-derives the verdict —
    * bit-identical when the validation came from `Evaluator`'s default
    * knobs (GovernedIO's path), re-graded under custom severities (the
    * observations, not the grading, are the wire contract). */
  def record(datasetId: String, datasetVersion: String, contract: Contract,
             validation: ValidationResult): DatasetStatus
}
