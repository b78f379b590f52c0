package graft.stream

import graft.quality.ValidationResult
import java.util.concurrent.atomic.AtomicInteger

/** Per-micro-batch context handed to intervention strategies — mirrors the
  * reference's `StreamingInterventionContext` (`spark/io/streaming.py:70`). */
final case class StreamingInterventionContext(
    batchId: Long,
    validation: ValidationResult,
    datasetId: String,
    datasetVersion: String)

/** Decides whether a streaming pipeline should be interrupted
  * (reference `StreamingInterventionStrategy`, `streaming.py:82-93`):
  * return a reason to block the stream, or None to continue. */
trait StreamingInterventionStrategy {
  def decide(context: StreamingInterventionContext): Option[String]
}

/** Never blocks (reference `NoOpStreamingInterventionStrategy`). */
case object NoOpStreamingInterventionStrategy extends StreamingInterventionStrategy {
  def decide(context: StreamingInterventionContext): Option[String] = None
}

/** Blocks after more than `maxViolatedBatches` batches with errors. */
final class FailAfterViolationsIntervention(maxViolatedBatches: Int = 0)
    extends StreamingInterventionStrategy {
  private val violated = new AtomicInteger(0)
  def decide(context: StreamingInterventionContext): Option[String] =
    if (context.validation.ok) None
    else if (violated.incrementAndGet() > maxViolatedBatches)
      Some(s"batch ${context.batchId} of ${context.datasetId} violated its contract " +
        s"(${violated.get()} violated batches > $maxViolatedBatches allowed): " +
        context.validation.errors.mkString("; "))
    else None
}

/** Raised inside foreachBatch to stop a governed stream; surfaces as the
  * StreamingQuery's terminating exception. */
final class StreamingInterventionException(reason: String)
    extends RuntimeException(reason)
