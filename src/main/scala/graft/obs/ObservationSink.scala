package graft.obs

import graft.quality.ValidationResult

/** Pluggable observability hook — the role of the reference's OpenTelemetry
  * integration (`spark/open_telemetry.py:211`) without binding to a
  * telemetry SDK: governed reads/writes and streaming batches publish
  * their metric set + verdict here; adapters fan out to whatever backend
  * (OTel meters, StatsD, a metrics table) the deployment uses. */
trait ObservationSink {
  def record(
      datasetId: String,
      batchId: Option[Long],
      metrics: Map[String, Any],
      validation: ValidationResult): Unit
}

/** Default sink: structured one-line log per observation via log4j. */
object LogObservationSink extends ObservationSink {
  private lazy val log = org.apache.logging.log4j.LogManager.getLogger("graft.observations")
  def record(datasetId: String, batchId: Option[Long],
             metrics: Map[String, Any], validation: ValidationResult): Unit = {
    val kv = metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")
    log.info(s"dataset=$datasetId batch=${batchId.getOrElse(-1L)} ok=${validation.ok} " +
      s"errors=${validation.errors.size} warnings=${validation.warnings.size} $kv")
  }
}

/** In-memory sink for tests and ad-hoc inspection. */
final class BufferingObservationSink extends ObservationSink {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Long], Map[String, Any], ValidationResult)]()
  def record(d: String, b: Option[Long], m: Map[String, Any], v: ValidationResult): Unit =
    buf.add((d, b, m, v))
  def all: Seq[(String, Option[Long], Map[String, Any], ValidationResult)] =
    buf.toArray(Array.empty[AnyRef]).toSeq.map(_.asInstanceOf[(String, Option[Long], Map[String, Any], ValidationResult)])
}
