package graft.obs

import graft.quality.ValidationResult
import org.json4s.JsonAST._
import org.json4s.jackson.JsonMethods

/** OpenTelemetry-shaped governance spans — the sibling of
  * [[LineageEvents]] mirroring the reference's `record_telemetry_span`
  * (dc43 `spark/open_telemetry.py:122-208`): one INTERNAL span per
  * governed operation, `dc43.governance.*` attributes carrying the
  * contract/dataset coordinates and validation verdict, plus a
  * `dc43.validation` span event with the full serialised payload and an
  * optional `dc43.expectations` event with the expectation plan.
  *
  * No OTel SDK is bound (the reference itself no-ops when the SDK is
  * absent): the span is emitted as plain JSON in the OTLP-ish
  * `{name, kind, attributes, events}` shape to a `String => Unit`
  * consumer, so deployments can hand it to a collector, a log pipeline,
  * or a test buffer. Attribute names match the reference exactly, so a
  * consumer of dc43's spans reads graft's unchanged. */
object TelemetrySpans {

  val TracerName = "dc43.integrations.governance"
  val AttributePrefix = "dc43.governance"
  val ValidationEvent = "dc43.validation"
  val ExpectationEvent = "dc43.expectations"

  /** Reference status vocabulary ("ok" | "warn" | "block") — delegates
    * to the canonical [[ValidationResult.recordStatus]] so spans and
    * governance records can never disagree about a verdict. */
  def statusOf(v: ValidationResult): String = v.recordStatus

  private def jStr(s: String): JValue = JString(s)

  /** Attribute values are scalar-or-JSON-string (`_attribute_value`):
    * complex payloads are embedded as deterministic (sorted-key) JSON. */
  private def encoded(v: JValue): String =
    JsonMethods.compact(JsonMethods.render(v))

  /** One governance span as OTLP-ish JSON. `pipelineContext` keys land
    * under `dc43.governance.pipeline.<key>` (the reference's flattened
    * context); empty/None coordinates are dropped like `_drop_empty`. */
  def span(
      operation: String,
      validation: Option[ValidationResult] = None,
      contractId: Option[String] = None,
      contractVersion: Option[String] = None,
      datasetId: Option[String] = None,
      datasetVersion: Option[String] = None,
      datasetFormat: Option[String] = None,
      table: Option[String] = None,
      path: Option[String] = None,
      pipelineContext: Map[String, String] = Map.empty,
      expectationPlan: Seq[Map[String, String]] = Nil): String = {

    val op = Option(operation).map(_.trim.toLowerCase).filter(_.nonEmpty).getOrElse("run")
    val p = AttributePrefix

    val coordAttrs: Seq[(String, JValue)] = Seq(
      s"$p.operation" -> Some(op),
      s"$p.contract.id" -> contractId.filter(_.nonEmpty),
      s"$p.contract.version" -> contractVersion.filter(_.nonEmpty),
      s"$p.dataset.id" -> datasetId.filter(_.nonEmpty),
      s"$p.dataset.version" -> datasetVersion.filter(_.nonEmpty),
      s"$p.dataset.format" -> datasetFormat.filter(_.nonEmpty),
      s"$p.dataset.table" -> table.filter(_.nonEmpty),
      s"$p.dataset.path" -> path.filter(_.nonEmpty)
    ).collect { case (k, Some(v)) => k -> jStr(v) }

    val pipelineAttrs = pipelineContext.toSeq.sortBy(_._1).map { case (k, v) =>
      s"$p.pipeline.$k" -> jStr(v)
    }

    val validationAttrs = validation.toSeq.flatMap { v =>
      Seq(s"$p.validation.status" -> jStr(statusOf(v)),
        s"$p.validation.ok" -> (JBool(v.ok): JValue))
    }

    val validationEvents = validation.toSeq.map { v =>
      JObject(
        "name" -> JString(ValidationEvent),
        "attributes" -> JObject(List(
          "status" -> JString(statusOf(v)),
          "ok" -> JBool(v.ok),
          "errors_count" -> JInt(BigInt(v.errors.size)),
          "warnings_count" -> JInt(BigInt(v.warnings.size)),
          "details" -> JString(encoded(LineageEvents.validationFacet(v))))))
    }
    val expectationEvents =
      if (expectationPlan.isEmpty) Nil
      else Seq(JObject(
        "name" -> JString(ExpectationEvent),
        "attributes" -> JObject("plan" -> JString(encoded(JArray(
          expectationPlan.toList.map(e => JObject(
            e.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }))))))))

    JsonMethods.compact(JsonMethods.render(JObject(
      "name" -> JString(s"$TracerName.$op"),
      "kind" -> JString("INTERNAL"),
      "attributes" -> JObject((coordAttrs ++ pipelineAttrs ++ validationAttrs).toList),
      "events" -> JArray((validationEvents ++ expectationEvents).toList))))
  }
}

/** Observation sink emitting one telemetry span per governed observation —
  * the OTel twin of [[LineageObservationSink]]; plug into the same
  * streaming/batch hooks. */
final class TelemetryObservationSink(
    emit: String => Unit,
    operation: String = "write",
    contractId: Option[String] = None,
    contractVersion: Option[String] = None,
    pipelineContext: Map[String, String] = Map.empty) extends ObservationSink {
  def record(datasetId: String, batchId: Option[Long],
             metrics: Map[String, Any], validation: ValidationResult): Unit =
    emit(TelemetrySpans.span(
      operation = operation,
      validation = Some(validation),
      contractId = contractId,
      contractVersion = contractVersion,
      datasetId = Some(datasetId),
      datasetVersion = batchId.map(_.toString),
      pipelineContext = pipelineContext))
}
