package graft.obs

import graft.quality.ValidationResult
import org.json4s.JsonAST._
import org.json4s.jackson.JsonMethods

/** OpenLineage-shaped run events for governed reads/writes — the concrete
  * emitter the reference builds in
  * `dc43-integrations/spark/open_data_lineage.py:261` (`RunEvent` with
  * `dc43Contract` / `dc43Dataset` / `dc43DataQuality` dataset facets and a
  * `dc43Validation` run facet) and mirrors into OpenTelemetry span events in
  * `spark/open_telemetry.py:108-211`. No lineage SDK is bound: the event is
  * plain JSON matching the RunEvent schema, handed to a `String => Unit`
  * consumer (HTTP poster, Kafka producer, log appender — deployment's
  * choice). */
object LineageEvents {

  val DefaultProducer = "graft"
  val DefaultSchemaUrl = "https://openlineage.io/spec/2-0-2/OpenLineage.json#"

  private def drop(fields: Seq[(String, JValue)]): JObject =
    JObject(fields.filter {
      case (_, JNothing) | (_, JNull) => false
      case (_, JObject(Nil)) | (_, JArray(Nil)) => false
      case (_, JString("")) => false
      case _ => true
    }.toList)

  private def jAny(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case n: Int => JInt(BigInt(n))
    case n: Long => JInt(BigInt(n))
    case n: Double => JDouble(n)
    case n: Number => JDouble(n.doubleValue)
    case m: Map[_, _] => JObject(m.toList.sortBy(_._1.toString).map { case (k, x) => k.toString -> jAny(x) })
    case xs: Iterable[_] => JArray(xs.toList.map(jAny))
    case other => JString(other.toString)
  }

  /** `_serialise_validation` (`open_data_lineage.py:64`): ok + messages +
    * metric and schema observations, empties dropped. */
  def validationFacet(v: ValidationResult): JObject = drop(Seq(
    "ok" -> JBool(v.ok),
    "errors" -> JArray(v.errors.toList.map(JString(_))),
    "warnings" -> JArray(v.warnings.toList.map(JString(_))),
    "metrics" -> jAny(v.metrics),
    "schema" -> JObject(v.schema.toList.sortBy(_._1).map { case (name, fs) =>
      name -> drop(Seq(
        "backendType" -> JString(fs.backendType),
        "odcsType" -> JString(fs.odcsType),
        "nullable" -> JBool(fs.nullable)))
    })))

  /** One RunEvent, shaped as `build_lineage_run_event` shapes it: the
    * dataset appears under `inputs` for reads and `outputs` for writes. */
  def runEvent(
      operation: String, // "read" | "write"
      datasetId: String,
      validation: ValidationResult,
      metrics: Map[String, Any] = Map.empty,
      contractId: Option[String] = None,
      contractVersion: Option[String] = None,
      datasetVersion: Option[String] = None,
      namespace: String = "graft",
      jobName: Option[String] = None,
      runId: String = java.util.UUID.randomUUID().toString,
      eventTimeMillis: Long = System.currentTimeMillis(),
      producer: String = DefaultProducer,
      schemaUrl: String = DefaultSchemaUrl): String = {
    val op = operation.toLowerCase
    val dataQuality = drop(Seq(
      "metrics" -> jAny(metrics),
      "schema" -> (validationFacet(validation) \ "schema")))
    val datasetFacets = drop(Seq(
      "dc43Contract" -> drop(Seq(
        "contractId" -> contractId.map(JString(_)).getOrElse(JNothing),
        "contractVersion" -> contractVersion.map(JString(_)).getOrElse(JNothing))),
      "version" -> datasetVersion.map(v => JObject("datasetVersion" -> JString(v))).getOrElse(JNothing),
      "dc43Dataset" -> drop(Seq(
        "datasetId" -> JString(datasetId),
        "datasetVersion" -> datasetVersion.map(JString(_)).getOrElse(JNothing),
        "operation" -> JString(op))),
      "dc43DataQuality" -> dataQuality))
    val dataset = JObject(
      "namespace" -> JString(namespace),
      "name" -> JString(datasetId),
      "facets" -> datasetFacets)
    val event = JObject(
      "eventType" -> JString("COMPLETE"),
      "eventTime" -> JString(java.time.Instant.ofEpochMilli(eventTimeMillis).toString),
      "run" -> JObject(
        "runId" -> JString(runId),
        "facets" -> JObject("dc43Validation" -> validationFacet(validation))),
      "job" -> JObject(
        "namespace" -> JString(namespace),
        "name" -> JString(jobName.orElse(contractId).getOrElse(datasetId)),
        "facets" -> JObject()),
      "producer" -> JString(producer),
      "inputs" -> (if (op == "read") JArray(List(dataset)) else JArray(Nil)),
      "outputs" -> (if (op == "write") JArray(List(dataset)) else JArray(Nil)),
      "schemaURL" -> JString(schemaUrl))
    JsonMethods.compact(JsonMethods.render(event))
  }
}

/** [[ObservationSink]] adapter: every recorded observation becomes one
  * OpenLineage RunEvent JSON line handed to `emit`. Streaming batch ids ride
  * in `datasetVersion`, matching how the reference versions micro-batch
  * writes. */
final class LineageObservationSink(
    emit: String => Unit,
    operation: String = "write",
    namespace: String = "graft",
    contractId: Option[String] = None,
    contractVersion: Option[String] = None) extends ObservationSink {
  def record(datasetId: String, batchId: Option[Long],
             metrics: Map[String, Any], validation: ValidationResult): Unit =
    emit(LineageEvents.runEvent(
      operation = operation,
      datasetId = datasetId,
      validation = validation,
      metrics = metrics,
      contractId = contractId,
      contractVersion = contractVersion,
      datasetVersion = batchId.map(_.toString),
      namespace = namespace))
}
