package graft.obs

import graft.{DemoContracts, SparkSpec}
import graft.io.ContractIO
import org.json4s.JsonAST._
import org.json4s.jackson.JsonMethods

class TelemetrySpansSpec extends SparkSpec {

  private def attr(span: JValue, key: String): JValue =
    span \ "attributes" \ key

  test("span carries the reference attribute names, statuses, and events") {
    val v = graft.quality.ValidationResult(ok = false,
      errors = Seq("missing required column: x"), warnings = Seq("w"),
      metrics = Map("row_count" -> 3L), schema = Map.empty)
    val json = TelemetrySpans.span(
      operation = " Write ",
      validation = Some(v),
      contractId = Some("sales.orders"), contractVersion = Some("1.2.0"),
      datasetId = Some("sales.orders"), datasetVersion = Some("7"),
      datasetFormat = Some("parquet"), path = Some("/lake/orders"),
      pipelineContext = Map("job" -> "nightly", "team" -> "data"),
      expectationPlan = Seq(Map("rule" -> "not_null", "column" -> "o_orderkey")))
    val span = JsonMethods.parse(json)
    assert(span \ "name" == JString("dc43.integrations.governance.write"))
    assert(span \ "kind" == JString("INTERNAL"))
    assert(attr(span, "dc43.governance.operation") == JString("write"))
    assert(attr(span, "dc43.governance.contract.id") == JString("sales.orders"))
    assert(attr(span, "dc43.governance.contract.version") == JString("1.2.0"))
    assert(attr(span, "dc43.governance.dataset.version") == JString("7"))
    assert(attr(span, "dc43.governance.dataset.format") == JString("parquet"))
    assert(attr(span, "dc43.governance.dataset.path") == JString("/lake/orders"))
    assert(attr(span, "dc43.governance.pipeline.job") == JString("nightly"))
    // errors -> block, ok=false; both as attributes and as the event payload
    assert(attr(span, "dc43.governance.validation.status") == JString("block"))
    assert(attr(span, "dc43.governance.validation.ok") == JBool(false))
    val events = (span \ "events").asInstanceOf[JArray].arr
    assert(events.map(_ \ "name") ==
      List(JString("dc43.validation"), JString("dc43.expectations")))
    val vAttrs = events.head \ "attributes"
    assert(vAttrs \ "errors_count" == JInt(1) && vAttrs \ "warnings_count" == JInt(1))
    val details = JsonMethods.parse((vAttrs \ "details").asInstanceOf[JString].s)
    assert(details \ "metrics" \ "row_count" == JInt(3))
    val plan = JsonMethods.parse(
      (events(1) \ "attributes" \ "plan").asInstanceOf[JString].s)
    assert(plan(0) \ "rule" == JString("not_null"))
  }

  test("status vocabulary and empty-coordinate dropping") {
    val ok = graft.quality.ValidationResult(true, Nil, Nil, Map.empty, Map.empty)
    assert(TelemetrySpans.statusOf(ok) == "ok")
    assert(TelemetrySpans.statusOf(ok.copy(warnings = Seq("w"))) == "warn")
    assert(TelemetrySpans.statusOf(ok.copy(ok = false, errors = Seq("e"))) == "block")
    val span = JsonMethods.parse(TelemetrySpans.span("", contractId = Some("")))
    assert(span \ "name" == JString("dc43.integrations.governance.run"))
    assert(attr(span, "dc43.governance.contract.id") == JNothing)
    assert(span \ "events" == JArray(Nil))
  }

  test("sink emits a span per governed write observation") {
    import spark.implicits._
    val lines = Seq.newBuilder[String]
    val sink = new TelemetryObservationSink(lines += _, operation = "write",
      contractId = Some(DemoContracts.lineitemAlign.id),
      contractVersion = Some(DemoContracts.lineitemAlign.version),
      pipelineContext = Map("job" -> "spec"))
    val df = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val result = ContractIO.write(df, tmpDir("graft_otel") + "/out",
      DemoContracts.lineitemAlign, mode = "overwrite")
    sink.record("sales.lineitem_slim", Some(1L), result.validation.metrics,
      result.validation)
    val span = JsonMethods.parse(lines.result().head)
    assert(attr(span, "dc43.governance.dataset.id") == JString("sales.lineitem_slim"))
    assert(attr(span, "dc43.governance.dataset.version") == JString("1"))
    assert(attr(span, "dc43.governance.contract.version") == JString("0.3.0"))
    assert(attr(span, "dc43.governance.validation.status") != JNothing)
    val details = JsonMethods.parse(
      ((span \ "events")(0) \ "attributes" \ "details").asInstanceOf[JString].s)
    assert(details \ "metrics" \ "row_count" != JNothing)
  }
}
