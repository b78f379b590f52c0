package graft.quality

import graft.contracts._
import org.scalatest.funsuite.AnyFunSuite

/** The pluggable-engine seam (reference engines.py:27-220 +
  * manager.py:21-130): per-contract engine resolution, the GE/Soda
  * metrics-driven verdict mappings, suite loading, and the loud
  * unknown-engine contract. Mirrors the reference's engine-resolution
  * and external-metrics-verdict cases — pure JVM, no Spark session. */
class DqEnginesSpec extends AnyFunSuite {

  private def contract(
      custom: Map[String, String] = Map.empty,
      objEngine: Option[String] = None,
      fieldEngine: Option[String] = None): Contract =
    Contract("orders", "1.0.0", schema = Seq(SchemaObjectDef("orders",
      properties = Seq(
        FieldDef("order_id", physicalType = Some("bigint"), required = true,
          quality = fieldEngine.map(e =>
            QualityRule(engine = Some(e))).toSeq),
        FieldDef("status", physicalType = Some("string"),
          quality = Seq(QualityRule(rule = Some("enum"),
            values = Seq("open", "closed"))))),
      quality = objEngine.map(e => QualityRule(engine = Some(e))).toSeq)),
      customProperties = custom)

  private val manager = new DataQualityManager()

  private val cleanPayload = ObservationPayload(
    metrics = Map("row_count" -> 10L,
      "violations.not_null_order_id" -> 0L,
      "violations.enum_status" -> 0L),
    schema = Map(
      "order_id" -> FieldSnapshot("bigint", "bigint", nullable = false),
      "status" -> FieldSnapshot("string", "string", nullable = true)))

  // ---- engine resolution (manager.py:49-75) ----

  test("resolution: custom-property spellings, rule engine attribute, default") {
    assert(manager.resolveEngineName(contract()) == "native")
    for (key <- Seq("quality_engine", "qualityEngine", "dq_engine", "dqEngine"))
      assert(manager.resolveEngineName(
        contract(custom = Map(key -> "Great_Expectations"))) ==
        "great_expectations", s"property $key must resolve (case-folded)")
    // a quality rule's engine attribute resolves when no property names one
    assert(manager.resolveEngineName(
      contract(objEngine = Some("soda"))) == "soda")
    assert(manager.resolveEngineName(
      contract(fieldEngine = Some("soda"))) == "soda")
    // property wins over rule attribute; blanks are skipped
    assert(manager.resolveEngineName(contract(
      custom = Map("quality_engine" -> "native"),
      objEngine = Some("soda"))) == "native")
    assert(manager.resolveEngineName(contract(
      custom = Map("quality_engine" -> "  "))) == "native")
  }

  test("unknown engine names fail loudly, never a silent native fallback") {
    val e = intercept[IllegalArgumentException] {
      manager.evaluate(contract(custom = Map("dq_engine" -> "nonsuch")),
        cleanPayload)
    }
    assert(e.getMessage.contains("nonsuch"))
  }

  test("builtin is an alias of native; custom registrations are case-folded") {
    val res = manager.evaluate(
      contract(custom = Map("quality_engine" -> "builtin")), cleanPayload)
    assert(res.ok && res.recordStatus == "ok" && res.statusOverride.isEmpty)
    var hits = 0
    val custom = new DataQualityEngine {
      override def evaluate(c: Contract, p: ObservationPayload): ValidationResult = {
        hits += 1
        ValidationResult(ok = true, Nil, Nil, Map.empty, Map.empty)
      }
    }
    val m2 = new DataQualityManager(engines = Map("MyEngine" -> custom))
    m2.evaluate(contract(custom = Map("quality_engine" -> "myengine")),
      cleanPayload)
    assert(hits == 1)
  }

  // ---- native engine (engines.py:44-86) ----

  test("native engine: the Evaluator verdict, violations and all") {
    val bad = cleanPayload.copy(metrics =
      cleanPayload.metrics + ("violations.enum_status" -> 3L))
    val res = manager.evaluate(contract(), bad)
    assert(!res.ok && res.recordStatus == "block")
    assert(res.errors.exists(_.contains("status")))
  }

  // ---- Great Expectations adapter (engines.py:145-178) ----

  private def geContract = contract(custom = Map("quality_engine" -> "great_expectations"))

  test("GE: missing summary -> status unknown with the missing-summary reason") {
    val res = manager.evaluate(geContract, cleanPayload)
    assert(res.recordStatus == "unknown")
    assert(res.reason.contains("missing-great-expectations-summary"))
    assert(res.ok, "unknown is 'cannot judge', not 'blocked' (models.py)")
  }

  test("GE: success maps ok/block; explicit known status wins; junk status falls back") {
    def eval(summary: Map[String, Any]) = manager.evaluate(geContract,
      cleanPayload.copy(metrics =
        cleanPayload.metrics + ("great_expectations" -> summary)))
    assert(eval(Map("success" -> true)).recordStatus == "ok")
    val blocked = eval(Map("success" -> false))
    assert(blocked.recordStatus == "block" && !blocked.ok)
    assert(eval(Map("status" -> "warn", "success" -> false)).recordStatus == "warn")
    assert(eval(Map("status" -> "rubbish", "success" -> true)).recordStatus == "ok")
    assert(eval(Map("status" -> "rubbish", "success" -> false)).recordStatus == "block")
  }

  test("GE: reason from exception_info (map or string), falling back to reason") {
    def eval(summary: Map[String, Any]) = manager.evaluate(geContract,
      cleanPayload.copy(metrics =
        cleanPayload.metrics + ("great_expectations" -> summary)))
    assert(eval(Map("success" -> false,
      "exception_info" -> Map("exception_message" -> "boom"))).reason
      .contains("boom"))
    assert(eval(Map("success" -> false,
      "exception_info" -> "raw text")).reason.contains("raw text"))
    assert(eval(Map("success" -> false,
      "reason" -> "fallback")).reason.contains("fallback"))
  }

  // ---- Soda adapter (engines.py:181-212) ----

  private def sodaContract = contract(custom = Map("quality_engine" -> "soda"))

  test("Soda: outcome vocabulary, passed/pass special-case, warn default") {
    def eval(summary: Map[String, Any]) = manager.evaluate(sodaContract,
      cleanPayload.copy(metrics = cleanPayload.metrics + ("soda" -> summary)))
    assert(eval(Map("status" -> "ok")).recordStatus == "ok")
    assert(eval(Map("outcome" -> "block")).recordStatus == "block")
    // out-of-vocabulary status: passed/pass -> ok, anything else -> block
    assert(eval(Map("status" -> "PASSED")).recordStatus == "ok")
    assert(eval(Map("status" -> "failed")).recordStatus == "block")
    // r15 review fix: the pass special-case reads the RESOLVED value —
    // a pass verdict under Soda's own `outcome` key (no `status` key at
    // all) must map ok, not block (the reference's fallback re-reads
    // the status key and gets this wrong)
    assert(eval(Map("outcome" -> "pass")).recordStatus == "ok")
    assert(eval(Map("outcome" -> "PASSED", "checks" -> 3L)).recordStatus == "ok")
    assert(eval(Map("outcome" -> "failed")).recordStatus == "block")
    // no status/outcome at all -> warn (the reference default)
    assert(eval(Map("checks" -> 5L)).recordStatus == "warn")
    // reason falls back from reason to error
    assert(eval(Map("status" -> "block", "error" -> "scan died")).reason
      .contains("scan died"))
    val missing = manager.evaluate(sodaContract, cleanPayload)
    assert(missing.recordStatus == "unknown" &&
      missing.reason.contains("missing-soda-summary"))
  }

  // ---- describeExpectations + suite loading (engines.py:89-142) ----

  test("describeExpectations: contract plan by default, loaded suite when configured") {
    val plan = manager.describeExpectations(contract())
    assert(plan.exists(d => d("rule") == "enum" && d("column") == "status"))
    assert(plan.exists(d => d("rule") == "not_null"))
    // a configured JSON suite overrides the contract plan
    val dir = java.nio.file.Files.createTempDirectory("graft_suite")
    val f = dir.resolve("suite.json")
    java.nio.file.Files.write(f,
      """[{"expectation_type":"expect_column_values_to_not_be_null",
        |"kwargs":{"column":"order_id"}}]""".stripMargin.getBytes("UTF-8"))
    val ge = new GreatExpectationsEngine(suitePath = Some(f.toString))
    val suite = ge.describeExpectations(contract())
    assert(suite.size == 1 &&
      suite.head("expectation_type") == "expect_column_values_to_not_be_null")
    // missing/malformed suites degrade to the contract plan, never throw
    val gone = new GreatExpectationsEngine(
      suitePath = Some(dir.resolve("nope.json").toString))
    assert(gone.describeExpectations(contract()).nonEmpty)
    java.nio.file.Files.write(f, "{broken".getBytes("UTF-8"))
    assert(ge.describeExpectations(contract())
      .exists(d => d("rule") == "enum"))
  }
}
