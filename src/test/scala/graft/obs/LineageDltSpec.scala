package graft.obs

import graft.DemoContracts
import graft.quality.{DltExpectations, Evaluator, FieldSnapshot, ValidationResult}
import org.json4s.jackson.JsonMethods
import org.json4s.JsonAST._
import org.scalatest.funsuite.AnyFunSuite

class DltExpectationsSpec extends AnyFunSuite {

  test("lineitem contract splits into enforced (required) and observed (optional)") {
    val dlt = DltExpectations.fromContract(DemoContracts.lineitem)
    // optional fields (l_discount, l_tax, l_linestatus) -> expect_all
    assert(dlt.observed == Map(
      "ge_l_discount" -> "`l_discount` >= 0.02",
      "le_l_tax" -> "`l_tax` <= 0.07",
      "regex_l_linestatus" -> "`l_linestatus` RLIKE '^[OF]$'"))
    // required fields -> expect_all_or_drop, predicates identical to the
    // engine's own validation predicates
    assert(dlt.enforced.keySet == Set(
      "not_null_l_orderkey", "not_null_l_partkey", "not_null_l_suppkey",
      "not_null_l_linenumber", "not_null_l_quantity", "gt_l_quantity",
      "le_l_quantity", "not_null_l_extendedprice", "lt_l_extendedprice",
      "not_null_l_returnflag", "enum_l_returnflag", "not_null_l_shipdate"))
    assert(dlt.enforced("enum_l_returnflag") == "`l_returnflag` IN ('A', 'N')")
  }

  test("specs without a row predicate (unique, query) are skipped like the reference") {
    val dlt = DltExpectations.fromContract(DemoContracts.orders)
    val keys = dlt.enforced.keySet ++ dlt.observed.keySet
    assert(!keys.exists(_.startsWith("unique_")), s"unique specs must be dropped: $keys")
    assert(keys.contains("enum_o_orderstatus"))
  }

  test("apply() routes the two maps to the right dlt callbacks") {
    val dlt = DltExpectations.fromContract(DemoContracts.lineitem)
    var dropped: Map[String, String] = Map.empty
    var warned: Map[String, String] = Map.empty
    dlt.apply(m => dropped = m, m => warned = m)
    assert(dropped == dlt.enforced && warned == dlt.observed)
    val none = DltExpectations(Map.empty, Map.empty)
    none.apply(_ => fail("must not call expect_all_or_drop when empty"),
      _ => fail("must not call expect_all when empty"))
  }

  test("fromPredicates honours the drop flag") {
    val p = Map("k" -> "`c` IS NOT NULL")
    assert(DltExpectations.fromPredicates(p, drop = true) == DltExpectations(p, Map.empty))
    assert(DltExpectations.fromPredicates(p) == DltExpectations(Map.empty, p))
  }
}

class LineageEventsSpec extends AnyFunSuite {

  private val validation = ValidationResult(
    ok = false,
    errors = Seq("missing required column: x"),
    warnings = Seq("w1"),
    metrics = Map("row_count" -> 42L, "violations.not_null_x" -> 0L),
    schema = Map("a" -> FieldSnapshot("bigint", "bigint", nullable = true)))

  test("write run event carries the reference facet shape") {
    val json = LineageEvents.runEvent(
      operation = "write", datasetId = "sales.lineitem",
      validation = validation, metrics = Map("row_count" -> 42L),
      contractId = Some("sales.lineitem"), contractVersion = Some("1.2.0"),
      datasetVersion = Some("7"), runId = "run-1", eventTimeMillis = 0L)
    val ev = JsonMethods.parse(json)
    assert(ev \ "eventType" == JString("COMPLETE"))
    assert(ev \ "eventTime" == JString("1970-01-01T00:00:00Z"))
    assert(ev \ "run" \ "runId" == JString("run-1"))
    assert(ev \ "run" \ "facets" \ "dc43Validation" \ "ok" == JBool(false))
    assert(ev \ "run" \ "facets" \ "dc43Validation" \ "errors" ==
      JArray(List(JString("missing required column: x"))))
    assert(ev \ "inputs" == JArray(Nil))
    val out = (ev \ "outputs")(0)
    assert(out \ "name" == JString("sales.lineitem"))
    assert(out \ "facets" \ "dc43Contract" \ "contractId" == JString("sales.lineitem"))
    assert(out \ "facets" \ "dc43Contract" \ "contractVersion" == JString("1.2.0"))
    assert(out \ "facets" \ "version" \ "datasetVersion" == JString("7"))
    assert(out \ "facets" \ "dc43Dataset" \ "operation" == JString("write"))
    assert(out \ "facets" \ "dc43DataQuality" \ "metrics" \ "row_count" == JInt(42))
    assert(out \ "facets" \ "dc43DataQuality" \ "schema" \ "a" \ "odcsType" == JString("bigint"))
  }

  test("read events list the dataset under inputs; sink emits one line per record") {
    val lines = Seq.newBuilder[String]
    val sink = new LineageObservationSink(lines += _, operation = "read",
      contractId = Some("sales.orders"))
    sink.record("sales.orders", Some(3L), Map("row_count" -> 1L),
      validation.copy(ok = true, errors = Nil))
    val ev = JsonMethods.parse(lines.result().head)
    assert((ev \ "inputs")(0) \ "facets" \ "version" \ "datasetVersion" == JString("3"))
    assert(ev \ "outputs" == JArray(Nil))
    assert(ev \ "run" \ "facets" \ "dc43Validation" \ "ok" == JBool(true))
  }

  test("governed validate end-to-end feeds the sink a well-formed event") {
    // shape check on a real ValidationResult produced by the evaluator
    val res = Evaluator.evaluate(DemoContracts.lineitem,
      Map("l_orderkey" -> FieldSnapshot("bigint", "bigint", nullable = false)),
      Map("violations.not_null_l_orderkey" -> 0L))
    val json = LineageEvents.runEvent("write", "d", res)
    val ev = JsonMethods.parse(json)
    assert((ev \ "run" \ "facets" \ "dc43Validation" \ "ok") == JBool(false)) // missing cols
    assert(JsonMethods.compact(JsonMethods.render(ev)).nonEmpty)
  }
}
