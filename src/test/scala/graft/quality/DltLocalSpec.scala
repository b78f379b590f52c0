package graft.quality

import graft.{DemoContracts, SparkSpec}
import org.apache.spark.sql.functions._

class DltLocalSpec extends SparkSpec {
  import spark.implicits._

  test("expectation reports and kept/dropped semantics match the reference") {
    val h = new LocalDltHarness(spark)
    val exp = DltExpectations(
      enforced = Map("pos" -> "v > 0"),
      observed = Map("small" -> "v < 10"))
    h.table("t", exp) {
      Seq(Some(1L), Some(5L), Some(-2L), None, Some(20L)).toDF("v")
    }
    val kept = h.runAsset("t")
    // failures are rows where NOT pred is TRUE (reference filter(~expr)):
    // pos -> only -2 (null doesn't count); small -> only 20
    val byRule = h.reports.map(r => r.rule -> r).toMap
    assert(byRule("pos").failedRows == 1 && byRule("pos").action == "drop")
    assert(byRule("small").failedRows == 1 && byRule("small").action == "warn")
    assert(byRule("pos").status == "failed" && byRule("pos").runId == 1L)
    // drop applies only to enforced rules: -2 dropped, null and 20 kept
    assert(kept.count() == 4)
    assert(h.assetStatus == Map("t" -> "failed"))
  }

  test("a predicate failing analysis counts every row as failed (reference AnalysisException path)") {
    val h = new LocalDltHarness(spark)
    h.table("broken", DltExpectations.fromPredicates(Map("bad" -> "no_such_col > 0"), drop = true)) {
      Seq(1L, 2L, 3L).toDF("v")
    }
    val kept = h.runAsset("broken")
    assert(h.reports.head.failedRows == 3 && h.reports.head.status == "failed")
    assert(kept.count() == 0)
  }

  test("demo contract end-to-end: reports agree with Metrics, kept frame passes every enforced rule") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val specs = Expectations.fromContract(DemoContracts.lineitem)
    val h = new LocalDltHarness(spark)
    h.table("lineitem", DltExpectations.fromContract(DemoContracts.lineitem))(li)
    val kept = h.runAsset("lineitem")

    // every report's failure count equals the single-pass Metrics violation
    // count for the same expectation key — two independent computations
    val metrics = Metrics.compute(li, specs)
    h.reports.foreach { r =>
      assert(metrics(s"violations.${r.rule}") == r.failedRows, r.rule)
    }
    // the kept frame re-validates clean on every enforced predicate
    val dlt = DltExpectations.fromContract(DemoContracts.lineitem)
    dlt.enforced.values.foreach { p =>
      assert(kept.filter(not(expr(p)) <=> true).count() == 0, p)
    }
    // observed-only violations survive the drop (warn action)
    assert(h.reports.exists(r => r.action == "warn" && r.failedRows > 0))
    assert(kept.count() < li.count() && kept.count() > 0)
  }

  test("runAll executes tables (not views); views run on demand; unknown assets error") {
    val h = new LocalDltHarness(spark)
    h.table("a")(Seq(1).toDF("x"))
    h.view("b", DltExpectations.fromPredicates(Map("pos" -> "x > 0")))(Seq(-1).toDF("x"))
    val all = h.runAll()
    assert(all.keySet == Set("a") && h.reports.isEmpty)
    // fromPredicates default drop=false -> warn action, row NOT dropped
    assert(h.runAsset("b").count() == 1)
    assert(h.reports.map(_.action) == Seq("warn"))
    intercept[NoSuchElementException](h.runAsset("nope"))
    // run ids increment per execution
    h.runAsset("b")
    assert(h.reports.map(_.runId) == Seq(2L, 3L))
  }
}
