package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query vs-baseline gate (r10): proves the 2× ceiling trips on
  * a deliberate slowdown and stays quiet inside it — the r9 episode was
  * a 2.27× outlier hiding inside an aggregate vs_baseline of 1.154, so
  * the gate's job is exactly "an outlier can never hide again". Pure
  * functions, no Spark session: the gate must be provable without a
  * 4-minute bench run. */
class BenchGateSpec extends AnyFunSuite {

  private val base = Bench.baselineSecs("q1_pricing")

  test("a deliberate 2.1x slowdown on a shared query trips the gate") {
    val results = Seq("q1_pricing" -> base * 2.1, "q_metrics" -> 0.30)
    val breaches = Bench.baselineBreaches(results, factor = 1.0)
    assert(breaches.size == 1)
    assert(breaches.head.startsWith("q1_pricing"))
  }

  test("1.9x stays inside the gate; exactly 2.0x is NOT a breach (strict >)") {
    assert(Bench.baselineBreaches(Seq("q1_pricing" -> base * 1.9), 1.0).isEmpty)
    assert(Bench.baselineBreaches(Seq("q1_pricing" -> base * 2.0), 1.0).isEmpty)
  }

  test("contention normalization scales the ceiling like the budget gate") {
    val results = Seq("q1_pricing" -> base * 2.5)
    assert(Bench.baselineBreaches(results, factor = 1.0).nonEmpty)
    // a run-wide 1.3x contention factor lifts the ceiling to 2.6x
    assert(Bench.baselineBreaches(results, factor = 1.3).isEmpty)
  }

  test("failed queries (-1) and non-baseline queries never trip the gate") {
    val results = Seq("q1_pricing" -> -1.0, "q_entropy" -> 99.0)
    assert(Bench.baselineBreaches(results, 1.0).isEmpty)
    assert(Bench.perQueryRatios(results).isEmpty)
  }

  test("perQueryRatios covers exactly the timed shared-baseline set") {
    val results = Seq("q1_pricing" -> base, "q_pack_chunks" -> 0.2,
      "q_entropy" -> 0.5)
    val ratios = Bench.perQueryRatios(results).toMap
    assert(ratios.keySet == Set("q1_pricing", "q_pack_chunks"))
    assert(math.abs(ratios("q1_pricing") - 1.0) < 1e-9)
  }

  test("every headline query has a budget; every baseline query is headline") {
    val missing = Bench.headline.filterNot(Bench.budgetSecs.contains)
    assert(missing.isEmpty, s"headline queries without a budget: $missing")
    val orphan = Bench.baselineSecs.keys.filterNot(Bench.headline.contains)
    assert(orphan.isEmpty, s"baseline queries not in headline: $orphan")
  }
}
