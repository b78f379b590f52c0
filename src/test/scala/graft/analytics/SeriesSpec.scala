package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** movingAvg / transitions / pivotSummary / momentsByGroup. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")

  test("movingAvg: trailing k-window, partial at the series head, per-user isolation") {
    val ev = Seq(
      (1L, ts(1), 7L, "view", 10.0), (2L, ts(2), 7L, "view", 20.0),
      (3L, ts(3), 7L, "view", 60.0), (4L, ts(4), 7L, "view", 100.0),
      (5L, ts(1), 8L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.movingAvg(ev, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 10.0)            // window of 1
    assert(out(2L) == 15.0)            // (10+20)/2
    assert(out(3L) == 30.0)            // (10+20+60)/3
    assert(out(4L) == 60.0)            // (20+60+100)/3 — 10 fell out
    assert(out(5L) == 5.0)             // other user unaffected
  }

  test("transitions: lead pairs per user, conditional rows sum to 1 per from_type") {
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
      (3L, ts(3), 1L, "view", 0.0), (4L, ts(4), 1L, "purchase", 0.0),
      (5L, ts(1), 2L, "view", 0.0), (6L, ts(2), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // user 1: view->click, click->view, view->purchase; user 2: view->view
    assert(out(("view", "click")) == ((1L, 0.333333)))
    assert(out(("view", "purchase")) == ((1L, 0.333333)))
    assert(out(("view", "view")) == ((1L, 0.333333)))
    assert(out(("click", "view")) == ((1L, 1.0)))
    assert(out.size == 4)
    // no cross-user pair (user 1's purchase -> user 2's view must not exist)
  }

  test("pivotSummary: explicit pivot values, absent cells read 0, exact totals") {
    val orders = Seq(
      (1L, 1L, "F", 10.0, ts(1), "1-URGENT"),
      (2L, 1L, "F", 20.0, ts(2), "1-URGENT"),
      (3L, 2L, "O", 40.0, ts(3), "1-URGENT"),
      (4L, 3L, "O", 7.5, ts(4), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.pivotSummary(orders)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getLong(5), r.getDouble(6))).toMap
    assert(out("1-URGENT") == ((2L, 30.0, 1L, 40.0, 0L, 0.0)))
    assert(out("5-LOW") == ((0L, 0.0, 1L, 7.5, 0L, 0.0)))
  }

  test("momentsByGroup: symmetric data has zero skew, flat data nulls, heavy tail positive skew") {
    val rows: Seq[(String, Double)] =
      Seq("sym" -> 1.0, "sym" -> 2.0, "sym" -> 3.0, "sym" -> 4.0, "sym" -> 5.0) ++
      Seq.fill(5)("flat" -> 3.0) ++
      (Seq.fill(9)(1.0) :+ 100.0).map("tail" -> _)
    val out = Stats2.moments(rows.toDF("g", "v"))
    assert(out("sym")._2 == 3.0)                 // mean
    assert(out("sym")._3.contains(0.0))          // skewness
    assert(out("flat")._3.isEmpty && out("flat")._4.isEmpty)
    assert(out("tail")._3.exists(_ > 2.0), s"tail skew: ${out("tail")._3}")
    assert(out("tail")._4.exists(_ > 4.0), s"tail kurt: ${out("tail")._4}")
    // uniform symmetric sample: platykurtic (negative excess kurtosis)
    assert(out("sym")._4.exists(_ < 0.0))
  }

  test("momentsByGroup: values outside the exact-arithmetic envelope fail LOUDLY") {
    // n*max|x*10^d| = 3e11 > 2e9: under ANSI the quartic product throws
    // on its own; under non-ANSI (the silent-null hazard the guard
    // exists for) DECIMAL(38,0) nulls the product and kurtosis would be
    // silently wrong — the guard must raise instead
    val wide = Seq("g" -> 1.0e9, "g" -> -1.0e9, "g" -> 0.0).toDF("g", "v")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val ex = intercept[Exception] {
        graft.ops.Stats.momentsByGroup(wide, "g", "v", decimals = 2).collect()
      }
      assert(msgs(ex).exists(m => m != null && m.contains("envelope")),
        s"expected the envelope guard under non-ANSI, got: $ex")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    // under ANSI (session default) the same input still fails loudly —
    // either the guard or the ANSI decimal-overflow error, never a null
    val ex2 = intercept[Exception] {
      graft.ops.Stats.momentsByGroup(wide, "g", "v", decimals = 2).collect()
    }
    assert(msgs(ex2).exists(m => m != null &&
      (m.contains("envelope") || m.contains("Decimal"))), s"got: $ex2")
    // the guard must survive COLUMN PRUNING: selecting only kurtosis
    // (not n) once dropped the guard column entirely and silently
    // restored the wrong-null behavior — the gate now rides inside the
    // n every output uses, so pruning cannot remove it
    val ansiWas2 = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val ex3 = intercept[Exception] {
        graft.ops.Stats.momentsByGroup(wide, "g", "v", decimals = 2)
          .select("g", "kurtosis").collect()
      }
      assert(msgs(ex3).exists(m => m != null && m.contains("envelope")),
        s"pruned projection must still hit the guard, got: $ex3")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas2)
    // in-envelope wide-ish values still compute (n*max = 3e9*... ok at d=0)
    val ok = graft.ops.Stats.momentsByGroup(
      Seq("g" -> 100.0, "g" -> 200.0, "g" -> 400.0).toDF("g", "v"),
      "g", "v", decimals = 0).collect().head
    assert(ok.getLong(1) == 3L && !ok.isNullAt(4))
  }

  private object Stats2 {
    def moments(df: org.apache.spark.sql.DataFrame)
    : Map[String, (Long, Double, Option[Double], Option[Double])] =
      graft.ops.Stats.momentsByGroup(df, "g", "v")
        .collect().map { r =>
          r.getString(0) -> ((r.getLong(1), r.getDouble(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        }.toMap
  }
}
