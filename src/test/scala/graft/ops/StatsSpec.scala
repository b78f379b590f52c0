package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
    ("b", 10L), ("b", 20L),
    ("c", 7L)
  ).toDF("g", "v")

  test("groupedQuantiles interpolates exactly on quarter fractions") {
    val out = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // a = [1,2,3,4]: p25 = 1.75, p50 = 2.5, p75 = 3.25
    assert(out("a") == ((4L, 1L, 4L, 1.75, 2.5, 3.25)))
    // b = [10,20]: p25 = 12.5, p50 = 15, p75 = 17.5
    assert(out("b") == ((2L, 10L, 20L, 12.5, 15.0, 17.5)))
    // singleton: every quantile is the value
    assert(out("c") == ((1L, 7L, 7L, 7.0, 7.0, 7.0)))
  }

  test("null values are ignored; all-null group yields zero count") {
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("z", None))
      .toDF("g", "v")
    val out = Stats.groupedQuantiles(withNulls, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "z" -> 0L))
  }

  test("approx path matches exact on small groups and shares the schema") {
    val exact = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.5))
    val approx = Stats.groupedQuantilesApprox(df, Seq("g"), "v", Seq(0.5))
    assert(exact.schema.map(f => (f.name, f.dataType)) ==
      approx.schema.map(f => (f.name, f.dataType)))
    // approx_percentile is exact when the group fits one digest node; it
    // returns an actual element (no interpolation), so compare medians of
    // odd-sized groups only
    val e = exact.filter($"g" === "c").select("p50").as[Double].head()
    val a = approx.filter($"g" === "c").select("p50").as[Double].head()
    assert(e == a)
  }

  test("fraction column naming handles non-integer percents") {
    val out = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.5, 0.999))
    assert(out.columns.toSeq == Seq("g", "n", "min_v", "max_v", "p50", "p99_9"))
  }

  test("psiByGroup: matching distributions score ~0, a shifted group scores high") {
    import spark.implicits._
    // a and b mirror the corpus mix; c lives in bins the others never hit
    val rows: Seq[(String, Option[Long])] =
      (1L to 50L).map(i => ("a", Some((i % 5) * 10L))) ++
      (1L to 50L).map(i => ("b", Some((i % 5) * 10L))) ++
      (1L to 50L).map(i => ("c", Some(1000L + (i % 5) * 10L))) :+
      (("a", None)) // null dropped
    val df2 = rows.toDF("src", "v")
    val out = Stats.psiByGroup(df2, "v", "src", binWidth = 10)
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("a", "b", "c"))
    // a and b share c-free bins: their shares differ from the corpus only
    // by c's mass — equal PSIs, both far below c's
    assert(out("a") == out("b"))
    assert(out("c") > out("a") && out("c") > 0.25,
      s"shifted group must breach the action threshold: $out")
    // the eps substitution keeps zero-bin groups finite
    assert(!out.values.exists(_.isInfinite))
  }

  test("corrByGroup matches a BigInt reference; zero variance is null") {
    import spark.implicits._
    val rows: Seq[(String, Option[Double], Option[Double])] =
      (1 to 40).map(i => ("g1", Some(i * 0.25), Some(i * 1.5 + (i % 7) * 0.01))) ++
      (1 to 30).map(i => ("g2", Some(i * 0.5), Some(100.0 - i * 0.75))) ++
      (1 to 10).map(_ => ("flat", Some(3.14), Some(1.0))) :+
      (("g1", None, Some(1.0))) // null x dropped
    val df = rows.toDF("g", "x", "y")
    val out = Stats.corrByGroup(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // independent reference on exact BigInt power sums
    def ref(g: String): Option[Double] = {
      val pts = rows.collect { case (`g`, Some(x), Some(y)) =>
        (BigInt(math.round(x * 100)), BigInt(math.round(y * 100))) }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx == 0 || vy == 0) None
      else Some(math.rint((n * sxy - sx * sy).toDouble /
        math.sqrt(vx.toDouble * vy.toDouble) * 1e6) / 1e6)
    }
    assert(out("g1") == ((40L, ref("g1"))))
    assert(out("g2") == ((30L, ref("g2"))))
    assert(out("g2")._2.get < -0.999, "anti-correlated group must be ~-1")
    assert(out("flat") == ((10L, None)), s"zero variance must be null: $out")
  }

  test("histogramByGroup: floor binning, per-group shares sum to 1, nulls dropped") {
    import spark.implicits._
    val rows: Seq[(String, Option[Double])] =
      Seq(("a", Some(0.0)), ("a", Some(9.99)), ("a", Some(10.0)),
        ("a", Some(25.0)), ("b", Some(-0.5)), ("b", Some(5.0)), ("a", None))
    val out = Stats.histogramByGroup(rows.toDF("g", "v"), "g", "v", 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a: bins 0 (two values), 1, 2 — shares 0.5/0.25/0.25
    assert(out(("a", 0L)) == ((2L, 0.5)))
    assert(out(("a", 1L)) == ((1L, 0.25)))
    assert(out(("a", 2L)) == ((1L, 0.25)))
    // negative values floor DOWN (bin -1), not toward zero
    assert(out(("b", -1L)) == ((1L, 0.5)))
    assert(out(("b", 0L)) == ((1L, 0.5)))
    assert(out.size == 5)
    val shareSums = out.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).sum).toMap
    assert(shareSums.values.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("madOutliers: robust gate survives the outlier it flags; MAD=0 flags any deviation") {
    import spark.implicits._
    // g: 9 values near 10 plus one wild outlier — a mean/stddev z-score
    // at k=3 would NOT flag 1000 here if more outliers inflated sigma;
    // the median/MAD gate flags exactly the wild point
    val rows = (1 to 9).map(i => ("g", i.toLong, 9.0 + (i % 3))) :+
      (("g", 100L, 1000.0)) :+
      // flat group: MAD = 0, so any off-median value is an outlier
      (("flat", 201L, 5.0)) :+ (("flat", 202L, 5.0)) :+ (("flat", 203L, 5.001))
    val out = Stats.madOutliers(rows.toDF("g", "id", "v"), "g", "v",
      idCols = Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set(100L, 203L), s"flagged: ${out.keySet}")
    val (_, medG, madG) = out(100L)
    assert(medG == 10.0 && madG == 1.0)
    val (_, medF, madF) = out(203L)
    assert(medF == 5.0 && madF == 0.0)
  }

  test("winsorize: Tukey fences clip both tails, interior values pass through") {
    import spark.implicits._
    // [1..8] plus wild tails: p25 = 2.75, p75 = 7.25 over the 10 values?
    // use a fixed set where fences are easy: values 0,10,20,...,90 + 1000
    val rows = ((0 to 9).map(i => ("g", i.toLong, i * 10.0)) :+
      (("g", 99L, 1000.0)) :+ (("g", 98L, -500.0))).toSeq
    val out = Stats.winsorize(rows.toDF("g", "id", "v"), "g", "v",
      idCols = Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    val clippedIds = out.filter(_._2._2).keySet
    assert(clippedIds == Set(98L, 99L), s"clipped: $clippedIds")
    // tails land exactly ON the fences, opposite sides
    assert(out(99L)._1 > out(98L)._1)
    // interior values are untouched
    assert(out(5L) == ((50.0, false)))
    // clipped column stays within [lo, hi] for every row
    val lo = out(98L)._1; val hi = out(99L)._1
    assert(out.values.forall { case (c, _) => c >= lo && c <= hi })
  }

  test("chiSquare: independence scores ~0, perfect association scores n*(min(r,c)-1)") {
    import spark.implicits._
    // perfectly independent 2x2: every (a, b) cell equal
    val ind = (1 to 40).map(i =>
      (if (i % 2 == 0) "x" else "y", if ((i / 2) % 2 == 0) "p" else "q"))
    val r1 = Stats.chiSquare(ind.toDF("a", "b"), "a", "b").collect().head
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1L)
    // perfect association: a determines b -> chi2 = n * (min(r,c)-1) = n
    val dep = (1 to 30).map(i => (if (i % 2 == 0) "x" else "y",
      if (i % 2 == 0) "p" else "q"))
    val r2 = Stats.chiSquare(dep.toDF("a", "b"), "a", "b").collect().head
    assert(r2.getDouble(0) == 30.0, s"chi2: ${r2.getDouble(0)}")
    // absent cell still contributes its expected mass (3x2 with a hole)
    val hole = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"), ("c", "p"))
    val r3 = Stats.chiSquare(hole.toDF("a", "b"), "a", "b").collect().head
    assert(r3.getDouble(0) > 0.0 && r3.getLong(1) == 2L)
  }

  test("welchT: known separation, sign convention, degenerate nulls") {
    import spark.implicits._
    val rows = (1 to 50).map(i => ("a", 10.0 + (i % 5) * 0.5)) ++
      (1 to 50).map(i => ("b", 20.0 + (i % 5) * 0.5))
    val out = Stats.welchT(rows.toDF("g", "v"), "g", "v", "a", "b").collect().head
    assert(out.getLong(2) == 50L && out.getLong(3) == 50L)
    assert(out.getDouble(4) == 11.0 && out.getDouble(5) == 21.0)
    // a's mean is 10 below b's: strongly negative t, df near n1+n2-2
    assert(out.getDouble(6) < -20.0, s"t = ${out.getDouble(6)}")
    assert(out.getDouble(7) > 90.0 && out.getDouble(7) <= 98.0)
    // reference check on exact arithmetic: equal variances, so
    // t = (m1-m2)/sqrt(2*s2/n) with s2 the shared sample variance
    val s2 = {
      val xs = (1 to 50).map(i => 10.0 + (i % 5) * 0.5)
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val tRef = (11.0 - 21.0) / math.sqrt(2 * s2 / 50)
    assert(math.abs(out.getDouble(6) - tRef) < 1e-6)
    // degenerate: singleton group yields null t/df, means still real
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val d = Stats.welchT(tiny, "g", "v", "a", "b").collect().head
    assert(d.isNullAt(6) && d.isNullAt(7))
    assert(d.getDouble(4) == 1.0)
    // zero variance in both groups: null, not NaN
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val z = Stats.welchT(flat, "g", "v", "a", "b").collect().head
    assert(z.isNullAt(6) && z.isNullAt(7))
  }

  test("outlierFlagWith: frozen stats reproduce madOutliers on the calibration frame, and gate streams") {
    import spark.implicits._
    val rows = (1 to 9).map(i => ("g", i.toLong, 9.0 + (i % 3))) :+
      (("g", 100L, 1000.0))
    val df = rows.toDF("g", "id", "v")
    val stats = Stats.madStats(df, "g", "v")
    val flagged = Stats.outlierFlagWith(df, stats, "g", "v")
      .filter($"is_outlier").select("id").as[Long].collect().toSet
    val direct = Stats.madOutliers(df, "g", "v", idCols = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(flagged == direct && flagged == Set(100L))
    // streaming frame through the same frozen stats
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Long, Double)](spark)
    val q = Stats.outlierFlagWith(
      mem.toDF().toDF("g", "id", "v"), stats, "g", "v")
      .writeStream.format("memory").queryName("outlier_stream_out")
      .outputMode("append").start()
    try {
      mem.addData(("g", 200L, 10.0), ("g", 201L, -400.0))
      q.processAllAvailable()
      val out = spark.table("outlier_stream_out")
        .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
      assert(out == Map(200L -> false, 201L -> true), s"$out")
    } finally q.stop()
  }

  test("fdViolations: only violating lhs values, null rhs is its own class") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("A")), (1L, Some("A")),          // consistent — not reported
      (2L, Some("A")), (2L, Some("B")),          // violation: 2 values
      (3L, Some("X")), (3L, None),               // violation: {X, null}
      (4L, None), (4L, None)                     // consistent all-null
    ).toDF("k", "v")
    val out = Stats.fdViolations(df, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))), s"got $out")
  }

  test("keyProfile: detects true keys, ratio exact, nulls disqualify") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), "x"), (2L, Some(10L), "y"),
      (3L, None, "x"), (4L, Some(30L), "z")
    ).toDF("id", "grp", "s")
    val out = Stats.keyProfile(df, Seq("id", "grp", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(out("id") == ((4L, 4L, 0L, 1.0, true)))
    // grp: 2 distinct non-null + 1 null -> not a key even at high ratio
    assert(out("grp") == ((4L, 2L, 1L, 0.5, false)))
    assert(out("s") == ((4L, 3L, 0L, 0.75, false)))
  }
}
