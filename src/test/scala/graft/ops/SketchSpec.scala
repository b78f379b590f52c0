package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, String)*) =
    rows.toDF("g", "v")

  test("KMV below k is the exact distinct count (duplicates collapse)") {
    val df = pairs(
      "a" -> "x", "a" -> "x", "a" -> "y", "a" -> "z",
      "b" -> "x", "b" -> "x")
    val est = Sketch.distinctKmv(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 3L, "b" -> 1L))
  }

  test("KMV buffer keeps the k smallest distinct hashes, sorted") {
    val df = pairs((1 to 200).map(i => "g" -> s"v$i"): _*)
    val sk = Sketch.kmvSketch(df, "g", "v", k = 16)
      .collect().map(r => r.getSeq[Long](1)).head
    assert(sk.size === 16)
    assert(sk === sk.sorted)
    assert(sk.distinct.size === 16)
    // the buffer is the true bottom-16 of the full hash set
    val all = df.select(HashMode.Portable.hash(lit("kmv"), col("v")).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted.take(16).toSeq
    assert(sk === all)
  }

  test("KMV estimate is within 3 relative standard errors of the truth") {
    val n = 5000
    val df = pairs((1 to n).map(i => "g" -> s"value_$i"): _*)
    val k = 64
    val est = Sketch.distinctKmv(df, "g", "v", k)
      .collect().head.getLong(1)
    // std error of the KMV estimator ≈ n / sqrt(k-2)
    val tol = 3.0 * n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) <= tol, s"est $est vs true $n (tol $tol)")
  }

  test("KMV is insertion-order and partitioning independent") {
    val vals = (1 to 500).map(i => "g" -> s"v$i")
    val a = Sketch.kmvSketch(pairs(vals: _*).repartition(1), "g", "v", 32)
      .collect().map(_.getSeq[Long](1)).head
    val b = Sketch.kmvSketch(pairs(scala.util.Random.shuffle(vals): _*).repartition(7),
      "g", "v", 32).collect().map(_.getSeq[Long](1)).head
    assert(a === b)
  }

  test("count-min never underestimates and is exact without collisions") {
    val df = Seq.fill(7)("alpha").union(Seq.fill(3)("beta")).union(Seq("gamma"))
      .toDF("v")
    val d = 2; val w = 1024 // plenty of buckets: collisions ~impossible
    val cm = Sketch.countMin(df, "v", d, w)
    // grid state is bounded by the number of non-empty counters
    assert(cm.count() <= d.toLong * w)
    val est = Sketch.cmEstimate(cm, df.distinct(), "v", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("count-min collision promotes (overestimates), never hides") {
    val df = (1 to 100).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i")).toDF("v")
    val exact = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.cmEstimate(
      Sketch.countMin(df, "v", 2, 8), df.distinct(), "v", 2, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v estimated ${est(v)} below exact $c")
    }
  }

  test("unseen probes estimate zero, not absence") {
    val cm = Sketch.countMin(Seq("a", "a", "b").toDF("v"), "v", 2, 4)
    val est = Sketch.cmEstimate(cm, Seq("zzz_never_inserted").toDF("v"),
      "v", 2, 4).collect()
    // either 0 (empty buckets) or a collision count — present either way
    assert(est.length === 1)
    assert(est.head.getLong(1) >= 0L)
  }

  test("heavyHitters recall: every true heavy hitter survives") {
    val df = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")).toDF("v")
    val hh = Sketch.heavyHitters(df, "v", d = 2, w = 64, minShare = 0.5)
      .collect().map(_.getString(0)).toSet
    assert(hh.contains("hot"))
    // 50% of 100 = 50: no cold value can reach it even with collisions
    // into hot's bucket (hot 60 + cold 1 = 61 — but a cold value's est
    // is min over two rows; both colliding with hot is possible, so
    // only assert recall here and precision on the collision-free grid
    val precise = Sketch.heavyHitters(df, "v", d = 2, w = 4096, minShare = 0.5)
      .collect().map(_.getString(0)).toSet
    assert(precise === Set("hot"))
  }

  test("SketchIndex KMV append equals a fresh build over the union") {
    val dir = tmpDir("kmv_a")
    val out = tmpDir("kmv_out")
    val day1 = pairs((1 to 300).map(i => (s"s${i % 3}", s"v$i")): _*)
    val day2 = pairs((250 to 500).map(i => (s"s${i % 3}", s"w$i")): _*)
    SketchIndex.buildKmv(day1, "g", "v", dir, k = 32)
    SketchIndex.appendKmv(spark, dir, day2, "g", "v", out)
    val merged = SketchIndex.estimateKmv(spark, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = Sketch.distinctKmv(day1.unionByName(day2), "g", "v", 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === fresh)
  }

  test("SketchIndex KMV merge of two artifacts equals the union build") {
    val a = tmpDir("kmv_m1"); val b = tmpDir("kmv_m2"); val out = tmpDir("kmv_m3")
    val d1 = pairs((1 to 200).map(i => ("g", s"v$i")): _*)
    val d2 = pairs((150 to 400).map(i => ("g", s"v$i")): _*)
    SketchIndex.buildKmv(d1, "g", "v", a, k = 24)
    SketchIndex.buildKmv(d2, "g", "v", b, k = 24)
    SketchIndex.mergeKmv(spark, a, b, out)
    val merged = SketchIndex.estimateKmv(spark, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = Sketch.distinctKmv(d1.unionByName(d2), "g", "v", 24).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === fresh)
  }

  test("SketchIndex CM append equals a fresh grid over the union") {
    val dir = tmpDir("cm_a"); val out = tmpDir("cm_out")
    val d1 = (1 to 100).map(i => s"t${i % 10}").toDF("v")
    val d2 = (1 to 50).map(i => s"t${i % 7}").toDF("v")
    SketchIndex.buildCm(d1, "v", dir, d = 3, w = 16)
    SketchIndex.appendCm(spark, dir, d2, "v", out)
    val probes = d1.unionByName(d2).distinct()
    val merged = SketchIndex.estimateCm(spark, out, probes, "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = Sketch.cmEstimate(
      Sketch.countMin(d1.unionByName(d2), "v", 3, 16), probes, "v", 3, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === fresh)
  }

  test("artifact parameter mismatches fail loudly") {
    val a = tmpDir("kmv_p1"); val b = tmpDir("kmv_p2")
    SketchIndex.buildKmv(pairs("g" -> "x"), "g", "v", a, k = 16)
    SketchIndex.buildKmv(pairs("g" -> "x"), "g", "v", b, k = 32)
    val e = intercept[IllegalArgumentException] {
      SketchIndex.mergeKmv(spark, a, b, tmpDir("kmv_p3"))
    }
    assert(e.getMessage.contains("disagree"))
    // a CM reader refuses a KMV artifact
    val e2 = intercept[IllegalArgumentException] {
      SketchIndex.estimateCm(spark, a, pairs("g" -> "x"), "v")
    }
    assert(e2.getMessage.contains("kind"))
  }

  test("estimator guards: k below 2 and bad CM shapes are rejected") {
    val df = pairs("g" -> "x")
    intercept[IllegalArgumentException](Sketch.kmvSketch(df, "g", "v", 1))
    intercept[IllegalArgumentException](Sketch.countMin(df, "v", 0, 16))
    intercept[IllegalArgumentException](Sketch.countMin(df, "v", 2, 1))
    intercept[IllegalArgumentException](Sketch.heavyHitters(df, "v", 2, 16, 0.0))
  }

  test("null values drop from both sketches") {
    val df = Seq(("g", Some("x")), ("g", None), ("g", Some("y")))
      .toDF("g", "v")
    assert(Sketch.distinctKmv(df, "g", "v", 8).collect().head.getLong(1) === 2L)
    val cmTotal = Sketch.countMin(df, "v", 2, 16)
      .filter(col("row") === 0).agg(sum("cnt")).collect().head.getLong(0)
    assert(cmTotal === 2L)
  }

  // ---- quantile sketch ----------------------------------------------------

  private def qrows(n: Int, g: String = "g") =
    (1 to n).map(i => (g, i.toLong, (i * 7 % n).toLong + 1)).toDF("g", "id", "v")

  test("quantile sketch below k holds the whole group: exact order statistics") {
    // 10 rows with values 1..10 (some permutation), k = 64 - never fills
    val df = (1 to 10).map(i => ("g", i.toLong, i.toLong)).toDF("g", "id", "v")
    val est = Sketch.quantileEstimate(
      Sketch.quantileSketch(df, "g", "id", "v", k = 64)).collect().head
    assert(est.getAs[Long]("n_sample") == 10L)
    // nearest-rank over the full set: p25 -> ceil(2.5) = 3rd, p50 -> 5th,
    // p75 -> 8th, p90 -> 9th smallest
    assert(est.getAs[Long]("p25") == 3L)
    assert(est.getAs[Long]("p50") == 5L)
    assert(est.getAs[Long]("p75") == 8L)
    assert(est.getAs[Long]("p90") == 9L)
  }

  test("quantile sketch full buffer equals a local min-k-by-hash recomputation") {
    val df = qrows(500)
    val k = 32
    val got = Sketch.quantileSketch(df, "g", "id", "v", k)
      .collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)).head
      .map(p => (p.getLong(0), p.getLong(1)))
    // recompute: hash every id, keep the k smallest (hash, v) pairs
    val all = df.select(HashMode.Portable.hash(lit("qs"), col("id")).as("h"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.take(k).toSeq
    assert(got == all, "the sample must be the true bottom-k by hash")
    // estimates are plausible quantiles of 1..500 from a uniform sample
    val est = Sketch.quantileEstimate(
      Sketch.quantileSketch(df, "g", "id", "v", k)).collect().head
    assert(est.getAs[Long]("n_sample") == k.toLong)
    assert(est.getAs[Long]("p25") < est.getAs[Long]("p75"))
    val p50 = est.getAs[Long]("p50")
    assert(p50 > 100 && p50 < 400, s"median of 1..500 sampled at k=32: $p50")
  }

  test("quantile sketches over disjoint shards merge to the sketch of the union") {
    val k = 16
    val a = (1 to 300).map(i => ("g", i.toLong, (i * 13 % 997).toLong)).toDF("g", "id", "v")
    val b = (301 to 600).map(i => ("g", i.toLong, (i * 13 % 997).toLong)).toDF("g", "id", "v")
    val merged = Sketch.mergeQuantile(
      Sketch.quantileSketch(a, "g", "id", "v", k),
      Sketch.quantileSketch(b, "g", "id", "v", k), k)
      .collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)).head
      .map(p => (p.getLong(0), p.getLong(1)))
    val whole = Sketch.quantileSketch(a.unionByName(b), "g", "id", "v", k)
      .collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)).head
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(merged == whole, "min-k is a semilattice: merge == sketch-of-union")
  }

  test("quantile sketch drops null keys and null values; estimate rank bounds hold") {
    val df = Seq(
      (Option("g"), Option(1L), Option(10L)),
      (Option("g"), None, Option(20L)),
      (Option("g"), Option(3L), None),
      (Option("g"), Option(4L), Option(40L))
    ).toDF("g", "id", "v")
    val est = Sketch.quantileEstimate(
      Sketch.quantileSketch(df, "g", "id", "v", k = 8), Seq(1, 100)).collect().head
    assert(est.getAs[Long]("n_sample") == 2L)
    assert(est.getAs[Long]("p1") == 10L, "p1 -> rank 1 (smallest)")
    assert(est.getAs[Long]("p100") == 40L, "p100 -> rank n (largest)")
    intercept[IllegalArgumentException](Sketch.quantileEstimate(df, Seq(0)))
    intercept[IllegalArgumentException](Sketch.quantileSketch(df, "g", "id", "v", 0))
  }

  test("SketchIndex quantile append/merge equal a fresh build over the union") {
    val a = tmpDir("qs_a"); val b = tmpDir("qs_b")
    val outApp = tmpDir("qs_app"); val outMrg = tmpDir("qs_mrg")
    // DISJOINT row ids across shards (the documented row-sample contract)
    val d1 = (1 to 250).map(i => (s"s${i % 3}", i.toLong, (i * 13 % 211).toLong))
      .toDF("g", "id", "v")
    val d2 = (251 to 500).map(i => (s"s${i % 3}", i.toLong, (i * 13 % 211).toLong))
      .toDF("g", "id", "v")
    SketchIndex.buildQuantile(d1, "g", "id", "v", a, k = 24)
    SketchIndex.buildQuantile(d2, "g", "id", "v", b, k = 24)
    SketchIndex.appendQuantile(spark, a, d2, "g", "id", "v", outApp)
    SketchIndex.mergeQuantile(spark, a, b, outMrg)
    def est(dir: String) = SketchIndex.estimateQuantile(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val fresh = Sketch.quantileEstimate(Sketch.quantileSketch(
      d1.unionByName(d2), "g", "id", "v", k = 24))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(est(outApp) === fresh, "append == fresh build over the union")
    assert(est(outMrg) === fresh, "merge == fresh build over the union")
    // merges re-aggregate under the STORED k: artifacts with different
    // build k refuse to merge (the biased-sample hazard, now checkable)
    val c = tmpDir("qs_c")
    SketchIndex.buildQuantile(d2, "g", "id", "v", c, k = 16)
    val e = intercept[IllegalArgumentException] {
      SketchIndex.mergeQuantile(spark, a, c, tmpDir("qs_d"))
    }
    assert(e.getMessage.contains("disagree"))
  }
}
