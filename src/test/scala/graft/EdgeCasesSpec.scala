package graft

import graft.contracts._
import graft.ops._
import graft.quality._
import org.apache.spark.sql.functions._

class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String, String, String)]
    .toDF("doc_id", "text", "lang", "source")

  test("metrics on an empty frame: zero counts, no nulls leaking") {
    val m = Metrics.compute(emptyDocs.withColumnRenamed("doc_id", "id"),
      Seq(ExpectationSpec("not_null_id", "not_null", Some("id")),
          ExpectationSpec("unique_id", "unique", Some("id"))))
    assert(m("row_count") == 0L)
    assert(m("violations.not_null_id") == 0L)
    assert(m("violations.unique_id") == 0L)
  }

  test("text/dedup ops are total on empty corpora") {
    assert(TextOps.textStats(emptyDocs).count() == 0)
    assert(TextOps.dedupExact(emptyDocs).count() == 0)
    assert(NearDup.ngramPairs(emptyDocs).count() == 0)
    assert(NearDup.minhashPairs(emptyDocs).count() == 0)
    assert(NearDup.simhashPairs(emptyDocs, maxHamming = 3).count() == 0)
    assert(NearDup.duplicateClusters(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("round-6 ops are total on empty corpora and null text") {
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(TextOps.bigramLm(emptyDocs).count() == 0)
    assert(TextOps.tokenEntropy(emptyDocs).count() == 0)
    assert(TextOps.truncateTokens(emptyDocs, 8).count() == 0)
    assert(Curate.boilerplateRatio(emptyDocs).count() == 0)
    assert(Curate.stratifiedSample(emptyDocs, Seq("lang"), k = 3).count() == 0)
    assert(Curate.contaminationFlag(emptyDocs,
      Seq((1L, "a b c d")).toDF("doc_id", "text")).count() == 0)
    assert(VectorOps.annRadius(emptyEmb).count() == 0)
    assert(VectorOps.annIvfRadius(emptyEmb).count() == 0)
    assert(VectorOps.semanticPairs(emptyEmb).count() == 0)
    assert(RangeJoin.intervalOverlap(
      Seq.empty[(Long, Long, Long)].toDF("lid", "a", "b"),
      Seq.empty[(Long, Long, Long)].toDF("rid", "c", "d"),
      col("a"), col("b"), col("c"), col("d"), bucketWidth = 10).count() == 0)

    // null text: projections stay total (null/zero outputs, no crash)
    val withNull = Seq((1L, null.asInstanceOf[String], "en", "s1"),
      (2L, "a b c d e", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    assert(TextOps.tokenEntropy(withNull).count() == 2)
    assert(TextOps.truncateTokens(withNull, 3).count() == 2)
    assert(Curate.boilerplateRatio(withNull).count() == 2)
    val ent = TextOps.tokenEntropy(withNull).filter(col("doc_id") === 1).collect()(0)
    assert(ent.getAs[Long]("n_tokens") == 0L && ent.getAs[Double]("entropy") == 0.0)
  }

  test("round-6-continuation ops are total on empty corpora and null text") {
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val emptyW = emptyDocs.withColumn("n_chars", lit(0L))
    assert(Curate.weightedSample(emptyW, k = 5, weightCol = "n_chars").count() == 0)
    assert(Curate.dedupLines(emptyDocs).count() == 0)
    assert(Curate.frequentLines(emptyDocs).count() == 0)
    assert(Curate.stripLinesFlag(emptyDocs, Curate.frequentLines(emptyDocs)).count() == 0)
    assert(TextOps.gopherRules(emptyDocs).count() == 0)
    assert(TextOps.scoreLinear(emptyDocs, Seq(0.1, -0.1)).count() == 0)
    assert(VectorOps.semanticPairsMultiProbe(emptyEmb).count() == 0)
    assert(NearDup.canonicalDocsBest(emptyW,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), "n_chars").count() == 0)

    val withNull = Seq((1L, null.asInstanceOf[String], "en", "s1"),
      (2L, "a b c d e", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    assert(Curate.dedupLines(withNull).count() == 2)
    assert(Curate.stripLinesFlag(withNull, Curate.frequentLines(withNull)).count() == 2)
    // offset ids above every centroid seed: multi-probe degrades gracefully
    val offsetEmb = Seq((1000L, Array.fill(4)(1.0f), 0), (1001L, Array.fill(4)(0.9f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.semanticPairsMultiProbe(offsetEmb, threshold = 0.5).count() == 0)
    // late round-6 ops: total on empty corpora and null text
    assert(NearDup.containmentPairs(emptyDocs).count() == 0)
    assert(Curate.upsampleBySource(emptyDocs, Map("x" -> 2.0)).count() == 0)
    assert(TextOps.windowChunks(emptyDocs, maxTokens = 8).count() == 0)
    assert(TextOps.lmScore(emptyDocs).count() == 0)
    assert(TextOps.vocabDrift(emptyDocs).count() == 0)
    val withNull2 = Seq((1L, null.asInstanceOf[String], "en", "s1"),
      (2L, "a b c d e", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    assert(TextOps.windowChunks(withNull2, maxTokens = 3).count() == 3) // 1 empty + 2 windows
    assert(TextOps.lmScore(withNull2).count() == 2)
    assert(TextOps.perplexityBuckets(withNull2).count() == 2)
  }

  test("vector ops are total on empty and offset-id corpora") {
    val emptyVecs = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.annIvf(emptyVecs).count() == 0)
    assert(VectorOps.kmeansCentroids(
      VectorOps.prepared(emptyVecs), k = 4, iterations = 2).count() == 0)
    // ids all above the seed bound: no centroid seeds — graceful empty,
    // not an AnalysisException from a zero-element array literal
    val offset = Seq((1000L, Seq.fill(8)(1.0f), 0), (1001L, Seq.fill(8)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.annIvf(offset, nCentroids = 16, nProbes = 10).count() == 0)
  }

  test("PQ clamps the codebook to the corpus and survives offset ids") {
    val tiny = Seq((1000L, Seq.tabulate(8)(i => i.toFloat), 0),
                   (1001L, Seq.tabulate(8)(i => (8 - i).toFloat), 0),
                   (1002L, Seq.tabulate(8)(i => (i * 2).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val books = PQ.train(tiny, m = 2, k = 16, iterations = 1)
    assert(books.forall(_.length == 3), "codebook must clamp to corpus size")
    assert(PQ.encode(tiny, books).count() == 3)
    intercept[IllegalArgumentException] {
      PQ.train(Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label"))
    }
    // no vec_id below nProbes: empty probe set must degrade to an empty
    // result, not an AnalysisException from a zero-element table literal
    assert(PQ.annPq(tiny, m = 2).count() == 0)
    assert(PQ.annIvfPq(tiny, m = 2, nCentroids = 2000).count() == 0)
  }

  test("unicode text: counts are codepoint-based and fingerprints stable") {
    val docs = Seq((1L, "héllo wörld 你好 世界"), (2L, "HÉLLO  WÖRLD 你好 世界"))
      .toDF("doc_id", "text")
    val stats = TextOps.textStats(docs.withColumn("lang", lit("x")).withColumn("source", lit("s")))
      .orderBy("doc_id").collect()
    assert(stats(0).getAs[Long]("n_tokens") == 4L)
    // lower+whitespace normalisation folds the two variants together
    val groups = TextOps.fingerprintGroups(
      docs.withColumn("lang", lit("x")).withColumn("source", lit("s")))
    assert(groups.count() == 1)
  }

  test("contract with empty schema aligns as identity and validates ok") {
    val c = Contract(id = "t.empty", version = "1.0.0")
    val df = Seq((1, "a")).toDF("x", "y")
    assert(graft.align.ApplyContract.align(df, c).columns.toSeq == Seq("x", "y"))
    assert(Evaluator.validate(df, c).ok)
  }

  test("resize stub preserves aspect ratio with integer determinism") {
    val meta = Seq((1L, "c1", 1920L, 1080L), (2L, "c2", 100L, 400L), (3L, "c3", 1L, 1L))
      .toDF("doc_id", "checksum", "width", "height")
    val out = Multimodal.resizeStub(meta, 640, 360).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("resized_w") == 640L && out(0).getAs[Long]("resized_h") == 360L)
    assert(out(1).getAs[Long]("resized_w") == 90L && out(1).getAs[Long]("resized_h") == 360L)
    assert(out(2).getAs[Long]("resized_w") >= 1L && out(2).getAs[Long]("resized_h") >= 1L)
    assert(out.forall(_.getAs[String]("resized_ref").length == 32))
  }

  test("text ops compose with structured streaming unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = TextOps.textQuality(docs).writeStream
      .format("memory").queryName("tq_stream").outputMode("append").start()
    try {
      mem.addData((1L, "the quick brown fox and the lazy dog"), (2L, ""))
      q.processAllAvailable()
      val out = spark.table("tq_stream").orderBy("doc_id").collect()
      assert(out.length == 2)
      assert(out(0).getAs[Long]("n_tokens") == 8L)
      assert(out(1).getAs[Double]("score") >= 0.0)
    } finally q.stop()
  }

  test("edge totality of the round-6 final-sweep surfaces") {
    import spark.implicits._
    import graft.ops._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((1L, "the cat sat"), (2L, "")).toDF("doc_id", "text")

    // LmIndex on an empty corpus: buildable, everything scores unk
    val dir = tmpDir("edge_lm_empty")
    LmIndex.build(emptyDocs, dir, minCount = 5)
    assert(LmIndex.meta(spark, dir) == ((5L, 0L)))
    val s = LmIndex.score(spark, dir, someDocs)
      .as[(Long, Long, Double)].collect().toSet
    assert(s == Set((1L, 2L, -10.0), (2L, 0L, 0.0)))
    // no scorable calibration docs -> explicit refusal, not a null cut
    intercept[Exception] { LmIndex.recordCuts(spark, dir, emptyDocs) }

    // MinhashIndex built on an empty corpus still probes (empty result)
    val mdir = tmpDir("edge_mh_empty")
    MinhashIndex.build(emptyDocs, mdir)
    assert(MinhashIndex.probe(spark, mdir, someDocs).count() == 0)

    // substring family: empty corpus -> no spans, strip passes through
    assert(ExactSubstr.duplicatedSpans(emptyDocs, l = 5).count() == 0)
    assert(ExactSubstr.frequentWindows(emptyDocs, l = 5).count() == 0)
    val stripped = ExactSubstr.stripSubstrFlag(someDocs,
      ExactSubstr.frequentWindows(emptyDocs, l = 5), l = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stripped(1L) == (("the cat sat", 3L, 0L)))

    // dsirScore with empty models: every bigram pays unk on both sides
    val d = TextOps.dsirScore(someDocs,
      TextOps.bigramLm(emptyDocs), TextOps.bigramLm(emptyDocs))
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(d == Set((1L, 2L, -10.0, -10.0, 0.0), (2L, 0L, 0.0, 0.0, 0.0)))

    // epochOrder degenerate shard counts
    val eo = Curate.epochOrder(someDocs, epoch = 1, nShards = 1)
      .as[(Long, Int, Long)].collect()
    assert(eo.map(_._2).forall(_ == 0) && eo.map(_._3).sorted.toSeq == Seq(1L, 2L))

    // snapshotDiff with one empty side: all added / all removed
    assert(Curate.snapshotDiff(emptyDocs, someDocs)
      .as[(Long, String)].collect().forall(_._2 == "added"))
    assert(Curate.snapshotDiff(someDocs, emptyDocs)
      .as[(Long, String)].collect().forall(_._2 == "removed"))

    // psiByGroup on a single group: PSI exactly 0 (p == q everywhere)
    val one = Seq(("a", 1L), ("a", 2L), ("a", 30L)).toDF("src", "v")
    assert(Stats.psiByGroup(one, "v", "src", binWidth = 10)
      .as[(String, Double)].collect().toSeq == Seq(("a", 0.0)))
  }

  test("edge totality of the round-8 surfaces") {
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.labelPropagation(emptyEdges, 3).count() == 0)
    assert(Graph.connectedComponents(emptyEdges).count() == 0)
    assert(Graph.pageRank(emptyEdges, 2).count() == 0)
    // iters = 0: labels are the identity
    assert(Graph.labelPropagation(Seq((5L, 9L)).toDF("src", "dst"), 0)
      .as[(Long, Long)].collect().toMap == Map(5L -> 5L, 9L -> 9L))

    // corr: empty input, single group of one point (zero variance)
    val emptyXY = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Stats.corrByGroup(emptyXY, "g", "x", "y").count() == 0)
    val onePt = Seq(("g", 1.5, 2.5)).toDF("g", "x", "y")
    val r = Stats.corrByGroup(onePt, "g", "x", "y").collect().head
    assert(r.getLong(1) == 1L && r.isNullAt(2))

    // resample: empty, and a single event yields exactly one zero-gap bucket
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.analytics.Analytics.resample(emptyEv).count() == 0)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00")
    val oneEv = Seq((1L, ts0, 7L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rs = graft.analytics.Analytics.resample(oneEv)
      .as[(Long, Long, Long, Double)].collect()
    assert(rs.length == 1 && rs.head._3 == 1L && rs.head._4 == 2.0)

    // funnel: order matters — a click BEFORE the first view never counts
    def ev(id: Long, user: Long, typ: String, sec: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), user, typ, 1.0)
    val evs = Seq(
      ev(1, 1, "click", 1), ev(2, 1, "view", 2), ev(3, 1, "click", 3),
      ev(4, 1, "purchase", 4),
      ev(5, 2, "purchase", 1), ev(6, 2, "view", 2), // purchase precedes view
      ev(7, 3, "error", 1)) // no funnel stages at all
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val f = graft.analytics.Analytics.funnel(evs)
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(f == Map(1L -> 3L, 2L -> 1L, 3L -> 0L), s"funnel stages wrong: $f")

    // funnel: simultaneous timestamps resolve by event_id, and the
    // next stage must be STRICTLY after (same-instant click ignored)
    val tied = Seq(ev(10, 9, "view", 5), ev(11, 9, "click", 5),
      ev(12, 9, "click", 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tf = graft.analytics.Analytics.funnel(tied).collect().head
    assert(tf.getLong(4) == 2L)
    assert(tf.getLong(2) > tf.getLong(1), "click must be strictly after view")

    // sketches: empty inputs produce empty frames, not errors
    val emptyToks = Seq.empty[(String, String)].toDF("source", "tok")
    assert(Sketch.kmvSketch(emptyToks, "source", "tok", k = 4).count() == 0)
    assert(Sketch.countMin(emptyToks, "tok", d = 2, w = 8).count() == 0)
  }

  test("edge totality of the round-8 continuation surfaces") {
    import graft.ops._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")

    // empty frames flow through every new operator without errors
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.analytics.Analytics.movingAvg(emptyEv).count() == 0)
    assert(graft.analytics.Analytics.transitions(emptyEv).count() == 0)
    assert(graft.analytics.Analytics.ewma(emptyEv).count() == 0)
    assert(graft.analytics.Analytics.scd2(emptyEv.toDF(
      "k", "at", "u", "status", "v").select($"k", $"status", $"at", $"u".as("tie")),
      "k", "status", "at", "tie").count() == 0)
    assert(Stats.histogramByGroup(emptyEv, "event_type", "value", 10.0).count() == 0)
    assert(Stats.madOutliers(emptyEv, "event_type", "value", Seq("event_id")).count() == 0)
    assert(Stats.winsorize(emptyEv, "event_type", "value", Seq("event_id")).count() == 0)
    assert(Stats.rankNormalize(emptyEv, "event_type", "value", Seq("event_id")).count() == 0)
    assert(Stats.momentsByGroup(emptyEv, "event_type", "value").count() == 0)
    assert(Stats.fdViolations(emptyEv, Seq("user_id"), "event_type").count() == 0)
    assert(Graph.triangleCounts(Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)

    // single-row frames: every operator total, sane values
    val oneEv = Seq((1L, ts0, 7L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.analytics.Analytics.movingAvg(oneEv)
      .collect().head.getDouble(4) == 2.0)
    assert(graft.analytics.Analytics.transitions(oneEv).count() == 0,
      "one event has no transition")
    assert(graft.analytics.Analytics.ewma(oneEv)
      .collect().head.getLong(2) == 2000000L)
    val m1 = Stats.momentsByGroup(oneEv, "event_type", "value").collect().head
    assert(m1.getLong(1) == 1L && m1.isNullAt(3) && m1.isNullAt(4))
    val rk = Stats.rankNormalize(oneEv, "event_type", "value", Seq("event_id"))
      .collect().head
    assert(rk.getDouble(3) == 0.0, "singleton percent_rank is 0")
    val wz = Stats.winsorize(oneEv, "event_type", "value", Seq("event_id"))
      .collect().head
    assert(wz.getDouble(3) == 2.0 && !wz.getBoolean(4))

    // welchT with an entirely missing side: degenerate nulls, zero count
    val oneSided = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val w1 = Stats.welchT(oneSided, "g", "v", "a", "b").collect().head
    assert(w1.getLong(3) == 0L && w1.isNullAt(6) && w1.isNullAt(7))

    // pivot with zero matching rows anywhere still emits the priorities
    val od = Seq((1L, 1L, "F", 1.0, ts0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val pv = graft.analytics.Analytics.pivotSummary(od).collect().head
    assert(pv.getLong(1) == 1L && pv.getLong(3) == 0L && pv.getDouble(4) == 0.0)

    // JSON: null/malformed-only feed stays total
    val dirty = Seq((1L, "x", null.asInstanceOf[String]), (2L, "x", "]["))
      .toDF("event_id", "event_type", "props")
    assert(JsonOps.extractProps(dirty).count() == 2)
    assert(JsonOps.propsStats(dirty).count() == 0)

    // ref integrity: empty parent means every checked ref is an orphan
    val child = Seq((1L, Some(5L)), (2L, None)).toDF("id", "fk")
    val emptyParent = Seq.empty[Tuple1[Long]].toDF("pk")
    assert(graft.quality.RefIntegrity.orphans(child, emptyParent, "fk", "pk")
      .count() == 1)
    val sum1 = graft.quality.RefIntegrity.orphanSummary(
      child, emptyParent, "fk", "pk").collect().head
    assert(sum1.getLong(0) == 2L && sum1.getLong(1) == 1L &&
      sum1.getLong(3) == 1L && sum1.getDouble(4) == 1.0)

    // ref integrity: identical FK/PK column names must not self-compare
    val childSame = Seq(5L, 9L).toDF("id")
    val parentSame = Seq(5L).toDF("id")
    assert(graft.quality.RefIntegrity.orphans(childSame, parentSame, "id", "id")
      .select("id").as[Long].collect().toSet == Set(9L),
      "same-name FK/PK join must find the dangling reference")

    // compaction plan over a directory with one file: nothing to merge
    val oneDir = java.nio.file.Files.createTempDirectory("edge_compact").toString
    Seq((1L, "x")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(oneDir)
    assert(Layout.compactionPlan(spark, oneDir, targetBytes = 1L << 30).isEmpty)
  }

  test("edge totality of the round-8 closing surfaces") {
    import graft.ops._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val A = graft.analytics.Analytics

    // twap: a single-event user is ABSENT, never a fake zero-span number
    val one = Seq((1L, ts0, 7L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(A.twap(one).count() == 0)
    // two equal-value events: twap exactly the value
    val two = Seq((1L, ts0, 7L, "view", 5.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "view", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tw = A.twap(two).collect().head
    assert(tw.getLong(1) == 1L && tw.getDouble(2) == 5.0,
      "only the first value was live over the span")

    // pop: first bucket per type has null delta/pct_change
    val pop = A.periodOverPeriod(two, bucketHours = 1).orderBy("bucket").collect()
    assert(pop.length == 2 && pop.head.isNullAt(3) && pop.head.isNullAt(4))
    assert(pop(1).getLong(3) == 0L && pop(1).getDouble(4) == 0.0)

    // zscore: zero-variance group yields null z, not NaN
    val flat = Seq((1L, ts0, 7L, "view", 3.0), (2L, ts0, 8L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(A.zscoreNormalize(flat).collect().forall(_.isNullAt(3)))

    // impute: all-null group stays null and flags false
    val allNull = Seq((1L, "g", None: Option[Double]), (2L, "g", None))
      .toDF("id", "grp", "v")
    val imp = Stats.imputeMedian(allNull, "grp", "v", Seq("id")).collect()
    assert(imp.forall(r => r.isNullAt(3) && !r.getBoolean(4)))

    // retention: offset 0 reads exactly 1.0
    val ev = Seq((1L, ts0, 7L, "signup", 0.0), (2L, ts0, 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ret = A.retentionRates(ev).collect()
    assert(ret.length == 1 && ret.head.getDouble(3) == 1.0)

    // autocorr: a single pair has zero variance on both sides -> null
    val pair = Seq((1L, ts0, 7L, "view", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 7L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ac = A.autocorr(pair).collect().head
    assert(ac.getLong(1) == 1L && ac.isNullAt(2))

    // mode: empty and null-valued inputs are total
    assert(Stats.modeByGroup(allNull, "grp", "v").count() == 0)

    // chiSquare: single category on one side -> df 0, chi2 0
    val oneSided = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    val chi = Stats.chiSquare(oneSided, "x", "y").collect().head
    assert(chi.getDouble(0) == 0.0 && chi.getLong(1) == 0L)

    // duplicationStats: all-unique corpus reports zero shares
    val uniq = Seq((1L, "aa", 2L), (2L, "bb", 2L)).toDF("doc_id", "text", "n_chars")
    val ds = TextOps.duplicationStats(uniq).collect().head
    assert(ds.getLong(2) == 0L && ds.getDouble(3) == 0.0 &&
      ds.getLong(5) == 0L && ds.getDouble(6) == 0.0)
  }
}
