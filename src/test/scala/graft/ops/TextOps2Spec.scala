package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeIshSpec extends SparkSpec {
  import spark.implicits._

  test("BPE-ish token count: 4-char chunks + symbols, more tokens than words") {
    val df = Seq((1L, "internationalization rocks!"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.tokenCountBpeIsh(col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    // "internationalization"(20) -> 5 chunks, "rocks" -> 2, "!" -> 1
    assert(out(0) == 8L)
    assert(out(1) == 0L)
    assert(out(2) == 2L)
  }
}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (3L, "PREFIX alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (4L, "one two three four five six seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  test("identical docs share all winnowed fingerprints; shifted docs share most") {
    val fp = NearDup.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fp(1L) == fp(2L))
    // a one-token prefix shifts windows but winnowing still shares minima
    assert(fp(1L).intersect(fp(3L)).size >= fp(1L).size / 2)
    assert(fp(1L).intersect(fp(4L)).isEmpty)
  }

  test("winnowPairs blocks on fingerprints and finds the overlapping pairs") {
    val pairs = NearDup.winnowPairs(docs, minCommon = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }
}

class KMeansIvfSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans centroids converge to the two obvious clusters") {
    val e = VectorOps.prepared(Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0), (2L, Array(0.95f, 0.05f), 0),
      (10L, Array(0.0f, 1.0f), 1), (3L, Array(0.1f, 0.9f), 1), (4L, Array(0.05f, 0.95f), 1)
    ).toDF("vec_id", "embedding", "label"))
    val cents = VectorOps.kmeansCentroids(e, k = 2, iterations = 3).collect()
    assert(cents.length == 2)
    val vecs = cents.map(_.getSeq[Double](1))
    // one centroid dominated by dim0, the other by dim1
    assert(vecs.exists(v => v.head > v(1) * 5))
    assert(vecs.exists(v => v(1) > v.head * 5))
  }

  test("annIvf with kmeans refinement keeps or improves brute-force recall") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = VectorOps.annBrute(e, nProbes = 5, topK = 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = VectorOps.annIvf(e, nCentroids = 8, nProbes = 5,
      nProbeClusters = 4, topK = 3, kmeansIters = 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.intersect(brute).size >= brute.size / 2)
  }

  test("broadcast-join argmax assignment is output-identical to the centroid literal") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(literalMax: Int, iters: Int) =
      VectorOps.annIvf(e, nCentroids = 16, nProbes = 8, nProbeClusters = 3,
        topK = 4, kmeansIters = iters, literalMax = literalMax)
        .select("probe_id", "neighbor_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    // literalMax = 0 forces the large-k cutover path on the same centroids
    assert(run(literalMax = 128, iters = 0) == run(literalMax = 0, iters = 0))
    assert(run(literalMax = 128, iters = 2) == run(literalMax = 0, iters = 2))
  }
}

class StreamReadSpec extends SparkSpec {

  test("contract-first streaming read: contract supplies the file-stream schema") {
    import graft.DemoContracts
    val src = tmpDir("graft_sread_src")
    graft.T.load(spark, "/root/testdata/sf0.001", "lineitem").write
      .mode("overwrite").parquet(src)
    val stream = graft.stream.ContractStream.read(spark, src, DemoContracts.lineitemAlign)
    assert(stream.isStreaming)
    assert(stream.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name))
    val q = stream.writeStream.format("memory").queryName("sread_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sread_out")
      assert(out.count() == 6000)
      assert(out.schema("l_quantity").dataType == org.apache.spark.sql.types.LongType)
    } finally q.stop()
  }
}

class ClustersVocabSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateClusters: min-label propagation over chained pairs") {
    // chain 1-2, 2-3 plus isolated pair 10-11: clusters {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = NearDup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicateClusters converges on a 60-long chain within O(log d) rounds") {
    // diameter 60 would exceed a 20-round plain propagation; pointer
    // jumping needs ~log2(60) rounds — maxIter = 10 must suffice
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = NearDup.duplicateClusters(pairs, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 61 && out.values.forall(_ == 0L),
      s"chain did not fully converge: ${out.filterNot(_._2 == 0L).take(5)}")
  }

  test("duplicateClusters uses reliable checkpoints when a checkpoint dir is set") {
    val dir = tmpDir("graft_ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
      val out = NearDup.duplicateClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the checkpoint dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("canonicalDocs marks one canonical per cluster, singletons canonical") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (7L, "x")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = NearDup.canonicalDocs(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, false) && out(3L) == (1L, false))
    assert(out(7L) == (7L, true))
  }

  test("canonicalDocsBest keeps the highest-score member, ties to lower id, singletons canonical") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L),  // cluster {1,2,3}: 2 wins (30, tie to lower id)
      (7L, "x", 1L)                                    // singleton
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = NearDup.canonicalDocsBest(docs, pairs, "score").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(out(1L) == (2L, false) && out(2L) == (2L, true) && out(3L) == (2L, false))
    assert(out(7L) == (7L, true))
    // constant score degenerates to min-id (canonicalDocs' policy)
    val flat = NearDup.canonicalDocsBest(docs.withColumn("score", lit(1L)), pairs, "score")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(flat(1L) == 1L && flat(2L) == 1L && flat(3L) == 1L)
  }

  test("end-to-end: minhash pairs -> clusters collapse the planted near-dups") {
    val docs = graft.T.load(spark, "/root/testdata/sf0.001", "documents")
    val pairs = NearDup.minhashPairs(docs)
    val canon = NearDup.canonicalDocs(docs, pairs)
    val kept = canon.filter(org.apache.spark.sql.functions.col("is_canonical")).count()
    val dropped = canon.count() - kept
    assert(dropped > 0, "planted near-dups should collapse")
    assert(kept + dropped == docs.count())
  }

  test("vocabulary: frequencies and coverage sum to one") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val v = TextOps.vocabulary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(v("a") == (2L, 1L, 0.4))
    assert(v("b") == (2L, 2L, 0.4))
    assert(v("c") == (1L, 1L, 0.2))
    assert(math.abs(v.values.map(_._3).sum - 1.0) < 1e-12)
  }

  test("vocabCoverage: closed-form ranks/shares, and NO window in the plan " +
    "(the r14 verdict's single-partition WindowExec hazard)") {
    val docs = Seq((1L, "a a a b b c"), (2L, "b d")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=1, d=1 over 8 tokens; ties break token-asc
    val out = TextOps.vocabCoverage(docs, topK = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ("a", 3L, 0.375))
    assert(out(2L) == ("b", 3L, 0.75))
    assert(out(3L) == ("c", 1L, 0.875))
    assert(out.size == 3, "topK bounds the curve")
    // a 100 TB vocabulary must never funnel through one window task: the
    // plan is TakeOrderedAndProject (bounded heap) + broadcast joins —
    // no WindowExec node anywhere
    val plan = TextOps.vocabCoverage(docs, topK = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"vocabCoverage plan must not contain a window operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must rank through a bounded heap:\n$plan")
  }

  test("tfidf ranks per-doc terms by tf x ln(N/df), ties on token asc") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry banana cherry")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidf(docs, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getString(1), r.getDouble(3))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // df: apple 1, banana 3, cherry 2 over N = 3 docs
    assert(out((1L, 1L)) == ("apple", r6(2 * math.log(3.0))))
    assert(out((1L, 2L)) == ("banana", 0.0))
    assert(out((2L, 1L)) == ("cherry", r6(math.log(1.5))))
    assert(out((2L, 2L)) == ("banana", 0.0))
    assert(out((3L, 1L)) == ("cherry", r6(2 * math.log(1.5))))
    // ubiquitous terms score exactly zero, still ranked after rarer ones
    assert(out((3L, 2L)) == ("banana", 0.0))
  }
}

class ScoreLinearSpec extends SparkSpec {
  import spark.implicits._

  test("hashed linear scoring: exact micro accumulation, bias-only on empty/null text") {
    val w = Seq.tabulate(8)(i => (i - 4) / 10.0) // -0.4 .. 0.3
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""))
      .toDF("doc_id", "text")
      .unionByName(Seq(Tuple1(3L)).toDF("doc_id").withColumn("text", lit(null: String)))
    val out = TextOps.scoreLinear(docs, w, bias = 0.05).orderBy("doc_id").collect()
    // replicate by hand: same hash, same buckets, exact longs
    val expected = Seq("alpha", "beta", "gamma").map { tok =>
      val h = docs.sparkSession.range(1)
        .select(pmod(xxhash64(lit(tok)), lit(8L)).cast("int")).as[Int].head()
      math.round(w(h) * 1e6)
    }.sum + 50000L
    assert(out(0).getAs[Long]("score_micro") == expected)
    assert(out(0).getAs[Long]("n_feats") == 3L)
    assert(out(0).getAs[Double]("score") == expected.toDouble / 1e6)
    assert(out(1).getAs[Long]("score_micro") == 50000L)
    assert(out(1).getAs[Long]("n_feats") == 0L)
    assert(out(2).getAs[Long]("score_micro") == 50000L)
    assert(out.forall(r => r.getAs[Boolean]("keep") == (r.getAs[Long]("score_micro") > 0)))
  }

  test("wordNgrams=2 adds exactly the n-1 bigram features") {
    val w = Seq.fill(16)(0.001)
    val docs = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextOps.scoreLinear(docs, w, wordNgrams = 2).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_feats") == 7L) // 4 unigrams + 3 bigrams
    assert(out(0).getAs[Long]("score_micro") == 7000L)
    assert(out(1).getAs[Long]("n_feats") == 1L) // no bigrams from one token
  }

  test("scoreLinear and gopherRules are stateless projections: run on a stream, match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val w = Seq.tabulate(8)(i => (i - 4) / 10.0)
    val data = Seq(
      (1L, "the quick brown fox and that lazy dog have fun with friends " * 5),
      (2L, "short"))
    val batchDf = data.toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val qs = TextOps.scoreLinear(src, w, bias = 0.05, wordNgrams = 2)
      .writeStream.format("memory").queryName("score_stream")
      .outputMode("append").start()
    val qg = TextOps.gopherRules(src, TextOps.GopherThresholds(minWords = 10))
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      qs.processAllAvailable(); qg.processAllAvailable()
      val streamedScore = spark.table("score_stream").orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
      val batchScore = TextOps.scoreLinear(batchDf, w, bias = 0.05, wordNgrams = 2)
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
      assert(streamedScore == batchScore)
      val streamedKeep = spark.table("gopher_stream").orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("gopher_keep"))).toSeq
      val batchKeep = TextOps.gopherRules(batchDf, TextOps.GopherThresholds(minWords = 10))
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("gopher_keep"))).toSeq
      assert(streamedKeep == batchKeep)
      assert(batchKeep.head._2, "long prose doc keeps")
    } finally { qs.stop(); qg.stop() }
  }
}

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("corpus-typical docs outscore garble; pruned bigrams take the unk penalty") {
    // "the cat sat" appears in 6 docs → its bigrams clear minCount=5 with
    // p_cond 1.0; doc 20's bigrams are unique → all pruned → pure unk
    val docs = ((1L to 6L).map(i => (i, "the cat sat")) :+
      (20L, "zq xv unique garble words") :+ (21L, "solo")).toDF("doc_id", "text")
    val out = TextOps.lmScore(docs, minCount = 5).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    // P(cat|the) = P(sat|cat) = 1.0 → ln 1 = 0
    (1L to 6L).foreach(i => assert(out(i) == (2L, 0.0), s"doc $i: ${out(i)}"))
    assert(out(20L) == (4L, -10.0))
    assert(out(21L) == (0L, 0.0), "sub-bigram docs score 0 with 0 bigrams")
    // mixed doc: known bigram + unknown → mean of 0 and -10
    val mixed = docs.unionByName(Seq((30L, "the cat zzz")).toDF("doc_id", "text"))
    val m = TextOps.lmScore(mixed, minCount = 5)
      .filter(col("doc_id") === 30L).collect()(0)
    assert(m.getAs[Long]("n_bigrams") == 2L)
    assert(m.getAs[Double]("avg_logp") == -5.0)
  }

  test("lmScoreWith scores a stream against offline reference stats (CCNet shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reference = (1L to 6L).map(i => (i, "the cat sat")).toDF("doc_id", "text")
    val stats = TextOps.bigramLm(reference, minCount = 5)
    val arrivals = Seq((100L, "the cat sat"), (101L, "zz unseen junk"), (102L, "x"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = TextOps.lmScoreWith(mem.toDF().toDF("doc_id", "text"), stats)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      val out = spark.table("lm_stream").orderBy("doc_id").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
      assert(out(100L) == (2L, 0.0))   // reads like the reference
      assert(out(101L) == (2L, -10.0)) // junk: all unk
      assert(!out.contains(102L))      // sub-bigram doc absent on streams (documented)
      // batch twin agrees on the docs that surface
      val batch = TextOps.lmScoreWith(arrivals.toDF("doc_id", "text"), stats)
        .filter(col("n_bigrams") > 0).orderBy("doc_id").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
      assert(out == batch)
    } finally q.stop()
  }
}

class VocabDriftSpec extends SparkSpec {
  import spark.implicits._

  test("KL drift: identical sources score ~0, a divergent source scores positive") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "a"), (2L, "alpha beta gamma delta", "b"),
      (3L, "alpha beta gamma delta", "a"), (4L, "alpha beta gamma delta", "b"),
      (5L, "zz zz zz zz", "weird"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.vocabDrift(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    // a and b have the exact corpus-share distribution over their support?
    // no — the corpus includes 'weird', so their p_c is diluted: both get
    // the SAME small positive drift; 'weird' diverges far more
    assert(out("a") == out("b"))
    assert(out("weird") > out("a"))
    assert(out("a") >= 0.0 && out("weird") > 0.5)
    // single-source corpus: P_source == P_corpus exactly → KL 0
    val uni = TextOps.vocabDrift(docs.filter(col("source") === "a")).collect()
    assert(uni.length == 1 && uni(0).getAs[Double]("kl_nats") == 0.0)
  }
}

class WindowChunksSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping windows tile the token stream; degenerate cases total") {
    val doc = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.windowChunks(docs, maxTokens = 10, overlap = 4)
      .orderBy("doc_id", "window_idx").collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    // stride 6: starts 0,6,12,18 → windows 4 ((25-10+5)/6 = 3 + 1)
    assert(d1.length == 4)
    assert(d1(0).getAs[String]("chunk_text").startsWith("w1 ") &&
      d1(0).getAs[Long]("n_tokens") == 10L)
    // consecutive windows share the 4 overlap tokens
    val w0 = d1(0).getAs[String]("chunk_text").split(" ")
    val w1 = d1(1).getAs[String]("chunk_text").split(" ")
    assert(w0.takeRight(4).toSeq == w1.take(4).toSeq)
    // last window is the tail, shorter
    assert(d1(3).getAs[Long]("n_tokens") == 7L)
    assert(d1(3).getAs[String]("chunk_text").endsWith("w25"))
    // every token appears in some window
    assert(d1.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet.size == 25)
    // short doc: one window; empty doc: one empty window (total)
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && d2(0).getAs[Long]("n_tokens") == 2L)
    val d3 = out.filter(_.getAs[Long]("doc_id") == 3L)
    assert(d3.length == 1 && d3(0).getAs[String]("chunk_text") == "")
    // window 0 equals truncateTokens (the degenerate keep-first case)
    val trunc = TextOps.truncateTokens(docs, 10).orderBy("doc_id")
      .select("text").as[String].collect()
    val firsts = TextOps.windowChunks(docs, maxTokens = 10, overlap = 4)
      .filter(col("window_idx") === 0).orderBy("doc_id")
      .select("chunk_text").as[String].collect()
    assert(firsts.toSeq == trunc.toSeq)
  }

  test("windowChunks and upsampleBySource are stateless: run on a stream, match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = Seq((1L, (1 to 25).map(i => s"w$i").mkString(" "), "rare"),
      (2L, "short doc", "common"))
    val mem = MemoryStream[(Long, String, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text", "source")
    val qc = TextOps.windowChunks(src, maxTokens = 10, overlap = 4)
      .writeStream.format("memory").queryName("wc_stream").outputMode("append").start()
    val qu = Curate.upsampleBySource(src, Map("rare" -> 3.0))
      .writeStream.format("memory").queryName("up_stream").outputMode("append").start()
    try {
      mem.addData(data: _*)
      qc.processAllAvailable(); qu.processAllAvailable()
      val batchDf = data.toDF("doc_id", "text", "source")
      assert(spark.table("wc_stream").orderBy("doc_id", "window_idx")
        .select("doc_id", "window_idx", "chunk_text").collect().toSeq ==
        TextOps.windowChunks(batchDf, maxTokens = 10, overlap = 4)
          .orderBy("doc_id", "window_idx")
          .select("doc_id", "window_idx", "chunk_text").collect().toSeq)
      assert(spark.table("up_stream").orderBy("doc_id", "copy")
        .select("doc_id", "copy").collect().toSeq ==
        Curate.upsampleBySource(batchDf, Map("rare" -> 3.0))
          .orderBy("doc_id", "copy").select("doc_id", "copy").collect().toSeq)
    } finally { qc.stop(); qu.stop() }
  }
}

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
                  t: TextOps.GopherThresholds = TextOps.GopherThresholds()) =
    TextOps.gopherRules(rows.toDF("doc_id", "text"), t)
      .orderBy("doc_id").collect()

  test("a clean prose doc passes every rule; the word floor gates short docs") {
    val prose = ("the quick brown fox jumps over that lazy dog " +
      "and runs to be part of the pack with great joy ") * 5
    val out = run(Seq((1L, prose), (2L, "too short to keep")))
    assert(out(0).getAs[Boolean]("gopher_keep"))
    assert(!out(1).getAs[Boolean]("gopher_keep"))
    assert(out(1).getAs[Boolean]("r_alpha") && !out(1).getAs[Boolean]("r_words"))
  }

  test("bullet and ellipsis line ratios count lines, not occurrences") {
    val bullety = "- one\n- two\n- three\nplain line"
    val dotty = "first part...\nsecond part...\nclean end"
    val out = run(Seq((1L, bullety), (2L, dotty)))
    assert(math.abs(out(0).getAs[Double]("bullet_ratio") - 0.75) < 1e-12)
    assert(out(0).getAs[Boolean]("r_bullet")) // 0.75 <= 0.9
    assert(math.abs(out(1).getAs[Double]("ellipsis_ratio") - 2.0 / 3) < 1e-12)
    assert(!out(1).getAs[Boolean]("r_ellipsis")) // 2/3 > 0.3
    // the ellipses also count as symbols: 2 of 6 words
    assert(math.abs(out(1).getAs[Double]("symbol_ratio") - 2.0 / 6) < 1e-12)
  }

  test("alpha ratio catches numeric junk; stop rule counts distinct stopwords") {
    val numeric = "12 34 5.6 789 0x1f 42"
    val stoppy = "the of the of the of padding words here now"
    val out = run(Seq((1L, numeric), (2L, stoppy)))
    assert(out(0).getAs[Double]("alpha_ratio") < 0.5)
    assert(!out(0).getAs[Boolean]("r_alpha"))
    assert(out(1).getAs[Long]("n_stop") == 2L) // the, of — distinct, not 6
  }

  test("total on null and empty text: rules evaluate, keep is false") {
    val df = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
      .unionByName(Seq(Tuple1(3L)).toDF("doc_id").withColumn("text", lit(null: String)))
    val out = TextOps.gopherRules(df).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out.forall(!_.getAs[Boolean]("gopher_keep")))
    assert(out(0).getAs[Long]("n_words") == 0L)
    assert(out(2).getAs[Long]("n_words") == 0L)
    assert(out(2).getAs[Double]("bullet_ratio") == 0.0)
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition ratio: repeats counted, edge docs at zero") {
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
      (2L, "x y z"),          // 2 distinct of 2
      (3L, "solo"),           // no bigrams
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.repetition(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_bigrams") == 5L)
    assert(out(0).getAs[Long]("n_distinct_bigrams") == 2L)
    assert(math.abs(out(0).getAs[Double]("repetition_ratio") - 0.6) < 1e-12)
    assert(out(1).getAs[Double]("repetition_ratio") == 0.0)
    assert(out(2).getAs[Double]("repetition_ratio") == 0.0)
    assert(out(3).getAs[Long]("n_bigrams") == 0L)
  }

  test("duplicationStats: doc and char shares against lowest-id canonicals") {
    import spark.implicits._
    // group A: 3 copies (ids 1,2,3; canonical 1, chars 10 each);
    // group B: unique (chars 4); whitespace variants fingerprint equal
    val docs = Seq(
      (1L, "duplicated", 10L), (2L, "duplicated", 10L),
      (3L, "  duplicated ", 13L), // normText-equal, different raw chars
      (9L, "solo", 4L))
      .toDF("doc_id", "text", "n_chars")
    val r = TextOps.duplicationStats(docs).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.5)
    // chars: group A total 33, canonical (id 1) 10 -> 23 redundant
    assert(r.getLong(4) == 37L && r.getLong(5) == 23L)
    assert(r.getDouble(6) == math.rint(23.0 / 37.0 * 1e6) / 1e6)
  }
}

class CleanControlSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("cleanControlChars strips every class member, keeps tab/LF/CR and visible text") {
    // one of each class member between letters: BEL, VT, DEL, NEL (C1),
    // soft hyphen, ZWSP, ZWNJ, ZWJ, word joiner, BOM — built from
    // codepoints so the source stays visibly ASCII
    val invisibles = Seq(0x07, 0x0B, 0x7F, 0x85, 0xAD,
        0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF)
      .map(cp => new String(Character.toChars(cp)))
    val dirty = ('a' to 'k').map(_.toString).zipAll(invisibles, "", "")
      .map { case (ch, inv) => ch + inv }.mkString
    val kept = "1\t2\n3\r4 ok" // tab/LF/CR are NOT in the class
    val out = Seq((1L, dirty), (2L, kept), (3L, "plain")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.cleanControlChars(col("text")).as("c"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "abcdefghijk", s"got ${out(0).map(_.toInt)}")
    assert(out(1) == kept, "tab/LF/CR must survive")
    assert(out(2) == "plain")
  }

  test("cleanControlChars + nfc compose as the ingest cleaning pair on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.nfc(TextOps.cleanControlChars(col("text"))).as("clean"))
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "cafe" + "́" + "​" + "!")) // decomposed + ZWSP
      q.processAllAvailable()
      val got = spark.table("clean_stream").collect().head.getString(1)
      assert(got == "café!", s"got ${got.map(_.toInt)}")
    } finally q.stop()
  }
}

class MojibakeSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // build mojibake programmatically: UTF-8 bytes misread as Latin-1
  private def garble(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  private def fix(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(TextOps.fixMojibake(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq

  test("repairs double-encoded text; healthy text is untouched; idempotent") {
    val healthy2 = "caf" + "é" + " bar"      // real Latin-1 accents
    val emoji = "hi " + new String(Character.toChars(0x1F600))
    val got = fix(garble("café"), garble("won’t – déjà"), garble(emoji),
      "plain ascii", healthy2)
    assert(got(0) == "café", s"got ${got(0)}")
    assert(got(1) == "won’t – déjà", s"got ${got(1)}")
    assert(got(2) == emoji, s"4-byte sequences repair too: ${got(2)}")
    assert(got(3) == "plain ascii")
    // healthy accented text must NOT be 'repaired' into garbage: é alone
    // is not a valid UTF-8 lead/continuation cluster, guard rejects it
    assert(got(4) == healthy2, s"healthy text mangled: ${got(4)}")
    // idempotence: repaired output no longer matches the signature
    assert(fix(got(0)) == Seq(got(0)))
  }

  test("mixed valid-looking but broken sequences pass through unrepaired") {
    // Ã pair followed by a standalone continuation char: the whole-string
    // validity guard fails, text passes through rather than U+FFFD-mangle
    val tricky = garble("é") + "¡"
    assert(fix(tricky) == Seq(tricky))
    // standalone lead byte at end of string
    val trailing = "abcÃ"
    assert(fix(trailing) == Seq(trailing))
  }
}

class MojibakeSpec2 extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def cps(xs: Int*): String = xs.map(Character.toChars(_).mkString).mkString

  // WHATWG-style windows-1252 (what browsers and real crawled mojibake
  // do): the 5 bytes the strict Java charset maps to U+FFFD pass
  // through as C1 controls instead -- the information-PRESERVING
  // misreading the repair can invert
  private val cpTable = Map(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
  private def garbleCp1252(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val u = b & 0xFF
      (if (u >= 0x80 && u <= 0x9F) cpTable.getOrElse(u, u) else u).toChar
    }.mkString
  private def garbleIso(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  private def fix(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(TextOps.fixMojibake(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq

  test("CP1252 mojibake (the dominant web variant) repairs too") {
    // won't with curly quote, en dash, curly double quotes, ellipsis, TM
    val curly = "won" + cps(0x2019) + "t " + cps(0x2013) + " " +
      cps(0x201C) + "quoted" + cps(0x201D) + " " + cps(0x2026)
    val got = fix(garbleCp1252(curly), garbleCp1252("caf" + cps(0xE9) + " " + cps(0x2122)))
    assert(got(0) == curly, s"got ${got(0).map(_.toInt)}")
    assert(got(1) == "caf" + cps(0xE9) + " " + cps(0x2122), s"got ${got(1)}")
    // a LEGIT CP1252-punctuation row must never be folded-and-returned
    val healthy = "it" + cps(0x2019) + "s fine " + cps(0x2014) + " really"
    assert(fix(healthy) == Seq(healthy))
  }

  test("exact UTF-8 validity guard: surrogate/overlong-looking rows never reach decode") {
    // ED A0 A1 rendered in Latin-1 (i-acute, NBSP, inverted-excl) is a
    // surrogate encoding -- the old blanket [80-BF] guard passed it and
    // Spark 4's strict decode would THROW, aborting the job
    val surrogateish = "s" + cps(0xED, 0xA0, 0xA1) + "hola"
    assert(fix(surrogateish) == Seq(surrogateish), "must pass through, not throw")
    // overlong 3-byte (E0 80 80), beyond-U+10FFFF (F4 90 80 80) likewise
    val overlong3 = "x" + cps(0xE0, 0x80, 0x80) + "y"
    val beyond = "x" + cps(0xF4, 0x90, 0x80, 0x80)
    assert(fix(overlong3, beyond) == Seq(overlong3, beyond))
  }

  test("order contract: fixMojibake before cleanControlChars, never after") {
    val want = "won" + cps(0x2019) + "t"
    val garbled = garbleIso(want) // contains C1 chars 0x80/0x99
    def run(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
      Seq((1L, garbled)).toDF("id", "text")
        .select(c(col("text")).as("c")).collect().head.getString(0)
    assert(run(t => TextOps.cleanControlChars(TextOps.fixMojibake(t))) == want)
    // the wrong order destroys the continuation bytes: pin the hazard
    assert(run(t => TextOps.fixMojibake(TextOps.cleanControlChars(t))) != want,
      "strip-first cannot be repaired")
  }
}
