package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted PQ artifact: search over the stored codes ≡ the
  * self-contained [[PQ.annPq]] on the same corpus/parameters, append
  * encodes through the FROZEN codebooks (never retrains), the pinned
  * dim/metadata refuses the silent-mismatch classes, and the
  * standing-query scorer is stream-admissible. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic dim-8 corpus: varied directions, no zero vectors
  private def embRows(ids: Range): Seq[(Long, String, Array[Double])] =
    ids.map { i =>
      (i.toLong, s"d$i",
        Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toDouble + 0.5))
    }
  private def corpus = embRows(0 until 30).toDF("vec_id", "label", "embedding")

  private def probesOf(emb: org.apache.spark.sql.DataFrame, n: Int) =
    VectorOps.prepared(emb).filter(col("vec_id") < n)
      .select(col("vec_id").as("probe_id"), col("v"), col("nrm"))

  test("search over the artifact ≡ PQ.annPq on the same corpus/parameters") {
    val dir = tmpDir("graft_pqix")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1)
    assert(PqIndex.meta(spark, dir) == (4, 4, 8))
    val viaIndex = PqIndex.search(spark, dir, probesOf(corpus, 5),
      topK = 3, rerank = 2, exactFrom = Some(corpus))
      .collect().map(_.toSeq).toSet
    val selfContained = PQ.annPq(corpus, nProbes = 5, topK = 3,
      m = 4, k = 4, iterations = 1, rerank = 2)
      .collect().map(_.toSeq).toSet
    assert(viaIndex == selfContained,
      "the persisted codes + frozen codebooks must reproduce annPq exactly")
    // codes-only deployment (no raw vectors): approximate ranking, same
    // shape, every neighbor a real corpus id
    val approx = PqIndex.search(spark, dir, probesOf(corpus, 5), topK = 3)
    assert(approx.columns.toSeq ==
      Seq("probe_id", "neighbor_id", "rank", "cosine"))
    val got = approx.collect()
    assert(got.length == 5 * 3)
    assert(got.forall(r => r.getLong(1) != r.getLong(0) && r.getLong(1) < 30))
  }

  test("append encodes through the FROZEN codebooks (data ≡ encodeWith of the union)") {
    val dir = tmpDir("graft_pqix_a")
    val a = corpus.filter(col("vec_id") < 20)
    val b = corpus.filter(col("vec_id") >= 20)
    PqIndex.build(a, dir, m = 4, k = 4, iterations = 1)
    PqIndex.append(spark, dir, b)
    val stored = spark.read.parquet(s"$dir/data")
      .collect().map(_.toSeq.map {
        case s: Seq[_] => s.toList; case x => x }).toSet
    val expected = PqIndex.encodeWith(spark, dir, corpus)
      .collect().map(_.toSeq.map {
        case s: Seq[_] => s.toList; case x => x }).toSet
    assert(stored == expected,
      "append must encode arrivals with the index's own codebooks")
    // searches over the appended index see the new ids as candidates
    val hits = PqIndex.search(spark, dir, probesOf(corpus, 3), topK = 25)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(hits.exists(_ >= 20), "appended vectors must be searchable")
  }

  test("metadata refusals: bare dir, probe dim, per-row arrival dim") {
    val dir = tmpDir("graft_pqix_r")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1)
    // a bare directory is not an artifact
    intercept[IllegalArgumentException](
      PqIndex.search(spark, tmpDir("graft_pqix_empty"),
        probesOf(corpus, 3)))
    // wrong-dimension probes would mis-slice into blocks silently
    val narrow = embRows(0 until 5)
      .map { case (i, l, v) => (i, l, v.take(6)) }
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException](
      PqIndex.search(spark, dir, probesOf(narrow, 3)))
    assert(e.getMessage.contains("dim mismatch"))
    // the arrival guard is PER ROW (raise_error in the projection): a
    // mixed-width frame whose FIRST row is fine must still refuse —
    // a first-row sample would let the 16-wide tail encode garbage
    val mixed = (embRows(0 until 2) ++ embRows(2 until 4)
      .map { case (i, l, v) => (i, l, v ++ v) })
      .toDF("vec_id", "label", "embedding")
    val e2 = intercept[Exception](
      PqIndex.encodeWith(spark, dir, mixed).collect())
    assert(e2.getMessage != null && e2.getMessage.contains("dim mismatch"),
      s"per-row guard must fire on the mixed tail: ${e2.getMessage}")
  }

  test("search with external-id probes: dropSelfIds=false keeps colliding corpus ids") {
    val dir = tmpDir("graft_pqix_x")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1)
    // probe reuses corpus id 7 but is an EXTERNAL query vector: with the
    // default, corpus vector 7 is silently suppressed from its results;
    // with dropSelfIds=false it competes like any neighbor
    val probes = probesOf(corpus, 8).filter(col("probe_id") === 7L)
    val dropped = PqIndex.search(spark, dir, probes, topK = 30)
      .select(col("neighbor_id")).as[Long].collect().toSet
    val kept = PqIndex.search(spark, dir, probes, topK = 30,
      dropSelfIds = false)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(!dropped.contains(7L))
    assert(kept.contains(7L),
      "external-id searches must be able to keep colliding corpus ids")
    assert(kept -- dropped == Set(7L))
  }

  test("scoreArrivals with an empty probe set idles on a stream (no limit(0) crash)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir("graft_pqix_e")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1)
    val noProbes = probesOf(corpus, 0)
    val mem = MemoryStream[(Long, String, Array[Double])](spark)
    val q = PqIndex.scoreArrivals(spark, dir,
      mem.toDF().toDF("vec_id", "label", "embedding"), noProbes,
      minApprox = -1.0)
      .writeStream.format("memory").queryName("pqix_empty_stream")
      .outputMode("append").start()
    try {
      mem.addData(embRows(50 until 55): _*)
      q.processAllAvailable()
      assert(spark.table("pqix_empty_stream").count() == 0,
        "an empty standing-query set idles, emitting nothing")
    } finally q.stop()
  }

  test("freshAgainst refuses a stale index (the provenance guard)") {
    val dir = tmpDir("graft_pqix_f")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1,
      provenance = Some(ArtifactProvenance.Target("emb", "1",
        snapshot = Some(ArtifactProvenance.embeddingSnapshot(corpus)))))
    PqIndex.search(spark, dir, probesOf(corpus, 3),
      freshAgainst = Some(ArtifactProvenance.embeddingSnapshot(corpus)))
      .collect()
    val edited = corpus.withColumn("embedding",
      when(col("vec_id") === 7L,
        transform(col("embedding"), x => x + lit(1.0)))
        .otherwise(col("embedding")))
    val e = intercept[IllegalArgumentException](
      PqIndex.search(spark, dir, probesOf(corpus, 3),
        freshAgainst = Some(ArtifactProvenance.embeddingSnapshot(edited)))
        .collect())
    assert(e.getMessage.contains("stale artifact"), e.getMessage)
  }

  test("scoreArrivals is stream-admissible: a MemoryStream scores identically to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir("graft_pqix_s")
    PqIndex.build(corpus, dir, m = 4, k = 4, iterations = 1)
    val probes = probesOf(corpus, 3)
    val arrivals = embRows(50 until 70)
    val batch = PqIndex.scoreArrivals(spark, dir,
      arrivals.toDF("vec_id", "label", "embedding"), probes,
      minApprox = -1.0).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture must produce scored pairs")
    val mem = MemoryStream[(Long, String, Array[Double])](spark)
    val q = PqIndex.scoreArrivals(spark, dir,
      mem.toDF().toDF("vec_id", "label", "embedding"), probes,
      minApprox = -1.0)
      .writeStream.format("memory").queryName("pqix_stream")
      .outputMode("append").start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      val streamed = spark.table("pqix_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, "streaming standing-query scoring ≡ batch")
    } finally q.stop()
  }
}
