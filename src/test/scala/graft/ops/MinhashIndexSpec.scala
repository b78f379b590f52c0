package graft.ops

import graft.SparkSpec

class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"), // near-dup of 1
    (3L, "completely different content about spark streaming state")
  ).toDF("doc_id", "text")

  private def arrivals = Seq(
    (4L, "the quick brown fox jumps over the lazy dog again and again"),  // dup of 1
    (5L, "unrelated words nothing shared here at all truly")
  ).toDF("doc_id", "text")

  private def crossPairs(mode: HashMode): Set[(Long, Long, Double)] =
    NearDup.minhashPairs(corpus.unionByName(arrivals), threshold = 0.7,
      mode = mode)
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => (p._1 <= 3) != (p._2 <= 3)) // one side old, one side new

  test("probe finds exactly the batch pipeline's new-vs-corpus verified pairs") {
    for (mode <- Seq[HashMode](HashMode.Default, HashMode.Portable)) {
      val dir = tmpDir(s"mh_idx_$mode")
      MinhashIndex.build(corpus, dir, k = 3, mode = mode)
      assert(MinhashIndex.meta(spark, dir) == ((3, mode)), "meta pins (k, mode)")
      val expected = crossPairs(mode)
      assert(expected.contains((1L, 4L, 1.0)), s"fixture needs a cross dup for $mode")
      val verified = MinhashIndex.probeVerified(spark, dir, arrivals,
        docStore = corpus.unionByName(arrivals))
        .as[(Long, Long, Double)].collect().toSet
      assert(verified == expected, s"$mode: idx=$verified batch=$expected")
      // candidates never pair new docs with each other (object-doc contract)
      val cand = MinhashIndex.probe(spark, dir, arrivals)
        .as[(Long, Long)].collect().toSet
      assert(cand.forall(p => (p._1 <= 3) != (p._2 <= 3)))
    }
  }

  test("merge equals a fresh build on the concatenated corpus") {
    val dirA = tmpDir("mh_merge_a"); val dirM = tmpDir("mh_merge_m")
    val dirF = tmpDir("mh_merge_f")
    MinhashIndex.build(corpus, dirA)
    MinhashIndex.merge(spark, dirA, arrivals, dirM)
    MinhashIndex.build(corpus.unionByName(arrivals), dirF)
    assert(MinhashIndex.meta(spark, dirM) == MinhashIndex.meta(spark, dirF))
    // identical banded rows -> identical probe behavior
    def rows(d: String) = spark.read.parquet(s"$d/data")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(rows(dirM) == rows(dirF))
    val later = Seq((6L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    assert(MinhashIndex.probe(spark, dirM, later).as[(Long, Long)].collect().toSet ==
      MinhashIndex.probe(spark, dirF, later).as[(Long, Long)].collect().toSet)
    // in-place merge refused: overwrite would delete the input signatures
    // before the lazy union plan reads them
    val e = intercept[IllegalArgumentException] {
      MinhashIndex.merge(spark, dirA, arrivals, dirA)
    }
    assert(e.getMessage.contains("in place"))
  }

  test("probe never re-signatures the corpus: index side is a bare scan") {
    val dir = tmpDir("mh_idx_plan")
    MinhashIndex.build(corpus, dir)
    val plan = MinhashIndex.probe(spark, dir, arrivals)
      .queryExecution.executedPlan.toString
    // exactly one signature pipeline (the arrivals'): every Generate in
    // the plan belongs to it — the corpus side contributes only a scan of
    // the persisted banded frame
    val generates = plan.split("\n").count(_.contains("Generate explode"))
    assert(generates > 0 && generates <= 3, // toks, shingles[, prep] of arrivals
      s"unexpected Generate count $generates:\n$plan")
    assert(plan.contains("FileScan parquet") && plan.contains("band_hash"),
      "index side must read the persisted banded signatures")
  }

  test("streaming probe dedups arrivals against the index with no state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir("mh_idx_stream")
    MinhashIndex.build(corpus, dir)
    val mem = MemoryStream[(Long, String)](spark)
    val out = MinhashIndex.probeVerified(spark, dir,
      mem.toDF().toDF("doc_id", "text"),
      docStore = corpus.unionByName(arrivals))
    val q = out.writeStream.format("memory").queryName("mh_idx_out")
      .outputMode("append").start()
    try {
      arrivals.as[(Long, String)].collect().foreach(mem.addData(_))
      q.processAllAvailable()
      val streamed = spark.table("mh_idx_out")
        .as[(Long, Long, Double)].collect().toSet // repeats collapse
      assert(streamed == crossPairs(HashMode.Default))
    } finally q.stop()
  }
}
