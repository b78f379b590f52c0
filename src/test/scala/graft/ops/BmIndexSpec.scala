package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BmIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "hash join hash join hash scan"),
    (2L, "hash join " + Seq.fill(30)("filler").mkString(" ")),
    (3L, "scan filter merge sort window"),
    (4L, "hash"),
    (5L, "spark spark join")
  ).toDF("doc_id", "text")

  test("scoring the stats corpus reproduces bm25Rank's scores bit for bit") {
    val dir = java.nio.file.Files.createTempDirectory("bmidx").toString
    BmIndex.build(corpus, dir)
    val viaIndex = BmIndex.score(spark, dir, corpus, Seq("hash", "join", "spark"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val viaRank = TextOps.bm25Rank(corpus, Seq("hash", "join", "spark"), topK = 10)
      .as[(Long, Double)].collect().toMap
    viaRank.foreach { case (id, s) =>
      assert(viaIndex(id) == s, s"doc $id: index ${viaIndex(id)} vs rank $s")
    }
    // non-matching docs score exactly 0 through the index path
    assert(viaIndex(3L) == 0.0)
  }

  test("merge equals a fresh build on the concatenated corpus") {
    val a = corpus.filter($"doc_id" <= 3)
    val b = corpus.filter($"doc_id" > 3)
    val dirA = java.nio.file.Files.createTempDirectory("bmidx_a").toString
    val dirM = java.nio.file.Files.createTempDirectory("bmidx_m").toString
    val dirF = java.nio.file.Files.createTempDirectory("bmidx_f").toString
    BmIndex.build(a, dirA)
    BmIndex.merge(spark, dirA, b, dirM)
    BmIndex.build(corpus, dirF)
    assert(BmIndex.meta(spark, dirM) == BmIndex.meta(spark, dirF))
    val dfM = spark.read.parquet(s"$dirM/df").as[(String, Long)].collect().sorted
    val dfF = spark.read.parquet(s"$dirF/df").as[(String, Long)].collect().sorted
    assert(dfM.toSeq == dfF.toSeq)
    // and scoring through the merged artifact matches the fresh one
    val sM = BmIndex.score(spark, dirM, corpus, Seq("hash", "filler"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val sF = BmIndex.score(spark, dirF, corpus, Seq("hash", "filler"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(sM == sF)
  }

  test("score is a stateless projection: runs unchanged on a streaming frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("bmidx_s").toString
    BmIndex.build(corpus, dir)
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val q = BmIndex.score(spark, dir, src, Seq("hash", "join"))
      .select("doc_id", "score")
      .writeStream.format("memory").queryName("bm25_stream_out")
      .outputMode("append").start()
    try {
      mem.addData((100L, "hash join hash"), (101L, "nothing relevant"))
      q.processAllAvailable()
      val out = spark.table("bm25_stream_out")
        .as[(Long, Double)].collect().toMap
      // batch twin over the same rows against the same frozen stats
      val batch = BmIndex.score(spark, dir,
        Seq((100L, "hash join hash"), (101L, "nothing relevant"))
          .toDF("doc_id", "text"), Seq("hash", "join"))
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
      assert(out == batch, s"stream $out vs batch $batch")
      assert(out(100L) > 0.0 && out(101L) == 0.0)
    } finally q.stop()
  }

  test("absent query terms take df=0 (maximal idf) instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("bmidx_u").toString
    BmIndex.build(corpus, dir)
    val out = BmIndex.score(spark, dir,
      Seq((7L, "unseen unseen")).toDF("doc_id", "text"), Seq("unseen"))
      .select("score").as[Double].head()
    assert(out > 0.0)
  }
}
