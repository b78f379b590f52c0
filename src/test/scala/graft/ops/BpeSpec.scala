package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(texts.toDF("text"), n)
      .orderBy("step")
      .as[(Int, String, String, Long)].collect().toSeq

  test("learns the classic low/lower/newest/widest merges") {
    // Sennrich et al.'s worked example as a corpus: 5×low, 2×lower,
    // 6×newest, 3×widest. First merges: (e s, 9) from newest+widest,
    // then (es t, 9), then (est </w>, 9), then l o (7 = low+lower)
    val corpus =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val m = merges(Seq(corpus.mkString(" ")), 4)
    assert(m.map(r => (r._2, r._4)) ==
      Seq(("e s", 9L), ("es t", 9L), ("est </w>", 9L), ("l o", 7L)),
      s"merge table: $m")
    assert(m.map(_._3) == Seq("es", "est", "est</w>", "lo"))
  }

  test("ties break lexicographically ascending on the pair string") {
    // "ab" and "cd" each occur once: pairs (a b), (b </w>), (c d),
    // (d </w>) all count 1 — the winner must be the smallest string,
    // "a b"
    val m = merges(Seq("ab cd"), 1)
    assert(m.head._2 == "a b" && m.head._4 == 1L, s"tie-break wrong: $m")
  }

  test("overlapping runs merge left-to-right non-overlapping") {
    // word "aaaa": chars a a a a </w>; pair (a a) counts 3 occurrences
    // (overlap-counted by adjacency); after the merge the word is
    // aa aa </w> — replace consumed pairs greedily left-to-right
    val df = Seq("aaaa").toDF("text")
    val m = merges(Seq("aaaa"), 1)
    assert(m.head._2 == "a a" && m.head._4 == 3L)
    val seg = Bpe.segmentCounts(
      df.withColumn("doc_id", lit(1L)), Seq(("a a", "aa")))
      .as[(Long, Long)].collect().toMap
    // aa aa </w> = 3 units
    assert(seg(1L) == 3L, s"segmented units: $seg")
  }

  test("segmentCounts folds merges in order and sums per document") {
    val docs = Seq((1L, "low lower"), (2L, "newest"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val learned = Seq(("l o", "lo"), ("lo w", "low"))
    val seg = Bpe.segmentCounts(docs, learned)
      .as[(Long, Long)].collect().toMap
    // doc 1: "low" -> low </w> (2 units); "lower" -> low e r </w> (4)
    // doc 2: "newest" -> 6 chars + </w> = 7 units (no merge applies)
    assert(seg == Map(1L -> 6L, 2L -> 7L), s"counts: $seg")
  }

  test("segmentCounts runs on a stream with frozen merges, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val learned = Seq(("l o", "lo"), ("lo w", "low"))
    val data = Seq((1L, "low lower"), (2L, "newest"))
    val batch = Bpe.segmentCounts(data.toDF("doc_id", "text"), learned)
      .as[(Long, Long)].collect().toMap
    val mem = MemoryStream[(Long, String)](spark)
    val out = Bpe.segmentCounts(mem.toDF().toDF("doc_id", "text"), learned)
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("complete").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      val rows = spark.table("bpe_stream")
        .as[(Long, Long)].collect().toMap
      assert(rows == batch, s"stream $rows vs batch $batch")
    } finally q.stop()
  }

  test("word-type weighting: repeated words count once per occurrence") {
    // "to to to" vs "to": every pair of the single word type "to"
    // must be weighted by corpus frequency (4), not by word-type
    // count (1); (o </w>) and (t o) tie at 4 and 'o' < 't' wins
    val m = merges(Seq("to to to", "to"), 1)
    assert(m.head._2 == "o </w>" && m.head._4 == 4L, s"weighting wrong: $m")
  }
}
