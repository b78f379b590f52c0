package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unigram (SentencePiece) trainer's exactness contracts: coverage
  * (every word segmentable — the single-char floor), the deterministic
  * prune, segment-vs-model consistency, the unseen-word fallback, and
  * the streaming admission of the frozen-model segmenter. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "banana bandana and an ana"),
    (2L, "banana and banana"),
    (3L, "an ana and a banana"),
    (4L, "   "),
    (5L, "bandana")).toDF("doc_id", "text")

  test("train: single-char coverage, target size, deterministic output") {
    val m = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val pieces = m.pieces.map(_._1)
    // the alphabet (a b d n + space-split never yields others) is fully
    // present — coverage — and the prune respected the target size
    assert(Set("a", "b", "d", "n").subsetOf(pieces.toSet))
    assert(pieces.length <= 8)
    assert(pieces.length > 4, "fixture must keep at least one multi piece")
    // every trained word type segments (the coverage guarantee)
    val words = Set("banana", "bandana", "and", "an", "ana", "a")
    assert(m.wordSegs.keySet == words)
    // the repeated 'ana'/'an' structure must surface a multi-char piece
    assert(pieces.exists(_.length > 1), "EM must learn a multi-char piece")
    // determinism: retraining reproduces the model bit for bit
    val m2 = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    assert(m2.pieces == m.pieces && m2.wordSegs == m.wordSegs)
  }

  test("segmentCounts: sums the word cache; whitespace-only docs keep (0,0)") {
    val m = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val got = Unigram.segmentCounts(docs, m)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // manual per-word recomposition from the model's own cache
    def of(ws: String*) = (ws.map(w => m.wordSegs(w)._1.toLong).sum,
      ws.map(w => m.wordSegs(w)._2).sum)
    assert(got(1L) == of("banana", "bandana", "and", "an", "ana"))
    assert(got(2L) == of("banana", "and", "banana"))
    assert(got(5L) == of("bandana"))
    assert(got(4L) == ((0L, 0L)), "whitespace-only doc keeps a (0,0) row")
  }

  test("unseen words fall back to single-char pieces with the char weights") {
    val m = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val unseen = Seq((10L, "nab zq")).toDF("doc_id", "text")
    val got = Unigram.segmentCounts(unseen, m, unkMicro = -777L)
      .as[(Long, Long, Long)].collect().head
    // "nab": 3 known chars; "zq": 2 unknown chars at the unk floor
    val charScore = Seq("n", "a", "b").map(m.charWts).sum
    assert(got == ((10L, 5L, charScore + 2 * -777L)))
  }

  test("segmenter admits a STREAM (broadcast word cache, one aggregation)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val m = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val rows = Seq((20L, "banana and ana"), (21L, "bandana nab"))
    val batch = Unigram.segmentCounts(rows.toDF("doc_id", "text"), m)
      .as[(Long, Long, Long)].collect().toSet
    val mem = MemoryStream[(Long, String)](spark)
    val q = Unigram.segmentCounts(mem.toDF().toDF("doc_id", "text"), m)
      .writeStream.format("memory").queryName("unigram_stream")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("unigram_stream")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("prune protects chars when vocabSize is below the alphabet size") {
    val m = Unigram.train(docs, vocabSize = 2, maxPieceLen = 3, emIters = 1)
    assert(m.pieces.map(_._1).forall(_.length == 1),
      "a too-small target keeps exactly the single-char floor")
    assert(m.pieces.map(_._1).toSet == Set("a", "b", "d", "n"))
  }
}
