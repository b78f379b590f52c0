package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PMI collocations + BM25 retrieval. */
class IrSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations: bound pair scores high, frequent-with-frequent ~0") {
    // "new york" always co-occurs; "the cat"/"the dog" mix freely
    val docs = (1 to 20).map { i =>
      val filler = if (i % 2 == 0) "the cat sat" else "the dog ran"
      (i.toLong, s"new york $filler the cat the dog")
    }.toDF("doc_id", "text")
    val bySet = TextOps.pmiCollocations(docs, minCount = 5)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect()
      .map(r => Set(r._1, r._2) -> r._3).toMap
    // "new york": "new" is only ever followed by "york" — tightly bound
    val ny = bySet(Set("new", "york"))
    assert(ny > 2.0, s"bound pair must score high: $ny")
    // "the cat": "the" is followed by cat/dog both — lower association
    val tc = bySet(Set("the", "cat"))
    assert(tc < ny, s"free pair must score below bound pair: $tc vs $ny")
  }

  test("pmiCollocations: minCount prunes singleton bigrams") {
    val docs = Seq((1L, "alpha beta alpha beta alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, minCount = 3)
    val pairs = out.select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs == Set(("alpha", "beta")), s"got $pairs")
  }

  test("bm25Rank: term-matching docs rank ahead; shorter docs beat longer at equal tf") {
    val docs = Seq(
      (1L, "hash join hash join hash"),                  // high tf, short
      (2L, "hash join " + Seq.fill(50)("filler").mkString(" ")), // same terms, long
      (3L, "scan filter merge sort window"),             // no query terms
      (4L, "hash")                                       // one term only
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Rank(docs, Seq("hash", "join"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ranked = out.map(_._1).toSeq
    assert(!ranked.contains(3L), "doc without query terms must not appear")
    assert(ranked.head == 1L, s"high-tf short doc must rank first: $ranked")
    val score = out.toMap
    assert(score(1L) > score(2L), "length normalisation must discount the long doc")
    // doc 4 (1 token, far under avgdl) legitimately outscores the
    // 52-token doc 2 — BM25's length prior at work; both must appear
    assert(score.keySet == Set(1L, 2L, 4L))
  }

  test("bm25Rank: topK bounds output and ties break by doc_id") {
    val docs = (1 to 30).map(i => (i.toLong, "hash"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25Rank(docs, Seq("hash"), topK = 5)
      .select("doc_id").as[Long].collect().toSeq
    // identical docs -> identical scores -> lowest 5 ids win
    assert(out.sorted == Seq(1L, 2L, 3L, 4L, 5L), s"got $out")
  }

  test("bm25Rank rejects empty or duplicate query terms") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.bm25Rank(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextOps.bm25Rank(docs, Seq("Hash", "hash"))
    }
  }
}
