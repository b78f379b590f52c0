package graft.ops

import graft.SparkSpec

/** C4's duplicated three-sentence-span removal (keep-first): ranking
  * across documents, within-document repeats, island merging of
  * overlapping duplicated shingles, short-doc/null totality, and the
  * sentence-extraction contract. */
class SentenceDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: (Long, String)*): Map[Long, (String, Long, Long)] =
    ExactSubstr.dedupSentenceSpans(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_removed")))).toMap

  private val block = "Shared one. Shared two. Shared three."

  test("keep-first across documents: the lowest (doc_id, pos) survives") {
    val got = run(
      1L -> s"Doc one opens. $block Doc one closes.",
      2L -> s"Doc two opens. $block Doc two closes.",
      3L -> "Doc three is unrelated. It stays whole.")
    assert(got(1L) == (s"Doc one opens. $block Doc one closes.", 5L, 0L))
    assert(got(2L) == ("Doc two opens. Doc two closes.", 5L, 3L))
    assert(got(3L)._3 == 0L)
  }

  test("a within-document repeat loses its second occurrence") {
    val got = run(1L -> s"$block A separator sits here. $block")
    assert(got(1L)._1 == s"$block A separator sits here.")
    assert(got(1L)._3 == 3L)
  }

  test("overlapping duplicated shingles merge into one maximal span") {
    // a shared FOUR-sentence run flags two consecutive shingles in the
    // later doc; the island merge must remove all 4 sentences, once
    val four = "Alpha beta. Gamma delta. Epsilon zeta. Eta theta."
    val got = run(
      1L -> s"First doc intro. $four",
      2L -> s"Second doc intro. $four Second doc outro.")
    assert(got(1L)._3 == 0L)
    assert(got(2L)._1 == "Second doc intro. Second doc outro.")
    assert(got(2L)._3 == 4L)
  }

  test("keeper protection: an overlapping flagged shingle cannot delete a keeper") {
    // doc2 holds the KEEPER of (Beta,Gamma,Delta) and (Gamma,Delta,Epsilon)
    // but is also FLAGGED for (Alpha,Beta,Gamma) (doc1 keeps that one).
    // Without protection the flagged span 1..3 would delete Beta+Gamma
    // from doc2 while doc3's copies are removed as rk>1 — zero surviving
    // occurrences corpus-wide. With protection doc2 loses only Alpha.
    val got = run(
      1L -> "X. Alpha. Beta. Gamma. Y.",
      2L -> "Alpha. Beta. Gamma. Delta. Epsilon. F.",
      3L -> "Q. Beta. Gamma. Delta. Epsilon. R.")
    assert(got(1L)._3 == 0L)
    assert(got(2L)._1 == "Beta. Gamma. Delta. Epsilon. F.")
    assert(got(2L)._3 == 1L)
    assert(got(3L)._1 == "Q. R.")
    assert(got(3L)._3 == 4L)
  }

  test("short docs, null text, and unterminated fragments are total") {
    val got = ExactSubstr.dedupSentenceSpans(
      Seq((1L, "Only two. Sentences here."), (2L, null: String),
          (3L, "Terminated once. then an unterminated tail"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_removed")))).toMap
    assert(got(1L) == (("Only two. Sentences here.", 2L, 0L)))
    assert(got(2L) == (("", 0L, 0L)))
    // the unterminated tail is not a sentence (C4's line filter would
    // have dropped unterminated text before this stage anyway)
    assert(got(3L) == (("Terminated once.", 1L, 0L)))
  }

  test("minOccurrences floor: a 3x-shared block survives a floor of 4") {
    val docs = (1L to 3L).map(i => i -> s"Doc $i opens. $block Doc $i closes.")
    val kept = ExactSubstr.dedupSentenceSpans(
      docs.toDF("doc_id", "text"), minOccurrences = 4)
      .collect().map(_.getAs[Long]("n_removed")).sum
    assert(kept == 0L)
  }

  // ---- the compute-offline/clean-online twin ------------------------------

  test("stripSentencesFlag equals the batch rebuild when keepers live in the corpus") {
    // corpus holds the duplicated block (and its keeper); arrivals carry
    // later occurrences — the artifact-probing twin must clean them to
    // exactly what the batch operator would have produced for those docs
    val corpus = Seq(
      1L -> s"Doc one opens. $block Doc one closes.",
      2L -> s"Doc two opens. $block Doc two closes.").toDF("doc_id", "text")
    val arrivals = Seq(
      10L -> s"Arrival intro. $block Arrival outro.",
      11L -> "A clean arrival. It keeps everything. All three sentences.")
      .toDF("doc_id", "text")
    val artifact = ExactSubstr.frequentShingles(corpus)
    val got = ExactSubstr.stripSentencesFlag(arrivals, artifact)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_removed")))).toMap
    // batch over corpus + arrivals: arrival 10's block copies are rk > 1
    val batch = ExactSubstr.dedupSentenceSpans(corpus.unionAll(arrivals))
      .filter($"doc_id" >= 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_removed")))).toMap
    assert(got == batch, s"twin diverged from batch: $got vs $batch")
    assert(got(10L) == (("Arrival intro. Arrival outro.", 5L, 3L)))
    assert(got(11L)._3 == 0L)
  }

  test("stripSentencesFlag is stateless: runs on a stream unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      1L -> s"Keeper doc. $block End.",
      2L -> s"Second copy. $block Tail.").toDF("doc_id", "text")
    val artifact = ExactSubstr.frequentShingles(corpus)
    val mem = MemoryStream[(Long, String)](spark)
    val out = ExactSubstr.stripSentencesFlag(
      mem.toDF().toDF("doc_id", "text"), artifact)
    val q = out.writeStream.format("memory").queryName("sf_stream")
      .outputMode("append").start()
    try {
      mem.addData((20L, s"Stream intro. $block Stream outro."),
        (21L, "Nothing shared. Stays whole."))
      q.processAllAvailable()
      val rows = spark.table("sf_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
      assert(rows(20L) == "Stream intro. Stream outro.")
      assert(rows(21L) == "Nothing shared. Stays whole.")
    } finally q.stop()
  }

  test("stripSentencesFlag guards its driver-side artifact size") {
    val corpus = Seq(
      1L -> s"$block", 2L -> s"$block").toDF("doc_id", "text")
    val artifact = ExactSubstr.frequentShingles(corpus)
    intercept[IllegalArgumentException] {
      ExactSubstr.stripSentencesFlag(corpus, artifact, maxShingles = 0L)
    }
  }
}
