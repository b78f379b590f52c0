package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 cleaning battery (Raffel et al. 2020 §2.2): line pass semantics,
  * page tripwires, sentence counting on the surviving text, null
  * totality, the no-shuffle plan shape, and stream admissibility. */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(t: TextOps.C4Thresholds, docs: (Long, String)*) =
    TextOps.c4Rules(docs.toDF("doc_id", "text"), t)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("line pass: terminal punctuation, word floor, javascript drop") {
    val page = Seq(
      "A perfectly fine sentence.",   // kept
      "Is this kept? Yes it is!",     // kept (ends '!')
      "He said \"stop here.\"",       // kept (closing quote ender)
      "too short.",                   // dropped: 2 words
      "no terminal punctuation",      // dropped
      "Enable javascript to continue.", // dropped: javascript
      "   ",                          // dropped
      "Trailing space is fine.  "     // kept: \s* after the ender
    ).mkString("\n")
    val got = run(TextOps.C4Thresholds(minSentences = 3), 1L -> page)(1L)
    assert(got.getAs[Long]("n_lines") == 8)
    assert(got.getAs[Long]("n_kept_lines") == 4)
    assert(got.getAs[String]("clean_text") == Seq(
      "A perfectly fine sentence.",
      "Is this kept? Yes it is!",
      "He said \"stop here.\"",
      "Trailing space is fine.  ").mkString("\n"))
    // sentences count TERMINAL MARKS in the surviving text: 1 + 2 + 1 + 1
    assert(got.getAs[Long]("n_sentences") == 5)
    assert(got.getAs[Boolean]("r_sentences"))
    assert(got.getAs[Boolean]("c4_keep"))
  }

  test("page tripwires: brace, lorem ipsum, blocklist; line pass unaffected") {
    val base = "One good sentence here.\nAnd another one stays!\nA third closes it."
    val t = TextOps.C4Thresholds(minSentences = 3, badWords = Seq("casino"))
    val got = run(t,
      1L -> base,
      2L -> (base + "\nvar conf = { a: 1 };"),
      3L -> (base + "\nLorem Ipsum dolor sit amet."),
      4L -> (base + "\nBig CASINO night draws near."),
      5L -> (base + "\ncasinos are not the word casino."))
    assert(got(1L).getAs[Boolean]("c4_keep"))
    assert(!got(2L).getAs[Boolean]("r_brace") && !got(2L).getAs[Boolean]("c4_keep"))
    assert(!got(3L).getAs[Boolean]("r_lorem"), "case-insensitive template match")
    assert(!got(4L).getAs[Boolean]("r_badwords"), "case-insensitive blocklist")
    // word-boundary match: 'casinos' alone would pass, bare 'casino' trips
    assert(!got(5L).getAs[Boolean]("r_badwords"))
    // the brace page still got its lines CLEANED (the brace line has no
    // terminal punct path issue — it ends '};' so it is dropped by the
    // ender rule, not by the tripwire)
    assert(got(2L).getAs[String]("clean_text") == base)
  }

  test("null and empty text are total: empty page, sentence floor fails") {
    val got = TextOps.c4Rules(
      Seq((1L, null: String), (2L, "")).toDF("doc_id", "text"),
      TextOps.C4Thresholds(minSentences = 1))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(got(id).getAs[String]("clean_text") == "")
      assert(got(id).getAs[Long]("n_sentences") == 0)
      assert(!got(id).getAs[Boolean]("c4_keep"))
      assert(got(id).getAs[Boolean]("r_brace"))
    }
  }

  test("blocklist rejects non-word entries (regex injection guard)") {
    intercept[IllegalArgumentException] {
      TextOps.C4Thresholds(badWords = Seq("a|b"))
    }
  }

  test("c4Rules plans as a zero-exchange projection") {
    val df = spark.range(3)
      .select(col("id").as("doc_id"),
        concat(lit("A good long sentence number "), col("id").cast("string"),
          lit(".\nshort.")).as("text"))
    val out = TextOps.c4Rules(df, TextOps.C4Thresholds(minSentences = 1))
    // the size-gated fan-out (r16) adds one RoundRobinPartitioning
    // micro-shuffle; anything else (a hash/range exchange) would mean
    // the projection regressed into a real shuffle
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("RoundRobinPartitioning")) &&
      exchanges.size <= 1, s"unexpected shuffle:\n$plan")
    assert(out.collect().forall(_.getAs[Boolean]("c4_keep")))
  }

  test("c4Rules is stream-admissible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val q = TextOps.c4Rules(mem.toDF().toDF("doc_id", "text"),
      TextOps.C4Thresholds(minSentences = 1))
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "Streaming rows clean fine.\nEnable javascript now."))
      q.processAllAvailable()
      val row = spark.table("c4_stream").collect().head
      assert(row.getAs[String]("clean_text") == "Streaming rows clean fine.")
      assert(row.getAs[Boolean]("c4_keep"))
    } finally q.stop()
  }
}
