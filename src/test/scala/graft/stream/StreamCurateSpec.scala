package graft.stream

import graft.SparkSpec
import graft.ops.{Curate, ExactSubstr, TextOps}
import org.apache.spark.sql.functions._

/** The composed stateless ingest chain: end-to-end behavior on dirty
  * pages, batch/stream identity (the whole point of the stateless
  * shape), and flag-vs-apply semantics. */
class StreamCurateSpec extends SparkSpec {
  import spark.implicits._

  // corpus the OFFLINE artifacts are built from: a boilerplate footer
  // line shared by two docs, and a duplicated three-sentence block
  private val footer = "subscribe to our newsletter"
  private val block = "Shared one two three. Shared four five six. Shared seven eight nine."
  private def corpus = Seq(
    (1L, s"Corpus doc body here. $block\n$footer"),
    (2L, s"Another corpus doc. $block\n$footer")
  ).toDF("doc_id", "text")

  private def artifacts = StreamCurate.Artifacts(
    frequentLines = Curate.frequentLines(corpus),
    frequentShingles = ExactSubstr.frequentShingles(corpus),
    evalDocs = Seq((900L, "the held out evaluation answer string for benchmark questions " +
      "is exactly this very sentence of thirteen plus tokens")).toDF("doc_id", "text"))

  // an arriving page exercising every stage: html wrapper, the corpus
  // footer, the duplicated block, a PAN, and enough healthy sentences
  // to keep the page
  private val goodBody =
    "This arriving page carries plenty of healthy prose that people wrote. " +
    "It keeps several complete sentences with common words like the and is. " +
    "The third sentence also ends with terminal punctuation of course. " +
    "A fourth one keeps the page over the sentence floor for this test. " +
    "The fifth sentence mentions a card 4539578763621486 to be scrubbed."
  private def arrivals = Seq(
    (10L, s"<p>$goodBody</p>\n$footer\n$block"),
    // a contaminated arrival: contains the eval 13-gram verbatim
    (11L, "Some page text. " +
      "the held out evaluation answer string for benchmark questions is " +
      "exactly this very sentence of thirteen plus tokens. More text here."),
    // junk page: no terminal punctuation, no stopwords -> both flags out
    (12L, "xxxx yyyy zzzz qqqq"),
    (13L, null.asInstanceOf[String]),
    // a quote-terminated TRAILING line: C4's line filter keeps it (ends
    // on a closing quote) but the sentence-span rebuild drops it — the
    // chain must count the drop instead of applying it silently
    (14L, s"<p>$goodBody</p>\n" +
      "He said the page keeps going \"beyond the last period\"")
  ).toDF("doc_id", "text")

  test("the composed chain cleans, dedups, flags, and scrubs in one stateless pass") {
    val out = StreamCurate.curate(arrivals, artifacts)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val good = out(10L)
    val text = good.getAs[String]("text")
    assert(!text.contains("<p>"), "html must be stripped")
    assert(!text.contains(footer), "the corpus boilerplate footer must be stripped")
    assert(!text.contains("Shared one two three"),
      "the corpus-duplicated sentence block must be stripped")
    assert(text.contains("[CARD]") && !text.contains("4539578763621486"),
      "the Luhn-valid PAN must be scrubbed")
    assert(good.getAs[Long]("n_boilerplate_lines") == 1L)
    assert(good.getAs[Long]("n_dup_sentences") == 3L)
    assert(good.getAs[Long]("n_cards") == 1L)
    assert(good.getAs[Boolean]("c4_keep") && good.getAs[Boolean]("gopher_keep"))
    assert(!good.getAs[Boolean]("might_contaminated"))
    assert(good.getAs[Boolean]("keep"))

    assert(out(11L).getAs[Boolean]("might_contaminated"),
      "an eval-overlapping arrival must flag")
    assert(!out(11L).getAs[Boolean]("keep"))

    assert(!out(12L).getAs[Boolean]("keep"), "junk pages drop on quality flags")
    assert(!out(12L).getAs[Boolean]("c4_keep"))
    assert(!out(12L).getAs[Boolean]("gopher_keep"))

    assert(out(13L).getAs[String]("text") == "", "null text is total, never a throw")
    assert(!out(13L).getAs[Boolean]("keep"))

    // trailing-fragment accounting: the quote-terminated tail is dropped
    // by the span rebuild AND counted; terminated pages count zero
    val tailed = out(14L)
    assert(!tailed.getAs[String]("text").contains("beyond the last period"),
      "the unterminated tail does not survive the sentence rebuild")
    assert(tailed.getAs[Long]("n_tail_dropped") == 1L,
      "the dropped tail must be counted (flags emitted, never silent)")
    assert(good.getAs[Long]("n_tail_dropped") == 0L)
    assert(out(13L).getAs[Long]("n_tail_dropped") == 0L)
  }

  test("crawl-container to curated shard: parseWarc feeds the chain end to end") {
    // the full production ingest: WARC files in, curated+flagged rows
    // out — one WARC record per arriving page, the record's
    // charset-decoded payload_text is exactly the chain's input column
    import graft.ops.WarcOps
    def record(uri: String, body: String): Array[Byte] = {
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n")
        .getBytes("US-ASCII") ++ body.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val warc = record("http://a.example/good", s"<p>$goodBody</p>\n$footer\n$block") ++
      record("http://a.example/junk", "xxxx yyyy zzzz qqqq")
    val files = Seq((1L, warc)).toDF("doc_id", "warc")
    val pages = WarcOps.parseWarc(spark, files)
      .filter(col("warc_type") === "response")
      .select((col("doc_id") * 100 + col("rec_index")).as("doc_id"),
        col("payload_text").as("text"))
    val out = StreamCurate.curate(pages, artifacts)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 2)
    val good = out(100L)
    assert(good.getAs[Boolean]("keep"))
    assert(good.getAs[String]("text").contains("[CARD]"),
      "the PAN inside the WARC payload must be scrubbed")
    assert(!good.getAs[String]("text").contains(footer))
    assert(good.getAs[Long]("n_dup_sentences") == 3L)
    assert(!out(101L).getAs[Boolean]("keep"), "junk page drops on quality flags")
  }

  test("batch and stream produce identical rows (the stateless contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = StreamCurate.curate(arrivals, artifacts)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)](spark)
    val out = StreamCurate.curate(mem.toDF().toDF("doc_id", "text"), artifacts)
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      mem.addData(arrivals.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("curate_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, "the chain must be a pure projection: " +
        "batch and stream rows identical")
    } finally q.stop()
  }
}
