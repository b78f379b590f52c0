package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private def strip(ss: String*): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .orderBy("id")
      .select(TextOps.stripHtml(col("text")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("tags, script/style payloads, comments and entities all strip") {
    val got = strip(
      "<div class=\"x\"><p>hello</p> <b>world</b></div>",
      // bare '<' INSIDE the script body: the non-greedy block match
      // must still find the real close tag
      "before<script>var x = 1 < 2;</script>after",
      "a<style type=\"text/css\">p { color: red }</style>b",
      "keep<!-- drop\nme -->this",
      "x &amp; y &lt;z&gt; &quot;q&quot; &apos;a&apos;",
      "A&#66;&#x43; &#X44;done",
      "no markup at all")
    assert(got(0) == "hello world")
    assert(got(1) == "before after")
    assert(got(2) == "a b")
    assert(got(3) == "keep this")
    assert(got(4) == "x & y <z> \"q\" 'a'")
    assert(got(5) == "ABC Ddone")
    assert(got(6) == "no markup at all")
  }

  test("decode order: markup quoted as text stays text; one-pass decode") {
    val got = strip(
      // &lt;script&gt; is CONTENT — decoding after tag removal keeps it
      "use &lt;script&gt; tags",
      // double-escaped: one pass yields the literal entity, never '&'
      "literal &amp;amp; stays",
      "a&nbsp;b")
    assert(got(0) == "use <script> tags")
    assert(got(1) == "literal &amp; stays")
    assert(got(2) == "a b", "nbsp folds to a plain space")
  }

  test("invalid and unknown entities pass through literally") {
    val got = strip(
      "bare & ampersand",
      "&unknown; &; &#; &#x;",
      // out of range / surrogate halves / zero stay literal
      "&#1114112; &#xD800; &#0;",
      // entity-length bound: a ';' too far away is not an entity
      "&thisistoolongtobe;")
    assert(got(0) == "bare & ampersand")
    assert(got(1) == "&unknown; &; &#; &#x;")
    assert(got(2) == "&#1114112; &#xD800; &#0;")
    assert(got(3) == "&thisistoolongtobe;")
  }

  test("unclosed script keeps its content (conservative failure)") {
    val got = strip("a<script>var x = 1;")
    assert(got.head == "a var x = 1;")
  }

  test("supplementary-plane numeric entities decode to real codepoints") {
    val smile = new String(Character.toChars(0x1F600))
    assert(strip("hi &#128512; &#x1F600;").head == s"hi $smile $smile")
  }

  test("entity-free text takes the zero-allocation fast path (same buffer)") {
    val in = UTF8String.fromString("plain text, no entities")
    assert(graft.functions.HtmlUnescape.unescape(in) eq in)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextOps.stripHtml(col("text"))).collect()
    assert(nulls.head.isNullAt(0), "null propagates, never throws")
  }

  test("stripHtml is stream-admissible (the ingest-pipeline pin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.stripHtml(col("text")).as("clean"))
      .writeStream.format("memory").queryName("html_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "<p>a &amp; b</p><script>x<y</script>"))
      q.processAllAvailable()
      val got = spark.table("html_stream").collect().head.getString(1)
      assert(got == "a & b")
    } finally q.stop()
  }

  test("stripHtml plans as a zero-exchange codegen projection") {
    // non-foldable input (a literal would constant-fold to LocalTableScan)
    val df = spark.range(3)
      .select(concat(lit("<p>a &amp; "), col("id").cast("string"), lit("</p>")).as("text"))
      .select(TextOps.stripHtml(col("text")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // `*(1)` is executedPlan.toString's whole-stage-codegen span marker;
    // the projection (native decode included) must sit inside one
    assert(plan.contains("*(1) Project"), s"fell out of codegen:\n$plan")
    assert(!plan.contains("CodegenFallback"), s"fallback in plan:\n$plan")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("a & 0", "a & 1", "a & 2"))
  }

  test("property: escape -> unescape round-trips arbitrary text") {
    val gen = new scala.util.Random(42)
    // pieces, not UTF-16 units: picking raw chars would manufacture
    // lone surrogates out of the emoji, which no UTF-8 round-trip keeps
    val pieces = Seq("a", "b", " ", "&", "<", ">", "\"", "'", "#", ";",
      "x", "1", "帝", new String(Character.toChars(0x1F642)))
    def randText(): String =
      (0 until gen.nextInt(40)).map(_ => pieces(gen.nextInt(pieces.size))).mkString
    def escape(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&#39;"
      case c => c.toString
    }
    val cases = (1 to 300).map(_ => randText())
    for (s <- cases) {
      val got = graft.functions.HtmlUnescape
        .unescape(UTF8String.fromString(escape(s))).toString
      assert(got == s, s"round-trip broke for ${s.map(_.toInt)}")
    }
  }

  test("the composed ingest pipeline is stream-admissible end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val cleaned = TextOps.nfc(TextOps.cleanControlChars(
      TextOps.fixMojibake(TextOps.stripHtml(col("text")))))
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), cleaned.as("clean"))
      .writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    try {
      // markup + a quoted entity + a control char + decomposed accent
      mem.addData((1L, "<p>cafe" + "\u0301" + "\u0007 &amp; co</p>"))
      q.processAllAvailable()
      val got = spark.table("ingest_stream").collect().head.getString(1)
      assert(got == "caf" + "\u00e9" + " & co", s"got ${got.map(_.toInt)}")
    } finally q.stop()
  }
}
