package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sitemap XML parsing (sitemaps.org protocol 0.9) and the per-host
  * politeness schedule: urlset vs sitemapindex shapes, entity
  * unescaping, optional-field nulls, position preservation across
  * loc-less entries, garbage totality; crawl-delay precedence and slot
  * arithmetic in crawlSchedule. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc> http://example.com/p?a=1&amp;b=2 </loc>
      |    <lastmod>2024-03-01</lastmod>
      |    <changefreq>DAILY</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><lastmod>2024-01-01</lastmod></url>
      |  <url><loc>http://example.com/q</loc><priority>high</priority></url>
      |</urlset>
      |""".stripMargin

  private val index =
    """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<sitemap><loc>http://example.com/maps/a.xml.gz</loc>
      |<lastmod>2024-02-02</lastmod></sitemap>
      |<sitemap><loc>http://example.com/maps/&amp;lt;odd&gt;.xml</loc></sitemap>
      |</sitemapindex>
      |""".stripMargin

  private def parsed = UrlOps.parseSitemap(Seq(
    (1L, urlset), (2L, index),
    (3L, "not xml at all"), (4L, null.asInstanceOf[String]))
    .toDF("doc_id", "text"))

  test("parseSitemap: urlset entries, trimming, unescape, optional nulls, position") {
    val rows = parsed.filter(col("doc_id") === 1L).orderBy("entry_pos")
      .select("entry_pos", "kind", "loc", "lastmod", "changefreq", "priority")
      .collect()
    assert(rows.length == 2, "the loc-less entry emits no row")
    val r0 = rows(0)
    assert(r0.getLong(0) == 0L && r0.getString(1) == "url")
    assert(r0.getString(2) == "http://example.com/p?a=1&b=2",
      "loc trimmed and &amp; unescaped")
    assert(r0.getString(3) == "2024-03-01")
    assert(r0.getString(4) == "daily", "changefreq lowercased")
    assert(r0.getDouble(5) == 0.8)
    val r1 = rows(1)
    assert(r1.getLong(0) == 2L,
      "the loc-less middle entry still occupies entry_pos 1")
    assert(r1.getString(2) == "http://example.com/q")
    assert(r1.isNullAt(3) && r1.isNullAt(4), "absent optionals are null")
    assert(r1.isNullAt(5), "non-numeric priority degrades to null, no throw")
  }

  test("parseSitemap: sitemapindex kind, double-escape round-trip, totality") {
    val rows = parsed.filter(col("doc_id") === 2L).orderBy("entry_pos")
      .select("entry_pos", "kind", "loc", "lastmod").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(1) == "sitemap"))
    assert(rows(0).getString(2) == "http://example.com/maps/a.xml.gz")
    assert(rows(0).getString(3) == "2024-02-02")
    assert(rows(1).getString(2) == "http://example.com/maps/&lt;odd>.xml",
      "&amp;lt; unescapes to the literal &lt; (amp replaced LAST)")
    // garbage and null both parse to zero rows
    assert(parsed.filter(col("doc_id").isin(3L, 4L)).count() == 0)
  }

  test("parseSitemap: <url> never half-matches <urlset>") {
    // a urlset wrapper with NO url children must emit nothing — the
    // element regex anchors the name with [whitespace]*> so the set tag
    // cannot open an entry
    val empty = UrlOps.parseSitemap(
      Seq((1L, "<urlset><x>nope</x></urlset>")).toDF("doc_id", "text"))
    assert(empty.count() == 0)
  }

  private val robots =
    """User-agent: *
      |Crawl-delay: 2
      |User-agent: fastbot
      |Crawl-delay: 0.5
      |Disallow:
      |""".stripMargin

  private def rules = UrlOps.parseRobots(
    Seq((1L, robots)).toDF("doc_id", "text"))

  private def urls = Seq(
    (1L, 10L, "/a"), (1L, 11L, "/b"), (1L, 12L, "/c"),
    (2L, 20L, "/x"), (2L, 21L, "/y") // host with no robots at all
  ).toDF("doc_id", "url_id", "path")

  test("crawlSchedule: slots in url order, star-group delay, default fallback") {
    val got = UrlOps.crawlSchedule(urls, rules, agent = "someBot",
      defaultDelay = 1.0)
      .select("url_id", "slot", "delay_s", "offset_s")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(10L) == ((0L, 2.0, 0.0)))
    assert(got(11L) == ((1L, 2.0, 2.0)))
    assert(got(12L) == ((2L, 2.0, 4.0)), "star group's crawl-delay applies")
    assert(got(20L) == ((0L, 1.0, 0.0)))
    assert(got(21L) == ((1L, 1.0, 1.0)), "no robots -> defaultDelay")
  }

  test("parseRobots and parseSitemap are stream-admissible: batch == stream rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // both parsers are pure per-row projections (one aggregate fold /
    // one regexp extraction), so the SAME call must run unchanged on a
    // stream of arriving captures and emit identical rows
    val robotsDocs = Seq((1L, robots), (2L, "User-agent: *\nDisallow: /p\n"))
    val sitemapDocs = Seq((1L, urlset), (2L, index), (3L, "garbage"))
    def parity(name: String, docs: Seq[(Long, String)],
               op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val batch = op(docs.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
      val mem = MemoryStream[(Long, String)](spark)
      val q = op(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        mem.addData(docs: _*)
        q.processAllAvailable()
        val streamed = spark.table(name).collect().map(_.toSeq).toSet
        assert(streamed == batch, s"$name: batch and stream rows identical")
        assert(batch.nonEmpty)
      } finally q.stop()
    }
    parity("robots_stream", robotsDocs, df => UrlOps.parseRobots(df))
    parity("sitemap_stream", sitemapDocs, df => UrlOps.parseSitemap(df))
  }

  test("crawlSchedule: the agent's own group outranks * for the delay too") {
    val got = UrlOps.crawlSchedule(urls, rules, agent = "FASTBOT")
      .select("url_id", "delay_s", "offset_s")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(11L) == ((0.5, 0.5)), "own group's 0.5 wins over *'s 2")
    assert(got(12L) == ((0.5, 1.0)))
  }

  test("entry elements carrying attributes still parse; <urlset> still never half-matches") {
    // image/video extension sitemaps attach attributes (and extension
    // children) to <url>/<sitemap> — pre-r14 these silently parsed to
    // zero rows instead of degrading per-field
    val attributed =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        |        xmlns:xhtml="http://www.w3.org/1999/xhtml">
        |  <url data-extra="1">
        |    <loc>http://example.com/a</loc>
        |    <xhtml:link rel="alternate" href="http://example.com/de/a"/>
        |  </url>
        |  <url
        |     class="wide"><loc>http://example.com/b</loc>
        |     <priority percent="yes">0.4</priority></url>
        |</urlset>""".stripMargin
    val rows = UrlOps.parseSitemap(Seq((9L, attributed)).toDF("doc_id", "text"))
      .orderBy("entry_pos")
      .select("entry_pos", "kind", "loc", "priority")
      .collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("http://example.com/a", "http://example.com/b"))
    assert(rows.forall(_.getString(1) == "url"),
      "kind detection must see through the attribute tail")
    assert(rows(1).getDouble(3) == 0.4,
      "child extracts must see through an attribute tail too")
    // the <urlset ...> wrapper itself must not have matched as an entry:
    // two entry ordinals only, starting at 0
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }
}
