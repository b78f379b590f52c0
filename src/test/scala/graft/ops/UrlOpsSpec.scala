package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://www.example.com/a/b?x=1#frag"),
    (2L, "http://sub.deep.example.co.uk:8080/path/"),
    (3L, "https://example.com:443/"),
    (4L, "http://example.com:80"),
    (5L, "ftp://files.example.org/pub"),
    (6L, "not a url at all"),
    (7L, "https://intranet/page"),
    (8L, "https://EXAMPLE.com/a/b?x=1")
  ).toDF("doc_id", "url")

  test("parseUrls splits scheme/host/port/path/query; dirty rows parse empty, never error") {
    val p = UrlOps.parseUrls(urls).orderBy("doc_id").collect()
    assert(p(0).getAs[String]("scheme") == "https")
    assert(p(0).getAs[String]("host") == "www.example.com")
    assert(p(0).isNullAt(p(0).fieldIndex("port")))
    assert(p(0).getAs[String]("path") == "/a/b")
    assert(p(0).getAs[String]("query") == "x=1") // fragment excluded
    assert(p(1).getAs[String]("host") == "sub.deep.example.co.uk")
    assert(p(1).getAs[Long]("port") == 8080L)
    assert(p(1).getAs[String]("path") == "/path/")
    assert(p(3).getAs[String]("path") == "") // no path at all
    assert(p(4).getAs[String]("scheme") == "ftp")
    // garbage row: every component '', port null — the '' no-match
    // contract both engines share
    assert(p(5).getAs[String]("scheme") == "")
    assert(p(5).getAs[String]("host") == "")
    assert(p(5).isNullAt(p(5).fieldIndex("port")))
    // hosts are case-normalised
    assert(p(7).getAs[String]("host") == "example.com")
  }

  test("registrableDomain: longest public suffix wins, with two-label and bare-host fallbacks") {
    val p = UrlOps.parseUrls(urls).orderBy("doc_id").collect()
    assert(p(0).getAs[String]("domain") == "example.com")
    assert(p(1).getAs[String]("domain") == "example.co.uk") // NOT co.uk
    assert(p(4).getAs[String]("domain") == "example.org")
    assert(p(6).getAs[String]("domain") == "intranet") // dotless host
    // unknown suffix → last two labels
    val odd = Seq((1L, "https://a.b.example.dev/x")).toDF("doc_id", "url")
    assert(UrlOps.parseUrls(odd).collect()(0).getAs[String]("domain") == "example.dev")
  }

  test("capPerDomain keeps the cap lowest ids per registrable domain across subdomains") {
    val crawl = (0L until 30L).map { i =>
      val sub = if (i % 3 == 0) "www." else if (i % 3 == 1) "cdn." else ""
      (i, s"https://${sub}site${i % 2}.com/p$i")
    }.toDF("doc_id", "url")
    val kept = UrlOps.capPerDomain(crawl, cap = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // two domains (site0.com, site1.com) regardless of subdomain → 4 lowest each
    assert(kept == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("dropBlockedDomains blocks subdomains through eTLD+1 reduction, both overloads") {
    val crawl = Seq(
      (1L, "https://evil.com/x"), (2L, "https://a.b.evil.com/y"),
      (3L, "https://good.com/z"), (4L, "https://evil.co.uk/w")
    ).toDF("doc_id", "url")
    val kept = UrlOps.dropBlockedDomains(crawl, Seq("evil.com"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    val bl = Seq("EVIL.com").toDF("domain") // blocklist is case-normalised too
    val kept2 = UrlOps.dropBlockedDomains(crawl, bl, "url")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(3L, 4L))
  }

  test("domainMix shares sum to 1 over registrable domains") {
    val crawl = Seq(
      (1L, "https://a.com/x"), (2L, "https://www.a.com/y"),
      (3L, "https://b.com/z"), (4L, "https://b.com/w")
    ).toDF("doc_id", "url")
    val rows = UrlOps.domainMix(crawl).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 4L)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(rows.find(_.getAs[String]("domain") == "a.com").get.getAs[Long]("n_docs") == 2L)
  }

  test("canonicalUrl drops default ports, query and fragment; normalises path; dedup keeps lowest id") {
    val crawl = Seq(
      (5L, "https://Example.com:443/a/"),
      (2L, "https://example.com/a?utm=x"),
      (9L, "https://example.com/a#sec"),
      (3L, "http://example.com:80"),
      (4L, "http://example.com/"),
      (6L, "https://example.com:8443/a")
    ).toDF("doc_id", "url")
    val canon = crawl.select(col("doc_id"), UrlOps.canonicalUrl(col("url")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(canon(5L) == "https://example.com/a")
    assert(canon(2L) == "https://example.com/a")
    assert(canon(9L) == "https://example.com/a")
    assert(canon(3L) == "http://example.com/")
    assert(canon(4L) == "http://example.com/")
    assert(canon(6L) == "https://example.com:8443/a") // non-default port kept
    val survivors = UrlOps.dedupUrls(crawl).as[(Long, String)].collect().toMap
    assert(survivors.keySet == Set(2L, 3L, 6L))
    assert(survivors(2L) == "https://example.com/a")
  }

  test("extractLinks: tag-ordinal positions, both quote styles, href-less anchors skipped") {
    val docs = Seq(
      (1L, """intro <a href="https://a.example.com/x">one</a> mid""" +
        """ <a name="anchor">dead</a> tail <a class='c' HREF='http://b.example.org/y?z=1'>two</a>"""),
      (2L, "no markup at all"),
      (3L, """<a
href="https://multi.example.com/l">newline inside tag</a>"""),
      (4L, """<a href="">empty href</a> <a href=''>also empty</a>""")
    ).toDF("doc_id", "text")
    val out = UrlOps.extractLinks(docs).orderBy("doc_id", "link_pos").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq == Seq(
      (1L, 0L, "https://a.example.com/x"),
      // the href-less <a name=...> holds position 1 but emits no row
      (1L, 2L, "http://b.example.org/y?z=1"),
      (3L, 0L, "https://multi.example.com/l")))
    // composes with parseUrls for the crawl-graph edge list
    val parsed = UrlOps.parseUrls(UrlOps.extractLinks(docs), "href")
      .orderBy("doc_id", "link_pos").collect()
    assert(parsed.map(_.getAs[String]("domain")).toSeq ==
      Seq("example.com", "example.org", "example.com"))
  }

  test("extractLinks is a stateless generate: runs on a stream, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val out = UrlOps.extractLinks(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("links_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, """x <a href="https://s.example.com/p">l</a>"""))
      q.processAllAvailable()
      val rows = spark.table("links_stream").collect()
      assert(rows.length == 1 && rows(0).getString(2) == "https://s.example.com/p")
    } finally q.stop()
  }

  test("extractLinks hardening: data-href ignored, unquoted values, '>' inside quotes") {
    val docs = Seq(
      // attribute-prefix guard: data-href / ng-href must never win over
      // (or substitute for) the real href
      (1L, "x <a data-href=\"https://tracker.example.com/t\" href=\"https://real.example.com/p\">l</a>"),
      (2L, "y <a data-href=\"https://only-tracker.example.com/t\">no real href</a>"),
      // unquoted attribute values are valid HTML
      (3L, "z <a href=http://bare.example.com/u class=m>unquoted</a>"),
      // a '>' inside a quoted attribute value must not truncate the tag
      (4L, "w <a href=\"https://e.example.com/a?b=1>2\">gt inside quotes</a>")
    ).toDF("doc_id", "text")
    val out = UrlOps.extractLinks(docs).orderBy("doc_id", "link_pos").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq == Seq(
      (1L, "https://real.example.com/p"),
      (3L, "http://bare.example.com/u"),
      (4L, "https://e.example.com/a?b=1>2")))
  }
}
