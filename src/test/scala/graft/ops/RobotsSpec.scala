package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** robots.txt parsing (RFC 9309 grammar subset) and the URL permission
  * join: grouping of user-agent runs, orphan-rule dropping, longest-
  * prefix decisions with allow winning ties, own-group-over-star agent
  * selection, and the total postures (no rules / no robots / null). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# crawl policy
      |Disallow: /orphan-rule-ignored
      |User-Agent: *
      |Disallow: /private/
      |Allow: /private/public
      |DISALLOW:
      |User-agent: botA
      |user-agent: botB
      |Crawl-delay: 4
      |Disallow: /
      |Sitemap: http://site.example/sitemap.xml
      |Weird-Key: ignored
      |""".stripMargin.replace("\n", "\r\n") // CRLF endings must parse too

  private def parsed = UrlOps.parseRobots(
    Seq((1L, robots), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"))

  test("parseRobots: groups, comments, case, orphan rules, sitemap, CRLF") {
    val rows = parsed.filter(col("doc_id") === 1L).orderBy("rule_pos")
      .select("grp", "directive", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      (0L, "user-agent", "*"),
      (0L, "disallow", "/private/"),
      (0L, "allow", "/private/public"),
      (0L, "disallow", ""), // empty value kept by the parse (no-op downstream)
      (1L, "user-agent", "botA"),
      (1L, "user-agent", "botB"), // the ua RUN shares one group
      (1L, "crawl-delay", "4"),
      (1L, "disallow", "/"),
      (-1L, "sitemap", "http://site.example/sitemap.xml"))) // colon value intact
    // the orphan rule before any group, the comment, the unknown key:
    // all absent
    assert(!rows.exists(_._3.contains("orphan")))
    // null text is total: zero rows, no throw
    assert(parsed.filter(col("doc_id") === 2L).count() == 0)
  }

  private def urls = Seq(
    (1L, 10L, "/private/secret"),
    (1L, 11L, "/private/public/page"),
    (1L, 12L, "/open/page"),
    (2L, 13L, "/private/secret") // host with NO robots: allowed
  ).toDF("doc_id", "url_id", "path")

  test("robotsAllowed: longest prefix decides, allow wins ties, no-rule URLs pass") {
    val got = UrlOps.robotsAllowed(parsed, urls, agent = "someBot")
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!got(10L), "/private/secret blocked by /private/")
    assert(got(11L), "the longer allow rule overrides")
    assert(got(12L), "no matching rule -> allowed")
    assert(got(13L), "no robots for that key -> allowed")
  }

  test("robotsAllowed: an agent's own group outranks *, case-insensitive") {
    val got = UrlOps.robotsAllowed(parsed, urls, agent = "BOTA")
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    // botA's group disallows everything — including the path * allows
    assert(!got(10L) && !got(11L) && !got(12L))
    assert(got(13L), "still no robots for key 2")
  }

  test("robotsAllowed: url ids only unique per host never merge across hosts") {
    // host 1 disallows /x for everyone; host 2 has no robots at all.
    // Both carry url_id=1 — the per-host frontier-ordinal shape. The
    // verdicts must stay per (host, id): an id-only aggregation would
    // stamp host 1's disallow onto host 2's row.
    val rules = UrlOps.parseRobots(Seq(
      (1L, "User-agent: *\nDisallow: /x")).toDF("doc_id", "text"))
    val collide = Seq((1L, 1L, "/x"), (2L, 1L, "/x"))
      .toDF("doc_id", "url_id", "path")
    val got = UrlOps.robotsAllowed(rules, collide, agent = "any")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!got(1L), "host 1 blocks /x")
    assert(got(2L), "host 2 has no rules -> allowed, even with a shared url_id")
  }

  test("robotsAllowed wildcards: * spans, trailing $ anchors, metachars stay literal") {
    val wc =
      """User-agent: *
        |Disallow: /a*/x
        |Allow: /a*/x/pub
        |Disallow: /exact$
        |Disallow: /q(b
        |""".stripMargin
    val rules = UrlOps.parseRobots(Seq((1L, wc)).toDF("doc_id", "text"))
    val urls = Seq(
      (1L, 1L, "/a123/x"),        // * spans -> blocked
      (1L, 2L, "/a123/x/pub/y"),  // longer allow overrides
      (1L, 3L, "/exact"),         // $ anchor -> blocked
      (1L, 4L, "/exactx"),        // one char past the anchor -> allowed
      (1L, 5L, "/q(b/z"),         // '(' is escaped, matches literally
      (1L, 6L, "/b"))             // nothing matches
      .toDF("doc_id", "url_id", "path")
    val got = UrlOps.robotsAllowed(rules, urls, agent = "any", wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!got(1L) && got(2L) && !got(3L) && got(4L) && !got(5L) && got(6L))
    // wildcard-free rules behave identically under both modes
    val plain = UrlOps.parseRobots(Seq(
      (1L, "User-agent: *\nDisallow: /p/\nAllow: /p/ok")).toDF("doc_id", "text"))
    val us = Seq((1L, 1L, "/p/x"), (1L, 2L, "/p/ok/y"), (1L, 3L, "/z"))
      .toDF("doc_id", "url_id", "path")
    val a = UrlOps.robotsAllowed(plain, us, agent = "any", wildcards = false)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    val b = UrlOps.robotsAllowed(plain, us, agent = "any", wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(a == b, "prefix rules are mode-invariant")
    // a dozen-star hostile rule must match in linear time — robots.txt
    // is attacker-controlled input; a backtracking regex translation
    // hangs for minutes on exactly this shape (empirically verified)
    val hostile = UrlOps.parseRobots(Seq(
      (1L, "User-agent: *\nDisallow: /*a*a*a*a*a*a*a*a*a*a*a*a$"))
      .toDF("doc_id", "text"))
    val longPath = "/" + ("a" * 59) + "b" // 61 chars, non-matching
    val t0 = System.nanoTime()
    val gotHostile = UrlOps.robotsAllowed(hostile,
      Seq((1L, 1L, longPath), (1L, 2L, "/" + "a" * 12))
        .toDF("doc_id", "url_id", "path"),
      agent = "any", wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(gotHostile(1L), "trailing b escapes the $-anchored all-a rule")
    assert(!gotHostile(2L), "the all-a path is caught")
    // a generous tripwire, not a benchmark: the pre-fix backtracking
    // translation ran MINUTES-to-unbounded on this exact shape, so any
    // sub-2-minute completion separates linear from exponential even
    // on a throttled box
    assert(elapsedS < 120.0, s"linear matching, not backtracking ($elapsedS s)")
    // * spans NEWLINES too (chars are literal — no regex '.' semantics),
    // and the $ anchor means the true end of the path, not line ends
    val nl = UrlOps.parseRobots(Seq(
      (1L, "User-agent: *\nDisallow: /n*b\nDisallow: /exact$"))
      .toDF("doc_id", "text"))
    val gotNl = UrlOps.robotsAllowed(nl,
      Seq((1L, 1L, "/n\nb"), (1L, 2L, "/exact\n"))
        .toDF("doc_id", "url_id", "path"),
      agent = "any", wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!gotNl(1L), "* spans a newline (a %0A path cannot dodge a rule)")
    assert(gotNl(2L), "$ anchors at the true end, not before a final newline")
    // a mid-rule $ is literal (only the TRAILING $ anchors)
    val midDollar = UrlOps.parseRobots(Seq(
      (1L, "User-agent: *\nDisallow: /m$n")).toDF("doc_id", "text"))
    val gotMid = UrlOps.robotsAllowed(midDollar,
      Seq((1L, 1L, "/m$n/t"), (1L, 2L, "/mn")).toDF("doc_id", "url_id", "path"),
      agent = "any", wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!gotMid(1L), "literal $ inside the rule matches a literal $ path")
    assert(gotMid(2L), "it does not behave as an anchor or wildcard")
  }

  test("robotsAllowed: allow-tie and empty-value no-op semantics") {
    val tie =
      """User-agent: *
        |Disallow: /a/
        |Allow: /a/
        |Disallow:
        |""".stripMargin
    val rules = UrlOps.parseRobots(Seq((1L, tie)).toDF("doc_id", "text"))
    val got = UrlOps.robotsAllowed(rules,
      Seq((1L, 1L, "/a/x"), (1L, 2L, "/b")).toDF("doc_id", "url_id", "path"),
      agent = "any")
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "equal-length allow wins the tie")
    assert(got(2L), "the empty disallow is the RFC no-op, not deny-all")
  }
}
