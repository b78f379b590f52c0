package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property battery for the crawl-permission family: totality of
  * parseRobots/parseSitemap over arbitrary junk, generative round-trips
  * against closed-form expectations, and robotsAllowed checked against
  * an independent brute-force reimplementation of the RFC 9309 §2.2.2
  * decision rule. Fixed seeds, manual sampling (the
  * [[graft.ContractGen]] convention — the scalatestplus bridge is not
  * on the offline classpath). Samples are batched into ONE DataFrame
  * per test so the battery costs a few Spark jobs, not hundreds. */
class CrawlPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---- totality over junk ---------------------------------------------

  /** Junk MIXED with directive-producing lines, so the grammar
    * assertions exercise real rows (junk alone parses to zero rows and
    * proves only totality). */
  private val genJunkLine: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString.take(60)),
    Gen.const("User-agent"),            // colon-less key
    Gen.const(": value with no key"),
    Gen.const("Disallow: /a: b: c"),    // colons in the value
    Gen.const("#"),
    Gen.const("\t \t"),
    Gen.const("User-agent: *"),         // opens a real group
    Gen.const("Allow: /x"),
    Gen.const("Sitemap: http://s.example/m.xml"),
    Gen.listOf(Gen.choose(0.toChar, 255.toChar)).map(_.mkString.take(40)))

  test("parseRobots is total on junk and its output grammar always holds") {
    val docs = sample(Gen.listOfN(8, genJunkLine), 150, seed = 0x50B)
      .zipWithIndex
      .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
    val out = UrlOps.parseRobots(docs.toDF("doc_id", "text")).collect()
    assert(out.nonEmpty, "the generator must produce SOME parsed rows " +
      "or the grammar assertions are vacuous")
    out.foreach { r =>
      val grp = r.getLong(2)
      val directive = r.getString(3)
      assert(Set("user-agent", "allow", "disallow", "crawl-delay",
        "sitemap").contains(directive), s"directive grammar: $directive")
      assert(if (directive == "sitemap") grp == -1L else grp >= 0L,
        s"group grammar: $directive/$grp")
      assert(r.getString(4) != null, "values are never null")
    }
    // rule_pos is a contiguous 0-based ordinal within each doc
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val ps = rows.map(_.getLong(1)).sorted.toSeq
      assert(ps == (0L until ps.length.toLong).toSeq, s"doc $doc positions")
    }
  }

  test("parseSitemap is total on junk and loc is never null or empty") {
    // junk interleaved with REAL entries (and loc-less ones) so the
    // grammar assertions run against produced rows
    val genPiece: Gen[String] = Gen.oneOf(
      genJunkLine,
      Gen.const("<url><loc>http://r.example/ok</loc></url>"),
      Gen.const("<url><lastmod>2024-01-01</lastmod></url>"), // loc-less
      Gen.const("<sitemap><loc>http://r.example/i.xml</loc></sitemap>"))
    val docs = sample(Gen.listOfN(6, genPiece), 150, seed = 0x517E)
      .zipWithIndex
      .map { case (ls, i) => (i.toLong, ls.mkString("<url>")) }
    val out = UrlOps.parseSitemap(docs.toDF("doc_id", "text")).collect()
    assert(out.nonEmpty, "vacuity guard: some entries must parse")
    out.foreach { r =>
      assert(Set("url", "sitemap").contains(r.getString(2)))
      assert(r.getString(3) != null && r.getString(3).nonEmpty)
    }
  }

  // ---- generative round trips -----------------------------------------

  private val genToken: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genPath: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, genToken).map(_.mkString("/", "/", "")))

  private case class Grp(agents: Seq[String], rules: Seq[(String, String)])
  private val genGrp: Gen[Grp] = for {
    nA <- Gen.chooseNum(1, 3)
    agents <- Gen.listOfN(nA, Gen.oneOf(Gen.const("*"), genToken))
    nR <- Gen.chooseNum(1, 3)
    rules <- Gen.listOfN(nR, for {
      d <- Gen.oneOf("allow", "disallow", "crawl-delay")
      v <- if (d == "crawl-delay") Gen.chooseNum(1, 30).map(_.toString)
           else genPath
    } yield (d, v))
  } yield Grp(agents.distinct, rules)

  private val genRobots: Gen[(Seq[Grp], Seq[String])] = for {
    nG <- Gen.chooseNum(1, 3)
    groups <- Gen.listOfN(nG, genGrp)
    sitemaps <- Gen.listOf(genToken.map(t => s"http://$t.example/s.xml"))
  } yield (groups, sitemaps.take(2))

  /** Serialize with case-varied keys and interleaved comments — placed
    * only where the pinned grammar says they are inert (never between
    * two user-agent lines of one run: a blank/comment line ends a run). */
  private def robotsText(groups: Seq[Grp], sitemaps: Seq[String],
                         varyCase: Boolean): String = {
    val sb = new StringBuilder("# generated\n")
    groups.foreach { g =>
      g.agents.foreach { a =>
        sb.append(if (varyCase) "USER-AGENT: " else "User-agent: ")
          .append(a).append('\n')
      }
      sb.append("# mid-group comment\n")
      g.rules.foreach { case (d, v) =>
        sb.append(d.capitalize).append(": ").append(v).append('\n')
      }
    }
    sitemaps.foreach(s => sb.append("Sitemap: ").append(s).append('\n'))
    sb.toString
  }

  private def expectedRows(groups: Seq[Grp], sitemaps: Seq[String])
      : Seq[(Long, String, String)] = {
    groups.zipWithIndex.flatMap { case (g, gi) =>
      g.agents.map(a => (gi.toLong, "user-agent", a)) ++
        g.rules.map { case (d, v) => (gi.toLong, d, v) }
    } ++ sitemaps.map(s => (-1L, "sitemap", s))
  }

  test("parseRobots round trip: generated group structures parse back exactly") {
    val cases = sample(genRobots, 80, seed = 0xF00D)
    val docs = cases.zipWithIndex.map { case ((gs, sms), i) =>
      (i.toLong, robotsText(gs, sms, varyCase = i % 2 == 0))
    }
    val out = UrlOps.parseRobots(docs.toDF("doc_id", "text"))
      .collect().groupBy(_.getLong(0))
    cases.zipWithIndex.foreach { case ((gs, sms), i) =>
      val got = out.getOrElse(i.toLong, Array.empty)
        .sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getString(3), r.getString(4))).toSeq
      assert(got == expectedRows(gs, sms), s"case $i")
    }
  }

  private case class SmEntry(loc: String, lastmod: Option[String],
                             priority: Option[Double])
  private val genEntry: Gen[SmEntry] = for {
    t <- genToken
    p <- genPath
    esc <- Gen.oneOf(true, false)
    lm <- Gen.option(Gen.chooseNum(1, 28).map(d => f"2025-06-$d%02d"))
    pr <- Gen.option(Gen.chooseNum(0, 10).map(_ / 10.0))
  } yield SmEntry(s"http://$t.example$p" + (if (esc) "?a=1&b=2" else ""),
    lm, pr)

  test("parseSitemap round trip: generated urlset/sitemapindex parse back exactly") {
    val cases = sample(Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, genEntry)), 80, seed = 0x5EED)
    val docs = cases.zipWithIndex.map { case (entries, i) =>
      val isIndex = i % 3 == 0
      val (open, close, tag) =
        if (isIndex) ("<sitemapindex>", "</sitemapindex>", "sitemap")
        else ("<urlset>", "</urlset>", "url")
      val body = entries.map { e =>
        val loc = e.loc.replace("&", "&amp;")
        s"<$tag>\n  <loc> $loc </loc>" +
          e.lastmod.fold("")(l => s"<lastmod>$l</lastmod>") +
          e.priority.fold("")(p => s"<priority>$p</priority>") +
          s"</$tag>"
      }.mkString("\n")
      (i.toLong, s"$open\n$body\n$close")
    }
    val out = UrlOps.parseSitemap(docs.toDF("doc_id", "text"))
      .collect().groupBy(_.getLong(0))
    cases.zipWithIndex.foreach { case (entries, i) =>
      val got = out.getOrElse(i.toLong, Array.empty).sortBy(_.getLong(1))
      assert(got.length == entries.length, s"case $i count")
      got.zip(entries).zipWithIndex.foreach { case ((r, e), j) =>
        assert(r.getLong(1) == j.toLong)
        assert(r.getString(2) == (if (i % 3 == 0) "sitemap" else "url"))
        assert(r.getString(3) == e.loc, s"case $i entry $j loc (escape+trim)")
        assert(Option(r.getString(4)) == e.lastmod)
        assert((if (r.isNullAt(6)) None else Some(r.getDouble(6))) == e.priority)
      }
    }
  }

  // ---- robotsAllowed vs an independent reference ------------------------

  /** Brute-force RFC 9309 §2.2.2: own groups over `*` groups, longest
    * matching non-empty rule wins, allow wins ties, no match → allowed —
    * written directly from the spec text, sharing no code with the
    * Spark implementation. The rule-match PREDICATE is the parameter
    * (prefix for the default mode, [[refGlob]] for wildcards): the
    * precedence machinery is one copy, checked under both matchers. */
  private def refAllowed(groups: Seq[Grp], agent: String, path: String,
                         matches: (String, String) => Boolean =
                           (rule, p) => p.startsWith(rule)): Boolean = {
    val own = groups.filter(_.agents.exists(_.equalsIgnoreCase(agent)))
    val chosen = if (own.nonEmpty) own else groups.filter(_.agents.contains("*"))
    val matching = chosen.flatMap(_.rules)
      .filter { case (d, v) =>
        (d == "allow" || d == "disallow") && v.nonEmpty && matches(v, path)
      }
    if (matching.isEmpty) true
    else {
      val la = matching.collect { case ("allow", v) => v.length }
      val ld = matching.collect { case ("disallow", v) => v.length }
      ld.isEmpty || (la.nonEmpty && la.max >= ld.max)
    }
  }

  /** Wildcard twin of [[refAllowed]]: rules may carry `*` (spans any
    * sequence) and a trailing `$` (end anchor) — implemented here by
    * direct RECURSIVE backtracking glob matching, sharing nothing with
    * the greedy leftmost-locate fold the production matcher
    * ([[UrlOps]] globMatches) uses — two independent algorithms that
    * must agree. */
  private def refGlob(rule: String, path: String): Boolean = {
    val (body, anchored) =
      if (rule.endsWith("$")) (rule.dropRight(1), true) else (rule, false)
    def m(r: Int, p: Int): Boolean =
      if (r == body.length) if (anchored) p == path.length else true
      else if (body(r) == '*')
        (p to path.length).exists(k => m(r + 1, k))
      else p < path.length && path(p) == body(r) && m(r + 1, p + 1)
    m(0, 0)
  }

  private def refAllowedWc(groups: Seq[Grp], agent: String,
                           path: String): Boolean =
    refAllowed(groups, agent, path, refGlob)

  test("wildcard robotsAllowed agrees with a direct glob-matching reference") {
    val agent = "botx"
    // rules drawn from a pool rich in wildcard/anchor/metachar shapes
    val rulePool = Seq("/a", "/a*", "/a*/b", "/*b", "/a$", "/a/b$",
      "/a(x", "/*$", "/a*c$", "/",
      // anchored WITH non-empty middles — the leftmost-locate fold
      // interacting with the suffix position check, the trickiest
      // branch of the linear matcher
      "/a*b*c$", "/a*a*a$", "/*a*b$")
    val genHost: Gen[Seq[Grp]] = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, for {
        nA <- Gen.chooseNum(1, 2)
        agents <- Gen.listOfN(nA, Gen.oneOf("*", "botx", "boty"))
        nR <- Gen.chooseNum(1, 3)
        rules <- Gen.listOfN(nR, for {
          d <- Gen.oneOf("allow", "disallow")
          v <- Gen.oneOf(rulePool)
        } yield (d, v))
      } yield Grp(agents.distinct, rules)))
    val hosts = sample(genHost, 60, seed = 0xDECAF)
    val paths = Seq("/a", "/a/b", "/axc", "/ab", "/a(x/y", "/zb", "/")
    val rules = UrlOps.parseRobots(hosts.zipWithIndex.map { case (gs, h) =>
      (h.toLong, robotsText(gs, Nil, varyCase = false))
    }.toDF("doc_id", "text"))
    val urls = hosts.indices.flatMap(h => paths.zipWithIndex.map { case (p, j) =>
      (h.toLong, h.toLong * 10 + j, p)
    }).toDF("doc_id", "url_id", "path")
    val got = UrlOps.robotsAllowed(rules, urls, agent = agent, wildcards = true)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    hosts.zipWithIndex.foreach { case (gs, h) =>
      paths.zipWithIndex.foreach { case (p, j) =>
        assert(got(h.toLong * 10 + j) == refAllowedWc(gs, agent, p),
          s"host $h path $p groups $gs")
      }
    }
  }

  test("robotsAllowed agrees with the brute-force RFC 9309 reference") {
    val agent = "botx"
    val genHost: Gen[Seq[Grp]] = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, for {
        nA <- Gen.chooseNum(1, 2)
        agents <- Gen.listOfN(nA, Gen.oneOf("*", "botx", "boty"))
        nR <- Gen.chooseNum(1, 3)
        rules <- Gen.listOfN(nR, for {
          d <- Gen.oneOf("allow", "disallow")
          v <- Gen.oneOf("/a", "/a/b", "/a/b/c", "/b", "/")
        } yield (d, v))
      } yield Grp(agents.distinct, rules)))
    val hosts = sample(genHost, 60, seed = 0xA11)
    val paths = Seq("/a", "/a/b", "/a/b/c/d", "/b/x", "/c")
    val rules = UrlOps.parseRobots(hosts.zipWithIndex.map { case (gs, h) =>
      (h.toLong, robotsText(gs, Nil, varyCase = false))
    }.toDF("doc_id", "text"))
    val urls = hosts.indices.flatMap(h => paths.zipWithIndex.map { case (p, j) =>
      (h.toLong, h.toLong * 10 + j, p)
    }).toDF("doc_id", "url_id", "path")
    val got = UrlOps.robotsAllowed(rules, urls, agent = agent)
      .select("url_id", "allowed").as[(Long, Boolean)].collect().toMap
    hosts.zipWithIndex.foreach { case (gs, h) =>
      paths.zipWithIndex.foreach { case (p, j) =>
        assert(got(h.toLong * 10 + j) == refAllowed(gs, agent, p),
          s"host $h path $p groups $gs")
      }
    }
  }
}
