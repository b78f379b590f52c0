package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** URL/domain-aware curation for web-crawl training corpora: parse URLs
  * into (scheme, host, port, path, query), reduce hosts to registrable
  * domains (eTLD+1 against a public-suffix list), and run the standard
  * crawl hygiene on top — per-domain caps, domain blocklists, domain mix
  * stats, canonical-URL dedup. Mirrors the curation surface crawl
  * pipelines (CCNet/RefinedWeb-style) put between fetch and text
  * filtering.
  *
  * Everything is a regexp/string projection — codegen'd, scan-parallel,
  * no UDFs — and every regex is written in the Java∩RE2 common subset
  * (char classes and anchors only) so a DuckDB oracle evaluates the
  * SAME pattern: Spark and DuckDB both return '' for a non-matching
  * extract, which is why empty components stay '' rather than null
  * (ports are the exception: nullif('')→long). At 100 TB the only
  * shuffles here are the per-domain aggregations, keyed on registrable
  * domain — bounded by web domain cardinality (~10⁸), never corpus
  * size. */
object UrlOps {

  /** scheme capture: `https://…` → `https`; '' when the value has no
    * scheme (protocol-relative or garbage rows parse as empty, never
    * error — crawl data is dirty by definition). */
  val SchemeRe = "^([a-z][a-z0-9+.-]*)://"
  /** authority (host[:port]) capture — everything between `://` and the
    * first `/`, `?` or `#`. Userinfo is intentionally NOT split off:
    * synthetic-credential URLs are rare crawl noise and keeping the
    * regex in the RE2∩Java subset beats special-casing them. */
  val HostPortRe = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
  val QueryRe = "[?]([^#]*)"

  /** Public suffixes recognised by [[registrableDomain]], longest-match
    * first. A deliberately small built-in default (the full Mozilla PSL
    * is ~9k entries — pass it in when fidelity matters; the MECHANISM is
    * identical, a longest-suffix match). */
  val DefaultSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "com.au", "co.jp", "com.br",
    "com", "org", "net", "io", "gov", "edu", "mil", "int")

  def scheme(url: Column): Column = regexp_extract(url, SchemeRe, 1)
  def hostPort(url: Column): Column = regexp_extract(url, HostPortRe, 1)
  def host(url: Column): Column =
    lower(regexp_extract(hostPort(url), "^([^:]+)", 1))
  def port(url: Column): Column =
    nullif(regexp_extract(hostPort(url), ":([0-9]+)$", 1), lit(""))
      .cast(LongType)
  def path(url: Column): Column = regexp_extract(url, PathRe, 1)
  def query(url: Column): Column = regexp_extract(url, QueryRe, 1)

  /** Registrable domain (eTLD+1): the last host label before the longest
    * matching public suffix, e.g. `a.b.evil.co.uk` → `evil.co.uk`. Falls
    * back to the last two labels when no suffix matches, and to the bare
    * host when it has no dot (intranet-style names group as themselves).
    *
    * A static when-chain over the suffix list, longest suffix first —
    * one codegen'd RLIKE+extract per suffix, no lambda, no join: the
    * suffix list is pipeline CONFIG (bounded, known at plan time), so it
    * belongs in the plan the same way the PQ codebook does. */
  def registrableDomain(hostCol: Column,
                        suffixes: Seq[String] = DefaultSuffixes): Column = {
    val ordered = suffixes.distinct
      .sortBy(s => (-s.count(_ == '.'), -s.length, s))
    val chain = ordered.foldLeft(Option.empty[Column]) { (acc, s) =>
      val quoted = s.split('.').mkString("[.]")
      val branch = regexp_extract(hostCol, s"([^.]+[.]$quoted)$$", 1)
      val cond = hostCol.rlike(s"[.]$quoted$$")
      Some(acc.fold(when(cond, branch))(_.when(cond, branch)))
    }.get
    chain.otherwise(
      when(hostCol.rlike("[.]"),
        regexp_extract(hostCol, "([^.]+[.][^.]+)$", 1))
        .otherwise(hostCol))
  }

  /** Anchor-tag / href patterns for [[extractLinks]] — RE2-safe: inline
    * `(?is)` flags, no backrefs (the three value styles are SEPARATE
    * patterns coalesced per tag, since one pattern would need a
    * backreference to pair the quotes), and whitespace spelled as the
    * explicit `[ \t\n\f\r]` class (Java's `\s` includes VT U+000B,
    * RE2's does not — the engine-parity discipline the file header
    * states).
    *
    * The tag body allows quoted runs (`"[^"]*"` / `'[^']*'`) so a `>`
    * INSIDE a quoted attribute value does not truncate the tag (HTML
    * permits it); the tradeoff is that a malformed UNCLOSED quote can
    * over-consume to a later `>` — the conservative failure for an
    * extractor (a dropped mangled tag, never a crash).
    *
    * `href` must be preceded by whitespace or a quote (`[ \t\n\f\r"']`)
    * so `data-href=` / `xlink:href=` / `ng-href=` never match — `-`
    * and `:` are non-word chars, so a bare `\bhref` WOULD match those
    * and extract tracker/template URLs instead of the real link (RE2
    * has no lookbehind, hence the one-char prefix class; inside a tag
    * string a real href attribute always has a predecessor char). */
  val ATagPattern = "(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
  val HrefDqPattern =
    "(?i)[ \\t\\n\\f\\r\"']href[ \\t\\n\\f\\r]*=[ \\t\\n\\f\\r]*\"([^\"]*)\""
  val HrefSqPattern =
    "(?i)[ \\t\\n\\f\\r\"']href[ \\t\\n\\f\\r]*=[ \\t\\n\\f\\r]*'([^']*)'"
  /** Unquoted attribute values are valid HTML (`href=http://x/`): the
    * value runs to the next whitespace (a bare `>` cannot occur inside
    * the tag match — it would have ended the tag). Tried LAST, and the
    * first value char excludes quotes so a quoted value never
    * half-matches here. */
  val HrefBarePattern =
    "(?i)[ \\t\\n\\f\\r\"']href[ \\t\\n\\f\\r]*=[ \\t\\n\\f\\r]*" +
      "([^ \\t\\n\\f\\r\"'][^ \\t\\n\\f\\r]*)"

  /** Extract outbound links from raw MARKUP — run BEFORE
    * [[graft.ops.TextOps.stripHtml]] (the cleaning pass deletes exactly
    * what this reads): one row per href-carrying anchor tag,
    * `(idCol, link_pos, href)`. `link_pos` is the 0-based ordinal of
    * the anchor TAG in the document — an href-less anchor occupies a
    * position but emits no row, so the numbering of the links around it
    * does not shift when decorative anchors are edited.
    *
    * This is the crawl-graph construction step: compose with
    * [[parseUrls]] for per-link hosts/registrable domains and feed
    * (page domain → link domain) edges to [[Graph.pageRank]] /
    * [[Graph.trustRank]] for link-spam scoring — every downstream piece
    * already exists; this is the seam between markup and the URL layer.
    *
    * Scale shape: one regexp extraction + posexplode + two per-tag
    * regexes — zero shuffle, no window (the position comes from the
    * array subscript, not a row_number), stream-admissible. Output is
    * O(anchors), a small fraction of page bytes, so the link stream
    * SHRINKS relative to the crawl. */
  def extractLinks(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit(ATagPattern), lit(0)))
          .as(Seq("link_pos", "_el_tag")))
      .select(col(idCol), col("link_pos").cast(LongType),
        coalesce(
          nullif(regexp_extract(col("_el_tag"), HrefDqPattern, 1), lit("")),
          nullif(regexp_extract(col("_el_tag"), HrefSqPattern, 1), lit("")),
          nullif(regexp_extract(col("_el_tag"), HrefBarePattern, 1), lit("")))
          .as("href"))
      .filter(col("href").isNotNull)

  /** `docs` plus (scheme, host, port, path, query, domain) parsed from
    * `urlCol` — the parse projection every operator below builds on. */
  def parseUrls(docs: DataFrame, urlCol: String = "url",
                suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    val u = col(urlCol)
    // host feeds two consumers (its own column + the domain chain);
    // materialise it through a Generate barrier so project-collapse
    // cannot inline the extract once per suffix branch
    docs
      .withColumn("_up_host", explode(array(host(u))))
      .select(col("*"),
        scheme(u).as("scheme"),
        col("_up_host").as("host"),
        port(u).as("port"),
        path(u).as("path"),
        query(u).as("query"),
        registrableDomain(col("_up_host"), suffixes).as("domain"))
      .drop("_up_host")
  }

  /** Per-domain quota: keep the `cap` lowest-id documents of each
    * registrable domain — [[Curate.capPerSource]] with the domain as the
    * source key, the crawl-dominance guard that stops one site from
    * flooding the corpus. Same scale shape: bounded MinKIds aggregation
    * + broadcast semi-join, the corpus never shuffles. */
  def capPerDomain(docs: DataFrame, cap: Int, urlCol: String = "url",
                   idCol: String = "doc_id",
                   suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    val withDomain = docs.withColumn("_cpd_domain",
      registrableDomain(host(col(urlCol)), suffixes))
    Curate.capPerSource(withDomain, cap, sourceCol = "_cpd_domain",
      idCol = idCol).drop("_cpd_domain")
  }

  /** Drop documents whose registrable domain is on `blocked` (exact
    * eTLD+1 match, so `evil.com` blocks `a.b.evil.com` too — subdomains
    * reduce to the same registrable domain). The Seq overload plans as a
    * codegen'd IN over plan-time config; use the DataFrame overload when
    * the blocklist is data (millions of rows → broadcast/shuffle anti
    * join as size dictates). */
  def dropBlockedDomains(docs: DataFrame, blocked: Seq[String],
                         urlCol: String = "url",
                         suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    require(blocked.nonEmpty, "blocked must not be empty")
    docs.filter(
      !registrableDomain(host(col(urlCol)), suffixes)
        .isin(blocked.map(_.toLowerCase): _*))
  }

  def dropBlockedDomains(docs: DataFrame, blocklist: DataFrame,
                         urlCol: String): DataFrame = {
    val blocked = blocklist.select(lower(col(blocklist.columns.head)).as("_bl_domain"))
    docs.join(blocked,
      registrableDomain(host(col(urlCol))) === col("_bl_domain"), "left_anti")
  }

  /** Domain mix: per-registrable-domain document count and corpus share —
    * the monitoring stat behind per-domain caps and mixture weights. One
    * map-side-combined aggregation keyed on domain; the share divides by
    * a broadcast scalar total (never an empty-partition window). */
  def domainMix(docs: DataFrame, urlCol: String = "url",
                suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    val counts = docs
      .select(registrableDomain(host(col(urlCol)), suffixes).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"),
        round(col("n_docs").cast("double") / col("_total"), 6).as("share"))
  }

  /** Canonical URL: lower-cased host, default ports dropped (80 for
    * http, 443 for https), query and fragment dropped, empty path → `/`,
    * single trailing slash stripped from non-root paths. The standard
    * crawl-frontier normalisation — two URLs that differ only in these
    * fetch the same page. */
  def canonicalUrl(url: Column): Column = {
    val s = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p.isNotNull &&
      !(s === "http" && p === 80L) && !(s === "https" && p === 443L)
    val rawPath = path(url)
    val normPath = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    concat(s, lit("://"), h,
      when(keepPort, concat(lit(":"), p.cast("string"))).otherwise(lit("")),
      normPath)
  }

  /** Exact URL dedup after [[canonicalUrl]] normalisation: one survivor
    * per canonical URL, the lowest id (the family's deterministic
    * survivor rule). Output `(idCol, url_canon)`. One hash aggregation
    * keyed on the canonical string — at crawl scale the canonical URL is
    * the natural shuffle key and the output is frontier-sized. */
  def dedupUrls(docs: DataFrame, urlCol: String = "url",
                idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), canonicalUrl(col(urlCol)).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("url_canon"))

  /** SURT-ordered URL key (Sort-friendly URI Reordering Transform —
    * the key web-archive CDX indexes sort and range-scan by): host
    * labels REVERSED and comma-joined (`site.example.com` →
    * `com,example,site`), then `)` and the path (empty → `/`), then
    * `?query` when present. Scheme and port are dropped (the lookup
    * identity ignores both), host lowercased by [[host]]. Reversing the
    * labels puts every subdomain of a registrable domain in one
    * contiguous key range — the property that makes prefix scans over
    * an archive index work. A pure codegen'd projection. */
  def surtKey(url: Column): Column = {
    val h = host(url)
    val p = path(url)
    val q = query(url)
    // non-hierarchical URIs (dns:example.com, urn:…, filedesc:… — all
    // present in real crawl WARCs) have no `scheme://authority`, so the
    // key is NULL rather than a colliding `)/` garbage bucket; index
    // writers coalesce to the raw URI when they want those rows keyed
    when(h === "", lit(null).cast("string")).otherwise(concat(
      array_join(reverse(split(h, "[.]")), ","), lit(")"),
      when(p === "", lit("/")).otherwise(p),
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  // ---- robots.txt (RFC 9309 Robots Exclusion Protocol) --------------------

  /** Parse robots.txt documents into directive rows — the crawl-
    * pipeline permission primitive BEFORE any fetch enters the corpus
    * (composes with [[parseUrls]]/[[capPerDomain]] and the WARC family;
    * crawl corpora ship robots captures as ordinary records). One row
    * per recognised directive, in file order:
    * `(idCol, rule_pos, grp, directive, value)` where `grp` numbers the
    * RFC group the directive belongs to and `-1` marks group-less
    * records (`sitemap`).
    *
    * Grammar handled (RFC 9309 §2.2): `#` comments stripped; blank /
    * colon-less lines ignored; keys case-insensitive; a RUN of
    * consecutive `user-agent` lines opens ONE group (they share its
    * rules); `allow` / `disallow` / `crawl-delay` attach to the current
    * group — rules BEFORE any group are ignored per spec; `sitemap` is
    * a standalone record (`grp` = -1); unknown keys are ignored and,
    * like any non-user-agent line, end a user-agent run. Values keep
    * everything after the FIRST colon (sitemap URLs carry colons).
    *
    * A zero-shuffle projection: the whole group-assignment pass is one
    * `aggregate` fold over the line array inside the row (robots files
    * are KB-sized — per-row state is bounded by the file), so the same
    * call runs on a stream of arriving robots captures. */
  def parseRobots(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    // SQL lambdas get no common-subexpression elimination (r11 lesson) —
    // key/value re-derive per branch, bounded by robots-file line counts
    def k(l: String) = s"lower(trim(substring($l, 1, instr($l, ':') - 1)))"
    def v(l: String) = s"trim(substring($l, instr($l, ':') + 1))"
    val acc = "named_struct('grp', %s, 'prevua', %s, 'out', %s)"
    val entry = "named_struct('grp', %s, 'directive', %s, 'value', %s)"
    val parsed = expr(s"""
      aggregate(
        transform(split(coalesce($textCol, ''), '\r?\n'),
          l -> trim(regexp_replace(l, '#.*', ''))),
        ${acc.format("cast(-1 as int)", "false",
          "cast(array() as array<struct<grp: int, directive: string, value: string>>)")},
        (acc, l) -> CASE
          WHEN l = '' OR instr(l, ':') = 0
            THEN ${acc.format("acc.grp", "false", "acc.out")}
          WHEN ${k("l")} = 'user-agent'
            THEN ${acc.format(
              "if(acc.prevua, acc.grp, acc.grp + 1)", "true",
              "array_append(acc.out, " + entry.format(
                "if(acc.prevua, acc.grp, acc.grp + 1)", "'user-agent'", v("l")) + ")")}
          WHEN ${k("l")} IN ('allow', 'disallow', 'crawl-delay') THEN
            ${acc.format("acc.grp", "false",
              "if(acc.grp >= 0, array_append(acc.out, " +
                entry.format("acc.grp", k("l"), v("l")) + "), acc.out)")}
          WHEN ${k("l")} = 'sitemap'
            THEN ${acc.format("acc.grp", "false",
              "array_append(acc.out, " +
                entry.format("cast(-1 as int)", "'sitemap'", v("l")) + ")")}
          ELSE ${acc.format("acc.grp", "false", "acc.out")}
        END
      ).out""")
    docs
      .select(col(idCol), posexplode(parsed).as(Seq("rule_pos", "_rb")))
      .select(col(idCol), col("rule_pos").cast(LongType),
        col("_rb.grp").cast(LongType).as("grp"),
        col("_rb.directive").as("directive"), col("_rb.value").as("value"))
  }

  /** The RFC 9309 §2.2.2 group-selection shared by [[robotsAllowed]]
    * and [[crawlSchedule]]: per key, the agent's OWN group(s) when any
    * user-agent line equals it (case-insensitive, exact product token),
    * else the `*` group(s). Output `(_rg_key, _rg_grp)`. */
  private def chosenGroups(rules: DataFrame, agent: String,
                           keyCol: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    rules
      .filter(col("directive") === "user-agent")
      .select(col(keyCol).as("_rg_key"), col("grp").as("_rg_grp"),
        lower(col("value")).as("_rg_agent"))
      .groupBy(col("_rg_key"), col("_rg_grp"))
      .agg(max(when(col("_rg_agent") === agentLc, 1).otherwise(0)).as("_rg_own"),
        max(when(col("_rg_agent") === "*", 1).otherwise(0)).as("_rg_star"))
      .withColumn("_rg_any_own",
        max(col("_rg_own")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("_rg_key"))))
      .filter((col("_rg_any_own") === 1 && col("_rg_own") === 1) ||
        (col("_rg_any_own") === 0 && col("_rg_star") === 1))
      .select(col("_rg_key"), col("_rg_grp"))
  }

  /** Which URLs may `agent` fetch, under [[parseRobots]] rules — RFC
    * 9309 §2.2.2 matching: the agent's OWN group(s) when any user-agent
    * line equals it (case-insensitive, exact product token — substring
    * matching is out of scope, documented), else the `*` group(s); among
    * the chosen groups' non-empty `allow`/`disallow` rules, the LONGEST
    * rule matching the URL path as a prefix decides, `allow` winning
    * ties; URLs matching no rule — or keys with no applicable group —
    * are allowed. Empty-value rules are the RFC's explicit no-op.
    *
    * With `wildcards = false` (the default), `$`/`*` in rules are NOT
    * interpreted — they participate as literal prefix characters; the
    * standard marks wildcard support optional. With `wildcards = true`
    * the §2.2.3 special characters apply: `*` matches any character
    * sequence (including newlines — every non-wildcard character is
    * LITERAL, there is no regex engine underneath), a TRAILING `$`
    * anchors the match at the path's end, and the most-specific-rule
    * precedence stays rule-string LENGTH (the published convention for
    * wildcard rules); wildcard-free rules match identically under both
    * modes. Matching is the greedy LINEAR glob algorithm (split on `*`,
    * prefix-check the first segment, leftmost-locate each middle
    * segment, suffix-check the last when anchored) expressed as a SQL
    * lambda fold — a hostile rule value can never inject a pattern,
    * throw, or trigger the exponential backtracking a `.*`-chain regex
    * translation invites (robots.txt is attacker-controlled input by
    * definition; a dozen `*`s must stay O(path), not wedge a task).
    *
    * `rules` and `urls` join on `keyCol` (typically the HOST the robots
    * file governs). Output: `urls` plus a boolean `allowed`. Scale
    * shape: rules are robots-sized per key, so the join is hash-
    * partitioned on the natural crawl key (or broadcast when the rule
    * frame is small); per-URL work is bounded by that host's rule
    * count; one aggregation keyed by the url row id. */
  /** Greedy linear glob match of `path` against pre-split rule
    * segments (`segs` = the rule body split on `*`, empties KEPT so
    * leading/trailing stars read back; `anch` = the rule carried a
    * trailing `$`): the first segment must be a prefix, each middle
    * segment is consumed at its LEFTMOST occurrence after the current
    * position (the classic optimal strategy for `*`-globs), and when
    * anchored the last segment must be a suffix starting at or after
    * the position the middles reached. O(|path|·segments), no regex —
    * see [[robotsAllowed]]'s wildcard contract. */
  private[graft] def globMatches(path: Column, segs: Column, anch: Column): Column = {
    val n = size(segs)
    val first = element_at(segs, 1)
    val last = element_at(segs, -1)
    val startOk = path.startsWith(first)
    val init = when(startOk, length(first) + lit(1)).otherwise(lit(-1))
    // middles: segments 2..n-1 when anchored (the last is the suffix),
    // 2..n otherwise; empty segments (consecutive stars) are no-ops
    val midLen = when(anch, greatest(n - lit(2), lit(0))).otherwise(n - lit(1))
    val middles = filter(slice(segs, lit(2), midLen), s => s =!= "")
    val acc = aggregate(middles, init, (a, seg) =>
      when(a < 0, a).otherwise {
        val p = call_function("locate", seg, path, a)
        when(p > 0, p + length(seg)).otherwise(lit(-1))
      })
    val generic = when(anch,
      acc >= 0 && path.endsWith(last) &&
        (length(path) - length(last) + lit(1) >= acc))
      .otherwise(acc >= 0)
    // a star-less rule has one segment that is BOTH first and last:
    // anchored means exact equality, unanchored plain prefix
    when(n === 1, when(anch, path === first).otherwise(startOk))
      .otherwise(generic)
  }

  def robotsAllowed(rules: DataFrame, urls: DataFrame, agent: String,
                    keyCol: String = "doc_id", pathCol: String = "path",
                    urlIdCol: String = "url_id",
                    wildcards: Boolean = false): DataFrame = {
    val activePlain = rules
      .filter(col("directive").isin("allow", "disallow") && col("value") =!= "")
      .select(col(keyCol).as("_rg_key"), col("grp").as("_rg_grp"),
        col("directive").as("_ra_dir"), col("value").as("_ra_rule"))
      .join(chosenGroups(rules, agent, keyCol), Seq("_rg_key", "_rg_grp"))
    // wildcard prep is PER RULE ROW, before the join fans rules out
    // over the frontier: anchor flag + star-split segments computed
    // once per rule, so the per-(url, rule) work is just the fold
    val active =
      if (!wildcards) activePlain
      else activePlain
        .withColumn("_ra_anch", col("_ra_rule").endsWith("$"))
        .withColumn("_ra_segs", split(
          when(col("_ra_anch"),
            expr("substring(_ra_rule, 1, length(_ra_rule) - 1)"))
            .otherwise(col("_ra_rule")),
          "[*]", -1))
    val ruleMatches =
      if (!wildcards) urls(pathCol).startsWith(col("_ra_rule"))
      else globMatches(urls(pathCol), col("_ra_segs"), col("_ra_anch"))
    // verdicts key on (host key, url id) — url ids need only be unique
    // WITHIN their host (the natural per-host frontier ordinal shape);
    // an id-only group would merge rule matches across hosts
    val matched = urls
      .join(active,
        urls(keyCol) === active("_rg_key") && ruleMatches,
        "left")
      .groupBy(urls(keyCol).as("_ra_ukey"), urls(urlIdCol).as("_ra_uid"))
      .agg(
        max(when(col("_ra_dir") === "allow", length(col("_ra_rule")))).as("_ra_la"),
        max(when(col("_ra_dir") === "disallow", length(col("_ra_rule")))).as("_ra_ld"))
      .withColumn("allowed",
        col("_ra_ld").isNull ||
          (col("_ra_la").isNotNull && col("_ra_la") >= col("_ra_ld")))
      .select(col("_ra_ukey"), col("_ra_uid"), col("allowed"))
    urls.join(matched,
        urls(keyCol) === matched("_ra_ukey") &&
          urls(urlIdCol) === matched("_ra_uid"), "left")
      .drop("_ra_ukey", "_ra_uid")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }

  /** Per-key COMPILED robots verdict tables — the STATIC side of the
    * streaming permission join ([[graft.stream.StreamFrontier]]), and a
    * reusable batch artifact: the RFC 9309 §2.2.2 chosen groups' active
    * `allow`/`disallow` rules collected into ONE array per key (robots
    * files are KB-sized, so the array is bounded by that host's rule
    * count) plus the effective `crawl-delay` (chosen-group precedence,
    * MAX over lines in scope — [[crawlSchedule]]'s exact lookup). With
    * `wildcards = true` the per-rule glob prep (trailing-`$` anchor
    * flag, star-split segments) is computed here ONCE per rule — never
    * per (url, rule) after the join fans out.
    *
    * Output: `(keyCol, rules array<struct<dir, rule, segs, anch>>,
    * delay_s)` — `rules` empty (not null) for keys that only carry a
    * delay; keys with neither emit no row (arrivals left-join to the
    * RFC's allow-by-default). Against this frame a per-URL verdict is a
    * per-row fold ([[graft.stream.StreamFrontier.permit]] — longest
    * matching rule per direction, allow wins ties), so the arrival side
    * needs NO aggregation: the stream-admissible reformulation of
    * [[robotsAllowed]], spec-pinned verdict-identical to it. */
  def compiledRobots(rules: DataFrame, agent: String,
                     keyCol: String = "doc_id",
                     wildcards: Boolean = false): DataFrame = {
    // built ONCE and shared by the rules join and the delay join —
    // inlining it twice would scan + window-aggregate the rules frame
    // twice per evaluation (and a streaming consumer re-evaluates the
    // static side every micro-batch)
    val chosen = chosenGroups(rules, agent, keyCol)
    val activePlain = rules
      .filter(col("directive").isin("allow", "disallow") && col("value") =!= "")
      .select(col(keyCol).as("_rg_key"), col("grp").as("_rg_grp"),
        col("directive").as("dir"), col("value").as("rule"))
      .join(chosen, Seq("_rg_key", "_rg_grp"))
    val active =
      if (!wildcards) activePlain
        .withColumn("anch", lit(false))
        .withColumn("segs", array(col("rule")))
      else activePlain
        .withColumn("anch", col("rule").endsWith("$"))
        .withColumn("segs", split(
          when(col("anch"),
            expr("substring(rule, 1, length(rule) - 1)"))
            .otherwise(col("rule")),
          "[*]", -1))
    val ruleTables = active
      .groupBy(col("_rg_key"))
      .agg(collect_list(struct(col("dir"), col("rule"), col("segs"),
        col("anch"))).as("rules"))
    val delays = rules
      .filter(col("directive") === "crawl-delay")
      .select(col(keyCol).as("_rg_key"), col("grp").as("_rg_grp"),
        expr("try_cast(value AS double)").as("_cr_delay"))
      .join(chosen, Seq("_rg_key", "_rg_grp"))
      .groupBy(col("_rg_key"))
      .agg(max(col("_cr_delay")).as("delay_s"))
    ruleTables.join(delays, Seq("_rg_key"), "full_outer")
      .select(col("_rg_key").as(keyCol),
        coalesce(col("rules"),
          array().cast("array<struct<dir:string,rule:string," +
            "segs:array<string>,anch:boolean>>")).as("rules"),
        col("delay_s"))
  }

  // ---- sitemaps (sitemaps.org protocol 0.9) --------------------------------

  /** `<url>` / `<sitemap>` entry blocks — lazy body so one pattern walks
    * the whole file without backtracking blowups, and the element name
    * anchored with `(?:[ \t\n\f\r][^>]*)?>` so `<url>` never
    * half-matches `<urlset>` (after the tag name only whitespace-then-
    * attribute-tail or the closing `>` may follow) while an entry
    * element CARRYING attributes — `<url xhtml:dummy="x">`, common in
    * image/video extension sitemaps — still parses instead of silently
    * dropping to zero rows. Namespace-PREFIXED tags (`<sm:url>`) remain
    * out of scope: the protocol's own examples bind the sitemap schema
    * as the default namespace, and a prefix rebind would have to thread
    * through every child extract too — documented contract, not a gap.
    * RE2∩Java subset as the file header requires (lazy quantifiers are
    * in both engines; no lookarounds, no backrefs, so the close tag is
    * matched by alternation — a malformed cross-closed pair truncates at
    * the first close tag, the conservative extractor failure). */
  val SitemapEntryPattern =
    "(?is)<(?:url|sitemap)(?:[ \\t\\n\\f\\r][^>]*)?>.*?" +
      "</[ \\t\\n\\f\\r]*(?:url|sitemap)[ \\t\\n\\f\\r]*>"

  /** Text of child element `tag` inside an entry block: `[^<]*` keeps
    * the capture inside the element (no nested markup in sitemap leaf
    * tags per protocol), trimmed — the spec requires trimming
    * surrounding whitespace inside value tags. */
  private def sitemapChild(el: Column, tag: String): Column =
    trim(regexp_extract(el,
      s"(?is)<$tag(?:[ \\t\\n\\f\\r][^>]*)?>([^<]*)</", 1))

  /** Undo the five XML predefined entities (sitemaps.org REQUIRES
    * entity-escaping URLs in `<loc>`). `&amp;` is replaced LAST so a
    * double-escaped `&amp;lt;` round-trips to the literal `&lt;` instead
    * of collapsing to `<` — literal `replace` chains, zero regex. */
  def xmlUnescape(text: Column): Column =
    replace(replace(replace(replace(replace(text,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&apos;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Parse sitemap XML documents (sitemaps.org protocol 0.9) into entry
    * rows — the crawl-frontier SOURCE the robots.txt `sitemap` records
    * (see [[parseRobots]]) point at: one row per `<url>` (urlset files)
    * or `<sitemap>` (sitemapindex files) element carrying a `<loc>`,
    * in file order:
    * `(idCol, entry_pos, kind, loc, lastmod, changefreq, priority)`.
    *
    * Semantics pinned: `kind` is `url` / `sitemap` by element name;
    * `entry_pos` is the 0-based ordinal of the entry ELEMENT in the
    * document — a loc-less entry occupies a position but emits no row
    * (the [[extractLinks]] numbering discipline, so editing a mangled
    * entry never renumbers its neighbours); `<loc>` values are
    * whitespace-trimmed and XML-entity-unescaped ([[xmlUnescape]] — the
    * protocol requires escaping `&` in URLs); `lastmod` / `changefreq`
    * are null when absent (`changefreq` lowercased — its vocabulary is
    * an enumerated token set); `priority` is a double, null when absent
    * or non-numeric (`try_cast` — dirty values degrade to null, never
    * throw); non-XML garbage parses to zero rows, total by construction.
    *
    * Scale shape: one regexp extraction + posexplode + per-entry child
    * extracts — zero shuffle, stream-admissible, memory bounded by one
    * sitemap file (the protocol caps files at 50k entries / 50 MB). */
  def parseSitemap(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(regexp_extract_all(col(textCol),
          lit(SitemapEntryPattern), lit(0)))
          .as(Seq("entry_pos", "_el")))
      .select(col(idCol), col("entry_pos").cast(LongType),
        when(col("_el").rlike("(?is)^<url(?:[ \\t\\n\\f\\r][^>]*)?>"), lit("url"))
          .otherwise(lit("sitemap")).as("kind"),
        nullif(xmlUnescape(sitemapChild(col("_el"), "loc")), lit(""))
          .as("loc"),
        nullif(sitemapChild(col("_el"), "lastmod"), lit("")).as("lastmod"),
        nullif(lower(sitemapChild(col("_el"), "changefreq")), lit(""))
          .as("changefreq"),
        sitemapChild(col("_el"), "priority").as("_sm_prio"))
      .withColumn("priority", expr("try_cast(_sm_prio AS double)"))
      .drop("_sm_prio")
      .filter(col("loc").isNotNull)

  /** Per-host politeness schedule: assign each URL a fetch slot and a
    * start offset honouring the host's `crawl-delay` (RFC 9309 extension
    * key, parsed by [[parseRobots]]) — the dispatch step between the
    * permission join ([[robotsAllowed]]) and the fetcher. URLs are
    * slotted in `urlIdCol` order within their key (deterministic replay
    * order); `offset_s` = slot × the host's effective delay, where the
    * delay comes from the agent's own group when one exists, else the
    * `*` group (the §2.2.2 precedence [[robotsAllowed]] applies to
    * rules), else `defaultDelay`; several delay lines in scope take the
    * MAX (the conservative read). Output: `urls` plus
    * `(slot, delay_s, offset_s)`.
    *
    * DELIBERATE precedence corner (test-pinned): when the agent's OWN
    * group exists but carries no `crawl-delay` while the `*` group does,
    * the own group wins group selection (§2.2.2 — exactly as
    * [[robotsAllowed]] selects rules) and `defaultDelay` applies; the
    * `*` group's delay is NOT consulted. Group selection is all-or-
    * nothing per the RFC — a site that names an agent explicitly has
    * replaced the generic policy for it wholesale, and cherry-picking
    * the `*` delay back in would make the two operators disagree about
    * which group governs the same agent. Operators wanting the more
    * conservative read set `defaultDelay` to their fleet-wide floor.
    *
    * Scale shape: one window partitioned by the host key — the natural
    * crawl shuffle key, partitions bounded by per-host frontier size —
    * plus a robots-sized delay lookup joined on the same key. */
  def crawlSchedule(urls: DataFrame, rules: DataFrame, agent: String,
                    defaultDelay: Double = 1.0, keyCol: String = "doc_id",
                    urlIdCol: String = "url_id"): DataFrame = {
    val delays = rules
      .filter(col("directive") === "crawl-delay")
      .select(col(keyCol).as("_rg_key"), col("grp").as("_rg_grp"),
        expr("try_cast(value AS double)").as("_cs_delay"))
      .join(chosenGroups(rules, agent, keyCol), Seq("_rg_key", "_rg_grp"))
      .groupBy(col("_rg_key"))
      .agg(max(col("_cs_delay")).as("_cs_delay"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(urls(keyCol)).orderBy(urls(urlIdCol))
    urls
      .join(delays, urls(keyCol) === delays("_rg_key"), "left")
      .drop("_rg_key")
      .withColumn("slot", row_number().over(w).cast(LongType) - 1)
      .withColumn("delay_s", coalesce(col("_cs_delay"), lit(defaultDelay)))
      .drop("_cs_delay")
      .withColumn("offset_s", col("slot").cast("double") * col("delay_s"))
  }
}
