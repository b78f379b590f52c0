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
}
