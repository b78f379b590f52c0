package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: reproducible sampling, per-source
  * quotas, blocklist/PII scrubbing, and eval-set decontamination. All are
  * single-pass projections / one-shuffle windows — no randomness (hash
  * determinism means retries, speculative tasks, and re-runs agree), no
  * driver-side data movement. */
object Curate {

  /** Deterministic hash sample: keeps rows whose salted id hash lands in
    * `[0, percent)` of 100 buckets. Unlike `rand()`-based sampling this is
    * reproducible across runs/retries and consistent for the same id
    * across datasets (a row's fate is a pure function of salt + id), which
    * is what makes sampled pipelines debuggable at 100 TB. The `salt`
    * decorrelates different sampling decisions over the same ids —
    * without it, composing two hash-based filters keeps min(rateA, rateB)
    * instead of rateA × rateB. */
  def sampleByHash(df: DataFrame, idCol: String, percent: Int,
                   mode: HashMode = HashMode.Default,
                   salt: String = "sample"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.filter(pmod(mode.hash(lit(salt), col(idCol)), lit(100L)) < percent)
  }

  /** Per-source quota: keep the `cap` lowest-id documents of each source —
    * the Common-Crawl-style dominance guard that stops one source from
    * flooding the corpus.
    *
    * Scale shape: a `row_number` window would shuffle and sort the WHOLE
    * corpus just to discard everything past the cap. Instead a bounded
    * [[TopK.MinKIds]] aggregation reduces each input partition to ≤ cap
    * ids per source before its (tiny) exchange, and the kept
    * (source, id) set — O(sources × cap) rows — broadcast-semi-joins back
    * against the corpus: the corpus itself is never shuffled. Assumes ids
    * are unique within a source (duplicated ids would all survive the
    * semi-join where the window kept one). */
  def capPerSource(docs: DataFrame, cap: Int, sourceCol: String = "source",
                   idCol: String = "doc_id",
                   broadcastMaxRows: Long = 4L << 20): DataFrame = {
    require(cap > 0, "cap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = docs
      .select(col(sourceCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK.minKIds(cap))
      .flatMap { case (src, ids) => ids.map(src -> _) }
      .toDF("_cap_src", "_cap_id")
    // broadcast guard: the kept set is O(sources × cap) rows — fine for
    // corpus-shaped source cardinalities, but a near-unique source column
    // would OOM the driver. The kept frame is persisted (MEMORY_AND_DISK,
    // the Dataset.persist default) and counted — an eager guard job whose
    // aggregation work the semi-join below then reuses, no extra corpus
    // scan — and the broadcast hint is dropped when the exact count
    // exceeds the bound. The cached kept frame lives until the
    // ContextCleaner GCs it; long-lived sessions calling this in a loop
    // should clearCache() between batches.
    val keptSmall = Caching.ensureCachedLazy(kept).count() <= broadcastMaxRows
    // null-safe on the source key: a null source is a group like any other
    // (a plain === join would silently drop it)
    docs.join(if (keptSmall) broadcast(kept) else kept,
      col(sourceCol) <=> col("_cap_src") && col(idCol) === col("_cap_id"),
      "left_semi")
  }

  /** Stratified sample: the `k` lowest-salted-hash documents of every
    * stratum (the distinct value combinations of `strataCols`) — exact
    * per-stratum quotas with [[sampleByHash]]'s reproducibility (a row's
    * fate is a pure function of salt + id, never `rand()`), the balanced
    * complement to [[capPerSource]]'s lowest-id quota.
    *
    * Scale shape mirrors [[capPerSource]]: a bounded [[TopK.MinKPairs]]
    * aggregation reduces each input partition to ≤ k (hash, id) pairs per
    * stratum before its tiny exchange — never a corpus-wide window sort —
    * and the kept id set (O(strata × k) rows) broadcast-semi-joins back
    * against the corpus, which itself is never shuffled. Ids must be
    * corpus-unique (they key the semi-join).
    *
    * The stratum key is length-prefix encoded (`len|value`, null as `-|`)
    * so free-form string combinations cannot collide the way a plain
    * separator join would ("a:b"+"c" vs "a"+"b:c"). */
  def stratifiedSample(docs: DataFrame, strataCols: Seq[String], k: Int,
                       mode: HashMode = HashMode.Default,
                       idCol: String = "doc_id", salt: String = "strat",
                       broadcastMaxRows: Long = 4L << 20): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must not be empty")
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val stratum = strataCols.map { c =>
      coalesce(concat(length(col(c).cast("string")).cast("string"), lit("|"),
        col(c).cast("string")), lit("-|"))
    }.reduce(concat(_, _))
    val kept = docs
      .select(stratum.as("_stratum"), col(idCol).cast("long").as("_id"),
        mode.hash(lit(salt), col(idCol)).as("_h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._3, t._2))
      .agg(TopK.minKPairs(k))
      .flatMap { case (_, pairs) => pairs.map(_._2) }
      .toDF("_samp_id")
    // same eager-count broadcast guard as capPerSource: the kept set is
    // O(strata × k) — broadcastable for corpus-shaped strata, but guard
    // against a near-unique stratum column
    val keptSmall = Caching.ensureCachedLazy(kept).count() <= broadcastMaxRows
    docs.join(if (keptSmall) broadcast(kept) else kept,
      col(idCol) === col("_samp_id"), "left_semi")
  }

  /** CCNet-style line-level deduplication: a line whose exact text occurs
    * in ≥ `minDocs` DISTINCT documents is boilerplate (navigation chrome,
    * cookie banners, licence footers) and is removed from EVERY document;
    * the survivors are reassembled in original order. This is the removal
    * transform on top of [[boilerplateRatio]]'s signal — the filter that
    * actually cleans the text rather than scoring it.
    *
    * Scale shape: lines travel the aggregation/join as 64-bit xxhash
    * keys, never strings — per-line doc frequency is one map-side-combined
    * aggregation over (line-hash → distinct docs) and the removal is a
    * hash-keyed anti join, so the shuffled bytes track the number of
    * DISTINCT lines, not corpus text volume. Reassembly sorts each doc's
    * kept (pos, line) pairs inside its aggregation buffer — deterministic
    * under any partition arrival order. A 64-bit collision would remove an
    * innocent line; at ~10¹¹ distinct lines that risk is ~1e-4 corpus-wide
    * (CCNet runs the same trade on SHA-1 prefixes).
    *
    * Output: (idCol, textCol cleaned, n_lines, n_removed); a document
    * whose every line is boilerplate comes back with empty text, not
    * dropped. Null text counts as empty. `sep` is a literal separator
    * (default newline), regex-quoted before splitting. */
  def dedupLines(docs: DataFrame, minDocs: Int = 2, idCol: String = "doc_id",
                 textCol: String = "text", sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would remove every line)")
    val sepRe = java.util.regex.Pattern.quote(sep)
    val base = docs.select(col(idCol), coalesce(col(textCol), lit("")).as("_txt"))
    val lines = base.select(col(idCol),
      posexplode(split(col("_txt"), sepRe)).as(Seq("_pos", "_line")))
      .withColumn("_lh", xxhash64(col("_line")))
    val frequent = lines.groupBy(col("_lh"))
      .agg(count_distinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("_lh"))
    val kept = lines.join(frequent, Seq("_lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
          s => s.getField("_line"))).as("_kept_txt"),
        count(lit(1)).as("_n_kept"))
    base
      .select(col(idCol), size(split(col("_txt"), sepRe)).cast(LongType).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_kept_txt"), lit("")).as(textCol),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"))
  }

  /** Offline artifact for [[stripLinesFlag]]: the md5 digest pairs of
    * every line occurring in ≥ `minDocs` distinct documents, with its
    * document frequency. Persist this from a periodic batch pass over the
    * corpus; the streaming side probes it statelessly. Same counting
    * semantics as [[dedupLines]]'s frequency stage (null text = empty). */
  def frequentLines(docs: DataFrame, minDocs: Int = 2, idCol: String = "doc_id",
                    textCol: String = "text", sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would strip every line)")
    lineCounts(docs, idCol, textCol, sep).filter(col("line_df") >= minDocs)
  }

  /** [[frequentLines]]'s UNPRUNED counting stage: the document frequency
    * of EVERY line, no threshold — what [[LineIndex]] persists, because
    * unpruned per-document counts are additive across corpora with
    * DISJOINT doc ids (a line seen once in each of two halves is
    * frequent in the union but in neither pruned part — the exactness
    * gap pruning-before-persisting opens). The ONE counting
    * implementation under both, so the artifact and the one-shot
    * operator can never disagree about what a line's frequency IS. */
  def lineCounts(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    docs
      .select(col(idCol),
        explode(split(coalesce(col(textCol), lit("")), sepRe)).as("_line"))
      .select(col(idCol),
        call_function("graft_md5hh", col("_line").cast("binary")).as("_hh"))
      .select(col(idCol), element_at(col("_hh"), 1).as("h1"),
        element_at(col("_hh"), 2).as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(count_distinct(col(idCol)).as("line_df"))
  }

  /** Stateless boilerplate-line stripping: removes every line whose digest
    * pair probes positive in a Bloom filter built from [[frequentLines]] —
    * the ingest-time twin of [[dedupLines]], in the production shape real
    * pipelines run (frequent lines computed OFFLINE over yesterday's
    * corpus; arriving documents cleaned ONLINE with no state and no
    * shuffle). A pure projection — split, array-filter, rejoin — so it
    * runs unchanged on streaming frames (spec-pinned against the batch
    * operator).
    *
    * The Bloom trade: no false negatives (every line the artifact lists
    * IS stripped) and `fpp`-bounded false positives (an innocent line
    * wrongly stripped — at the 1e-6 default, one line per million). The
    * artifact is collected driver-side behind the `maxLines` guard, the
    * same contract as contaminationFlag's eval grams: this frame must be
    * boilerplate-shaped, not corpus-shaped. */
  def stripLinesFlag(docs: DataFrame, frequent: DataFrame, sep: String = "\n",
                     textCol: String = "text", fpp: Double = 1e-6,
                     maxLines: Long = 16L << 20): DataFrame = {
    val pairs = GramBloom.collectPairs(
      frequent.select(col("h1"), col("h2")), maxLines,
      s"frequent-line artifact exceeds $maxLines lines; " +
        "stripLinesFlag builds its filter driver-side — raise maxLines " +
        "only if the driver can hold it, or raise minDocs upstream")
    val bloom = GramBloom.build(pairs, fpp)
    val sepRe = java.util.regex.Pattern.quote(sep)
    docs
      .withColumn("_sl_lines",
        explode(array(split(coalesce(col(textCol), lit("")), sepRe))))
      .withColumn("_sl_kept",
        filter(col("_sl_lines"), l => !bloom.mightContainGram(l)))
      .withColumn("n_lines", size(col("_sl_lines")).cast(LongType))
      .withColumn("n_removed",
        (col("n_lines") - size(col("_sl_kept"))).cast(LongType))
      .withColumn(textCol, concat_ws(sep, col("_sl_kept")))
      .drop("_sl_lines", "_sl_kept")
  }

  /** Corpus snapshot diff: every document's fate between two snapshots —
    * `added` / `removed` / `changed` / `unchanged` — decided by id
    * presence and normalised-text fingerprint ([[TextOps.fingerprintCol]],
    * so whitespace-only edits read as `unchanged`, the dedup family's
    * equality). The data-ops primitive for pipeline iteration: diff
    * yesterday's curated corpus against today's before re-running
    * downstream stages, audit what a filter change actually touched.
    *
    * Scale shape: one full outer join on the id (the two fingerprint
    * projections are map-side; no other shuffle), output one row per id
    * in either snapshot. Ids must be unique within each snapshot (the
    * family contract — duplicates would multiply through the join). */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol),
      TextOps.fingerprintCol(col(textCol)).as("_sd_old"))
    val n = newDocs.select(col(idCol),
      TextOps.fingerprintCol(col(textCol)).as("_sd_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_sd_old").isNull, lit("added"))
          .when(col("_sd_new").isNull, lit("removed"))
          .when(col("_sd_old") =!= col("_sd_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Deterministic multi-epoch training order: every document gets a
    * `(shard, pos)` coordinate — global order = shard-major — that is a
    * pure function of `(epoch, id)`, so the data order of any epoch can
    * be reproduced byte-for-byte months later (the reproducibility
    * contract training runs need; re-runs, resumed jobs and debugging
    * replays all see the same sequence). Different epochs yield
    * different permutations (the epoch salts the hash), which is the
    * cheap multi-epoch reshuffle.
    *
    * Scale shape: no global sort. The hash is a projection; ordering
    * state is per SHARD (`row_number` over the shard partition), so
    * `nShards` sizes the largest ordering task at ~corpus/nShards rows —
    * the same bound-the-task-by-sharding trade `packChunks` makes. A
    * writer materialises the order by `repartitionByRange(shard, pos)` +
    * `sortWithinPartitions`. Ids must be corpus-unique (the family
    * contract — duplicate ids would tie on the full sort key and take
    * partition-order-dependent positions). */
  def epochOrder(docs: DataFrame, epoch: Int, nShards: Int = 256,
                 idCol: String = "doc_id",
                 mode: HashMode = HashMode.Default): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs
      .select(col(idCol), mode.hash(lit(s"epoch$epoch"), col(idCol)).as("_eo_h"))
      .withColumn("shard",
        pmod(col("_eo_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_eo_h"), col(idCol)))
        .cast(LongType))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Weighted sample without replacement: the `k` documents with the
    * smallest priority `hash(salt, id) div weight` — Ohlsson-style
    * sequential Poisson sampling (priorities uᵢ/wᵢ, keep the k smallest),
    * the weighted generalisation of [[sampleByHash]]. Inclusion
    * probability is asymptotically proportional to `weight` (πps), and
    * the whole contract is EXACT integer arithmetic: the uniform uᵢ is
    * the salted id hash and the priority its integer division by the
    * weight. That arithmetic is the point — the classic
    * Efraimidis–Spirakis key u^(1/w) needs transcendental floating-point
    * that no two engines evaluate bit-identically, whereas `div` lets a
    * DuckDB oracle reproduce every priority exactly (ties broken on id).
    * A row's fate is a pure function of (salt, id, weight, the corpus's
    * k-th priority): re-runs, retries and speculative tasks agree.
    *
    * Weights must be positive integers; rows with null or non-positive
    * weight never sample (weight 0 = "never pick"). Weight granularity is
    * the caller's: quantize float weights to an integer scale first.
    * (The uniform is [[HashMode.nonNegHash]]: non-negative in BOTH
    * modes, so larger weight → smaller priority → likelier inclusion
    * holds everywhere. [[HashMode.Portable]] hashes were always
    * non-negative — the oracle contract is unchanged; [[HashMode
    * .Default]] previously used the signed xxhash64, under which the
    * min-k set came from the negative hashes and the weight tilt
    * INVERTED.)
    *
    * Scale shape mirrors [[stratifiedSample]]: a bounded [[TopK.MinKPairs]]
    * aggregation reduces each input partition to ≤ k (priority, id) pairs
    * before one tiny single-group exchange — never a corpus-wide sort —
    * and the kept id set (exactly ≤ k rows, always broadcastable)
    * semi-joins back against the corpus, which itself is never shuffled.
    * Ids must be corpus-unique (they key the semi-join). */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String,
                     idCol: String = "doc_id",
                     mode: HashMode = HashMode.Default,
                     salt: String = "wsamp"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = docs
      .filter(col(weightCol).isNotNull && col(weightCol).cast(LongType) > 0)
      .select(mode.nonNegHash(lit(salt), col(idCol)).as("_h"),
        col(weightCol).cast(LongType).as("_w"),
        col(idCol).cast(LongType).as("_id"))
      .select(expr("_h div _w").as("_pri"), col("_id"))
      .as[(Long, Long)]
      .select(TopK.minKPairs(k).name("_pairs"))
      .select(explode(col("_pairs")).as("_p"))
      .select(col("_p._2").as("_ws_id"))
    docs.join(broadcast(kept), col(idCol) === col("_ws_id"), "left_semi")
  }

  /** Cross-document boilerplate signal (the RefinedWeb/CCNet-style
    * repeated-content filter, word-k-gram flavored): a doc's distinct
    * k-grams that appear in ≥ `minDocs` documents are "boilerplate"; the
    * per-doc ratio of boilerplate grams is the filter signal (headers,
    * footers, templates, licence blocks score high).
    *
    * Scale shape: the gram is the join/aggregation key throughout —
    * per-gram doc frequency is one bounded aggregation over the distinct
    * (doc, gram) stream (never |docs|² pair work), and only grams that
    * clear `minDocs` flow into the count-back join. Docs shorter than k
    * tokens have no k-grams and report a 0 ratio. */
  def boilerplateRatio(docs: DataFrame, k: Int = 3, minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    // persisted + eagerly materialised (a construction-time job — plan-only
    // callers pay it too): the gram stream feeds both the
    // doc-frequency aggregation and the count-back join — uncached, each
    // consumer would re-tokenise the whole corpus (the two scan subtrees
    // don't reuse each other's exchange). AQE skew handling covers the
    // deliberately-hot join keys (boilerplate grams are frequent by
    // definition); a per-gram window would funnel each hot gram through
    // one unsplittable task instead.
    val grams = kgrams(docs, k) // distinct per doc
    Caching.ensureCached(grams)
    val dfreq = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df")) // grams are doc-distinct: count == doc freq
    val perDoc = grams.join(dfreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_df") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          round(coalesce(col("n_boiler"), lit(0L)).cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)).as("boiler_ratio"))
  }

  /** RE2-safe (no backrefs/lookaround) scrub patterns, so the same
    * strings run on engines using either regex dialect. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Default scrub set: email, IPv4, US-phone, SSN shapes. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    Ipv4Pattern -> "[IP]",
    PhonePattern -> "[PHONE]",
    SsnPattern -> "[SSN]")

  /** Blocklist / PII redaction: applies each (pattern → replacement) in
    * order and counts matches per pattern against the ORIGINAL text (so
    * counts are order-independent). Pure projection; an empty pattern
    * list is the identity with n_redactions = 0. */
  def redact(docs: DataFrame, patterns: Seq[(String, String)] = PiiPatterns,
             textCol: String = "text"): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val n = patterns.map { case (p, _) => regexp_count(col(textCol), lit(p)) }
      .foldLeft(lit(0L).cast(LongType))(_ + _)
    docs.withColumn("n_redactions", n.cast(LongType))
      .withColumn(textCol, redacted)
  }

  /** Payment-card candidate shape: 13-19 digits (the full ISO/IEC 7812
    * PAN envelope [[graft.functions.LuhnCheck]] validates — 16-digit
    * 4×4, 15-digit Amex 4-6-5, 13-digit Visa, 19-digit Maestro print
    * forms all included) with optional single space/dash separators
    * between digits. RE2-safe — no backrefs, no lookaround; the
    * non-capturing group keeps DuckDB's `regexp_extract` default
    * (group 0) on the whole match. Shape over-matching (a 14-digit
    * phone+extension run, say) is BY DESIGN: the checksum is the
    * precision gate, the shape only bounds the scan. */
  val CardPattern = "\\b\\d(?:[- ]?\\d){12,18}\\b"

  /** CHECKSUM-VALIDATED card redaction: digit-shape candidates that
    * pass the Luhn mod-10 check ([[graft.functions.LuhnCheck]],
    * `graft_luhn`) are replaced with `replacement`; shape-matching but
    * checksum-failing strings (order ids, timestamps, phone fragments —
    * 9 in 10 random digit strings) are LEFT ALONE, which is what makes
    * card redaction safe to run over a whole corpus where [[redact]]'s
    * unconditional regex pass would over-scrub.
    *
    * Pure zero-shuffle projection: extract candidates ONCE into a
    * temporary column (the scan + checksum are the per-row cost — not
    * duplicated between count and replace), replace each distinct
    * valid candidate word-boundary-anchored (candidates contain only
    * digits, spaces, and dashes, so splicing one into a regex is
    * literal-safe). `n_cards` is EXACTLY the number of replacements
    * performed: the count and the replace run in ONE sequential fold,
    * each candidate counted against the text state it actually sees —
    * a pre-count against the original overstates when one candidate's
    * occurrence overlaps another's already-replaced span (separator
    * forms sharing digit groups), and a replacement-token diff
    * miscounts when `replacement` is empty or can combine with
    * adjacent text into extra occurrences. */
  def redactCards(docs: DataFrame, textCol: String = "text",
                  replacement: String = "[CARD]"): DataFrame = {
    val candCol = "_rc_valid"
    val accCol = "_rc_acc"
    val valid = array_distinct(filter(
      regexp_extract_all(col(textCol), lit(CardPattern), lit(0)),
      c => call_function("graft_luhn", c)))
    docs.withColumn(candCol, valid)
      // one fold carries (current text, replacements so far): count the
      // candidate in the CURRENT text, then replace it there — count
      // and mutation can never drift. Candidate-free docs (the
      // overwhelming majority of a real corpus) fold zero steps.
      .withColumn(accCol,
        aggregate(col(candCol),
          struct(col(textCol).as("t"), lit(0L).as("n")),
          (acc, c) => {
            val bounded = concat(lit("\\b"), c, lit("\\b"))
            struct(
              regexp_replace(acc.getField("t"), bounded, lit(replacement)).as("t"),
              (acc.getField("n") +
                regexp_count(acc.getField("t"), bounded).cast(LongType)).as("n"))
          }))
      .withColumn("n_cards", col(accCol).getField("n"))
      .withColumn(textCol, col(accCol).getField("t"))
      .drop(candCol, accCol)
  }

  /** Weighted source mixture: per-source keep rates (percent of 100),
    * applied with a deterministic salted id-hash like [[sampleByHash]] —
    * the reproducible way to mix corpora at fixed ratios. Sources absent
    * from `rates` keep `defaultPercent`. The distinct default salt keeps
    * mixing independent of sampling: with a shared hash the two filters
    * would fully correlate (composition keeps min of the rates, not the
    * product). */
  def mixBySource(docs: DataFrame, rates: Map[String, Int], defaultPercent: Int = 100,
                  sourceCol: String = "source", idCol: String = "doc_id",
                  mode: HashMode = HashMode.Default,
                  salt: String = "mix"): DataFrame = {
    require((rates.values ++ Seq(defaultPercent)).forall(p => p >= 0 && p <= 100),
      "rates must be in [0, 100]")
    val rate = rates.foldLeft(lit(defaultPercent)) { case (c, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(c)
    }
    docs.filter(pmod(mode.hash(lit(salt), col(idCol)), lit(100L)) < rate)
  }

  /** Deterministic train/val/test (or any named-fraction) split
    * assignment: each row gets a `split` label from the same salted
    * id-hash family as [[sampleByHash]]/[[mixBySource]], so membership is
    * a pure function of (salt, id) — stable across runs, retries, and
    * repartitions, and consistent for a given id even when the corpus
    * around it changes (rows never migrate between train and test because
    * an upstream filter moved them; THE property that keeps eval sets
    * uncontaminated over pipeline revisions). Percents must sum to 100 —
    * a partial assignment would silently drop rows from every split.
    * Pure projection: no shuffle, no randomness. */
  def assignSplits(docs: DataFrame, splits: Seq[(String, Int)],
                   idCol: String = "doc_id", mode: HashMode = HashMode.Default,
                   salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0) && splits.map(_._2).sum == 100,
      "split percents must be non-negative and sum to 100")
    val bucket = pmod(mode.hash(lit(salt), col(idCol)), lit(100L))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cum).init.reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), c)) => when(bucket < c, lit(name)).otherwise(acc)
      }
    docs.withColumn("split", label)
  }

  /** Temperature-scaled mixture RATES: per-group integer keep percents
    * that re-balance a skewed corpus toward `n_g^alpha / Σ n^alpha`
    * sampling shares (the multilingual-LM mixing rule — T5/XLM-R-style
    * `p^α` temperature sampling; α < 1 upweights rare groups) sized to
    * `targetPercent` percent of the corpus in total expected rows —
    * a scale-free target, so the same call means the same thing at
    * sf0.01 and at 100 TB.
    *
    * Determinism across engines (the reason α is restricted): the rate
    * math must produce IDENTICAL values in Spark and any SQL oracle, so
    * only correctly-rounded IEEE operations are allowed. `sqrt` is
    * correctly rounded (IEEE 754); `pow`/`ln` are NOT. α ∈ {1.0, 0.5,
    * 0.25} spells `n^α` as 0, 1, or 2 sqrt applications. The weight is
    * then fixed-pointed (`round(w·10^6)` — exact integral double, exact
    * long), the total is an exact int64 sum (order-independent, unlike a
    * double Σ), and the percent is a decimal integral division — every
    * step bit-reproducible on both engines.
    *
    * Scale shape: one map-side-combined count aggregation over the
    * corpus; everything after runs on the groups-sized frame. Rows with
    * a NULL group are dropped by the inner rate join (a null language is
    * a filter problem, not a mixing problem).
    *
    * Output: (`groupCol`, `n`, `rate`) — a groups-sized frame, FREEZABLE
    * as an artifact: persist it and apply with [[mixWithRates]] at ingest
    * (stream-static join + stateless hash filter), so online admission
    * uses the exact offline rates. */
  def temperatureRates(docs: DataFrame, groupCol: String, targetPercent: Int,
                       alpha: Double = 0.5): DataFrame = {
    require(Set(1.0, 0.5, 0.25)(alpha),
      "alpha must be 1.0, 0.5, or 0.25 (spelled as repeated sqrt — the " +
        "only correctly-rounded IEEE power, so rates are engine-exact)")
    require(targetPercent > 0 && targetPercent <= 100,
      "targetPercent must be in (0, 100]")
    val dec = "decimal(38,0)"
    val w = alpha match {
      case 1.0  => col("n").cast("double")
      case 0.5  => sqrt(col("n").cast("double"))
      case 0.25 => sqrt(sqrt(col("n").cast("double")))
    }
    val stats = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("_tm_w6", round(w * lit(1e6)).cast(LongType))
    // exact int64 totals — no double-summation order dependence
    val tot = stats.agg(sum(col("_tm_w6")).as("_tm_tw"), sum(col("n")).as("_tm_tn"))
    // rate_g = pct·N·w6_g / (Σw6 · n_g): expected kept Σ n·rate/100 ≈ pct%·N
    stats.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(100L),
        call_function("div",
          lit(targetPercent.toLong).cast(dec) * col("_tm_tn").cast(dec) *
            col("_tm_w6").cast(dec),
          col("_tm_tw").cast(dec) * col("n").cast(dec)).cast(LongType)))
      .select(col(groupCol), col("n"), col("rate"))
  }

  /** Apply a frozen per-group rate table (from [[temperatureRates]] or
    * hand-written) as a deterministic hash mixture: keep a row iff its
    * salted id hash lands under its group's `rate` percent. Stateless —
    * a broadcast/stream-static join plus a projection filter, so the same
    * call admits rows in a Structured Streaming ingest with the batch
    * operator's exact semantics (a row kept offline is kept online).
    * Rows whose group is absent from `rates` (or null) are dropped —
    * an unknown group has no share in the mixture. */
  def mixWithRates(docs: DataFrame, rates: DataFrame, groupCol: String,
                   idCol: String = "doc_id", mode: HashMode = HashMode.Default,
                   salt: String = "tmix"): DataFrame = {
    val r = broadcast(rates.select(col(groupCol).as("_tm_g"), col("rate")))
    docs.join(r, docs(groupCol) === col("_tm_g"))
      .filter(pmod(mode.hash(lit(salt), col(idCol)), lit(100L)) < col("rate"))
      .drop("_tm_g", "rate")
  }

  /** [[temperatureRates]] + [[mixWithRates]] in one call: temperature-
    * rebalanced deterministic downsampling of a skewed corpus toward
    * `targetRows` rows. The published mixing rule as a first-class
    * operator (cf. [[mixBySource]] for hand-set rates, [[upsampleBySource]]
    * for repeat factors above 1). */
  def temperatureMix(docs: DataFrame, groupCol: String, targetPercent: Int,
                     alpha: Double = 0.5, idCol: String = "doc_id",
                     mode: HashMode = HashMode.Default,
                     salt: String = "tmix"): DataFrame =
    mixWithRates(docs, temperatureRates(docs, groupCol, targetPercent, alpha),
      groupCol, idCol, mode, salt)

  /** Source UPSAMPLING — the direction [[mixBySource]] cannot express:
    * repeat factors ABOVE 1 for rare, high-value sources (the Pile /
    * LLaMA-style "Wikipedia × 3 epochs" mixture). Each document emits
    * `floor(f)` copies plus one more with probability `frac(f)`, decided
    * by the salted id hash — deterministic, id-stable, and expressible in
    * exact integer arithmetic (factors are quantised to 2 decimal places:
    * percent resolution, same granularity as [[mixBySource]]). Factors
    * below 1 degrade to plain hash downsampling; factor 0 drops the
    * source.
    *
    * Output repeats the row with `copy` = 1..n so downstream packing /
    * shuffling treats copies as distinct rows (dedup BEFORE upsampling,
    * obviously). Pure projection + one Generate — no shuffle, no
    * randomness; a row's copy count is a function of (salt, id, factor)
    * alone. */
  def upsampleBySource(docs: DataFrame, factors: Map[String, Double],
                       defaultFactor: Double = 1.0,
                       sourceCol: String = "source", idCol: String = "doc_id",
                       mode: HashMode = HashMode.Default,
                       salt: String = "upsample"): DataFrame = {
    def pct(f: Double): (Int, Int) = {
      require(f >= 0, s"factor $f must be non-negative")
      val scaled = math.round(f * 100)
      require(math.abs(f * 100 - scaled) < 1e-9,
        s"factor $f has more than 2 decimal places — quantise explicitly")
      ((scaled / 100).toInt, (scaled % 100).toInt)
    }
    val (defBase, defFrac) = pct(defaultFactor)
    val (baseCol, fracCol) = factors.foldLeft(
      (lit(defBase), lit(defFrac))) { case ((bc, fc), (s, f)) =>
      val (b, fr) = pct(f)
      (when(col(sourceCol) === s, lit(b)).otherwise(bc),
        when(col(sourceCol) === s, lit(fr)).otherwise(fc))
    }
    docs
      .withColumn("_up_n", baseCol +
        when(pmod(mode.hash(lit(salt), col(idCol)), lit(100L)) < fracCol, 1)
          .otherwise(0))
      .filter(col("_up_n") > 0)
      .withColumn("copy", explode(sequence(lit(1), col("_up_n"))))
      .drop("_up_n")
  }

  /** [[packChunks]] `shards` sentinel: size the shard count from a cheap
    * per-source row count so no window task exceeds `autoTargetRows`. */
  val AutoShards = 0

  /** Concat-and-chunk sequence packing: within each source, documents are
    * laid out in a deterministic order and cut into `budget`-token chunks;
    * a document's chunk is where its first token lands.
    *
    * Scale shape: a plain per-source running sum funnels EVERY row of a
    * source through one window task — on a Common-Crawl-shaped corpus
    * (one source = 60-80% of rows) that is most of 100 TB in a single
    * task. With `shards > 1` each source is cut into `pmod(id, shards)`
    * shards, the running sum is per (source, shard) — bounded tasks —
    * and a tiny per-shard token-total aggregate (O(sources × shards)
    * rows, broadcast back) turns the within-shard sums into globally
    * consistent offsets, so chunk ids are still contiguous 0..n per
    * source and every chunk except per-shard boundary stubs is full.
    *
    * Layout order is (shard, id) for `shards > 1` — a different (but
    * deterministic) document order than `shards = 1`, which keeps the
    * exact id-ordered layout. Chunk ids are a pure function of
    * (corpus, budget, shards); retries and re-runs agree.
    *
    * The DEFAULT is [[AutoShards]]: one cheap per-source count (an eager
    * guard job — a count-only aggregation, no window, no text columns)
    * sizes the shard count so the largest source's window task holds
    * ≤ `autoTargetRows` rows. A naive caller on a Common-Crawl-shaped
    * corpus therefore gets bounded tasks by default; pass `shards = 1`
    * explicitly to pin the exact id-ordered layout (and skip the guard
    * job) when the per-source row counts are known to be tame.
    *
    * CAVEAT — [[AutoShards]] trades layout stability across corpus GROWTH
    * for bounded tasks: the shard count is a function of the largest
    * source's row count, so when that count crosses an `autoTargetRows`
    * multiple between runs, the shard count — and with it every chunk id —
    * shifts, even though the code is unchanged. Each individual run is
    * still fully deterministic (retries within a run agree). When chunk
    * ids must be reproducible across corpus revisions, pass an explicit
    * `shards` (any fixed value, including 1) so the layout is a function
    * of the corpus CONTENT only, never its size. */
  def packChunks(docs: DataFrame, budget: Int, tokenCol: String = "n_tokens",
                 sourceCol: String = "source", idCol: String = "doc_id",
                 shards: Int = AutoShards,
                 autoTargetRows: Long = 4L << 20): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards >= 0, "shards must be positive, or AutoShards (0) to size from the data")
    require(autoTargetRows > 0, "autoTargetRows must be positive")
    val nShards =
      if (shards != AutoShards) shards
      else {
        val maxSrc = docs.groupBy(col(sourceCol))
          .agg(count(lit(1)).as("_n")).agg(max(col("_n"))).collect()(0)
        if (maxSrc.isNullAt(0)) 1 // empty corpus: nothing to pack
        else math.min(4096L,
          (maxSrc.getLong(0) + autoTargetRows - 1) / autoTargetRows).toInt.max(1)
      }
    if (nShards == 1) {
      val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("_cum", sum(col(tokenCol)).over(w))
        .withColumn("chunk_id", ((col("_cum") - col(tokenCol)) / budget).cast(LongType))
        .drop("_cum")
    } else {
      // null ids land in shard 0 (they sort first within the shard, the
      // same relative position the shards=1 window gives them) — a plain
      // pmod would yield a null shard and the offsets equi-join would
      // silently drop the row
      val sharded = docs.withColumn("_shard",
        coalesce(pmod(col(idCol), lit(nShards)), lit(0)).cast("int"))
      val w = Window.partitionBy(col(sourceCol), col("_shard"))
        .orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // per-(source, shard) token totals → prefix offset of each shard in
      // its source's global layout; O(sources × shards) rows, broadcast
      val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_shard").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = sharded.groupBy(col(sourceCol), col("_shard"))
        .agg(sum(col(tokenCol)).as("_tot"))
        .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
        .select(col(sourceCol).as("_off_src"), col("_shard").as("_off_shard"),
          col("_off"))
      // null-safe source match: a null source is a group like any other
      sharded.withColumn("_cum", sum(col(tokenCol)).over(w))
        .join(broadcast(offsets),
          col(sourceCol) <=> col("_off_src") && col("_shard") === col("_off_shard"))
        .withColumn("chunk_id",
          ((col("_cum") + col("_off") - col(tokenCol)) / budget).cast(LongType))
        .drop("_cum", "_off", "_off_src", "_off_shard", "_shard")
    }
  }

  /** Materialise packed training sequences from a [[packChunks]]
    * assignment: one row per (source, chunk) with the member documents'
    * text concatenated in id order — the step that turns chunk IDS into
    * the actual sequences a tokenizer consumes.
    *
    * Determinism: `collect_list` order is shuffle-dependent, so texts
    * ride in (id, text) structs and `array_sort` fixes the order BEFORE
    * the join — same output under any partitioning. One aggregation
    * keyed by (source, chunk): at most `budget` tokens of text per
    * group by construction, so group state is bounded by the packing
    * budget, not by source size. */
  def packText(chunked: DataFrame, sep: String = " ",
               textCol: String = "text", sourceCol: String = "source",
               idCol: String = "doc_id"): DataFrame =
    chunked.groupBy(col(sourceCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
            e => e.getField(textCol)), sep).as("packed_text"))

  /** Pack ORDERED TOKEN SEQUENCES into training chunks — the
    * shard-writer output shape ([[packText]] concatenates raw text;
    * this concatenates the [[graft.ops.Bpe.segmentTokens]] streams a
    * model actually trains on), with a `boundary` token closing every
    * document so attention masking / loss boundaries are recoverable
    * from the packed stream alone. Input is a [[packChunks]]-chunked
    * frame carrying a `tokensCol` array; docs concatenate in ascending
    * id order inside each chunk (the same total order the chunk
    * assignment used); a null tokens array contributes its boundary
    * alone (like an empty doc) rather than nulling the whole chunk's
    * stream. Scale shape: one (source, chunk_id) aggregation whose
    * per-group state is bounded by `budget + the longest single
    * document` — [[packChunks]] assigns an over-budget doc whole to
    * the chunk its first token lands in, so the budget alone bounds
    * state only when every doc fits it; truncate or split oversized
    * docs upstream if the worst case matters. */
  def packTokens(chunked: DataFrame, boundary: String = "</s>",
                 tokensCol: String = "tokens", sourceCol: String = "source",
                 idCol: String = "doc_id"): DataFrame =
    chunked.groupBy(col(sourceCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        flatten(transform(
          array_sort(collect_list(struct(col(idCol).as("_id"),
            col(tokensCol).as("_t")))),
          e => concat(
            coalesce(e.getField("_t"), array().cast("array<string>")),
            array(lit(boundary))))).as("packed_tokens"))
      .withColumn("n_tokens_packed", size(col("packed_tokens")).cast(LongType))

  /** Distinct k-gram set per doc over normalised text (no short-doc
    * fallback: a doc shorter than k tokens has no k-grams). Reuses
    * [[NearDup.explodedShingles]]' Generate-barrier tokenisation. */
  private def kgrams(docs: DataFrame, k: Int): DataFrame =
    NearDup.explodedShingles(docs, k, distinct = true, wholeDocFallback = false,
      fanOut = false)
      .select(col("doc_id"), col("shingle").as("gram"))

  /** Eval-set decontamination (the 13-gram overlap rule of GPT-3-style
    * training hygiene): returns `(doc_id, n_shared)` for every corpus doc
    * sharing at least one k-gram with the eval frame. The gram is the join
    * key — work is proportional to true overlap, never |corpus| × |eval|.
    * Filter the flagged ids out of the corpus to decontaminate. */
  def contamination(docs: DataFrame, evalDocs: DataFrame, k: Int = 13): DataFrame = {
    val evalGrams = kgrams(evalDocs, k).select(col("gram")).distinct()
    kgrams(docs, k)
      .join(evalGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[contamination]] with a Bloom-filter prefilter on the corpus side —
    * output-identical (false positives die in the exact gram join), but
    * the corpus gram stream is pruned to ~(true overlap + fpp) BEFORE the
    * shuffle. At 100 TB the corpus side emits billions of
    * (doc_id, gram) rows of which almost none are contaminated; dropping
    * them map-side — one md5 + `kh` bit probes per gram, all codegen —
    * is the difference between shuffling the corpus's gram stream and
    * shuffling roughly nothing.
    *
    * The filter is built ON THE DRIVER from the eval set's gram hashes —
    * eval/benchmark sets are tiny next to the corpus by definition (the
    * `maxEvalGrams` guard makes the assumption explicit rather than
    * letting a mis-passed frame OOM the driver). The bitset rides into
    * the plan as ONE array literal (a constant, not a per-element
    * expression tree — ~1.5 MB for 10M grams at 1% fpp), probed with
    * [[GramBloom]]'s odd-stride double hashing over the graft_md5hh
    * digest pair — one digest serves all `kh` probes. */
  def contaminationBloom(docs: DataFrame, evalDocs: DataFrame, k: Int = 13,
                         fpp: Double = 0.01,
                         maxEvalGrams: Long = 16L << 20): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val spark = docs.sparkSession
    import spark.implicits._
    // persisted (MEMORY_AND_DISK): the same frame feeds the driver-side
    // build here and the exact verification join below — without it the
    // eval tokenisation runs twice and the two uses could even diverge on
    // a changing source. Cached until the ContextCleaner GCs the plan;
    // loop callers should clearCache() between batches.
    val evalGrams = Caching.ensureCachedLazy(
      kgrams(evalDocs, k).select(col("gram")).distinct())
    val bloom = GramBloom.build(
      collectGramPairs(evalGrams, k, maxEvalGrams, "contaminationBloom"), fpp)
    kgrams(docs, k)
      .withColumn("_hh", call_function("graft_md5hh", col("gram").cast("binary")))
      .filter(bloom.mightContain(element_at(col("_hh"), 1), element_at(col("_hh"), 2)))
      .drop("_hh")
      .join(evalGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Digest pairs of a distinct gram frame, collected driver-side behind
    * the explicit eval-shaped-frame guard. */
  private def collectGramPairs(evalGrams: DataFrame, k: Int, maxEvalGrams: Long,
                               caller: String): Array[(Long, Long)] =
    GramBloom.collectPairs(
      evalGrams
        .select(call_function("graft_md5hh", col("gram").cast("binary")).as("hh"))
        .select(element_at(col("hh"), 1), element_at(col("hh"), 2)),
      maxEvalGrams,
      s"eval set exceeds $maxEvalGrams distinct $k-grams; " +
        s"$caller builds its filter driver-side — this frame is " +
        "corpus-shaped, not eval-shaped")

  /** Stateless per-document contamination flag: `might_contaminated` is
    * true when ANY of the doc's k-grams might be in the eval set (Bloom
    * probe — ≈`fpp` false positives among clean docs, never false
    * negatives). Unlike [[contamination]]'s join+aggregation, this is a
    * PURE PROJECTION — no shuffle, no state — so it runs unchanged on
    * STREAMING frames: ingest-time decontamination at line rate, where
    * the exact join would need a stream-static join plus a stateful
    * per-doc aggregation. Dropping flagged docs errs on the safe side;
    * run the exact [[contamination]] over the (tiny) flagged subset when
    * the false-positive docs must be rescued.
    *
    * The token / shingle / digest arrays each materialise through a
    * Generate barrier (1-element-array explode, row cardinality kept) —
    * without them CollapseProject inlines the upstream computation into
    * every lambda element access and the scan goes O(n²). The md5 digest
    * pair is computed ONCE per shingle in its own barrier stage; probing
    * the digest array means the `kh` Bloom probes per gram are integer
    * arithmetic only (lambdas get no common-subexpression elimination, so
    * probing raw grams would re-digest each gram 2·kh times). */
  def contaminationFlag(docs: DataFrame, evalDocs: DataFrame, k: Int = 13,
                        fpp: Double = 0.01,
                        maxEvalGrams: Long = 16L << 20): DataFrame = {
    val evalGrams = kgrams(evalDocs, k).select(col("gram")).distinct()
    val bloom = GramBloom.build(
      collectGramPairs(evalGrams, k, maxEvalGrams, "contaminationFlag"), fpp)
    docs
      .withColumn("_cf_toks",
        explode(array(split(graft.ops.TextOps.normText(col("text")), " "))))
      .withColumn("_cf_sh", explode(array(NearDup.shinglesOf(col("_cf_toks"), k,
        distinct = true, wholeDocFallback = false))))
      .withColumn("_cf_hh", explode(array(transform(col("_cf_sh"),
        s => call_function("graft_md5hh", s.cast("binary"))))))
      .withColumn("might_contaminated",
        exists(col("_cf_hh"),
          p => bloom.mightContain(element_at(p, 1), element_at(p, 2))))
      .drop("_cf_toks", "_cf_sh", "_cf_hh")
  }
}
