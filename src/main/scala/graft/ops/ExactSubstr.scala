package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact duplicated-substring detection at token-window granularity — the
  * Spark-tractable formulation of suffix-array ExactSubstr dedup (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better";
  * reference surface: dc43's dedup pipeline family).
  *
  * The suffix-array algorithm finds every duplicated substring of ≥ L
  * tokens; it is inherently single-machine (one sorted suffix array over
  * the concatenated corpus). The distributed equivalence this module
  * exploits: a substring of ≥ L tokens is duplicated iff EVERY length-L
  * token window inside it is duplicated — so duplicated fixed-length
  * windows (a hash-groupBy, embarrassingly parallel) found and merged
  * per-document reconstruct exactly the maximal duplicated spans of
  * length ≥ L. Window granularity costs nothing at the span level: the
  * union of merged windows IS the union of duplicated ≥-L substrings.
  *
  * Scale shape: each token starts at most one window, so the window
  * stream is one row per corpus token — projected (never materialised)
  * from a scan, hashed to 32 hex chars, partial-aggregated before the
  * count shuffle. Duplicated hashes join back against a second
  * projection of the window stream (the two consumers each recompute
  * the scan+projection rather than caching a corpus-sized frame; the
  * join is a shuffle join on the hash — the dup set at web scale is too
  * big to broadcast, and a broadcast here would be wrong-by-default;
  * Catalyst/AQE still picks one when the dup frame is actually small).
  * The island merge runs per document over only the DUPLICATED window
  * starts — bounded by document length, corpus-size independent.
  */
object ExactSubstr {

  /** `(doc_id, pos, wh)`: the md5 of each length-`l` token window
    * (1-based start `pos`), one row per window. Windows never span
    * documents; docs shorter than `l` tokens emit nothing. md5 of the
    * space-joined window is the portable spelling (DuckDB computes the
    * identical hex — the family's [[TextOps.fingerprintCol]] parity). */
  def windowHashes(docs: DataFrame, l: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(l >= 2, "window length must be at least 2 tokens")
    shingleHashes(docs, split(TextOps.normText(col(textCol)), " "), l, idCol)
  }

  /** Maximal duplicated token spans `(doc_id, start_tok, end_tok,
    * n_tokens)`, 1-based inclusive: every position covered lies inside a
    * length-`l` window whose text occurs at least `minOccurrences` times
    * in the corpus (occurrences within one document count — self-repeated
    * boilerplate is duplication too; raise to cross-document semantics by
    * pre-deduping identical docs upstream). Overlapping and adjacent
    * duplicated windows merge into one span, so spans are maximal and
    * disjoint per document. */
  def duplicatedSpans(docs: DataFrame, l: Int = 20, minOccurrences: Long = 2,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences must be at least 2")
    val wins = windowHashes(docs, l, idCol, textCol)
    val dup = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minOccurrences)
      .select(col("wh"))
    // islands over the duplicated starts: fixed-length intervals sorted by
    // start, so the running end is prev_pos + l - 1 and a gap begins
    // whenever pos - prev_pos > l (adjacent spans, pos == prev_end + 1,
    // still merge). The window runs over duplicated starts only.
    val perDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    wins.join(dup, Seq("wh"))
      .select(col(idCol), col("pos"))
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(perDoc) <= l, lit(0))
          .otherwise(lit(1)))
      .withColumn("_isl", sum(col("_brk")).over(
        perDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(l - 1)).as("end_tok"))
      .select(col(idCol), col("start_tok").cast(LongType),
        col("end_tok").cast(LongType),
        (col("end_tok") - col("start_tok") + 1).cast(LongType).as("n_tokens"))
  }

  /** Per-document duplication fraction — [[duplicatedSpans]] reduced to
    * the doc-level curation SCORE "what share of this document's tokens
    * lie inside corpus-duplicated spans": `(idCol, n_tokens,
    * n_dup_tokens, dup_fraction)`. Spans are maximal and disjoint per
    * document, so the cover size is an exact sum — no double counting.
    * TOTAL: every input document emits a row (0.0 when nothing is
    * duplicated, including docs shorter than one window). The signal a
    * quality-filtering pass thresholds on directly — RefinedWeb/Gopher
    * style pipelines drop documents whose duplicate share exceeds a
    * budget rather than surgically stripping them, and this is that
    * number. Scale shape: the spans pipeline (one row per corpus token
    * through the shuffle) plus one doc-sized aggregation and a left
    * join back to a token-count projection. */
  def dupFraction(docs: DataFrame, l: Int = 20, minOccurrences: Long = 2,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val perDoc = duplicatedSpans(docs, l, minOccurrences, idCol, textCol)
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens")).as("_ds_dup"))
    docs
      .select(col(idCol),
        // the canonical token count (\S+ runs == the normalized token
        // count, and 0 for empty/blank docs where size(split(...))
        // would report 1 — matching the oracle's len(toks))
        TextOps.tokenCount(col(textCol)).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("_ds_dup"), lit(0L)).as("n_dup_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("_ds_dup"), lit(0L)).cast(DoubleType) /
            col("n_tokens"), 6))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }

  /** Offline artifact for [[stripSubstrFlag]]: the `graft_md5hh` digest
    * pairs of every length-`l` token window occurring at least
    * `minOccurrences` times in the corpus, with the occurrence count —
    * the window-granular sibling of [[Curate.frequentLines]]. Persist
    * from a periodic batch pass; the streaming side probes it
    * statelessly. Same occurrence semantics as [[duplicatedSpans]]
    * (self-repeats count). */
  def frequentWindows(docs: DataFrame, l: Int = 20, minOccurrences: Long = 2,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences must be at least 2")
    windowCounts(docs, l, idCol, textCol).filter(col("win_df") >= minOccurrences)
  }

  /** [[frequentWindows]]'s UNPRUNED counting stage: every window's
    * occurrence count, no threshold — the [[Curate.lineCounts]] posture
    * at window granularity, persisted by [[LineIndex]] because
    * per-occurrence counts union+sum exactly across corpora. */
  def windowCounts(docs: DataFrame, l: Int = 20, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(l >= 2, "window length must be at least 2 tokens")
    docs
      .select(col(idCol),
        explode(array(split(TextOps.normText(col(textCol)), " "))).as("_toks"))
      .select(
        when(size(col("_toks")) >= l,
          sequence(lit(1), size(col("_toks")) - lit(l - 1)))
          .otherwise(array().cast(ArrayType(IntegerType))).as("_starts"),
        col("_toks"))
      .select(explode(col("_starts")).as("_pos"), col("_toks"))
      .select(call_function("graft_md5hh",
        concat_ws(" ", slice(col("_toks"), col("_pos"), lit(l))).cast(BinaryType))
        .as("_hh"))
      .select(element_at(col("_hh"), 1).as("h1"),
        element_at(col("_hh"), 2).as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("win_df"))
  }

  /** Stateless ingest-time duplicated-substring stripping: a token is
    * dropped iff some length-`l` window covering it probes positive in a
    * Bloom filter built from [[frequentWindows]] — the streaming twin of
    * [[duplicatedSpans]]+[[stripSpans]] in the production shape
    * ([[Curate.stripLinesFlag]]'s contract at window granularity):
    * duplicated windows computed OFFLINE over yesterday's corpus,
    * arriving documents cleaned ONLINE with no state and no shuffle.
    * A pure projection, so it runs unchanged on streaming frames.
    *
    * Bloom trade as in stripLinesFlag: no false negatives (every
    * artifact window IS stripped) and `fpp`-bounded false positives.
    * Cost note: the probe loop and the coverage test are per-row array
    * lambdas (interpreted, O(tokens × l) per doc) — the ingest-time
    * price of the corpus-free contract; the batch pipeline remains the
    * cheaper way to clean a CORPUS. Output `(id, text, n_tokens,
    * n_removed)`; token counts are of the normalised split (an empty
    * doc counts one empty token, the family's split contract). */
  def stripSubstrFlag(docs: DataFrame, frequent: DataFrame, l: Int = 20,
                      fpp: Double = 1e-6, maxWindows: Long = 16L << 20,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(l >= 2, "window length must be at least 2 tokens")
    val pairs = GramBloom.collectPairs(
      frequent.select(col("h1"), col("h2")), maxWindows,
      s"frequent-window artifact exceeds $maxWindows windows; " +
        "stripSubstrFlag builds its filter driver-side — raise maxWindows " +
        "only if the driver can hold it, or raise minOccurrences upstream")
    val bloom = GramBloom.build(pairs, fpp)
    val n = size(col("_ss_toks"))
    val nStarts = size(col("_ss_flags"))
    docs
      .withColumn("_ss_toks",
        explode(array(split(TextOps.normText(col(textCol)), " "))))
      .withColumn("_ss_flags",
        when(n >= l,
          transform(sequence(lit(1), n - lit(l - 1)), i =>
            bloom.mightContainGram(
              concat_ws(" ", slice(col("_ss_toks"), i, lit(l))).cast(BinaryType))))
          .otherwise(array().cast(ArrayType(BooleanType))))
      .withColumn("_ss_kept",
        filter(col("_ss_toks"), (t, i) => {
          // 1-based token position p is covered iff a flagged window
          // starts in [p-l+1, p] ∩ [1, nStarts]
          val p = i + 1
          val lo = greatest(lit(1), p - lit(l - 1))
          val hi = least(p, nStarts)
          !(nStarts > 0 && hi >= lo &&
            exists(slice(col("_ss_flags"), lo, hi - lo + lit(1)), f => f))
        }))
      .select(col(idCol),
        concat_ws(" ", col("_ss_kept")).as(textCol),
        n.cast(LongType).as("n_tokens"),
        (n - size(col("_ss_kept"))).cast(LongType).as("n_removed"))
  }

  /** Sentence extraction for [[dedupSentenceSpans]]: maximal runs ending
    * at a terminal mark, whitespace-trimmed, empties dropped.
    * `[^.!?]*[.!?]` is lookaround-free on purpose — RE2 has no
    * lookbehind, so a split-after-punctuation spelling could never be
    * oracle-shared; an unterminated trailing fragment is NOT a sentence
    * (C4's own line filter already discards unterminated text). The trim
    * is a REGEX whitespace trim, not `trim()` — Spark's trim strips
    * spaces only, and a sentence that follows a line break would keep a
    * `\n` prefix, silently failing to match its space-separated twin in
    * a dedup artifact (found composing with line-structured cleaning). */
  def sentencesCol(c: Column): Column =
    filter(
      transform(regexp_extract_all(c, lit("[^.!?]*[.!?]"), lit(0)),
        s => regexp_replace(s, lit("^\\s+|\\s+$"), lit(""))),
      s => s =!= lit(""))

  /** `(id, pos, wh)`: digest of each length-`n` shingle of `unitsOf`
    * (the per-row unit array — tokens, sentences), 1-based start `pos`.
    * The ONE shingle-identity definition under [[windowHashes]],
    * [[dedupSentenceSpans]], and [[frequentShingles]] — parameterised
    * by digest (md5 column for ranking, `graft_md5hh` pair for Bloom
    * artifacts) precisely so the batch operator and its ingest twin can
    * never disagree about what a shingle IS. Generate barrier on the
    * unit array, one row per shingle, rows shorter than `n` units emit
    * nothing. */
  private def shingleHashes(docs: DataFrame, unitsOf: Column, n: Int,
                            idCol: String,
                            digest: Column => Column = c => md5(c.cast(BinaryType)),
                            fanOut: Boolean = true): DataFrame =
    // fanOut: the TOKEN-window path digests ~one md5 per corpus token
    // (compute-bound — fanning measured 25% faster end to end at sf0.1);
    // the SENTENCE-shingle path emits a handful of units per document
    // (shuffle-bound — fanning measured 65% slower), so its call sites
    // opt out
    (if (fanOut) Parallel.fan(docs) else docs)
      .select(col(idCol), explode(array(unitsOf)).as("_units"))
      .select(col(idCol),
        when(size(col("_units")) >= n,
          sequence(lit(1), size(col("_units")) - lit(n - 1)))
          .otherwise(array().cast(ArrayType(IntegerType))).as("_starts"),
        col("_units"))
      .select(col(idCol), explode(col("_starts")).as("pos"),
        digest(concat_ws(" ", slice(col("_units"), col("pos"), lit(n)))).as("wh"))

  /** C4's third cleaning component (Raffel et al. 2020 §2.2: "we removed
    * any duplicated three-sentence span, keeping one occurrence") — the
    * corpus-wide stage [[TextOps.c4Rules]]'s per-document battery cannot
    * express. Keep-one policy with KEEPER PROTECTION: per duplicated
    * `n`-sentence shingle the first occurrence in (doc_id, pos) order is
    * the keeper; a sentence is removed iff some LATER (flagged)
    * occurrence covers it AND no keeper shingle of that document does —
    * protection is what makes the documented guarantee actually hold
    * when duplicated shingles overlap (without it, a flagged shingle's
    * removal could delete sentences of an adjacent keeper and leave a
    * duplicated span with ZERO surviving occurrences corpus-wide).
    *
    * Output `(id, clean_text, n_sentences, n_removed)`; docs with fewer
    * than `n` sentences (or null text) pass through with 0 removed.
    *
    * Scale shape: one row per sentence shingle through ONE hash
    * exchange (`row_number` + windowed `count` share the same
    * partitioning, so ranking and the occurrence floor cost a single
    * shuffle); the flagged/keeper start lists are per-document and
    * bounded by document length, and the rebuild left-joins them onto
    * the corpus — untouched documents pass through on null lists. */
  def dedupSentenceSpans(docs: DataFrame, n: Int = 3, minOccurrences: Long = 2,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(n >= 2, "span length must be at least 2 sentences")
    require(minOccurrences >= 2, "minOccurrences must be at least 2")
    val sentsOf = sentencesCol(coalesce(col(textCol), lit("")))
    val bySh = Window.partitionBy(col("sh")).orderBy(col(idCol), col("pos"))
    val ranked = shingleHashes(docs, sentsOf, n, idCol, fanOut = false)
      .withColumnRenamed("wh", "sh")
      .withColumn("_rk", row_number().over(bySh))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("_n") >= minOccurrences)
    val flagged = ranked.filter(col("_rk") > 1)
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("_flag"))
    val keepers = ranked.filter(col("_rk") === 1)
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("_keep"))
    docs
      .select(col(idCol), explode(array(sentsOf)).as("_sents"))
      .join(flagged, Seq(idCol), "left")
      .join(keepers, Seq(idCol), "left")
      .withColumn("_kept",
        when(col("_flag").isNull, col("_sents"))
          .otherwise(filter(col("_sents"), (s, i) => {
            val q = i + 1
            def covered(starts: Column): Column = coalesce(
              exists(starts, f => q >= f && q <= f + lit(n - 1)), lit(false))
            !(covered(col("_flag")) && !covered(col("_keep")))
          })))
      .select(col(idCol),
        concat_ws(" ", col("_kept")).as("clean_text"),
        size(col("_sents")).cast(LongType).as("n_sentences"),
        (size(col("_sents")) - size(col("_kept"))).cast(LongType).as("n_removed"))
  }

  /** Offline artifact for [[stripSentencesFlag]]: the `graft_md5hh`
    * digest pairs of every `n`-sentence shingle occurring ≥
    * `minOccurrences` times corpus-wide, with the occurrence count —
    * the same counting semantics as [[dedupSentenceSpans]]'s frequency
    * stage (per-OCCURRENCE, not per-document: a span duplicated twice
    * inside one document is duplicated). Persist this from a periodic
    * batch pass; the streaming side probes it statelessly. The
    * [[graft.ops.Curate.frequentLines]] compute-offline/clean-online
    * split, completed for the last dedup family member that lacked it. */
  def frequentShingles(docs: DataFrame, n: Int = 3, minOccurrences: Long = 2,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences must be at least 2")
    shingleCounts(docs, n, idCol, textCol).filter(col("n_occ") >= minOccurrences)
  }

  /** [[frequentShingles]]'s UNPRUNED counting stage: every sentence
    * shingle's occurrence count, no threshold — what [[LineIndex]]
    * persists for the span-dedup family (per-occurrence counts
    * union+sum exactly across corpora). */
  def shingleCounts(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(n >= 2, "span length must be at least 2 sentences")
    val sentsOf = sentencesCol(coalesce(col(textCol), lit("")))
    shingleHashes(docs, sentsOf, n, idCol,
      digest = c => call_function("graft_md5hh", c.cast(BinaryType)),
      fanOut = false)
      .select(element_at(col("wh"), 1).as("h1"),
        element_at(col("wh"), 2).as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Stateless sentence-span dedup for INGEST — the
    * compute-offline/clean-online twin of [[dedupSentenceSpans]], in
    * the production shape real pipelines run (duplicated shingles
    * computed OFFLINE over yesterday's corpus via [[frequentShingles]];
    * arriving documents cleaned ONLINE with no state and no shuffle): a
    * sentence is removed iff some `n`-shingle covering it probes
    * positive in the Bloom built from the artifact. A pure projection —
    * extract sentences, probe shingles, array-filter, rejoin — so it
    * runs unchanged on streaming frames (spec-pinned against batch).
    *
    * KEEPER CAVEAT (the [[stripSubstrFlag]] canonical-copy posture): the
    * stateless twin cannot know which occurrence was first, so it
    * strips EVERY flagged occurrence in the frame it cleans. Against an
    * offline artifact this approximates keep-first exactly when the
    * keepers live in the already-deduped corpus the artifact was built
    * from — every arrival occurrence is a later one by construction.
    * An arrival that is itself the corpus's only keeper loses its copy
    * too; run the batch operator on the periodic re-pass to restore it.
    *
    * Same Bloom trade as [[graft.ops.Curate.stripLinesFlag]]: no false
    * negatives, `fpp`-bounded false positives, artifact collected
    * driver-side behind the `maxShingles` guard (this frame must be
    * duplicated-span-shaped, not corpus-shaped).
    *
    * Output matches [[dedupSentenceSpans]]: `(id, clean_text,
    * n_sentences, n_removed)`. */
  def stripSentencesFlag(docs: DataFrame, frequent: DataFrame, n: Int = 3,
                         idCol: String = "doc_id", textCol: String = "text",
                         fpp: Double = 1e-6,
                         maxShingles: Long = 16L << 20,
                         passThrough: Seq[String] = Nil): DataFrame = {
    require(n >= 2, "span length must be at least 2 sentences")
    val pairs = GramBloom.collectPairs(
      frequent.select(col("h1"), col("h2")), maxShingles,
      s"frequent-shingle artifact exceeds $maxShingles shingles; " +
        "stripSentencesFlag builds its filter driver-side — raise maxShingles " +
        "only if the driver can hold it, or raise minOccurrences upstream")
    val bloom = GramBloom.build(pairs, fpp)
    val sentsOf = sentencesCol(coalesce(col(textCol), lit("")))
    docs
      // Generate barrier (the dedupSentenceSpans shape): the sentence
      // array materialises ONCE — without it, project collapse inlines
      // the extraction tree into every per-position slice/probe below
      // and re-evaluates it ~positions× per row
      .withColumn("_sf_sents", explode(array(sentsOf)))
      // digest each shingle ONCE (lambdas get no common-subexpression
      // elimination — probing raw grams would re-slice, re-concat, and
      // re-md5 each position 2·kh ≈ 32 times; measured 5.7 s → ~1 s on
      // the q_curation_ingest fixture), then probe the materialised
      // pairs with integer arithmetic only (the contaminationFlag shape)
      .withColumn("_sf_hh", explode(array(
        when(size(col("_sf_sents")) >= n,
          transform(sequence(lit(1), size(col("_sf_sents")) - lit(n - 1)), p =>
            call_function("graft_md5hh",
              concat_ws(" ", slice(col("_sf_sents"), p, lit(n))).cast(BinaryType))))
          .otherwise(array().cast(ArrayType(ArrayType(LongType)))))))
      .withColumn("_sf_flag",
        when(size(col("_sf_hh")) > 0,
          filter(sequence(lit(1), size(col("_sf_hh"))), p =>
            bloom.mightContain(
              element_at(element_at(col("_sf_hh"), p), 1),
              element_at(element_at(col("_sf_hh"), p), 2))))
          .otherwise(array().cast(ArrayType(IntegerType))))
      .withColumn("_sf_kept",
        filter(col("_sf_sents"), (_, i) =>
          !exists(col("_sf_flag"), f => i + 1 >= f && i + 1 <= f + lit(n - 1))))
      .select((col(idCol) +: passThrough.map(col)) ++ Seq(
        concat_ws(" ", col("_sf_kept")).as("clean_text"),
        size(col("_sf_sents")).cast(LongType).as("n_sentences"),
        (size(col("_sf_sents")) - size(col("_sf_kept"))).cast(LongType)
          .as("n_removed")): _*)
  }

  /** Remove flagged spans from the text: every token whose position falls
    * inside a span of `spans` (the [[duplicatedSpans]] schema) is dropped,
    * and the survivors are re-joined with single spaces. Pure mechanics —
    * which occurrences to strip is the CALLER's policy (Lee et al. keep
    * one canonical copy: filter the spans frame, e.g. anti-join the
    * lowest-(doc_id, start) occurrence per duplicated region, before
    * passing it here; passing the raw frame strips every occurrence).
    *
    * Shape: spans collapse to one array per flagged doc (spans per doc
    * are disjoint and few), one shuffle of the SPANS frame; the corpus is
    * left-joined and rebuilt with a per-row array filter — docs with no
    * flagged span carry a null span list and pass through verbatim. */
  def stripSpans(docs: DataFrame, spans: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val spanArr = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("_spans"))
    docs
      .select(col(idCol),
        explode(array(split(TextOps.normText(col(textCol)), " "))).as("_toks"))
      .join(spanArr, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_spans").isNull, concat_ws(" ", col("_toks")))
          .otherwise(concat_ws(" ",
            filter(col("_toks"), (t, i) =>
              !exists(col("_spans"), s =>
                i + 1 >= s.getField("start_tok") &&
                  i + 1 <= s.getField("end_tok")))))
          .as(textCol))
  }
}
