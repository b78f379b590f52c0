package graft.stream

import graft.ops.{Curate, ExactSubstr, LineIndex, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed STATELESS ingest-curation chain — the production shape a
  * crawl pipeline actually deploys: yesterday's governed corpus builds
  * the artifacts OFFLINE (one periodic batch pass), today's arrivals
  * stream through a pure projection chain with no state, no shuffle,
  * and no joins, so the same code runs identically on a batch frame and
  * on `readStream` (spec-pinned). Every stage is an already-gated
  * operator; this object only fixes their production ORDER and threads
  * the counters through:
  *
  *  1. byte-level cleaning — html strip → mojibake repair → control
  *     chars → NFC (the `q_ingest_clean` chain, same order);
  *  2. boilerplate-line removal against the [[Curate.frequentLines]]
  *     artifact ([[Curate.stripLinesFlag]]);
  *  3. PII redaction — checksum-gated card scrub
  *     ([[Curate.redactCards]]) then the pattern battery
  *     ([[Curate.redact]]). ORDER IS LOAD-BEARING: redaction must run
  *     BEFORE any stage that rewrites token boundaries — the
  *     sentence-span rebuild splits `user@domain.com` at its dots
  *     (dots are sentence terminals), and a later email scrub would
  *     silently miss it (found by the q_curation_ingest oracle gate);
  *  4. C4 line battery + page tripwires ([[TextOps.c4Rules]]) — while
  *     the page still HAS lines: the span rebuild below flattens it,
  *     which would turn the per-line filter into whole-page
  *     all-or-nothing;
  *  5. Gopher quality flags ([[TextOps.gopherRules]]) on the C4-cleaned
  *     (still line-structured) text — flags describe the arriving page
  *     before span dedup;
  *  6. duplicated sentence-span removal against the
  *     [[ExactSubstr.frequentShingles]] artifact
  *     ([[ExactSubstr.stripSentencesFlag]] — the C4 three-sentence rule,
  *     ingest-time twin) — the last text rewrite, because its rebuild
  *     flattens line structure;
  *  7. eval-set decontamination flag ([[Curate.contaminationFlag]]).
  *
  * Output: `(doc_id, text, keep, c4_keep, gopher_keep,
  * might_contaminated, n_boilerplate_lines, n_dup_sentences,
  * n_tail_dropped, n_cards, n_redactions)` — `keep` is the conjunction
  * a training shard-writer
  * filters on; flags are EMITTED, never silently applied, so the
  * quarantine stream is the same frame filtered the other way.
  *
  * KEEPER CAVEAT (inherited from the artifact twins): the stateless
  * chain strips every artifact-flagged line/span in the arrivals —
  * keep-first holds when the keepers live in the corpus the artifacts
  * were built from; run the batch operators on the periodic re-pass.
  *
  * TRAILING-FRAGMENT ACCOUNTING: the span stage's rebuild keeps only
  * `[.!?]`-terminated sentences, while C4's line filter also accepts a
  * closing double quote — a quote-terminated TRAILING fragment (kept by
  * C4, unterminated to the sentence extractor) is dropped by the
  * rebuild. Mid-document quote-terminated text survives (it rides as
  * the prefix of the next terminated sentence); only the document tail
  * is affected — the sentence extractor's documented unterminated-tail
  * convention. The chain's contract is "flags EMITTED, never silently
  * applied", so the drop is COUNTED: `n_tail_dropped` is 1 when the
  * pre-rebuild text carried a non-whitespace residue after its last
  * terminal mark (at most one tail per document), 0 otherwise. */
object StreamCurate {

  /** The offline artifacts that parameterise the online chain. Build
    * them with [[Curate.frequentLines]] / [[ExactSubstr.frequentShingles]]
    * over the governed corpus; `evalDocs` is the benchmark/eval corpus
    * decontamination guards against (driver-bounded, like the
    * artifacts). */
  final case class Artifacts(frequentLines: DataFrame,
                             frequentShingles: DataFrame,
                             evalDocs: DataFrame)

  /** [[Artifacts]] from PERSISTED [[LineIndex]] artifacts — the
    * production wiring the in-memory constructor only approximates: the
    * periodic batch pass `build`s (then `merge`s, incrementally and
    * exactly) the line and shingle indexes offline, and the online
    * chain loads thresholded views at startup without touching the
    * corpus. Kind-checked — handing the chain a windows artifact, or
    * swapping lines for shingles, fails loudly instead of silently
    * mis-cleaning every arriving document. Thresholds apply at load
    * (the indexes store unpruned counts), pinned here to the chain's
    * stage defaults. */
  def loadArtifacts(spark: SparkSession, linesDir: String,
                    shinglesDir: String, evalDocs: DataFrame,
                    minDocs: Long = 2, minOccurrences: Long = 2): Artifacts =
    Artifacts(
      LineIndex.load(spark, linesDir, minDocs,
        expectKind = Some(LineIndex.Kind.Lines())),
      LineIndex.load(spark, shinglesDir, minOccurrences,
        expectKind = Some(LineIndex.Kind.Shingles())),
      evalDocs)

  /** Generate barrier: materialise `c` once so project collapse cannot
    * inline its (deep, 7-stage) expression tree into every downstream
    * reference — the C4 battery reads its input ~8 times and the Gopher
    * metrics ~15 times; without barriers the whole upstream chain
    * re-evaluates per reference per row (measured 13.6 s → the
    * component sum ~5 s on the q_curation_ingest fixture). */
  private def materialized(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, explode(array(col(c))))

  def curate(docs: DataFrame, artifacts: Artifacts,
             c4: TextOps.C4Thresholds = TextOps.C4Thresholds(),
             gopher: TextOps.GopherThresholds = TextOps.GopherThresholds(),
             contaminationK: Int = 13): DataFrame = {
    // 1. byte-level ingest cleaning (the q_ingest_clean chain order:
    // structure first, encodings before normalization) — with the
    // BLOCK-preserving html strip: the downstream boilerplate-line and
    // C4 stages are line-based, so the cleaning stage must keep line
    // structure (stripHtml's whitespace collapse would erase it)
    val cleaned = docs.select(col("doc_id"),
      TextOps.nfc(TextOps.cleanControlChars(TextOps.fixMojibake(
        TextOps.stripHtmlBlocks(coalesce(col("text"), lit(""))))))
        .as("text"))
    // 2. boilerplate lines out (Bloom over the offline line artifact)
    val lines = Curate.stripLinesFlag(cleaned, artifacts.frequentLines)
      .select(col("doc_id"), col("text"),
        col("n_removed").as("n_boilerplate_lines"))
    // 3. PII before any token-boundary rewrite (see the order note in
    // the scaladoc): checksum-gated cards first (the unconditional
    // pattern pass would mangle digit runs the Luhn gate needs intact),
    // then the pattern battery
    val scrubbed = Curate.redact(Curate.redactCards(lines))
    // 4. C4 battery while lines STILL EXIST — the sentence-span rebuild
    // below flattens the page, which would turn C4's per-line filter
    // into whole-page all-or-nothing (one 'javascript' line would blank
    // the document instead of dropping the line)
    val c4d = TextOps.c4Rules(materialized(scrubbed, "text"), c4,
        passThrough = Seq("n_boilerplate_lines", "n_cards", "n_redactions"))
      .select(col("doc_id"), col("n_boilerplate_lines"), col("n_cards"),
        col("n_redactions"), col("clean_text").as("text"), col("c4_keep"))
    // 5. Gopher flags on the C4-cleaned text — still line-structured
    // (c4Rules rejoins kept lines with \n), so the bullet/ellipsis
    // line ratios keep their meaning. Flags describe the page BEFORE
    // span dedup (the arriving page's quality, not the rebuilt one's).
    val flagged = TextOps.gopherRules(materialized(c4d, "text"), gopher,
        passThrough = Seq("n_boilerplate_lines", "n_cards", "n_redactions",
          "text", "c4_keep"))
      .select(col("doc_id"), col("n_boilerplate_lines"), col("n_cards"),
        col("n_redactions"), col("text"), col("c4_keep"), col("gopher_keep"))
    // 6. duplicated sentence spans out — the LAST text rewrite (the
    // rebuild flattens line structure, so every line-based stage runs
    // before it). The rebuild's other effect is counted HERE, on the
    // text it is about to read: a non-whitespace residue after the last
    // terminal mark (a quote-terminated document tail C4 kept) is not a
    // sentence and will not survive the rebuild — replace-all of the
    // sentence pattern leaves exactly that residue, so the counter and
    // the extractor can never disagree about what a sentence is
    val tailed = flagged.withColumn("n_tail_dropped",
      when(regexp_replace(
          regexp_replace(col("text"), lit("[^.!?]*[.!?]"), lit("")),
          lit("^\\s+|\\s+$"), lit("")) =!= "", 1L).otherwise(0L))
    val spans = ExactSubstr.stripSentencesFlag(tailed, artifacts.frequentShingles,
        passThrough = Seq("n_boilerplate_lines", "n_cards", "n_redactions",
          "c4_keep", "gopher_keep", "n_tail_dropped"))
      .select(col("doc_id"), col("n_boilerplate_lines"), col("n_cards"),
        col("n_redactions"), col("c4_keep"), col("gopher_keep"),
        col("n_tail_dropped"),
        col("clean_text").as("text"), col("n_removed").as("n_dup_sentences"))
    // 7. eval decontamination flag (emitted, not applied — a training
    // run filters on it; an audit keeps the flagged rows)
    val decon = Curate.contaminationFlag(materialized(spans, "text"),
      artifacts.evalDocs, k = contaminationK)
    decon.select(col("doc_id"), col("text"),
      (col("c4_keep") && col("gopher_keep") && !col("might_contaminated"))
        .as("keep"),
      col("c4_keep"), col("gopher_keep"), col("might_contaminated"),
      col("n_boilerplate_lines"), col("n_dup_sentences"),
      col("n_tail_dropped"), col("n_cards"), col("n_redactions"))
  }
}
