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

  /** Deterministic hash sample: keeps rows whose id hashes into
    * `[0, percent)` of 100 buckets. Unlike `rand()`-based sampling this is
    * reproducible across runs/retries and consistent for the same id
    * across datasets (a row's fate is a pure function of its id), which is
    * what makes sampled pipelines debuggable at 100 TB. */
  def sampleByHash(df: DataFrame, idCol: String, percent: Int,
                   mode: HashMode = HashMode.Default): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.filter(pmod(mode.hash(col(idCol)), lit(100L)) < percent)
  }

  /** Per-source quota: keep the `cap` lowest-id documents of each source —
    * the Common-Crawl-style dominance guard that stops one source from
    * flooding the corpus. One key-partitioned shuffle. */
  def capPerSource(docs: DataFrame, cap: Int, sourceCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol).asc)
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Default scrub patterns: email, IPv4, US-phone, SSN shapes. RE2-safe
    * (no backrefs/lookaround), so the same patterns run on engines using
    * either regex dialect. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "[IP]",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "[PHONE]",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "[SSN]")

  /** Blocklist / PII redaction: applies each (pattern → replacement) in
    * order and counts matches per pattern against the ORIGINAL text (so
    * counts are order-independent). Pure projection. */
  def redact(docs: DataFrame, patterns: Seq[(String, String)] = PiiPatterns,
             textCol: String = "text"): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val n = patterns.map { case (p, _) => regexp_count(col(textCol), lit(p)) }
      .reduce(_ + _)
    docs.withColumn("n_redactions", n.cast(LongType))
      .withColumn(textCol, redacted)
  }

  /** Weighted source mixture: per-source keep rates (percent of 100),
    * applied with the same deterministic id-hash as [[sampleByHash]] —
    * the reproducible way to mix corpora at fixed ratios. Sources absent
    * from `rates` keep `defaultPercent`. */
  def mixBySource(docs: DataFrame, rates: Map[String, Int], defaultPercent: Int = 100,
                  sourceCol: String = "source", idCol: String = "doc_id",
                  mode: HashMode = HashMode.Default): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPercent)) { case (c, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(c)
    }
    docs.filter(pmod(mode.hash(col(idCol)), lit(100L)) < rate)
  }

  /** Concat-and-chunk sequence packing: within each source (the
    * parallelism key — a global ordering would funnel into one task),
    * documents are laid out in id order and cut into `budget`-token
    * chunks; a document's chunk is where its first token lands. One
    * key-partitioned window, deterministic. */
  def packChunks(docs: DataFrame, budget: Int, tokenCol: String = "n_tokens",
                 sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk_id", ((col("_cum") - col(tokenCol)) / budget).cast(LongType))
      .drop("_cum")
  }

  /** Distinct k-gram set per doc over normalised text (no short-doc
    * fallback: a doc shorter than k tokens has no k-grams). */
  private def kgrams(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array(split(TextOps.normText(col("text")), " "))).as("toks"))
      .select(col("doc_id"),
        explode(array(NearDup.shinglesOf(col("toks"), k, distinct = true,
          wholeDocFallback = false))).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("gram"))

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
}
