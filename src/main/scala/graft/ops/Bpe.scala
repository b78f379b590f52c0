package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction (Sennrich et al. 2016), engine-exact.
  *
  * A training-data engine that counts, scores, and packs by tokens
  * should also be able to LEARN the tokenizer: byte-pair-encoding
  * merge induction is the standard subword pipeline step, and it runs
  * on exactly the word-frequency statistics the engine already
  * extracts. The published algorithm operates on the WORD-TYPE
  * vocabulary (distinct words weighted by corpus frequency), not the
  * token stream — so each merge iteration's state is vocabulary-sized,
  * and the corpus is touched exactly once to build the initial counts.
  * That is the 100 TB shape: one corpus-sized aggregation up front,
  * then bounded per-iteration work (pair stats over word types, one
  * shuffle each), nothing quadratic anywhere.
  *
  * Representation: each word type is kept as its space-joined unit
  * string (`"l o w </w>"`), the end-of-word marker a unit of its own.
  * A merge replaces the winning pair substring with its concatenation
  * (`"l o w </w>"` + merge `o w` → `"l ow </w>"`). Because units never
  * contain spaces, substring replacement on this form IS unit-pair
  * merging, and both Spark's and the oracle engines' `replace` apply
  * left-to-right non-overlapping — the same greedy order the reference
  * algorithm uses on overlapping runs (`a a a` merges to `aa a`).
  *
  * Determinism: pair counts are exact Long sums; the winning pair is
  * picked by (count DESC, pair ASC) — a total order, so any engine
  * reproduces the same merge table bit-for-bit. Ties in published BPE
  * are implementation-defined; fixing lexicographic-ascending makes
  * the artifact portable.
  */
object Bpe {

  /** Word-type vocabulary: lowercase, whitespace-split, with corpus
    * frequencies. One corpus pass, vocabulary-sized output. */
  def wordVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word as its initial space-joined character units plus the
    * end-of-word marker: `low` → `l o w </w>`. */
  private def charUnits(word: Column): Column =
    concat(trim(regexp_replace(word, "(.)", "$1 ")), lit(" </w>"))

  /** Learn `nMerges` BPE merges from the corpus. Returns one row per
    * merge: (`step` INT, `pair` STRING — the two units space-joined,
    * `merged` STRING, `cnt` BIGINT — the pair's weighted frequency when
    * it won). Each iteration is: adjacent-pair stats over the cached
    * word-type frame (one vocabulary-sized shuffle), a 1-row
    * deterministic top pick, and a broadcast rewrite of the word
    * types. */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): DataFrame =
    trainMergesFromVocab(wordVocab(docs, textCol), nMerges)

  /** Learn merges from an explicit (word, cnt) vocabulary frame — the
    * algorithm only ever sees the vocabulary, which is what makes the
    * [[BpeIndex]] incremental story EXACT: vocab counts are additive,
    * so a merged vocab retrains identically to the concatenated
    * corpus. `priorMerges` (in training order) resumes learning from an
    * already-merged unit state, numbering new merges from
    * `priorMerges.size + 1` — training n then extending by k equals
    * training n+k from scratch. */
  def trainMergesFromVocab(vocab: DataFrame, nMerges: Int,
                           priorMerges: Seq[(String, String)] = Nil): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val start = priorMerges.foldLeft(charUnits(col("word"))) {
      case (c, (pair, merged)) => replace(c, lit(pair), lit(merged))
    }
    var w = Caching.ensureCachedLazy(
      vocab.select(start.as("s"), col("cnt")))
    var merges: Option[DataFrame] = None
    for (i0 <- 1 to nMerges) {
      val i = priorMerges.size + i0
      val top = Caching.ensureCachedLazy(
        pairStats(w)
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1)
          .select(lit(i).as("step"), col("pair"),
            regexp_replace(col("pair"), " ", "").as("merged"),
            col("c").as("cnt")))
      merges = Some(merges.fold(top)(_.union(top)))
      w = Caching.ensureCachedLazy(
        w.crossJoin(broadcast(
            top.select(col("pair").as("_bpe_p"), col("merged").as("_bpe_m"))))
          .select(expr("replace(s, _bpe_p, _bpe_m)").as("s"), col("cnt")))
    }
    merges.get
  }

  /** Weighted adjacent-pair frequencies over a (s, cnt) word-type
    * frame. */
  private def pairStats(w: DataFrame): DataFrame =
    w.withColumn("_bpe_u", split(col("s"), " "))
      .select(explode(expr(
        "transform(sequence(1, size(_bpe_u) - 1), " +
          "i -> concat(element_at(_bpe_u, i), ' ', element_at(_bpe_u, i + 1)))"))
        .as("pair"), col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))

  /** Stateless segmentation under FROZEN merges — the ingest-time twin
    * (merges are a k-bounded learned artifact, like PQ codebooks or
    * IVF centroids): per document, lowercase-split words, expand to
    * character units, fold the merges in training order, and count the
    * resulting subword tokens. Pure projection + one corpus-sized
    * aggregation; admits a streaming source unchanged. Documents with
    * no words produce no row (the whitespace-split contract). */
  def segmentCounts(docs: DataFrame, merges: Seq[(String, String)],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val folded = merges.foldLeft(charUnits(col("word"))) {
      case (c, (pair, merged)) => replace(c, lit(pair), lit(merged))
    }
    docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .select(col(idCol), size(split(folded, " ")).cast("long").as("_bpe_n"))
      .groupBy(col(idCol))
      .agg(sum(col("_bpe_n")).as("n_tokens"))
  }
}
