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
    Parallel.fan(docs)
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
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
    val spark = vocab.sparkSession
    val start = priorMerges.foldLeft(charUnits(col("word"))) {
      case (c, (pair, merged)) => replace(c, lit(pair), lit(merged))
    }
    var w = Caching.ensureCachedLazy(
      vocab.select(start.as("s"), col("cnt")))
    // Each round COLLECTS its single winning row (one merge — the
    // artifact itself, the PQ-codebook collect precedent) and bakes it
    // back as literals. Keeping the winner as a crossJoin frame instead
    // (the pre-r9 shape) embeds round k-1's plan TWICE in round k —
    // once under the rewrite, once under the winner's aggregation — so
    // logical plans duplicate EXPONENTIALLY in the merge count (2^12
    // subtree copies OOM'd the analyzer at nMerges=12). Literals make
    // plans linear; the checkpoint window then bounds even that.
    val win = new Caching.CheckpointWindow(every = 8)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var drained = false
    for (i0 <- 1 to nMerges if !drained) {
      val i = priorMerges.size + i0
      val top = pairStats(w)
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) drained = true // vocab exhausted: stop early
      else {
        val pair = top.head.getString(0)
        val merged = pair.replace(" ", "")
        out += ((i, pair, merged, top.head.getLong(1)))
        w = win.advance(
          w.select(replace(col("s"), lit(pair), lit(merged)).as("s"), col("cnt")))
      }
    }
    // nothing outlives the loop (the merge table was collected row by
    // row) — release every trailing cached round now instead of leaving
    // up to `every - 1` frames to the ContextCleaner
    win.release(null)
    import spark.implicits._
    out.result().toDF("step", "pair", "merged", "cnt")
  }

  /** Production-k merge induction: the vocabulary aggregation stays
    * DISTRIBUTED (the only corpus-sized step — the part that matters at
    * 100 TB), then the merge loop runs DRIVER-SIDE over the collected
    * word-type table with incremental pair-count maintenance: each merge
    * re-counts only the word types whose unit string CONTAINS the
    * winning pair, so merge k costs O(affected) pair updates plus one
    * O(V) containment scan — not a full vocabulary re-aggregation, and
    * never a Spark job. This is the same architecture as the PQ/IVF
    * trainers (bounded-state artifact learned at the driver, corpus
    * touched once); a 32k-merge tokenizer is ~minutes of driver CPU on a
    * million-type vocab where the distributed loop would be 32k chained
    * jobs.
    *
    * `maxTypes` caps the collected vocabulary at the most frequent word
    * types ((cnt DESC, word ASC) — deterministic), the standard
    * frequency-floor practice; 0 collects everything. Semantics are
    * spec-pinned EQUAL to [[trainMergesFromVocab]] (BpeSpec property):
    * identical stringy left-to-right `replace` rewrite, identical
    * (count DESC, pair ASC) wins. Returns the same (step, pair, merged,
    * cnt) frame. */
  def trainMergesLocal(vocab: DataFrame, nMerges: Int,
                       maxTypes: Int = 1000000): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    require(maxTypes >= 0, "maxTypes must be non-negative")
    val spark = vocab.sparkSession
    val capped =
      if (maxTypes == 0) vocab
      else vocab.orderBy(col("cnt").desc, col("word").asc).limit(maxTypes)
    val collected = capped.select(charUnits(col("word")).as("s"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = localMergeLoop(collected, nMerges)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.map { case (step, pair, merged, cnt) =>
        org.apache.spark.sql.Row(step, pair, merged, cnt) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pair",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("merged",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The in-memory merge loop with delta pair maintenance. Pair counts
    * are derived from SPLIT units (matching [[pairStats]]); the rewrite
    * is java.lang.String.replace — left-to-right non-overlapping, the
    * exact semantics of the SQL `replace` the distributed trainer and
    * the oracles use. Affected-word detection is substring containment
    * on the joined string (NOT the split-pair index) for the same
    * reason: `replace` can fire across unit boundaries when one unit is
    * a suffix of another (`"ab b"` contains `"b b"`), and fidelity to
    * the distributed semantics beats BPE-textbook purity here. */
  private[ops] def localMergeLoop(words0: Array[(String, Long)],
                                  nMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = words0.map(_._1).toBuffer
    val cnts = words0.map(_._2)
    val pairCounts = scala.collection.mutable.HashMap.empty[String, Long]
    def pairsOf(s: String): Iterator[String] = {
      val u = s.split(' ')
      (0 until u.length - 1).iterator.map(i => u(i) + " " + u(i + 1))
    }
    def bump(p: String, by: Long): Unit = {
      val nv = pairCounts.getOrElse(p, 0L) + by
      if (nv == 0L) pairCounts.remove(p) else pairCounts.update(p, nv)
    }
    for (i <- words.indices; p <- pairsOf(words(i))) bump(p, cnts(i))
    // tie-break comparison in UTF-8 UNSIGNED-BYTE order — Spark's
    // UTF8String and DuckDB both sort strings by their UTF-8 bytes, and
    // Java String '<' (UTF-16 code units) DISAGREES with that for
    // supplementary characters (surrogate pairs start 0xD8xx, below
    // U+E000..U+FFFF in UTF-16 but above in UTF-8): an emoji-containing
    // pair tied on count would pick a different winner and diverge the
    // whole merge chain from the distributed trainer and the oracle
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val m = math.min(x.length, y.length)
      var i = 0
      while (i < m) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to nMerges if pairCounts.nonEmpty) {
      // (count DESC, pair ASC) — the distributed trainer's total order
      val (bestPair, bestCnt) = pairCounts.foldLeft(("", Long.MinValue)) {
        case (acc @ (bp, bc), (p, c)) =>
          if (c > bc || (c == bc && utf8Less(p, bp))) (p, c) else acc
      }
      val merged = bestPair.replace(" ", "")
      out += ((step, bestPair, merged, bestCnt))
      var i = 0
      while (i < words.length) {
        val s = words(i)
        if (s.contains(bestPair)) {
          val ns = s.replace(bestPair, merged)
          val c = cnts(i)
          for (p <- pairsOf(s)) bump(p, -c)
          for (p <- pairsOf(ns)) bump(p, c)
          words(i) = ns
        }
        i += 1
      }
    }
    out.result()
  }

  /** Weighted adjacent-pair frequencies over a (s, cnt) word-type
    * frame. Single-unit words (fully merged — reachable at production
    * merge counts) contribute no pairs: without the size guard,
    * `sequence(1, size-1)` at size = 1 is sequence(1, 0), which Spark
    * generates DESCENDING as [1, 0] and the i+1 access throws — DuckDB's
    * generate_series(1, 0) is empty, so the guard is also what keeps
    * oracle parity. */
  private def pairStats(w: DataFrame): DataFrame =
    w.withColumn("_bpe_u", split(col("s"), " "))
      .filter(size(col("_bpe_u")) >= 2)
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

  /** The ORDERED subword token sequence per document — what a sequence
    * packer or training-shard writer actually consumes ([[segmentCounts]]
    * only sizes it). No shuffle beyond [[Parallel.fan]]'s size-gated
    * round-robin micro-shuffle, and no explode/regroup round-trip:
    * the whole segmentation is one array-lambda projection
    * (`transform` over the split word array, merges folded as literal
    * `replace`s inside the lambda, `flatten` back) so document order is
    * preserved BY CONSTRUCTION rather than re-established by a sort,
    * and the operator runs unchanged on streaming frames (stateless
    * projection — the ingest-time tokenisation shape). Emits every
    * input document: a whitespace-only text yields an empty `tokens`
    * array with `n_tokens` 0, not a dropped row. */
  def segmentTokens(docs: DataFrame, merges: Seq[(String, String)],
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    keepCols: Seq[String] = Nil): DataFrame = {
    def foldWord(w: Column): Column =
      merges.foldLeft(charUnits(w)) {
        case (c, (pair, merged)) => replace(c, lit(pair), lit(merged))
      }
    // keepCols ride the same projection — a downstream packer needs e.g.
    // `source` alongside the tokens, and re-joining it back onto this
    // output would cost a corpus-sized doc_id shuffle the pass-through
    // makes unnecessary. Fanned (r16): the per-word merge fold is
    // nMerges string replaces per word — compute-bound map work.
    Parallel.fan(docs).select(col(idCol) +: keepCols.map(col) :+
      coalesce(flatten(transform(
          filter(split(lower(col(textCol)), "\\s+"), w => length(w) > 0),
          w => split(foldWord(w), " "))),
        array().cast("array<string>")).as("tokens"): _*) // null text -> [], not null
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
