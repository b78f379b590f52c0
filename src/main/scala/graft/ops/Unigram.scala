package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) tokenizer induction — Kudo 2018, the
  * OTHER production subword tokenizer next to [[Bpe]]: instead of
  * greedy merge induction, a piece VOCABULARY with log-probabilities is
  * fit by EM over the word types and pruned to a target size, and
  * segmentation is the Viterbi best split under the fitted model.
  *
  * Engine-exact variant (what makes the cross-engine gate possible):
  *  - HARD (Viterbi) EM — the E-step assigns each word type its single
  *    best segmentation under a TOTAL order (score DESC, piece-count
  *    ASC, segmentation-string ASC in UTF-8 byte order) and counts
  *    pieces from it, weighted by word frequency. Published
  *    SentencePiece marginalises over all segmentations
  *    (forward-backward) and fits with soft counts; that float
  *    marginalisation has no engine-exact replay, while the hard-EM
  *    argmax chain is integer/6dp-rounded arithmetic end to end and
  *    replays bit-for-bit in SQL (the q_lang_id_trained discipline).
  *  - Piece log-probs are INTEGER MICROS: `round(round(ln(f/tot), 6)
  *    * 1e6)` — exact addition, exact comparison, no accumulation
  *    order anywhere.
  *  - Deterministic prune: single-character pieces are never dropped
  *    (the coverage guarantee); multi-character pieces keep the top
  *    `vocabSize - nChars` by (frequency DESC, piece ASC); survivors'
  *    log-probs renormalise over the surviving mass.
  *  - Single-character pieces that win no Viterbi count keep frequency
  *    1 (the floor that keeps every word segmentable — SentencePiece's
  *    required-character set, made exact).
  *
  * Scale shape — the [[Bpe.trainMergesLocal]] architecture: the corpus
  * is touched ONCE (the distributed word-type aggregation, the only
  * corpus-sized step at 100 TB); the EM loop runs driver-side over the
  * collected vocabulary with exact integer arithmetic (bounded state:
  * word types × pieces, never the corpus). Segmentation of a corpus is
  * a broadcast join against the word→segmentation table the final
  * E-step already computed (SentencePiece's own word cache, made the
  * primary path) — one corpus pass, zero extra shuffle; unseen word
  * types fall back to single-character pieces in-expression. */
object Unigram {

  /** The fitted model: `pieces` (piece, frequency, logp micro-int) in
    * (piece ASC) order; `wordSegs` maps every trained word type to its
    * Viterbi (pieceCount, scoreMicro) under the final vocabulary;
    * `charWts` the single-char piece micros (the fallback path). */
  final case class Model(pieces: Seq[(String, Long, Long)],
                         wordSegs: Map[String, (Int, Long)],
                         charWts: Map[String, Long],
                         maxPieceLen: Int)

  /** UTF-8 unsigned-byte string order — Spark UTF8String / DuckDB
    * collation, NOT Java UTF-16 order (see [[Bpe]]'s tie-break note). */
  private def utf8Less(a: String, b: String): Boolean = {
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

  /** `round(round(ln(f/tot), 6) * 1e6)` as a Long — the lang-ID
    * integer-micro weight, BigDecimal HALF_UP like Spark/DuckDB round. */
  private def microLogP(f: Long, tot: Long): Long = {
    val r6 = BigDecimal(math.log(f.toDouble / tot.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    math.round(r6 * 1e6)
  }

  /** Viterbi best segmentation of `word` under `wts`: maximise the
    * micro-logp sum; ties → fewer pieces → UTF-8-lexicographically
    * smallest piece string. Single chars are always present in `wts`
    * (the trainer's floor), so the DP never dead-ends. */
  private def viterbi(word: String, wts: collection.Map[String, Long],
                      maxPieceLen: Int): (Seq[String], Long) = {
    val n = word.length
    // dp(i): (score, nPieces, segString) best over word[0, i)
    val dp = new Array[(Long, Int, String)](n + 1)
    dp(0) = (0L, 0, "")
    var i = 1
    while (i <= n) {
      var best: (Long, Int, String) = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(j, i)
        wts.get(piece) match {
          case Some(w) if dp(j) != null =>
            val (s0, p0, g0) = dp(j)
            val cand = (s0 + w, p0 + 1,
              if (g0.isEmpty) piece else g0 + " " + piece)
            if (best == null ||
              cand._1 > best._1 ||
              (cand._1 == best._1 && (cand._2 < best._2 ||
                (cand._2 == best._2 && utf8Less(cand._3, best._3)))))
              best = cand
          case _ => ()
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    require(dp(n) != null,
      s"word '$word' is not segmentable — a character is missing from " +
        "the vocabulary (the single-char floor should make this unreachable)")
    (dp(n)._3.split(' ').toSeq, dp(n)._1)
  }

  /** Fit the unigram model on an explicit `(word, cnt)` vocabulary
    * frame (the [[Bpe.trainMergesFromVocab]] seam — counts are additive,
    * so incremental retrains stay exact). `maxTypes` caps the collected
    * vocabulary at the most frequent types ((cnt DESC, word ASC)); 0
    * collects everything. */
  def trainFromVocab(vocab: DataFrame, vocabSize: Int = 48,
                     maxPieceLen: Int = 4, emIters: Int = 2,
                     maxTypes: Int = 0): Model = {
    require(vocabSize > 0 && maxPieceLen > 0 && emIters >= 1,
      "vocabSize/maxPieceLen must be positive, emIters >= 1")
    val capped =
      if (maxTypes == 0) vocab
      else vocab.orderBy(col("cnt").desc, col("word").asc).limit(maxTypes)
    val words = capped.select(col("word"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "cannot train a tokenizer on an empty vocabulary")

    // seed: every substring occurrence up to maxPieceLen, frequency-
    // weighted; all single chars + the top 4×vocabSize multis
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i))
      seedCounts.updateWith(w.substring(i, i + l)) {
        prev => Some(prev.getOrElse(0L) + c)
      }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toSeq
      .sortWith(utf8Less)
    val multiCap = 4 * vocabSize
    val multis = seedCounts.iterator.filter(_._1.length > 1).toSeq
      .sortWith { case ((pa, fa), (pb, fb)) =>
        fa > fb || (fa == fb && utf8Less(pa, pb)) }
      .take(multiCap).map(_._1)
    var freqs: Map[String, Long] =
      (chars ++ multis).map(p => p -> seedCounts(p)).toMap

    def wtsOf(f: Map[String, Long]): Map[String, Long] = {
      val tot = f.valuesIterator.sum
      f.map { case (p, n) => p -> microLogP(n, tot) }
    }

    // hard-EM rounds: Viterbi E-step counts, char-floored M-step
    for (_ <- 1 to emIters) {
      val wts = wtsOf(freqs)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words; p <- viterbi(w, wts, maxPieceLen)._1)
        counts.updateWith(p)(prev => Some(prev.getOrElse(0L) + c))
      freqs = (chars.map(ch => ch -> math.max(counts.getOrElse(ch, 0L), 1L)) ++
        counts.iterator.filter { case (p, n) => p.length > 1 && n > 0L })
        .toMap
    }

    // deterministic prune: all chars + top (vocabSize - nChars) multis
    // by (freq DESC, piece ASC); logp renormalises over the survivors
    val keepMulti = math.max(0, vocabSize - chars.length)
    val kept = chars.map(ch => ch -> freqs(ch)) ++
      freqs.iterator.filter(_._1.length > 1).toSeq
        .sortWith { case ((pa, fa), (pb, fb)) =>
          fa > fb || (fa == fb && utf8Less(pa, pb)) }
        .take(keepMulti)
    val finalFreqs = kept.toMap
    val finalWts = wtsOf(finalFreqs)

    val segs = words.map { case (w, _) =>
      val (pieces, score) = viterbi(w, finalWts, maxPieceLen)
      w -> (pieces.length, score)
    }.toMap
    Model(
      finalFreqs.toSeq.sortWith { case ((pa, _), (pb, _)) => utf8Less(pa, pb) }
        .map { case (p, f) => (p, f, finalWts(p)) },
      segs,
      finalWts.filter(_._1.length == 1),
      maxPieceLen)
  }

  /** Fit on a document corpus: ONE distributed word-type aggregation
    * ([[Bpe.wordVocab]] — the only corpus-sized step), then
    * [[trainFromVocab]]'s driver-side exact EM. */
  def train(docs: DataFrame, vocabSize: Int = 48, maxPieceLen: Int = 4,
            emIters: Int = 2, maxTypes: Int = 0,
            textCol: String = "text"): Model =
    trainFromVocab(Bpe.wordVocab(docs, textCol), vocabSize, maxPieceLen,
      emIters, maxTypes)

  /** The fitted vocabulary as a frame `(piece, freq, logp_micro)`. */
  def piecesDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "freq", "logp_micro")
  }

  /** Per-document piece counts and total Viterbi score under the FROZEN
    * model: lowercase-split words join the model's word→segmentation
    * table (broadcast — vocabulary-sized, the SentencePiece word-cache
    * shape), and the corpus pays one projection + one aggregation.
    * Word types unseen at training time fall back IN-EXPRESSION to
    * single-character pieces (count = length, score = the chars' micro
    * weights, `unkMicro` per out-of-alphabet char) — stateless, so the
    * whole operator admits a streaming corpus (stream-static join +
    * one aggregation). Documents with no words keep a (0, 0) row in
    * batch (the [[TextOps.lmScoreWith]] contract). */
  def segmentCounts(docs: DataFrame, model: Model,
                    idCol: String = "doc_id", textCol: String = "text",
                    unkMicro: Long = -20000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    segmentCountsWith(docs,
      broadcast(
        model.wordSegs.toSeq.map { case (w, (np, sc)) => (w, np.toLong, sc) }
          .toDF("word", "_np", "_sc")),
      model.charWts, idCol, textCol, unkMicro)
  }

  /** The segmenter core over an EXPLICIT word→segmentation frame
    * `(word, _np, _sc)` — what [[UnigramIndex]] feeds from its persisted
    * cache (broadcast-decided there from recorded metadata) and
    * [[segmentCounts]] feeds from the in-memory model. */
  private[ops] def segmentCountsWith(docs: DataFrame, segDf: DataFrame,
                                     charWts: Map[String, Long],
                                     idCol: String, textCol: String,
                                     unkMicro: Long): DataFrame = {
    val charMap: org.apache.spark.sql.Column =
      if (charWts.isEmpty) map()
      else map(charWts.toSeq.sortBy(_._1)
        .flatMap { case (c, w) => Seq(lit(c), lit(w)) }: _*)
    val fallbackScore = aggregate(split(col("word"), ""),
      lit(0L), (acc, ch) => acc +
        coalesce(element_at(charMap, ch), lit(unkMicro)))
    val perWord = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(segDf, Seq("word"), "left")
      .select(col(idCol),
        coalesce(col("_np"), length(col("word")).cast("long")).as("_np"),
        coalesce(col("_sc"), fallbackScore).as("_sc"))
    val agg = perWord.groupBy(col(idCol))
      .agg(sum(col("_np")).as("n_pieces"), sum(col("_sc")).as("score_micro"))
    if (docs.isStreaming) agg
    else docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }
}
