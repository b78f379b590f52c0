package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted reference-LM artifact: [[TextOps.bigramLm]] statistics written
  * once from a curated reference corpus, then fed to
  * [[TextOps.lmScoreWith]] any number of times without retraining — the
  * CCNet production shape (their Wikipedia-trained KenLM is a build-once
  * artifact, not a per-run aggregation), and the LM twin of
  * [[IvfIndex]]'s build-once/search-many layout.
  *
  * Layout: `dir/counts/…parquet` (w1, w2, n — UNPRUNED, so [[merge]] can
  * fold new corpora in exactly), range-partitioned and sorted by
  * (w1, w2) — sorted runs of w1 compress well and give parquet min/max
  * row-group pruning for point lookups — plus `dir/meta.json` carrying
  * `minCount` and the pruned stats row count. The count is the scale
  * lever: [[load]] reads it to decide AT PLAN TIME whether the scoring
  * join gets a broadcast hint (vocabulary-sized stats → map-side join, no
  * shuffle of the corpus bigram stream — the difference between shuffling
  * the corpus and shuffling nothing at 100 TB) or stays a shuffle join
  * (unpruned web-scale vocabularies), with no runtime count job either
  * way.
  *
  * Because [[score]] is a stream-static join for streaming inputs, the
  * artifact is exactly what `lmScoreWith`'s streaming contract wants: a
  * static reference the ingest pipeline probes micro-batch by micro-batch.
  *
  * FORMAT VERSIONS. v1 (`meta.json` without a `version` field): the
  * bigram layer only — every pre-r14 artifact. v2
  * ([[buildWithTrigrams]]): adds `dir/counts3/…parquet`
  * (w1, w2, w3, n — unpruned and additive like the bigram layer, same
  * range-partitioned sorted layout) plus `minCount3`/`nTrigrams`
  * metadata, serving stupid-backoff scoring ([[score3]] →
  * [[TextOps.lmScore3With]]: trigram hit, else α-discounted bigram,
  * else unk). v3 ([[buildWithOrders]], r15): adds `dir/counts4` and
  * `dir/counts5` (per-order UNPRUNED additive counts, same layout
  * discipline) plus `minCount4`/`n4grams`/`minCount5`/`n5grams`,
  * serving the PRODUCTION backoff order ([[score5]] →
  * [[TextOps.lmScore5With]]: 5-gram hit, else α^j-discounted lower
  * orders 4→3→2, else unk — KenLM's default and the CCNet-lineage
  * filtering order is 5). Readers are version-tolerant downward: v1/v2
  * artifacts keep loading/scoring/merging exactly as before (higher-
  * order entry points fail loudly on them), [[merge]] preserves
  * whichever layout its input has — a v2/v3 merge re-counts ALL the
  * new corpus's orders in ONE shared tokenisation pass — and
  * [[readMeta]] REJECTS artifacts stamped with a version above what
  * this reader knows (a future v4 must fail loudly, not load silently
  * under v3 semantics).
  */
object LmIndex {

  /** Highest artifact format version this reader understands. */
  val MaxVersion = 3L

  /** Train on `docs` and persist under `dir`. The artifact stores the
    * UNPRUNED count frame ([[TextOps.bigramCounts]]) — counts are
    * additive, so [[merge]] can fold new data in exactly; the pruned
    * conditional probabilities [[load]] serves are derived from them
    * with [[TextOps.statsFromCounts]] (a vocabulary-sized aggregation
    * per plan — the price of exact mergeability). `numFiles` bounds the
    * artifact's file count (vocabulary-sized data — a handful of sorted
    * files beats one file per shuffle partition). */
  def build(docs: DataFrame, dir: String, minCount: Long = 5,
            numFiles: Int = 4,
            provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    val spark = docs.sparkSession
    writeCountsData(TextOps.bigramCounts(docs), dir, numFiles)
    writeMeta(spark, dir, metaFromDisk(spark, dir, minCount, None))
    ArtifactProvenance.stampArtifact(spark, dir, "lm-index", "build",
      provenance)
  }

  /** [[build]] plus the v2 trigram layer, from ONE corpus tokenisation:
    * the pass emits each document's bigram AND trigram shingles into a
    * single (k, gram)-keyed count (map-side combined — the shuffle
    * carries one row per distinct gram per partition), which then splits
    * into the two persisted layers. At 100 TB the corpus scan dominates
    * an artifact build; paying it once for both orders is the point of
    * building them together. */
  def buildWithTrigrams(docs: DataFrame, dir: String, minCount: Long = 5,
                        minCount3: Long = 3, numFiles: Int = 4,
                        provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    val spark = docs.sparkSession
    val kg = TextOps.ngramCounts23(docs)
    // gram-vocabulary-sized, feeds two writes — cache so the corpus
    // aggregation runs once, not once per layer
    Caching.ensureCached(kg)
    writeCountsData(TextOps.bigramCountsOf(kg), dir, numFiles)
    writeCounts3Data(TextOps.trigramCountsOf(kg), dir, numFiles)
    writeMeta(spark, dir, metaFromDisk(spark, dir, minCount, Some(minCount3)))
    ArtifactProvenance.stampArtifact(spark, dir, "lm-index", "build",
      provenance)
  }

  /** [[buildWithTrigrams]] extended to the v3 ORDER-5 layout: all four
    * backoff layers (2, 3, 4, 5) from ONE corpus tokenisation
    * ([[TextOps.ngramCountsUpTo]] — the pass emits every order's
    * shingles into a single (k, gram)-keyed map-side-combined count),
    * each layer persisted unpruned so [[merge]] stays an exact
    * incremental retrain at every order. */
  def buildWithOrders(docs: DataFrame, dir: String, minCount: Long = 5,
                      minCount3: Long = 3, minCount4: Long = 2,
                      minCount5: Long = 2, numFiles: Int = 4,
                      provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    val spark = docs.sparkSession
    val kg = TextOps.ngramCountsUpTo(docs, 5)
    // gram-vocabulary-sized, feeds four writes — cache so the corpus
    // aggregation runs once, not once per layer
    Caching.ensureCached(kg)
    writeCountsData(TextOps.bigramCountsOf(kg), dir, numFiles)
    (3 to 5).foreach(k =>
      writeCountsKData(TextOps.ngramCountsOf(kg, k), dir, k, numFiles))
    writeMeta(spark, dir, metaFromDisk(spark, dir, minCount,
      Some(minCount3), Some(minCount4), Some(minCount5)))
    ArtifactProvenance.stampArtifact(spark, dir, "lm-index", "build",
      provenance)
  }

  /** One persisted LM PER LANGUAGE — CCNet's deployment shape: the
    * corpus arrives with a language prediction (the trained-ID
    * projection), each predicted-language slice trains ITS OWN
    * reference model, and scoring dispatches every document to its
    * language's model. Layout: `dir/lang=<code>/` is a full [[build]]
    * artifact per language (individually loadable, mergeable,
    * recalibratable), plus `dir/langs.json` recording the language set.
    * Language codes must be path-safe tokens (`[A-Za-z0-9_-]+`) —
    * anything else is refused loudly rather than written into a
    * directory name; null-language rows train nothing. The one
    * top-level provenance stamp covers the whole family (the sub-builds
    * share a corpus). */
  def buildPerLang(docs: DataFrame, dir: String,
                   langCol: String = "predicted_lang", minCount: Long = 5,
                   numFiles: Int = 4,
                   provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    val spark = docs.sparkSession
    // ONE corpus tokenisation for every language's counts (the
    // buildWithOrders discipline — at 100 TB the corpus scan dominates;
    // a per-language filtered build would pay it once per language).
    // The keyed count frame is (lang, gram)-vocabulary-sized — cache it
    // so the per-language writes split a materialised frame.
    val counts = TextOps.bigramCountsByKey(docs, langCol)
    Caching.ensureCached(counts)
    val langs = counts.select(col(langCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(langs.nonEmpty, "no non-null language labels to train on")
    langs.foreach { l =>
      require(l.matches("[A-Za-z0-9_-]+"),
        s"language '$l' is not a path-safe token — refusing to write it " +
          "into an artifact directory name")
      val sub = s"$dir/lang=$l"
      writeCountsData(counts.filter(col(langCol) === l).drop(langCol),
        sub, numFiles)
      writeMeta(spark, sub, metaFromDisk(spark, sub, minCount, None))
    }
    writeLangsMeta(spark, dir, langs, minCount)
    ArtifactProvenance.stampArtifact(spark, dir, "lm-index-perlang", "build",
      provenance)
  }

  /** Fold `newDocs` (language-labelled like [[buildPerLang]]'s input)
    * into the per-language family at `dir`, writing the combined family
    * to `outDir` — the [[merge]] contract per language, from ONE keyed
    * tokenisation of the new documents: existing languages union their
    * persisted counts with the new slice's (exact — counts are
    * additive), languages NEW to the family get a fresh layer under the
    * family's pinned minCount, and languages absent from the new corpus
    * carry over unchanged. Spec-pinned equal to [[buildPerLang]] on the
    * concatenated corpus. */
  def mergePerLang(spark: SparkSession, dir: String, newDocs: DataFrame,
                   outDir: String, langCol: String = "predicted_lang",
                   numFiles: Int = 4,
                   provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dir, outDir)
    val (stored, minCount) = readLangsMeta(spark, dir)
    val fresh = TextOps.bigramCountsByKey(newDocs, langCol)
    Caching.ensureCached(fresh)
    val newLangs = fresh.select(col(langCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val all = (stored ++ newLangs).distinct.sorted
    all.foreach { l =>
      require(l.matches("[A-Za-z0-9_-]+"),
        s"language '$l' is not a path-safe token — refusing to write it " +
          "into an artifact directory name")
      val freshSlice = fresh.filter(col(langCol) === l).drop(langCol)
      val combined =
        if (!stored.contains(l)) freshSlice
        else if (!newLangs.contains(l)) spark.read.parquet(s"$dir/lang=$l/counts")
        else spark.read.parquet(s"$dir/lang=$l/counts")
          .unionByName(freshSlice)
          .groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("n"))
      val sub = s"$outDir/lang=$l"
      writeCountsData(combined, sub, numFiles)
      writeMeta(spark, sub, metaFromDisk(spark, sub, minCount, None))
    }
    writeLangsMeta(spark, outDir, all, minCount)
    ArtifactProvenance.stampArtifact(spark, outDir, "lm-index-perlang",
      "merge", provenance)
  }

  /** The language set a [[buildPerLang]] artifact carries. */
  def langs(spark: SparkSession, dir: String): Seq[String] =
    readLangsMeta(spark, dir)._1

  /** The family metadata: (languages, the pinned minCount every layer
    * was — and every merged-in layer will be — pruned under). */
  private def readLangsMeta(spark: SparkSession, dir: String): (Seq[String], Long) = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/langs.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path),
      s"$dir has no langs.json — not a per-language LmIndex artifact")
    val in = fs.open(path)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JsonAST.JObject(fields) =>
        val m = fields.toMap
        val ls = m.get("langs") match {
          case Some(org.json4s.JsonAST.JArray(items)) => items.map {
            case org.json4s.JsonAST.JString(s) => s
            case _ => throw new IllegalArgumentException(
              s"$dir/langs.json langs must be strings")
          }
          case _ => throw new IllegalArgumentException(
            s"$dir/langs.json carries no langs array")
        }
        val mc = m.get("minCount") match {
          case Some(org.json4s.JsonAST.JInt(v)) => v.toLong
          case _ => throw new IllegalArgumentException(
            s"$dir/langs.json carries no minCount")
        }
        (ls, mc)
      case _ => throw new IllegalArgumentException(
        s"$dir/langs.json is not a JSON object")
    }
  }

  /** Language-dispatched scoring against the persisted per-language
    * family: the per-language stats frames (each derived under ITS OWN
    * recorded prune) are tagged with their language and unioned into
    * one lang-keyed model — vocabulary-sized per language, broadcast
    * when the recorded pruned counts sum small — and the corpus joins
    * it ONCE on `(lang, w1, w2)` ([[TextOps.lmScoreByKeyWith]]). One
    * corpus pass + one join + one aggregation for ANY number of
    * languages (never a per-model corpus scan — and, unlike a union of
    * per-model scorings, still a single streaming aggregation, so a
    * streaming `docs` frame dispatches per micro-batch). Documents
    * whose `langCol` names no stored model (or is null) score all-unk
    * (`avg_logp == unkLogP`) — visible, never dropped. Output
    * `(doc_id, langCol, n_bigrams, avg_logp)`. */
  def scoreByLang(spark: SparkSession, dir: String, docs: DataFrame,
                  langCol: String = "predicted_lang",
                  unkLogP: Double = -10.0,
                  broadcastMaxRows: Long = 4L << 20,
                  freshAgainst: Option[DataFrame] = None): DataFrame = {
    ArtifactProvenance.checkFresh(spark, dir, freshAgainst)
    val ls = langs(spark, dir)
    val stats = ls.map { l =>
      val sub = s"$dir/lang=$l"
      val m = readMeta(spark, sub)
      // Exact variant: per-language continuation totals land on .5e-6
      // probability boundaries routinely (see statsFromCountsExact)
      TextOps.statsFromCountsExact(spark.read.parquet(s"$sub/counts"),
          m.minCount)
        .select(lit(l).as(langCol), col("w1"), col("w2"), col("p_cond"))
    }.reduce(_.unionByName(_))
    // broadcast decision from the RECORDED pruned counts (zero jobs),
    // summed across languages — the union is what the join ships
    val total = ls.map(l => readMeta(spark, s"$dir/lang=$l").nBigrams).sum
    val hinted = if (total <= broadcastMaxRows) broadcast(stats) else stats
    TextOps.lmScoreByKeyWith(docs, hinted, langCol, unkLogP)
  }

  private def writeLangsMeta(spark: SparkSession, dir: String,
                             langs: Seq[String], minCount: Long): Unit = {
    import org.json4s.JsonAST._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(JObject(
        "langs" -> JArray(langs.toList.map(JString(_))),
        "minCount" -> JInt(BigInt(minCount)))))
    val path = new org.apache.hadoop.fs.Path(s"$dir/langs.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Fold `newDocs` into the artifact at `dir`, writing the combined
    * model to `outDir` — an EXACT incremental retrain (spec-pinned equal
    * to building on the concatenated corpus): only the new documents are
    * tokenised (ONE pass for every layer the artifact carries); the old
    * corpus contributes its persisted vocabulary-sized counts.
    *
    * Recorded cut points (`cuts`/`cuts3`/`cuts5`) are INTENTIONALLY
    * DISCARDED — the merged model's score distribution is not the input
    * model's, so carried-over quartiles would misbucket silently;
    * [[bucket]]/[[bucket3]]/[[bucket5]] fail loudly until the matching
    * `recordCuts*` recalibrates on `outDir`. */
  def merge(spark: SparkSession, dir: String, newDocs: DataFrame,
            outDir: String, numFiles: Int = 4,
            provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    // an in-place merge (outDir == dir) would overwrite-delete the input
    // counts before the lazy union plan reads them, losing the artifact
    ArtifactPaths.requireDistinct(spark, dir, outDir)
    val m = readMeta(spark, dir)
    val maxOrder =
      if (m.minCount5.isDefined) 5 else if (m.minCount3.isDefined) 3 else 2
    def mergeLayer(path: String, fresh: DataFrame, k: Int): DataFrame = {
      val keys = (1 to k).map(i => col(s"w$i"))
      spark.read.parquet(path).unionByName(fresh)
        .groupBy(keys: _*).agg(sum(col("n")).as("n"))
    }
    if (maxOrder == 2)
      writeCountsData(
        mergeLayer(s"$dir/counts", TextOps.bigramCounts(newDocs), 2),
        outDir, numFiles)
    else {
      // v2/v3: the new corpus pays ONE tokenisation for every layer,
      // exactly like the multi-order builds
      val kg = TextOps.ngramCountsUpTo(newDocs, maxOrder)
      Caching.ensureCached(kg)
      writeCountsData(
        mergeLayer(s"$dir/counts", TextOps.bigramCountsOf(kg), 2),
        outDir, numFiles)
      (3 to maxOrder).foreach(k => writeCountsKData(
        mergeLayer(countsPath(dir, k), TextOps.ngramCountsOf(kg, k), k),
        outDir, k, numFiles))
    }
    writeMeta(spark, outDir, metaFromDisk(spark, outDir, m.minCount,
      m.minCount3, m.minCount4, m.minCount5))
    ArtifactProvenance.stampArtifact(spark, outDir, "lm-index", "merge",
      provenance)
  }

  /** The model stats frame `(w1, w2, n, p_cond)` derived from the
    * persisted counts, broadcast-hinted when the recorded pruned row
    * count is at most `broadcastMaxRows` (decided from metadata — zero
    * jobs). */
  def load(spark: SparkSession, dir: String,
           broadcastMaxRows: Long = 4L << 20): DataFrame = {
    val m = readMeta(spark, dir)
    val df = TextOps.statsFromCounts(
      spark.read.parquet(s"$dir/counts"), m.minCount)
    if (m.nBigrams <= broadcastMaxRows) broadcast(df) else df
  }

  /** The trigram stats frame `(w1, w2, w3, n, p_cond)` from a v2
    * artifact, broadcast-hinted from the recorded pruned count exactly
    * like [[load]]. Loud on v1 artifacts — a silently-empty trigram
    * layer would back every document off to the bigram floor. */
  def load3(spark: SparkSession, dir: String,
            broadcastMaxRows: Long = 4L << 20): DataFrame = {
    val m = readMeta(spark, dir)
    require(m.minCount3.isDefined,
      s"$dir has no trigram layer (v1 artifact) — rebuild with " +
        "buildWithTrigrams to enable backoff scoring")
    val df = TextOps.trigramStatsFromCounts(
      spark.read.parquet(s"$dir/counts3"), m.minCount3.get)
    if (m.nTrigrams.getOrElse(Long.MaxValue) <= broadcastMaxRows)
      broadcast(df)
    else df
  }

  /** Stupid-backoff scoring against the persisted v2 model —
    * [[TextOps.lmScore3With]] over [[load3]]+[[load]]; stream-safe the
    * same way [[score]] is. */
  def score3(spark: SparkSession, dir: String, docs: DataFrame,
             alpha: Double = 0.4, unkLogP: Double = -10.0,
             broadcastMaxRows: Long = 4L << 20,
             freshAgainst: Option[DataFrame] = None): DataFrame = {
    ArtifactProvenance.checkFresh(spark, dir, freshAgainst)
    TextOps.lmScore3With(docs, load3(spark, dir, broadcastMaxRows),
      load(spark, dir, broadcastMaxRows), alpha, unkLogP)
  }

  /** The order-4 stats frame `(w1..w4, n, p_cond)` from a v3 artifact —
    * [[load3]]'s contract one order up; loud below v3. */
  def load4(spark: SparkSession, dir: String,
            broadcastMaxRows: Long = 4L << 20): DataFrame =
    loadK(spark, dir, 4, broadcastMaxRows)

  /** The order-5 stats frame `(w1..w5, n, p_cond)` from a v3 artifact;
    * loud below v3. */
  def load5(spark: SparkSession, dir: String,
            broadcastMaxRows: Long = 4L << 20): DataFrame =
    loadK(spark, dir, 5, broadcastMaxRows)

  private def loadK(spark: SparkSession, dir: String, k: Int,
                    broadcastMaxRows: Long): DataFrame = {
    val m = readMeta(spark, dir)
    val (mc, n) = k match {
      case 4 => (m.minCount4, m.n4grams)
      case _ => (m.minCount5, m.n5grams)
    }
    require(mc.isDefined,
      s"$dir has no order-$k layer (pre-v3 artifact) — rebuild with " +
        "buildWithOrders to enable order-5 backoff scoring")
    val df = TextOps.ngramStatsFromCounts(
      spark.read.parquet(countsPath(dir, k)), k, mc.get)
    if (n.getOrElse(Long.MaxValue) <= broadcastMaxRows) broadcast(df) else df
  }

  /** Order-5 stupid-backoff scoring against the persisted v3 model —
    * [[TextOps.lmScore5With]] over all four layers, each broadcast-
    * decided at PLAN time from its own recorded pruned count (a
    * web-scale 5-gram layer falls back to a shuffle join while the
    * bigram layer still broadcasts); stream-safe like [[score]]. */
  def score5(spark: SparkSession, dir: String, docs: DataFrame,
             alpha: Double = 0.4, unkLogP: Double = -10.0,
             broadcastMaxRows: Long = 4L << 20,
             freshAgainst: Option[DataFrame] = None): DataFrame = {
    ArtifactProvenance.checkFresh(spark, dir, freshAgainst)
    TextOps.lmScore5With(docs,
      load5(spark, dir, broadcastMaxRows), load4(spark, dir, broadcastMaxRows),
      load3(spark, dir, broadcastMaxRows), load(spark, dir, broadcastMaxRows),
      alpha, unkLogP)
  }

  /** The v2 layer's recorded `(minCount3, nTrigrams)`, `None` on v1. */
  def meta3(spark: SparkSession, dir: String): Option[(Long, Long)] = {
    val m = readMeta(spark, dir)
    for (mc <- m.minCount3; n <- m.nTrigrams) yield (mc, n)
  }

  /** The v3 layers' recorded `(minCount4, n4grams, minCount5, n5grams)`,
    * `None` below v3. */
  def meta5(spark: SparkSession, dir: String): Option[(Long, Long, Long, Long)] = {
    val m = readMeta(spark, dir)
    for (m4 <- m.minCount4; n4 <- m.n4grams; m5 <- m.minCount5; n5 <- m.n5grams)
      yield (m4, n4, m5, n5)
  }

  private def countsPath(dir: String, k: Int): String =
    if (k == 2) s"$dir/counts" else s"$dir/counts$k"

  private def writeCountsData(counts: DataFrame, dir: String,
                              numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    counts
      .repartitionByRange(numFiles, col("w1"), col("w2"))
      .sortWithinPartitions(col("w1"), col("w2"))
      .write.mode("overwrite").parquet(s"$dir/counts")
  }

  /** One order-`k` layer under the family layout discipline:
    * range-partitioned and sorted on the full gram key (sorted runs
    * compress well; parquet min/max prunes point lookups). */
  private def writeCountsKData(counts: DataFrame, dir: String, k: Int,
                               numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val keys = (1 to k).map(i => col(s"w$i"))
    counts
      .repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(countsPath(dir, k))
  }

  private def writeCounts3Data(counts: DataFrame, dir: String,
                               numFiles: Int): Unit =
    writeCountsKData(counts, dir, 3, numFiles)

  /** Pruned row counts read back from the just-written layers — the
    * broadcast decision is about the frames the scoring joins actually
    * see (one vocabulary-sized job per layer, at build time only). */
  private def metaFromDisk(spark: SparkSession, dir: String, minCount: Long,
                           minCount3: Option[Long],
                           minCount4: Option[Long] = None,
                           minCount5: Option[Long] = None): Meta = {
    val n = TextOps.statsFromCounts(
      spark.read.parquet(s"$dir/counts"), minCount).count()
    def prunedCount(k: Int, mc: Option[Long]): Option[Long] =
      mc.map(m => TextOps.ngramStatsFromCounts(
        spark.read.parquet(countsPath(dir, k)), k, m).count())
    Meta(minCount, n, None, minCount3, prunedCount(3, minCount3),
      minCount4 = minCount4, n4grams = prunedCount(4, minCount4),
      minCount5 = minCount5, n5grams = prunedCount(5, minCount5))
  }

  /** Score documents against the persisted reference model —
    * [[TextOps.lmScoreWith]] over [[load]]; works unchanged on a
    * streaming `docs` frame (stream-static join + stateful aggregation,
    * see lmScoreWith's streaming contract). */
  def score(spark: SparkSession, dir: String, docs: DataFrame,
            unkLogP: Double = -10.0,
            broadcastMaxRows: Long = 4L << 20,
            freshAgainst: Option[DataFrame] = None): DataFrame = {
    ArtifactProvenance.checkFresh(spark, dir, freshAgainst)
    TextOps.lmScoreWith(docs, load(spark, dir, broadcastMaxRows), unkLogP)
  }

  /** The artifact's recorded `(minCount, nBigrams)`. */
  def meta(spark: SparkSession, dir: String): (Long, Long) = {
    val m = readMeta(spark, dir)
    (m.minCount, m.nBigrams)
  }

  /** Score a calibration corpus under the artifact and RECORD its
    * quartile cut points into the metadata — after which [[bucket]] is a
    * stateless online operation. This is CCNet's actual deployment
    * shape: the percentile computation (a corpus-wide aggregation with
    * no streaming equivalent) runs once per calibration snapshot; every
    * later batch or stream compares against FIXED cuts. Quartiles, not
    * CCNet's terciles, for the same engine-exactness reason as
    * [[TextOps.perplexityBuckets]] (quarter fractions interpolate
    * bit-identically; a third does not). */
  def recordCuts(spark: SparkSession, dir: String, calibration: DataFrame,
                 unkLogP: Double = -10.0): Unit = {
    val row = score(spark, dir, calibration, unkLogP)
      .filter(col("n_bigrams") > 0)
      .agg(round(percentile(col("avg_logp"), lit(0.25)), 6).as("p25"),
        round(percentile(col("avg_logp"), lit(0.75)), 6).as("p75"))
      .collect()(0)
    require(!row.isNullAt(0), "calibration corpus produced no scorable document")
    val m = readMeta(spark, dir)
    writeMeta(spark, dir,
      m.copy(cuts = Some((row.getDouble(0), row.getDouble(1)))))
  }

  /** The recorded `(p25, p75)` cut points, if [[recordCuts]] ran. */
  def cuts(spark: SparkSession, dir: String): Option[(Double, Double)] =
    readMeta(spark, dir).cuts

  /** [[recordCuts]] for the ORDER-3 score distribution: quartile cuts
    * of [[score3]] over a calibration corpus, stored as a separate
    * `(p25_3, p75_3)` pair — backoff scores live on a different scale
    * than bigram scores (trigram hits score near ln 1, backed-off terms
    * carry the α discount), so sharing one cut pair would misbucket
    * both. Requires the v2 trigram layer ([[load3]]'s loud contract);
    * preserves every other metadata field, including the bigram cuts. */
  def recordCuts3(spark: SparkSession, dir: String, calibration: DataFrame,
                  alpha: Double = 0.4, unkLogP: Double = -10.0): Unit = {
    val row = score3(spark, dir, calibration, alpha, unkLogP)
      .filter(col("n_trigrams") > 0)
      .agg(round(percentile(col("avg_logp3"), lit(0.25)), 6).as("p25"),
        round(percentile(col("avg_logp3"), lit(0.75)), 6).as("p75"))
      .collect()(0)
    require(!row.isNullAt(0), "calibration corpus produced no scorable document")
    val m = readMeta(spark, dir)
    writeMeta(spark, dir,
      m.copy(cuts3 = Some((row.getDouble(0), row.getDouble(1)))))
  }

  /** The recorded order-3 cut points, if [[recordCuts3]] ran. */
  def cuts3(spark: SparkSession, dir: String): Option[(Double, Double)] =
    readMeta(spark, dir).cuts3

  /** [[recordCuts3]] at order 5: quartile cuts of [[score5]] over a
    * calibration corpus, stored as their own `(p25_5, p75_5)` pair —
    * each order's backoff scores live on their own scale. Requires the
    * v3 layers; preserves every other metadata field. */
  def recordCuts5(spark: SparkSession, dir: String, calibration: DataFrame,
                  alpha: Double = 0.4, unkLogP: Double = -10.0): Unit = {
    val row = score5(spark, dir, calibration, alpha, unkLogP)
      .filter(col("n_5grams") > 0)
      .agg(round(percentile(col("avg_logp5"), lit(0.25)), 6).as("p25"),
        round(percentile(col("avg_logp5"), lit(0.75)), 6).as("p75"))
      .collect()(0)
    require(!row.isNullAt(0), "calibration corpus produced no scorable document")
    val m = readMeta(spark, dir)
    writeMeta(spark, dir,
      m.copy(cuts5 = Some((row.getDouble(0), row.getDouble(1)))))
  }

  /** The recorded order-5 cut points, if [[recordCuts5]] ran. */
  def cuts5(spark: SparkSession, dir: String): Option[(Double, Double)] =
    readMeta(spark, dir).cuts5

  /** [[bucket3]] at order 5 — the CCNet head/middle/tail split under
    * the production model order, against [[recordCuts5]]'s frozen
    * quartiles: a pure post-scoring projection, stream-safe like
    * [[score5]]; documents with fewer than 5 tokens bucket `unscored`. */
  def bucket5(spark: SparkSession, dir: String, docs: DataFrame,
              alpha: Double = 0.4, unkLogP: Double = -10.0): DataFrame = {
    val (p25, p75) = cuts5(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"$dir has no recorded order-5 cuts — run recordCuts5 first"))
    score5(spark, dir, docs, alpha, unkLogP)
      .withColumn("bucket",
        when(col("n_5grams") === 0, lit("unscored"))
          .when(col("avg_logp5") >= p75, lit("head"))
          .when(col("avg_logp5") >= p25, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_5grams"), col("avg_logp5"), col("bucket"))
  }

  /** [[bucket]] under the ORDER-3 cuts: head/middle/tail by the
    * stupid-backoff score against [[recordCuts3]]'s frozen quartiles —
    * a pure post-scoring projection, stream-safe like [[score3]];
    * documents with fewer than 3 tokens bucket `unscored`. */
  def bucket3(spark: SparkSession, dir: String, docs: DataFrame,
              alpha: Double = 0.4, unkLogP: Double = -10.0): DataFrame = {
    val (p25, p75) = cuts3(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"$dir has no recorded order-3 cuts — run recordCuts3 first"))
    score3(spark, dir, docs, alpha, unkLogP)
      .withColumn("bucket",
        when(col("n_trigrams") === 0, lit("unscored"))
          .when(col("avg_logp3") >= p75, lit("head"))
          .when(col("avg_logp3") >= p25, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_trigrams"), col("avg_logp3"), col("bucket"))
  }

  /** Head/middle/tail bucketing against the artifact's RECORDED cuts —
    * [[TextOps.perplexityBuckets]]'s output contract without its corpus
    * percentile aggregation, so it is a pure post-scoring projection and
    * runs on streaming frames exactly like [[score]]. Bucketing a corpus
    * against ITS OWN snapshot (artifact trained and calibrated on it)
    * reproduces perplexityBuckets row for row; the point of the split is
    * bucketing NEW data against a frozen reference distribution. */
  def bucket(spark: SparkSession, dir: String, docs: DataFrame,
             unkLogP: Double = -10.0): DataFrame = {
    val (p25, p75) = cuts(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"$dir has no recorded cuts — run recordCuts first"))
    score(spark, dir, docs, unkLogP)
      .withColumn("bucket",
        when(col("n_bigrams") === 0, lit("unscored"))
          .when(col("avg_logp") >= p75, lit("head"))
          .when(col("avg_logp") >= p25, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"), col("bucket"))
  }

  private case class Meta(minCount: Long, nBigrams: Long,
                          cuts: Option[(Double, Double)],
                          minCount3: Option[Long] = None,
                          nTrigrams: Option[Long] = None,
                          cuts3: Option[(Double, Double)] = None,
                          minCount4: Option[Long] = None,
                          n4grams: Option[Long] = None,
                          minCount5: Option[Long] = None,
                          n5grams: Option[Long] = None,
                          cuts5: Option[(Double, Double)] = None)

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    import org.json4s.JsonAST._
    val base = List(
      "minCount" -> (JInt(BigInt(m.minCount)): JValue),
      "nBigrams" -> (JInt(BigInt(m.nBigrams)): JValue))
    def cutsOf(key: String, c: Option[(Double, Double)]) =
      c.toList.flatMap { case (p25, p75) =>
        List(s"p25$key" -> (JDouble(p25): JValue),
          s"p75$key" -> (JDouble(p75): JValue))
      }
    // the version stamp travels with the highest layer present (absent
    // on v1 artifacts); each layer's minCount/pruned-count pair is
    // emitted IFF that layer exists — readMeta's "layer presence = key
    // presence" invariant, so a hypothetical order-5-without-order-3
    // meta can never write a phantom zero-valued layer
    val version: Long =
      if (m.minCount5.isDefined) 3L else if (m.minCount3.isDefined) 2L else 1L
    def layer(mcKey: String, mc: Option[Long],
              nKey: String, nv: Option[Long]): List[(String, JValue)] =
      mc.toList.flatMap(v =>
        List(mcKey -> (JInt(BigInt(v)): JValue),
          nKey -> (JInt(BigInt(nv.getOrElse(0L))): JValue)))
    val layerFields =
      (if (version >= 2) List("version" -> (JInt(BigInt(version)): JValue))
       else Nil) ++
      layer("minCount3", m.minCount3, "nTrigrams", m.nTrigrams) ++
      layer("minCount4", m.minCount4, "n4grams", m.n4grams) ++
      layer("minCount5", m.minCount5, "n5grams", m.n5grams)
    val withCuts = base ++ cutsOf("", m.cuts) ++ cutsOf("_3", m.cuts3) ++
      cutsOf("_5", m.cuts5) ++ layerFields
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(JObject(withCuts: _*)))
    val path = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String): Meta = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JsonAST.JObject(fields) =>
        val m = fields.toMap
        def longOf(k: String): Long = m.get(k) match {
          case Some(org.json4s.JsonAST.JInt(v)) => v.toLong
          case _ => 0L
        }
        def dblOf(k: String): Option[Double] = m.get(k) match {
          case Some(org.json4s.JsonAST.JDouble(v)) => Some(v)
          case Some(org.json4s.JsonAST.JInt(v)) => Some(v.toDouble)
          case _ => None
        }
        def optLong(k: String): Option[Long] = m.get(k).collect {
          case org.json4s.JsonAST.JInt(v) => v.toLong
        }
        def cutsOf(key: String): Option[(Double, Double)] =
          for (a <- dblOf(s"p25$key"); b <- dblOf(s"p75$key")) yield (a, b)
        // the explicit version stamp gates forward compatibility: a
        // future v4 artifact must fail HERE, loudly, instead of loading
        // silently under v3 semantics (layer presence alone cannot tell
        // — v4 would carry every v3 key too)
        val version = optLong("version").getOrElse(1L)
        require(version <= MaxVersion,
          s"$dir is an LmIndex format v$version artifact; this reader " +
            s"understands up to v$MaxVersion — upgrade before loading")
        // layer presence = key presence (the writers emit a layer's keys
        // iff the layer exists), so a legitimate minCount of 0 still
        // reads back as a present layer
        Meta(longOf("minCount"), longOf("nBigrams"), cutsOf(""),
          optLong("minCount3"), optLong("nTrigrams"), cutsOf("_3"),
          optLong("minCount4"), optLong("n4grams"),
          optLong("minCount5"), optLong("n5grams"), cutsOf("_5"))
      case _ => Meta(0L, 0L, None)
    }
  }
}
