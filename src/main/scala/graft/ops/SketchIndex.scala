package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted profile sketches — the cardinality/frequency member of the
  * build-once artifact family ([[IvfIndex]], [[LmIndex]],
  * [[MinhashIndex]], [[BpeIndex]]).
  *
  * The production shape this enables: profile each ingest batch ONCE
  * into bounded state (a KMV buffer per group, a d×w count-min grid),
  * persist it, and answer "distinct shingles per source so far" /
  * "estimated frequency of this token across the whole corpus" by
  * reading kilobytes — never re-scanning yesterday's 100 TB. Both
  * merges are EXACT (spec-pinned equal to a fresh build over the
  * concatenated stream):
  *
  *  - KMV: the k smallest distinct hashes of A ∪ B are all within the
  *    k smallest of A plus the k smallest of B, so re-aggregating the
  *    stored buffers IS the union's buffer.
  *  - Count-min: counters are plain sums, so elementwise addition of
  *    two grids equals the grid of the concatenated stream.
  *
  * Layout: `dir/data/…parquet` plus `dir/meta.json` pinning the sketch
  * parameters (kind, k or d×w, salt, hash mode) — readers take them
  * from the metadata, so a probe/sketch parameter mismatch cannot
  * happen. Metadata parsing fails loudly on an unknown kind: silently
  * estimating from a mismatched artifact would be a wrong-answer bug,
  * not a recoverable default.
  */
object SketchIndex {

  /** Sketch `(groupCol, valueCol)` with a k-sized KMV buffer per group
    * ([[Sketch.kmvSketch]]) and persist. The artifact is O(groups × k)
    * longs regardless of input size. */
  def buildKmv(df: DataFrame, groupCol: String, valueCol: String, dir: String,
               k: Int = 64, salt: String = "kmv",
               mode: HashMode = HashMode.Portable, numFiles: Int = 1,
               provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    Sketch.kmvSketch(df, groupCol, valueCol, k, salt, mode)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$dir/data")
    writeMeta(df.sparkSession, dir, "kmv", Map("k" -> k.toString, "salt" -> salt,
      "mode" -> modeName(mode)))
    ArtifactProvenance.stampArtifact(df.sparkSession, dir, "sketch-kmv",
      "build", provenance)
  }

  /** Fold new raw rows into a KMV artifact: only `df` is hashed (the
    * stored groups contribute their buffers, never their source data),
    * then the buffers re-aggregate — exactly a fresh build over the
    * concatenated stream. In-place output is rejected: the lazy union
    * plan still reads `dir` when `outDir` is written. */
  def appendKmv(spark: SparkSession, dir: String, df: DataFrame,
                groupCol: String, valueCol: String, outDir: String,
                numFiles: Int = 1,
                provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dir, outDir)
    val m = readMeta(spark, dir, "kmv")
    val k = m("k").toInt
    val fresh = Sketch.kmvSketch(df, groupCol, valueCol, k, m("salt"),
      modeOf(m("mode")))
    writeMerged(spark, Seq(spark.read.parquet(s"$dir/data"), fresh), k,
      outDir, numFiles)
    writeMeta(spark, outDir, "kmv", m)
    ArtifactProvenance.stampArtifact(spark, outDir, "sketch-kmv", "append",
      provenance)
  }

  /** Merge two KMV artifacts (same k/salt/mode — verified from both
    * metadata files) into `outDir`. */
  def mergeKmv(spark: SparkSession, dirA: String, dirB: String,
               outDir: String, numFiles: Int = 1,
               provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dirA, outDir)
    ArtifactPaths.requireDistinct(spark, dirB, outDir)
    val a = readMeta(spark, dirA, "kmv")
    val b = readMeta(spark, dirB, "kmv")
    require(a == b, s"KMV artifacts disagree on parameters: $a vs $b")
    writeMerged(spark, Seq(spark.read.parquet(s"$dirA/data"),
      spark.read.parquet(s"$dirB/data")), a("k").toInt, outDir, numFiles)
    writeMeta(spark, outDir, "kmv", a)
    ArtifactProvenance.stampArtifact(spark, outDir, "sketch-kmv", "merge",
      provenance)
  }

  /** Distinct-count estimates from a KMV artifact: `(group,
    * est_distinct)` via [[Sketch.kmvEstimate]] under the stored k. */
  def estimateKmv(spark: SparkSession, dir: String): DataFrame = {
    val m = readMeta(spark, dir, "kmv")
    Sketch.kmvEstimate(spark.read.parquet(s"$dir/data"), m("k").toInt)
  }

  private def writeMerged(spark: SparkSession, parts: Seq[DataFrame], k: Int,
                          outDir: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    import spark.implicits._
    parts.reduce(_ unionByName _)
      .select(col("group"), explode(col("kmv")).as("_h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK.minKDistinct(k))
      .toDF("group", "kmv")
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$outDir/data")
  }

  /** Sketch per-group `(keyCol → valueCol)` min-k row samples
    * ([[Sketch.quantileSketch]]) and persist — O(groups × k) pairs.
    * The artifact RECORDS k (and salt/mode), which closes the contract
    * the raw frames cannot check: [[appendQuantile]] and
    * [[mergeQuantile]] re-aggregate under the STORED k, so a caller can
    * never merge with a larger k than the inputs were built with (the
    * biased-sample hazard `Sketch.mergeQuantile` documents). */
  def buildQuantile(df: DataFrame, groupCol: String, keyCol: String,
                    valueCol: String, dir: String, k: Int = 64,
                    salt: String = "qs", mode: HashMode = HashMode.Portable,
                    numFiles: Int = 1,
                    provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    Sketch.quantileSketch(df, groupCol, keyCol, valueCol, k, salt, mode)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$dir/data")
    writeMeta(df.sparkSession, dir, "quantile", Map("k" -> k.toString,
      "salt" -> salt, "mode" -> modeName(mode)))
    ArtifactProvenance.stampArtifact(df.sparkSession, dir, "sketch-quantile",
      "build", provenance)
  }

  /** Fold new raw rows (DISJOINT from the artifact's — rows have
    * multiplicity, the [[Sketch.mergeQuantile]] contract) into a
    * quantile artifact: only `df` is hashed, then the samples
    * re-aggregate under the stored parameters — exactly a fresh build
    * over the concatenated stream. */
  def appendQuantile(spark: SparkSession, dir: String, df: DataFrame,
                     groupCol: String, keyCol: String, valueCol: String,
                     outDir: String, numFiles: Int = 1,
                     provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dir, outDir)
    val m = readMeta(spark, dir, "quantile")
    val k = m("k").toInt
    val fresh = Sketch.quantileSketch(df, groupCol, keyCol, valueCol, k,
      m("salt"), modeOf(m("mode")))
    writeMergedQuantile(spark, Seq(spark.read.parquet(s"$dir/data"), fresh),
      k, outDir, numFiles)
    writeMeta(spark, outDir, "quantile", m)
    ArtifactProvenance.stampArtifact(spark, outDir, "sketch-quantile",
      "append", provenance)
  }

  /** Merge two quantile artifacts over disjoint row sets (same
    * k/salt/mode — verified from both metadata files). */
  def mergeQuantile(spark: SparkSession, dirA: String, dirB: String,
                    outDir: String, numFiles: Int = 1,
                    provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dirA, outDir)
    ArtifactPaths.requireDistinct(spark, dirB, outDir)
    val a = readMeta(spark, dirA, "quantile")
    val b = readMeta(spark, dirB, "quantile")
    require(a == b, s"quantile artifacts disagree on parameters: $a vs $b")
    writeMergedQuantile(spark, Seq(spark.read.parquet(s"$dirA/data"),
      spark.read.parquet(s"$dirB/data")), a("k").toInt, outDir, numFiles)
    writeMeta(spark, outDir, "quantile", a)
    ArtifactProvenance.stampArtifact(spark, outDir, "sketch-quantile",
      "merge", provenance)
  }

  /** Nearest-rank quantile estimates from a quantile artifact via
    * [[Sketch.quantileEstimate]]. */
  def estimateQuantile(spark: SparkSession, dir: String,
                       pcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    readMeta(spark, dir, "quantile") // kind check
    Sketch.quantileEstimate(spark.read.parquet(s"$dir/data"), pcts)
  }

  private def writeMergedQuantile(spark: SparkSession, parts: Seq[DataFrame],
                                  k: Int, outDir: String,
                                  numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    import spark.implicits._
    parts.reduce(_ unionByName _)
      .select(col("group"), explode(col("sample")).as("_p"))
      .select(col("group"), col("_p._1").as("_h"), col("_p._2").as("_v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.minKPairs(k))
      .toDF("group", "sample")
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$outDir/data")
  }

  /** Build and persist a count-min grid over `valueCol`
    * ([[Sketch.countMin]]): ≤ d × w counter rows. */
  def buildCm(df: DataFrame, valueCol: String, dir: String,
              d: Int = 4, w: Int = 1 << 16, salt: String = "cm",
              mode: HashMode = HashMode.Portable, numFiles: Int = 1,
              provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    Sketch.countMin(df, valueCol, d, w, salt, mode)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$dir/data")
    writeMeta(df.sparkSession, dir, "cm", Map("d" -> d.toString,
      "w" -> w.toString, "salt" -> salt, "mode" -> modeName(mode)))
    ArtifactProvenance.stampArtifact(df.sparkSession, dir, "sketch-cm",
      "build", provenance)
  }

  /** Fold new raw rows into a count-min artifact (elementwise counter
    * addition — exact). */
  def appendCm(spark: SparkSession, dir: String, df: DataFrame,
               valueCol: String, outDir: String, numFiles: Int = 1,
               provenance: Option[ArtifactProvenance.Target] = None): Unit = {
    ArtifactPaths.requireDistinct(spark, dir, outDir)
    require(numFiles > 0, "numFiles must be positive")
    val m = readMeta(spark, dir, "cm")
    val fresh = Sketch.countMin(df, valueCol, m("d").toInt, m("w").toInt,
      m("salt"), modeOf(m("mode")))
    spark.read.parquet(s"$dir/data").unionByName(fresh)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$outDir/data")
    writeMeta(spark, outDir, "cm", m)
    ArtifactProvenance.stampArtifact(spark, outDir, "sketch-cm", "append",
      provenance)
  }

  /** Frequency estimates for `probes` against a count-min artifact:
    * `(value, est_count)` via [[Sketch.cmEstimate]] under the stored
    * parameters. */
  def estimateCm(spark: SparkSession, dir: String, probes: DataFrame,
                 valueCol: String): DataFrame = {
    val m = readMeta(spark, dir, "cm")
    Sketch.cmEstimate(spark.read.parquet(s"$dir/data"), probes, valueCol,
      m("d").toInt, m("w").toInt, m("salt"), modeOf(m("mode")))
  }

  private def modeName(mode: HashMode): String = mode match {
    case HashMode.Default => "default"
    case HashMode.Portable => "portable"
    case HashMode.PortableComposable => "portable_composable"
  }

  private def modeOf(name: String): HashMode = name match {
    case "default" => HashMode.Default
    case "portable" => HashMode.Portable
    case "portable_composable" => HashMode.PortableComposable
    case other => throw new IllegalArgumentException(
      s"unknown hash mode in sketch metadata: $other")
  }

  private def writeMeta(spark: SparkSession, dir: String, kind: String,
                        fields: Map[String, String]): Unit = {
    import org.json4s.JsonAST._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(("kind" -> JString(kind)) ::
          fields.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
    val path = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String,
                       expectKind: String): Map[String, String] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val fields = org.json4s.jackson.JsonMethods.parse(json) match {
      case org.json4s.JsonAST.JObject(fs0) => fs0.collect {
        case (k, org.json4s.JsonAST.JString(v)) => k -> v
      }.toMap
      case _ => Map.empty[String, String]
    }
    require(fields.get("kind").contains(expectKind),
      s"sketch artifact at $dir has kind ${fields.get("kind")}, expected $expectKind")
    fields - "kind"
  }
}
