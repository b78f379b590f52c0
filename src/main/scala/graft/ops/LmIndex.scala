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
  * Layout: `dir/stats/…parquet` (w1, w2, n, p_cond), range-partitioned and
  * sorted by (w1, w2) — sorted runs of w1 compress well and give parquet
  * min/max row-group pruning for point lookups — plus `dir/meta.json`
  * carrying `minCount` and the exact row count. The count is the scale
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
  */
object LmIndex {

  /** Train [[TextOps.bigramLm]] on `docs` and persist it under `dir`.
    * `numFiles` bounds the artifact's file count (vocabulary-sized data —
    * a handful of sorted files beats one file per shuffle partition). */
  def build(docs: DataFrame, dir: String, minCount: Long = 5,
            numFiles: Int = 4): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val stats = TextOps.bigramLm(docs, minCount)
    stats
      .repartitionByRange(numFiles, col("w1"), col("w2"))
      .sortWithinPartitions(col("w1"), col("w2"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    // row count from parquet footers — no full scan
    val n = docs.sparkSession.read.parquet(s"$dir/stats").count()
    writeMeta(docs.sparkSession, dir, minCount, n)
  }

  /** The persisted stats frame `(w1, w2, n, p_cond)`, broadcast-hinted
    * when the artifact's recorded row count is at most
    * `broadcastMaxRows` (decided from metadata — zero jobs). */
  def load(spark: SparkSession, dir: String,
           broadcastMaxRows: Long = 4L << 20): DataFrame = {
    val (_, n) = readMeta(spark, dir)
    val df = spark.read.parquet(s"$dir/stats")
    if (n <= broadcastMaxRows) broadcast(df) else df
  }

  /** Score documents against the persisted reference model —
    * [[TextOps.lmScoreWith]] over [[load]]; works unchanged on a
    * streaming `docs` frame (stream-static join + stateful aggregation,
    * see lmScoreWith's streaming contract). */
  def score(spark: SparkSession, dir: String, docs: DataFrame,
            unkLogP: Double = -10.0,
            broadcastMaxRows: Long = 4L << 20): DataFrame =
    TextOps.lmScoreWith(docs, load(spark, dir, broadcastMaxRows), unkLogP)

  /** The artifact's recorded `(minCount, nBigrams)`. */
  def meta(spark: SparkSession, dir: String): (Long, Long) = readMeta(spark, dir)

  private def writeMeta(spark: SparkSession, dir: String,
                        minCount: Long, n: Long): Unit = {
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JsonAST.JObject(
        "minCount" -> org.json4s.JsonAST.JInt(BigInt(minCount)),
        "nBigrams" -> org.json4s.JsonAST.JInt(BigInt(n)))))
    val path = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String): (Long, Long) = {
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
        (longOf("minCount"), longOf("nBigrams"))
      case _ => (0L, 0L)
    }
  }
}
