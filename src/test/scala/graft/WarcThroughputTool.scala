package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Crawl-ingest throughput evidence (PERF.md): the documents corpus at
  * `SPARK_GRAFT_SF_DIR` packed into real `.warc.gz` shards (~2048 docs
  * each), then the full files → records → StreamCurate chain timed on
  * the BATCH path and on the STREAMING twin (AvailableNow over the same
  * shards, parquet sink). Prints one JSON line with shard/record/byte
  * volumes and seconds per leg. The batch and streaming legs run the
  * SAME projection chain (spec-pinned identical rows); the streaming
  * delta is micro-batch + sink overhead. */
object WarcThroughputTool {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shardDir = s"/tmp/graft_warc_tp_${math.abs(srcDir.hashCode)}"
    graft.ops.WarcOps.packShards(spark, srcDir, shardDir)
    val files = new java.io.File(shardDir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    val totalBytes = files.map(_.length()).sum

    // offline artifacts over the same corpus (the StreamCurate contract)
    val corpus = T.load(spark, srcDir, "documents").select(col("doc_id"), col("text"))
    val artifacts = graft.stream.StreamCurate.Artifacts(
      graft.ops.Curate.frequentLines(corpus),
      graft.ops.ExactSubstr.frequentShingles(corpus),
      corpus.limit(50))

    def chain(records: DataFrame): DataFrame =
      graft.stream.StreamCurate.curate(
        records
          .filter(col("warc_type") === "response" && col("payload_text").isNotNull)
          .select((col("doc_id") + col("rec_index")).as("doc_id"),
            col("payload_text").as("text")),
        artifacts)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // batch leg: files -> records -> curation chain, noop-sunk
    def batchOnce(): Double = timed {
      chain(graft.ops.WarcOps.readWarc(spark, shardDir))
        .write.format("noop").mode("overwrite").save()
    }
    batchOnce() // warm-up (artifact builds included here)
    val tBatch = math.min(batchOnce(), batchOnce())
    val nRecords = graft.ops.WarcOps.readWarc(spark, shardDir).count()

    // streaming leg: the same chain over readWarcStream, AvailableNow,
    // real parquet sink + checkpoint (the production deployment shape)
    def streamOnce(tag: String): Double = timed {
      val out = s"$shardDir/stream_out_$tag"
      val q = chain(graft.ops.WarcOps.readWarcStream(spark, shardDir,
          maxFilesPerTrigger = Some(8)))
        .writeStream.option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow())
        .format("parquet").start(s"$out/data")
      q.awaitTermination()
    }
    streamOnce("w") // warm-up
    val tStream = math.min(streamOnce("a"), streamOnce("b"))

    val n = Bench.num3 _
    println(s"""{"metric":"warc_throughput","sf":"$srcDir",""" +
      s""""shards":${files.length},"bytes":$totalBytes,"records":$nRecords,""" +
      s""""batch_sec":${n(tBatch)},"stream_sec":${n(tStream)},""" +
      s""""batch_rec_per_sec":${n(nRecords / tBatch)},""" +
      s""""stream_rec_per_sec":${n(nRecords / tStream)}}""")
    spark.stop()
  }
}
