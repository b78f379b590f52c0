package graft.stream

import graft.ops.{HashMode, NearDup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence tool: per-row (array-lambda) signature throughput vs the
  * exploded batch aggregation — decides whether the streaming signature
  * path needs a native codegen expression. */
object SigThroughputTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.T.load(spark, "/root/testdata/sf0.1", "documents").cache()
    val n = docs.count()
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (mode <- Seq[HashMode](HashMode.Default, HashMode.Portable)) {
      // warm
      StreamNearDup.bandedSignatures(docs, mode = mode).count()
      NearDup.minhashSignatures(docs, mode = mode).count()
      val (_, tRow) = timed(StreamNearDup.bandedSignatures(docs, mode = mode).count())
      val (_, tAgg) = timed(NearDup.minhashSignatures(docs, mode = mode).count())
      println(f"$mode: per-row path ${tRow}%.2fs vs exploded agg ${tAgg}%.2fs ($n docs)")
      // Portable routes through the native graft_minhash60; Default stays on lambdas
    }
    spark.stop()
  }
}
