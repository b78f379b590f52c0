package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the SURVEY §6 headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * - Materialises results through the `noop` sink so projections are not
  *   pruned away by a bare count() — the timing covers the full computation.
  * - Two iterations per query, best-of reported (first run pays JIT +
  *   file-listing warmup).
  * - A failing query is reported as -1.0 and fails the process — a broken
  *   query must not masquerade as a fast one.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_topn_join", "q5_join5", "q_metrics",
    "q_dedup_exact", "q_dedup_minhash", "q_ann_brute", "q_text_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    var failed = false
    val results = headline.map { name =>
      val secs =
        try math.min(runOnce(name), runOnce(name))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed = true
            -1.0
        }
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
