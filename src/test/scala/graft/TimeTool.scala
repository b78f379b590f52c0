package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc query timer: `Test/runMain graft.TimeTool <query> [query...]`
  * runs each named [[SparkEntry.queries]] entry against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) with the Bench harness's
  * session shape and prints warmed best-of-3 seconds — the number the
  * Bench budget comments are calibrated from. */
object TimeTool {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeTool <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- args) {
      once(name) // warm-up
      val best = Seq(once(name), once(name), once(name)).min
      println(f"[time] $name warmed best-of-3: $best%.3f s ($sfDir)")
    }
    spark.stop()
  }
}
