package graft.ops

import org.apache.spark.sql.SparkSession

/** Interleaved A/B harness for the r16 fan-out pass: machine drift
  * between JVM runs swamps per-query deltas, so each query is timed with
  * [[Parallel]] fan-out DISABLED (conf `graft.fan.maxInputBytes = 0`)
  * and ENABLED alternately inside one JVM (A B A B A B, best-of-3 per
  * side). `Test/runMain graft.ops.OptProfile <query> [query...]` on
  * SPARK_GRAFT_SF_DIR. */
object OptProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: OptProfile <query> [query...]")
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

    for (name <- args) {
      def once(fan: Boolean): Double = {
        if (fan) spark.conf.unset(Parallel.MaxInputBytesKey)
        else spark.conf.set(Parallel.MaxInputBytesKey, "0")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(false); once(true) // warm both plan shapes
      val off = collection.mutable.Buffer[Double]()
      val on = collection.mutable.Buffer[Double]()
      (1 to 3).foreach { _ => off += once(false); on += once(true) }
      println(f"[opt] $name%-28s off=${off.min}%.3f on=${on.min}%.3f " +
        f"(med ${off.sorted.apply(1)}%.3f vs ${on.sorted.apply(1)}%.3f)")
    }
    spark.stop()
  }
}
