package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B harness for fanning the ANALYTIC table scans
  * (lineitem/orders/events — multi-row-group but still far fewer scan
  * tasks than cores at sf0.1): times each query over the raw scan vs a
  * `repartition(defaultParallelism)` input, alternately in one JVM.
  * `Test/runMain graft.ops.FanProfile` on SPARK_GRAFT_SF_DIR. */
object FanProfile {
  def main(args: Array[String]): Unit = {
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
    import graft.analytics.Analytics

    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def customer = spark.read.parquet(s"$sfDir/customer.parquet")
    def fanned(df: DataFrame) = df.repartition(cpus.toInt)

    println("[fan] lineitem scan partitions = " + lineitem.rdd.getNumPartitions)
    println("[fan] orders scan partitions = " + orders.rdd.getNumPartitions)

    def ab(label: String)(a: => DataFrame)(b: => DataFrame): Unit = {
      def once(df: DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(a); once(b)
      val as = collection.mutable.Buffer[Double]()
      val bs = collection.mutable.Buffer[Double]()
      (1 to 3).foreach { _ => as += once(a); bs += once(b) }
      println(f"[fan] $label%-24s raw=${as.min}%.3f fan=${bs.min}%.3f " +
        f"(med ${as.sorted.apply(1)}%.3f vs ${bs.sorted.apply(1)}%.3f)")
    }

    ab("q1_pricing") { Analytics.q1Pricing(lineitem) } {
      Analytics.q1Pricing(fanned(lineitem))
    }
    ab("q3_topn") { Analytics.q3TopN(customer, orders, lineitem) } {
      Analytics.q3TopN(customer, fanned(orders), fanned(lineitem))
    }
    spark.stop()
  }
}
