package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence harness behind the r11 labelPropagation rework (PERF.md
  * r11): times the SHIPPED shape (no repartition, map-side partial agg,
  * lazy window-8 — the pageRank cadence), its eager/lazy cadence
  * variants, and an inline reconstruction of the r8-r10 shape (explicit
  * raw-vote `repartition(dst)` + eager per-round checkpoint) so the
  * next drift investigation can re-measure both sides. Warmed
  * best-of-3 on SPARK_GRAFT_SF_DIR via
  * `Test/runMain graft.ops.LabelpropProfile`. */
object LabelpropProfile {
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

    def edges = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 10000000L).as("p"))
        .distinct()
      pairs.select(col("c").as("src"), col("p").as("dst"))
        .union(pairs.select(col("p").as("src"), col("c").as("dst")))
    }

    def run(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val best = Seq(once(), once(), once()).min
      println(f"[lp-profile] $label: $best%.3f s")
    }

    // the r8-r10 shape, reconstructed inline: explicit raw-vote
    // repartition(dst) per round + eager per-round localCheckpoint
    def oldShape(): org.apache.spark.sql.DataFrame = {
      val e = edges.select(col("src").cast("long").as("_pr_src"),
        col("dst").cast("long").as("_pr_dst"))
        .filter(col("_pr_src").isNotNull && col("_pr_dst").isNotNull)
      val eC = Caching.ensureCachedLazy(e)
      val nodes = Caching.ensureCachedLazy(
        e.select(col("_pr_src").as("node"))
          .union(e.select(col("_pr_dst").as("node"))).distinct())
      var labels = nodes.select(col("node"), col("node").as("label"))
      val win = new Caching.CheckpointWindow(every = 1)
      for (_ <- 1 to 5) {
        val winners = eC
          .join(labels, col("_pr_src") === col("node"))
          .repartition(col("_pr_dst"))
          .groupBy(col("_pr_dst"), col("label"))
          .agg(count(lit(1)).as("_lp_cnt"))
          .groupBy(col("_pr_dst"))
          .agg(min_by(col("label"),
            struct((-col("_lp_cnt")).as("nc"), col("label").as("lb"))).as("_lp_win"))
        val next = labels
          .join(winners, col("node") === col("_pr_dst"), "left")
          .select(col("node"), coalesce(col("_lp_win"), col("label")).as("label"))
        labels = win.advance(next)
      }
      win.release(labels)
      labels
    }

    run("shipped (norepart, window-8 lazy)")(
      Graph.labelPropagation(edges, iters = 5))
    run("norepart, eager every=1")(
      Graph.labelPropagation(edges, iters = 5, checkpointEvery = 1))
    run("norepart, unmaterialized chain")(
      Graph.labelPropagation(edges, iters = 5, materializeEach = false))
    run("r8-r10 shape (repartition + eager every=1)")(oldShape())
    spark.stop()
  }
}
