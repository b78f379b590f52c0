package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence tool behind PERF.md's iterative-hygiene table (not a test —
  * run with `Test/runMain graft.IterEvidence [maxIters]`).
  *
  * The r8 audit flagged that Graph.iterate / labelPropagation cached
  * every round and never truncated lineage: fine at the gated 5
  * iterations, but at real-crawl budgets (30–50 rounds) the logical
  * plan grows linearly, analyzer/optimizer time balloons, and a lost
  * executor recomputes through the whole chain. The fix (r9) reuses the
  * reliable-or-local checkpoint materialiser per round and releases the
  * superseded round's blocks.
  *
  * This tool demonstrates both properties directly: it runs
  * labelPropagation and pageRank at increasing iteration budgets over
  * the sf0.01 co-purchase graph and prints (a) total seconds and
  * seconds-per-iteration — flat per-round cost = truncated lineage,
  * because with per-round plan growth the analyzer alone goes
  * super-linear — and (b) the number of persisted RDDs left behind
  * after each run (bounded ≈ the constant operator-internal caches +
  * ≤2 live rounds, NOT growing with iters). */
object IterEvidence {

  def main(args: Array[String]): Unit = {
    val maxIters = args.headOption.map(_.toInt).getOrElse(24)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the gated queries' co-purchase edge set (same construction as
    // q_labelprop / q_pagerank wiring, inlined to vary iters)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val a = li.select(col("o"), col("p").as("src"))
    val b = li.select(col("o"), col("p").as("dst"))
    val edges = a.join(b, Seq("o")).filter(col("src") < col("dst"))
      .select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    println(s"[iter] edges: ${edges.count()} over $dir")

    def run(label: String, f: Int => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n| $label iters | total (s) | s/iter | persisted RDDs after |")
      println("|---|---|---|---|")
      for (iters <- Seq(4, maxIters / 2, maxIters)) {
        val t0 = System.nanoTime()
        val n = f(iters).count()
        val secs = (System.nanoTime() - t0) / 1e9
        System.gc() // let the context cleaner see dropped rounds
        Thread.sleep(300)
        val persisted = spark.sparkContext.getPersistentRDDs.size
        println(f"| $iters | $secs%.2f | ${secs / iters}%.3f | $persisted (rows=$n) |")
      }
    }
    run("labelprop", it => graft.ops.Graph.labelPropagation(edges, it))
    run("pagerank", it => graft.ops.Graph.pageRank(edges, it))
    spark.stop()
  }
}
