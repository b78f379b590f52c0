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
    "q_dedup_exact", "q_dedup_minhash", "q_ann_brute", "q_text_quality",
    "q_topk_groups", "q_ann_ivf", "q_source_cap", "q_pack_chunks")

  /** Round-over-round regression budgets: BENCH_r02 per-query seconds
    * (round-3 local best-of-2 for the two queries first benched in r3)
    * + 20%, plus a 0.3 s absolute jitter floor (20% of a 0.3 s query is
    * inside scheduler noise). Breaching any budget fails the process —
    * a regression must not ride along silently. */
  val budgetSecs: Map[String, Double] = Map(
    "q1_pricing" -> 1.52, "q3_topn_join" -> 1.17, "q5_join5" -> 1.30,
    "q_metrics" -> 0.51, "q_dedup_exact" -> 0.29, "q_dedup_minhash" -> 1.56,
    "q_ann_brute" -> 0.43, "q_text_quality" -> 0.31,
    "q_topk_groups" -> 1.01, "q_ann_ivf" -> 1.05,
    // round-4 local best-of-2 for the curation entries first benched in r4
    "q_source_cap" -> 0.59, "q_pack_chunks" -> 0.25
  ).map { case (k, v) => k -> (v * 1.2 + 0.3) }

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
    // budgets are wall-clock numbers from the round driver's machine;
    // SPARK_GRAFT_BENCH_BUDGETS=off keeps the timings but drops the gate
    // when running on different hardware
    val budgetsOn = !sys.env.get("SPARK_GRAFT_BENCH_BUDGETS").exists(_.equalsIgnoreCase("off"))
    val breaches = if (!budgetsOn) Nil else results.collect {
      case (name, secs) if secs >= 0 && budgetSecs.get(name).exists(secs > _) =>
        f"$name ${secs}%.2f>${budgetSecs(name)}%.2f"
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    breaches.foreach(b => System.err.println(s"[bench] BUDGET BREACH: $b " +
      "(budgets are wall-clock numbers from the round driver's machine; " +
      "set SPARK_GRAFT_BENCH_BUDGETS=off on other hardware)"))
    spark.stop()
    if (failed || breaches.nonEmpty) sys.exit(1)
  }
}
