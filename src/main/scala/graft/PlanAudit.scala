package graft
// Per-round plan audit: dumps formatted physical plans of the headline
// queries so pushdown/broadcast/shuffle regressions are visible in review.
// Findings are summarised in PERF.md.
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    for (q <- Bench.headline ++ Seq("q_apply_contract", "q_dedup_embedding",
        "q_source_cap", "q_sample_hash", "q_decontaminate", "q_pack_chunks",
        "q_salted_join", "q_rollup",
        "q_range_join", "q_tfidf", "q_quantiles", "q_decontaminate_bloom",
        "q_stratified_sample", "q_ann_radius", "q_bigram_lm", "q_entropy",
        "q_boilerplate", "q_interval_join", "q_dedup_semantic",
        "q_asof_forward", "q_pack_text", "q_curation_pipeline",
        "q_vocab_coverage", "q_truncate",
        "q_weighted_sample", "q_dedup_semantic_mp", "q_gopher_rules",
        "q_line_dedup", "q_dedup_keep_best", "q_classifier_score",
        "q_containment", "q_dedup_semantic_pq", "q_upsample",
        "q_window_chunks", "q_lm_score", "q_curation_pipeline2",
        "q_ppl_buckets", "q_vocab_drift", "q_substr_spans", "q_substr_strip",
        "q_substr_strip_flag", "q_dsir", "q_dsir_sample", "q_nb_classify",
        "q_cluster_sample", "q_epoch_order", "q_psi", "q_snapshot_diff",
        "q_robots_rules", "q_robots_filter", "q_robots_wildcard",
        "q_crawl_schedule", "q_crawl_frontier", "q_sitemap_urls",
        "q_warc_cdx", "q_warc_revisit",
        "q_trigram_lm", "q_frequent_lines", "q_frequent_windows",
        "q_frequent_shingles")) {
      println(s"\n================ $q ================")
      val df = SparkEntry.queries(q)(spark, sf)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
