package graft.stream

import graft.ops.{Curate, ExactSubstr, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage cumulative cost profile of the q_curation_ingest chain
  * (PERF.md r11 evidence): times each prefix of the composed pipeline
  * on SPARK_GRAFT_SF_DIR so a stage regression is attributable. The
  * r11 findings it recorded: the sentence-span Bloom probe re-digested
  * each shingle 2*kh times inside its filter lambda (5.7 s -> ~1 s
  * after the digest-once barrier), and the chain is NOT benched as a
  * headline query because it re-runs seven already-benched stage
  * families (the q_substr_strip double-count precedent). */
object CiProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the gated fixture's own constants — shared, so the profile can
    // never drift from what q_curation_ingest actually runs
    val block = graft.SparkEntry.IngestBlock
    val footer = graft.SparkEntry.IngestFooter
    val extras = graft.SparkEntry.IngestExtras
    val m = col("doc_id") % 4
    val corpus = docs.select(col("doc_id"), concat(col("text"), lit(". " + block + "\n" + footer)).as("text"))
    val arrivals = docs.select(col("doc_id"),
      concat(lit("<p>"), col("text"), lit(". " + block + "</p>\n" + footer + "\n"),
        when(m === 0, lit(graft.SparkEntry.IngestInjCard + " "))
          .when(m === 1, lit(graft.SparkEntry.IngestInjEmail + " "))
          .when(m === 2, lit(graft.SparkEntry.IngestEval + " "))
          .otherwise(lit("")),
        lit(extras)).as("text"))
    import spark.implicits._
    val evalDocs = Seq((0L, graft.SparkEntry.IngestEval)).toDF("doc_id", "text")
    val fl = Curate.frequentLines(corpus)
    val fs = ExactSubstr.frequentShingles(corpus)

    def time(label: String)(df: => DataFrame): Unit = {
      def once(): Double = { val t0 = System.nanoTime(); df.write.format("noop").mode("overwrite").save(); (System.nanoTime()-t0)/1e9 }
      once(); println(f"[ci] $label: ${Seq(once(), once()).min}%.2f s")
    }
    time("artifacts only")(fl.unionByName(fs.withColumnRenamed("n_occ","line_df")))
    val cleaned = arrivals.select(col("doc_id"), TextOps.nfc(TextOps.cleanControlChars(TextOps.fixMojibake(TextOps.stripHtmlBlocks(coalesce(col("text"), lit("")))))).as("text"))
    time("stage1 clean")(cleaned)
    val lines = Curate.stripLinesFlag(cleaned, fl).select(col("doc_id"), col("text"), col("n_removed").as("nb"))
    time("stage2 lines")(lines)
    val scrub = Curate.redact(Curate.redactCards(lines))
    time("stage3 redact")(scrub)
    val spans = ExactSubstr.stripSentencesFlag(scrub, fs, passThrough = Seq("nb", "n_cards", "n_redactions"))
    time("stage4 spans")(spans)
    val c4d = TextOps.c4Rules(spans.select(col("doc_id"), col("nb"), explode(array(col("clean_text"))).as("text")), passThrough = Seq("nb"))
    time("stage5 c4")(c4d)
    val gop = TextOps.gopherRules(c4d.select(col("doc_id"), explode(array(col("clean_text"))).as("text")))
    time("stage6 gopher")(gop)
    val dec = Curate.contaminationFlag(cleaned, evalDocs)
    time("stage7 contamination (on cleaned)")(dec)
    spark.stop()
  }
}
