package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `Test/runMain graft.ExplainTool <query> [query...]`
  * prints each named [[SparkEntry.queries]] entry's formatted physical
  * plan against `SPARK_GRAFT_SF_DIR` (default sf0.01) — the fast way to
  * audit exchanges, reuse, and codegen spans without timing anything. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainTool <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
