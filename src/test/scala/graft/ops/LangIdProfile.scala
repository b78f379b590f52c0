package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence harness for the r16 q_lang_id_trained optimization pass:
  * splits the gate's cost into its two corpus passes — TRAIN
  * ([[TextOps.trainLangNb]]: the hashed-trigram count collect + the class
  * count collect) and INFER ([[TextOps.langIdNb]]: the zero-shuffle
  * scoring projection) — so the optimization targets the pass that
  * actually carries the time. Warmed best-of-3 on SPARK_GRAFT_SF_DIR via
  * `Test/runMain graft.ops.LangIdProfile`. */
object LangIdProfile {
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

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(body: => Unit): Unit = {
      body // warm-up
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[langid] $label%-28s best=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
    }

    println("[langid] scan partitions = " + docs.rdd.getNumPartitions)

    time("train (both collects)") {
      TextOps.trainLangNb(docs, col("lang"), buckets = 64, nGram = 3,
        mode = HashMode.Portable)
    }
    time("train (repart 32)") {
      TextOps.trainLangNb(docs.repartition(32), col("lang"), buckets = 64,
        nGram = 3, mode = HashMode.Portable)
    }
    // split the train cost: the hashed-feature count job vs the class
    // count job (reconstructed inline from trainLangNb's body)
    locally {
      import org.apache.spark.sql.types._
      val labeled = docs.repartition(32).filter(col("lang").isNotNull)
      val mode: HashMode = HashMode.Portable
      def charsOf(c: org.apache.spark.sql.Column) =
        split(TextOps.normText(coalesce(c, lit(""))), "")
      def charNgramsOf(chars: org.apache.spark.sql.Column, n: Int) =
        when(size(chars) >= n && length(element_at(chars, 1)) > 0,
          transform(sequence(lit(1), size(chars) - (n - 1)),
            i => concat((0 until n).map(j => element_at(chars, i + j)): _*)))
          .otherwise(array().cast(ArrayType(StringType)))
      time("train: counts job only") {
        labeled
          .select(col("lang").cast(StringType).as("_lang"),
            explode(array(charsOf(col("text")))).as("_ch"))
          .select(col("_lang"), explode(charNgramsOf(col("_ch"), 3)).as("_g"))
          .select(col("_lang"),
            pmod(mode.hash(col("_g")), lit(64L)).cast(IntegerType).as("_b"))
          .groupBy(col("_lang"), col("_b")).agg(count(lit(1)).as("n"))
          .collect()
      }
      time("train: doc-count job only") {
        labeled.groupBy(col("lang").cast(StringType).as("_lang"))
          .agg(count(lit(1)).as("d")).collect()
      }
      time("train: gram agg first") {
        labeled
          .select(col("lang").cast(StringType).as("_lang"),
            explode(array(charsOf(col("text")))).as("_ch"))
          .select(col("_lang"), explode(charNgramsOf(col("_ch"), 3)).as("_g"))
          .groupBy(col("_lang"), col("_g")).agg(count(lit(1)).as("n"))
          .select(col("_lang"),
            pmod(mode.hash(col("_g")), lit(64L)).cast(IntegerType).as("_b"),
            col("n"))
          .groupBy(col("_lang"), col("_b")).agg(sum(col("n")).as("n"))
          .collect()
      }
    }
    val model = TextOps.trainLangNb(docs, col("lang"), buckets = 64,
      nGram = 3, mode = HashMode.Portable)
    time("infer (noop sink)") {
      TextOps.langIdNb(docs, model)
        .write.format("noop").mode("overwrite").save()
    }
    time("infer (repart 32)") {
      TextOps.langIdNb(docs.repartition(32), model)
        .write.format("noop").mode("overwrite").save()
    }
    time("full gate (train+infer)") {
      val m = TextOps.trainLangNb(docs, col("lang"), buckets = 64,
        nGram = 3, mode = HashMode.Portable)
      TextOps.langIdNb(docs, m)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
