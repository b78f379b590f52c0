package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamQuotaSpec extends SparkSpec {
  import spark.implicits._


  test("weighted reservoir admission: batch top-k never dropped, bound respected") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String, Long)](spark)
    val src = mem.toDF().toDF("doc_id", "text", "source", "w")
    val q = StreamQuota.weightedSamplePerStratum(src, Seq("source"), k = 3,
      weightCol = "w")
      .writeStream.format("memory").queryName("wres_out")
      .outputMode("append").start()
    val rows = (0L until 40L).map(i =>
      (i, s"t$i", if (i % 2 == 0) "s1" else "s2", 1L + i % 5))
    try {
      val (b1, b2) = rows.splitAt(20)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val admitted = spark.table("wres_out").select("doc_id").as[Long].collect().toSet
      // the batch operator's exact per-stratum top-k must all be admitted
      // (a batch winner can never rank outside the running top-k at arrival)
      val batchDf = rows.toDF("doc_id", "text", "source", "w")
      val batchKept = Seq("s1", "s2").flatMap { s =>
        graft.ops.Curate.weightedSample(
          batchDf.filter(col("source") === s), k = 3, weightCol = "w")
          .select("doc_id").as[Long].collect()
      }.toSet
      assert(batchKept.subsetOf(admitted), s"batch winners $batchKept not in $admitted")
      // admission is bounded: at most k admits per stratum PER BATCH wave
      // is not guaranteed, but the total stays near k (superset property,
      // never the whole stream)
      assert(admitted.size < rows.size / 2, "reservoir must actually reject rows")
      // zero/absent weights never admit
      mem.addData((100L, "z", "s1", 0L)); q.processAllAvailable()
      assert(!spark.table("wres_out").select("doc_id").as[Long].collect().contains(100L))
    } finally q.stop()
  }

  test("quota admission is monotone across batches and exact per stratum") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text", "source")
    val q = StreamQuota.capPerStratum(src, Seq("source"), cap = 2)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      q.processAllAvailable()
      // s1 quota already spent: 4 and 5 must be dropped; s2 has room for 6
      mem.addData((4L, "d", "s1"), (5L, "e", "s1"), (6L, "f", "s2"), (7L, "g", "s2"))
      q.processAllAvailable()
      val out = spark.table("quota_out")
      assert(out.count() == 4)
      val bySource = out.groupBy("source").count()
        .as[(String, Long)].collect().toMap
      assert(bySource == Map("s1" -> 2L, "s2" -> 2L))
      // batch-one admissions are exactly the first arrivals
      assert(out.filter(col("source") === "s1").select("doc_id")
        .as[Long].collect().toSet == Set(1L, 2L))
      // full rows pass through unchanged
      assert(out.filter(col("doc_id") === 3L).select("text")
        .as[String].collect().head == "c")
    } finally q.stop()
  }

  test("null strata count as their own group") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "source")
      .withColumn("source", when(col("doc_id") < 3, col("source")).otherwise(lit(null)))
    val q = StreamQuota.capPerStratum(src, Seq("source"), cap = 1)
      .writeStream.format("memory").queryName("quota_null")
      .outputMode("append").start()
    try {
      mem.addData((1L, "s"), (2L, "s"), (3L, "x"), (4L, "x"))
      q.processAllAvailable()
      val out = spark.table("quota_null").select("doc_id").as[Long].collect().toSet
      assert(out.size == 2) // one from the "s" stratum, one from the null stratum
      assert(out.contains(1L) || out.contains(2L))
      assert(out.contains(3L) || out.contains(4L))
    } finally q.stop()
  }
}
