package graft.stream

import graft.SparkSpec
import java.sql.Timestamp

class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("closed versions across batch boundaries equal the batch history's non-current rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, Timestamp, Long)](spark)
    val src = mem.toDF().toDF("k", "status", "at", "tie")
    val q = StreamScd2.track(src, "k", "status", "at", "tie")
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    // key 1: O O F O (split across batches); key 2: single P (stays open)
    val all = Seq(
      (1L, "O", ts(1), 10L), (1L, "O", ts(2), 11L),
      (2L, "P", ts(1), 20L),
      (1L, "F", ts(3), 12L), (1L, "O", ts(4), 13L))
    try {
      val (b1, b2) = all.splitAt(3)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .as[(Long, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._5))
      val batch = graft.analytics.Analytics.scd2(
        all.toDF("k", "status", "at", "tie"), "k", "status", "at", "tie")
        .filter(!org.apache.spark.sql.functions.col("is_current"))
        .collect().map { r =>
          (r.getLong(0), r.getString(1),
            r.getTimestamp(2).getTime * 1000L, r.getTimestamp(3).getTime * 1000L,
            r.getLong(4))
        }.sortBy(r => (r._1, r._5))
      assert(streamed.toSeq == batch.toSeq,
        s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
      // the open versions (1,"O",v3) and (2,"P",v1) are state, not output
      assert(!streamed.exists(r => r._1 == 2L))
      assert(streamed.filter(_._1 == 1L).map(_._5).toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("consecutive equal values never close a version; null attr is a value") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Option[String], Timestamp, Long)](spark)
    val src = mem.toDF().toDF("k", "status", "at", "tie")
    val q = StreamScd2.track(src, "k", "status", "at", "tie")
      .writeStream.format("memory").queryName("scd2_null_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (3L, None, ts(1), 1L), (3L, None, ts(2), 2L),
        (3L, Some("X"), ts(3), 3L), (3L, Some("X"), ts(4), 4L))
      q.processAllAvailable()
      val out = spark.table("scd2_null_out").collect()
      // the two nulls are ONE run, closed by X; the X run stays open
      assert(out.length == 1)
      assert(out.head.isNullAt(1) && out.head.getLong(4) == 1L)
    } finally q.stop()
  }

  test("same-batch same-instant updates resolve by tie order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, Timestamp, Long)](spark)
    val src = mem.toDF().toDF("k", "status", "at", "tie")
    val q = StreamScd2.track(src, "k", "status", "at", "tie")
      .writeStream.format("memory").queryName("scd2_tie_out")
      .outputMode("append").start()
    try {
      // B arrives in the data before A, but A's tie is lower: run = A -> B
      mem.addData((9L, "B", ts(1), 2L), (9L, "A", ts(1), 1L))
      q.processAllAvailable()
      val out = spark.table("scd2_tie_out")
        .as[(Long, String, Long, Long, Long)].collect()
      assert(out.length == 1 && out.head._2 == "A" && out.head._5 == 1L,
        s"got ${out.toSeq}")
    } finally q.stop()
  }
}
