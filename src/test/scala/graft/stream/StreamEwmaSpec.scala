package graft.stream

import graft.SparkSpec
import java.sql.Timestamp

class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")

  test("streamed running EWMA equals the batch integer fold across batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamEwma.track(src, halvings = 4)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    val all = Seq(
      (1L, ts(1), 7L, "view", 100.0), (2L, ts(2), 7L, "view", 50.0),
      (3L, ts(3), 7L, "view", 0.001),
      (4L, ts(1), 8L, "view", 2.5),
      (5L, ts(4), 7L, "view", 200.0))
    try {
      val (b1, b2) = all.splitAt(3)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("ewma_out")
        .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
      val batch = graft.analytics.Analytics.ewma(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"),
        halvings = 4)
        .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      // hand-check the integer recurrence: e1 = 100e6,
      // e2 = 100e6 + (50e6 - 100e6) div 16 = 100e6 - 3125000 = 96875000
      val byEid = streamed.map(r => r._2 -> r._3).toMap
      assert(byEid(1L) == 100000000L)
      assert(byEid(2L) == 96875000L)
      // negative deltas truncate toward zero, exactly as Scala/SQL div
      assert(byEid(3L) == byEid(2L) + (1000L - byEid(2L)) / 16)
    } finally q.stop()
  }

  test("same-instant same-batch events fold in event_id order; state is one pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamEwma.track(src)
      .writeStream.format("memory").queryName("ewma_tied_out")
      .outputMode("append").start()
    try {
      // arrival order reversed vs event_id — fold must use (ts, id) order
      mem.addData((11L, ts(5), 9L, "view", 32.0), (10L, ts(5), 9L, "view", 16.0))
      q.processAllAvailable()
      val out = spark.table("ewma_tied_out")
        .as[(Long, Long, Long)].collect().sortBy(_._2)
      assert(out.map(_._2).toSeq == Seq(10L, 11L))
      assert(out(0)._3 == 16000000L)
      assert(out(1)._3 == 16000000L + (32000000L - 16000000L) / 16)
    } finally q.stop()
  }
}
