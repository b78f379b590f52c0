package graft.stream

import graft.SparkSpec
import java.sql.Timestamp

class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")

  test("streamed pairs equal the batch lead pairs across batch boundaries; O(1) state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamTransitions.pairs(src)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    val all = Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "click", 0.0),
      (3L, ts(3), 1L, "view", 0.0), (4L, ts(4), 1L, "purchase", 0.0),
      (5L, ts(1), 2L, "view", 0.0), (6L, ts(2), 2L, "view", 0.0))
    try {
      // split mid-user-1 so the last-event state must carry over
      val (b1, b2) = all.splitAt(2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .as[(Long, String, String)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      // batch pairs before the matrix aggregation: recompute via the
      // batch operator's counts (n column) exploded back
      val batch = graft.analytics.Analytics.transitions(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val streamedByEdge = streamed.toSeq
        .groupBy { case ((_, f, t), _) => (f, t) }
        .view.mapValues(_.map(_._2).sum.toLong).toMap
      assert(streamedByEdge == batch,
        s"stream $streamedByEdge vs batch $batch")
      // per-user pair multiset is right (user 1: 3 pairs, user 2: 1)
      assert(streamed.toSeq.map { case ((u, _, _), n) => u -> n }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap ==
        Map(1L -> 3, 2L -> 1))
    } finally q.stop()
  }
}
