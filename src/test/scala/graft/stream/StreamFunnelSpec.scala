package graft.stream

import graft.SparkSpec
import java.sql.Timestamp

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")
  private def ev(id: Long, user: Long, typ: String, sec: Int) =
    (id, ts(sec), user, typ, 1.0)

  test("in-order arrivals complete exactly the batch funnel's stages") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamFunnel.track(src)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    // user 1 completes all three in order; user 2's purchase precedes
    // its view (stage stalls at 1); user 3 has a click before any view
    val all = Seq(
      ev(1, 1, "click", 1), ev(2, 1, "view", 2), ev(3, 1, "click", 3),
      ev(5, 2, "purchase", 1), ev(6, 2, "view", 2),
      ev(7, 3, "click", 1),
      ev(4, 1, "purchase", 4), ev(8, 2, "click", 5), ev(9, 3, "error", 6))
    try {
      val (b1, b2) = all.splitAt(6)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val out = spark.table("funnel_out")
        .as[(Long, Int, String, Long)].collect()
      val stagesByUser = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(stagesByUser == Map(1L -> Seq(1, 2, 3), 2L -> Seq(1, 2)),
        s"stream stages wrong: $stagesByUser")
      // completion timestamps match the batch funnel exactly
      val batch = graft.analytics.Analytics.funnel(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(r => r.getLong(0) ->
          (Seq(1, 2, 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
            r.getLong(4))).toMap
      val streamTs = out.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
      batch.foreach { case (u, (stageTs, n)) =>
        assert(streamTs.getOrElse(u, Nil) == stageTs.flatten.take(n.toInt),
          s"user $u: stream ${streamTs.get(u)} vs batch $stageTs")
      }
      // monotone progress: each completion strictly after its predecessor
      out.groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(_._2).map(_._4)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b })
      }
    } finally q.stop()
  }

  test("conversion window bounds stage advances; batch and stream agree") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // view@1, click@12 (11s after view), purchase@13
    val evs = Seq(ev(1, 5, "view", 1), ev(2, 5, "click", 12),
      ev(3, 5, "purchase", 13))
    val df = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
    // 10s window: the click is out of window -> funnel stalls at stage 1
    val tight = graft.analytics.Analytics.funnel(df,
      maxGapUs = Some(10L * 1000000L)).collect().head
    assert(tight.getLong(4) == 1L, s"tight window: ${tight.getLong(4)}")
    // 20s window: all three stages complete
    val loose = graft.analytics.Analytics.funnel(df,
      maxGapUs = Some(20L * 1000000L)).collect().head
    assert(loose.getLong(4) == 3L)

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamFunnel.track(src, maxGapUs = Some(10L * 1000000L))
      .writeStream.format("memory").queryName("funnel_gap_out")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val stages = spark.table("funnel_gap_out")
        .as[(Long, Int, String, Long)].collect().map(_._2).sorted.toSeq
      assert(stages == Seq(1), s"stream must stall like batch: $stages")
    } finally q.stop()
  }

  test("same-batch same-instant races resolve by event_id; state is O(1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamFunnel.track(src)
      .writeStream.format("memory").queryName("funnel_tied_out")
      .outputMode("append").start()
    try {
      // view and click share an instant: the view (lower event_id) wins
      // stage 1, the same-instant click is NOT strictly after -> stalls;
      // a later click completes stage 2
      mem.addData(ev(10, 9, "view", 5), ev(11, 9, "click", 5),
        ev(12, 9, "click", 6))
      q.processAllAvailable()
      val out = spark.table("funnel_tied_out")
        .as[(Long, Int, String, Long)].collect().sortBy(_._2)
      assert(out.map(_._2).toSeq == Seq(1, 2))
      assert(out(1)._4 > out(0)._4)
    } finally q.stop()
  }
}
