package graft.stream

import graft.SparkSpec
import graft.analytics.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Watermark semantics pinned across trigger pacing and late-data rates
  * (SURVEY §7 r3+): the single happy-path test said nothing about HOW
  * lateness interacts with micro-batch boundaries — these do.
  *
  * Key semantic under test: the watermark is evaluated per micro-batch, so
  * the same event sequence admits or drops a too-late event depending on
  * whether pacing put a batch boundary (and thus a watermark advance)
  * before it. Both outcomes are asserted explicitly. */
class TriggerMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("paced micro-batches: in-watermark late events count, beyond-watermark drop") {
    val mem = MemoryStream[Ev](spark)
    val out = ContractStream.eventsWindow(mem.toDF(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("late_paced")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(10, 0), 1, "view", 1.0), Ev(2, ts(10, 59), 1, "view", 2.0))
      q.processAllAvailable() // watermark -> 10:49; 10:00 window still open
      // in-watermark late: older than the watermark, but its window's end
      // (11:00) is still ahead of it — Spark admits by window end, so this
      // late event counts
      mem.addData(Ev(4, ts(10, 5), 3, "view", 8.0))
      q.processAllAvailable()
      // push the watermark past the 10:00 window's end: 11:30 - 10m = 11:20
      mem.addData(Ev(5, ts(11, 30), 5, "view", 0.5))
      q.processAllAvailable() // 10:00 window closes and emits
      // beyond-watermark late: its window already closed — dropped
      mem.addData(Ev(3, ts(10, 5), 2, "view", 4.0))
      q.processAllAvailable()
      mem.addData(Ev(99, ts(14, 0), 9, "view", 0.0)) // close everything
      q.processAllAvailable()
      val win10 = spark.table("late_paced")
        .where("window_start = timestamp'2024-01-01 10:00:00' AND event_type = 'view'")
        .select("n_events", "sum_value").collect()
      // events 1, 2, 4 counted; the post-close replay of 10:05 dropped
      assert(win10.length == 1, s"append mode must emit the closed window exactly once")
      assert((win10.head.getLong(0), win10.head.getDouble(1)) == ((3L, 11.0)),
        s"got ${win10.head.toString}")
    } finally q.stop()
  }

  test("AvailableNow collapses pending offsets: batch-boundary watermark admits the same event") {
    val mem = MemoryStream[Ev](spark)
    // identical event sequence, but all offsets are pending when the query
    // starts: AvailableNow reads them in one batch, the watermark only
    // advances afterwards, so the event that paced processing dropped
    // (10:05 delivered after its window closed) is admitted here
    mem.addData(Ev(1, ts(10, 0), 1, "view", 1.0), Ev(2, ts(10, 59), 1, "view", 2.0))
    mem.addData(Ev(4, ts(10, 5), 3, "view", 8.0))
    mem.addData(Ev(5, ts(11, 30), 5, "view", 0.5))
    mem.addData(Ev(3, ts(10, 5), 2, "view", 4.0))
    mem.addData(Ev(99, ts(14, 0), 9, "view", 0.0))
    val out = ContractStream.eventsWindow(mem.toDF(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("late_avail")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      val win10 = spark.table("late_avail")
        .where("window_start = timestamp'2024-01-01 10:00:00' AND event_type = 'view'")
        .select("n_events", "sum_value").collect().head
      assert((win10.getLong(0), win10.getDouble(1)) == ((4L, 15.0)),
        s"got ${win10.toString}")
    } finally q.stop()
  }

  test("late-rate matrix: every in-watermark late rate converges to the batch twin") {
    for (latePct <- Seq(0, 20, 50)) {
      val base = (0 until 40).map { i =>
        Ev(i.toLong, ts(10, i), 1L + i % 3, "view", i.toDouble)
      }
      // `latePct`% of events are delivered one batch later than their
      // event-time order suggests, but always within the 1h watermark
      val (late, onTime) = base.partition(_.event_id % 100 < latePct)
      val mem = MemoryStream[Ev](spark)
      val out = ContractStream.eventsWindow(mem.toDF(), watermark = "1 hour")
      val name = s"late_rate_$latePct"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        mem.addData(onTime: _*)
        q.processAllAvailable()
        mem.addData(late: _*)
        q.processAllAvailable()
        mem.addData(Ev(999, ts(20, 0), 9, "view", 0.0))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .where("event_type = 'view' AND window_start < timestamp'2024-01-01 20:00:00'")
          .select("window_start", "n_events", "sum_value")
          .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
        val twin = Analytics.eventsWindow(base.toDF())
          .select("window_start", "n_events", "sum_value")
          .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
        assert(streamed == twin, s"latePct=$latePct: $streamed != $twin")
      } finally q.stop()
    }
  }
}
