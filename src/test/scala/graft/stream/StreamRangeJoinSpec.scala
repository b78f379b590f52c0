package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Pt(view_id: Long, view_ts: Timestamp)
case class Iv(purchase_id: Long, start_ts: Timestamp)

class StreamRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream containment join matches the batch semantics in-watermark") {
    val pts = MemoryStream[Pt](spark)
    val ivs = MemoryStream[Iv](spark)
    val points = pts.toDF().withWatermark("view_ts", "10 minutes")
    val intervals = ivs.toDF()
      .selectExpr("purchase_id", "start_ts", "start_ts + INTERVAL 20 MINUTES AS end_ts")
      .withWatermark("start_ts", "10 minutes")
    val joined = StreamRangeJoin.pointInInterval(
      points, intervals, "view_ts", "start_ts", "end_ts", maxSpan = java.time.Duration.ofMinutes(20))
    val q = joined.selectExpr("view_id", "purchase_id")
      .writeStream.format("memory").queryName("srj_out").outputMode("append").start()
    try {
      ivs.addData(
        Iv(100L, ts("2024-01-01 10:00:00")), // covers [10:00, 10:20]
        Iv(101L, ts("2024-01-01 11:00:00"))) // covers [11:00, 11:20]
      pts.addData(
        Pt(1L, ts("2024-01-01 10:05:00")), // inside 100
        Pt(2L, ts("2024-01-01 10:25:00")), // between intervals -> no match
        Pt(3L, ts("2024-01-01 11:20:00")), // inclusive end of 101
        Pt(4L, ts("2024-01-01 10:59:59"))) // 1s before 101 -> no match
      q.processAllAvailable()
      // points arriving AFTER their interval was buffered still match
      pts.addData(Pt(5L, ts("2024-01-01 11:01:00")))
      q.processAllAvailable()
      val out = spark.table("srj_out").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 100L), (3L, 101L), (5L, 101L)))
    } finally q.stop()
  }

  test("state-eviction bound: maxSpan truncates over-long intervals, documented trade-off") {
    val pts = MemoryStream[Pt](spark)
    val ivs = MemoryStream[Iv](spark)
    val points = pts.toDF().withWatermark("view_ts", "1 minute")
    val intervals = ivs.toDF()
      .selectExpr("purchase_id", "start_ts", "start_ts + INTERVAL 2 HOURS AS end_ts")
      .withWatermark("start_ts", "1 minute")
    // maxSpan (30m) < true interval length (2h): points past start+30m
    // are outside the state-eviction bound and must NOT match
    val joined = StreamRangeJoin.pointInInterval(
      points, intervals, "view_ts", "start_ts", "end_ts", maxSpan = java.time.Duration.ofMinutes(30))
    val q = joined.selectExpr("view_id", "purchase_id")
      .writeStream.format("memory").queryName("srj_trunc").outputMode("append").start()
    try {
      ivs.addData(Iv(200L, ts("2024-01-01 10:00:00")))
      pts.addData(
        Pt(1L, ts("2024-01-01 10:10:00")),  // within maxSpan -> match
        Pt(2L, ts("2024-01-01 11:00:00")))  // within end_ts but past maxSpan -> dropped
      q.processAllAvailable()
      val out = spark.table("srj_trunc").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 200L)))
    } finally q.stop()
  }
}
