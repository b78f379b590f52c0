package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Pt(view_id: Long, view_ts: Timestamp)
case class Iv(purchase_id: Long, start_ts: Timestamp)
case class IvFull(purchase_id: Long, start_ts: Timestamp, end_ts: Timestamp)

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

  test("stream output equals the batch twin on the span-truncated subset, boundary buckets included") {
    import org.apache.spark.sql.functions._
    val spanMin = 10L
    val span = java.time.Duration.ofMinutes(spanMin)
    val w = spanMin * 60L * 1000000L // bucket width in micros
    val base = ts("2024-01-01 00:00:00").getTime // a bucket edge by construction
    def at(min: Long, sec: Long = 0) = new Timestamp(base + (min * 60 + sec) * 1000)
    // every alignment case: points on bucket edges, interval starts/ends,
    // exactly at start+maxSpan, one second past each boundary
    val pts = (0L until 41L).map(i => Pt(i, at(i * 3))) ++ Seq(
      Pt(100L, at(10)), Pt(101L, at(10, 1)), Pt(102L, at(9, 59)),
      Pt(103L, at(20)), Pt(104L, at(20, 1)), Pt(105L, at(30)))
    // lengths 0, < span, = span, > span (truncated), spanning bucket edges
    val ivs = Seq(
      IvFull(200L, at(0), at(0)),      IvFull(201L, at(5), at(7)),
      IvFull(202L, at(10), at(20)),    IvFull(203L, at(17), at(30)),
      IvFull(204L, at(20), at(55)),    IvFull(205L, at(33), at(101)),
      IvFull(206L, at(60), at(60, 1)), IvFull(207L, at(90), at(89)))
    val ptStream = MemoryStream[Pt](spark)
    val ivStream = MemoryStream[IvFull](spark)
    val joined = StreamRangeJoin.pointInInterval(
      ptStream.toDF().withWatermark("view_ts", "10 minutes"),
      ivStream.toDF().withWatermark("start_ts", "10 minutes"),
      "view_ts", "start_ts", "end_ts", maxSpan = span)
    val q = joined.selectExpr("view_id", "purchase_id")
      .writeStream.format("memory").queryName("srj_eq").outputMode("append").start()
    val streamed = try {
      // one batch per side: nothing is late, so no watermark drops — the
      // comparison isolates the join semantics
      ptStream.addData(pts: _*)
      ivStream.addData(ivs: _*)
      q.processAllAvailable()
      spark.table("srj_eq").as[(Long, Long)].collect().toSet
    } finally q.stop()

    // batch twin on the span-TRUNCATED intervals (the documented stream
    // contract: end' = min(end, start + maxSpan)), same bucket width
    val ptDf = pts.toDF()
    val ivDf = ivs.toDF().withColumn("end_trunc",
      least(col("end_ts"), col("start_ts") + expr(s"INTERVAL '$spanMin' MINUTE")))
    val expected = graft.ops.RangeJoin.pointInInterval(
        ptDf, ivDf,
        unix_micros(col("view_ts")), unix_micros(col("start_ts")),
        unix_micros(col("end_trunc")), bucketWidth = w)
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(streamed == expected)
    // the comparison exercised real boundary hits, not a trivial set:
    // inclusive start, inclusive (truncated) end, and the start+maxSpan edge
    assert(expected.contains((100L, 202L)) && expected.contains((103L, 202L)))
    assert(expected.contains((103L, 203L))) // inside a bucket-crossing interval
    assert(!expected.exists(_._2 == 207L))  // inverted interval joins nothing
    assert(expected.size > 10)
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
