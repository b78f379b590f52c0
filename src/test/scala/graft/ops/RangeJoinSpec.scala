package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)]) =
    (for {
      (pid, p) <- points
      (iid, s, e) <- ivs
      if s <= p && p <= e
    } yield (pid, iid)).toSet

  test("pointInInterval matches the naive cross-product join") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L), (5L, -3L))
    val ivs = Seq((10L, 0L, 9L), (11L, 5L, 20L), (12L, 90L, 110L), (13L, -10L, -1L))
    val out = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
      col("p"), col("s"), col("e"), bucketWidth = 7)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == naive(points, ivs))
  }

  test("result is duplicate-free even when an interval spans many buckets") {
    val points = Seq((1L, 50L))
    val ivs = Seq((9L, 0L, 1000L))
    val out = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
      col("p"), col("s"), col("e"), bucketWidth = 3)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 9L)))
  }

  test("bounds are inclusive; inverted and null intervals/points drop") {
    val points = Seq((1L, Some(0L)), (2L, Some(9L)), (3L, None))
    val ivs = Seq((10L, Some(0L), Some(9L)), (11L, Some(9L), Some(0L)),
      (12L, None, Some(5L)))
    val out = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
      col("p"), col("s"), col("e"), bucketWidth = 4)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  test("negative-domain points bucket correctly (floor, not truncate)") {
    val points = Seq((1L, -8L), (2L, -1L))
    val ivs = Seq((10L, -9L, -5L), (11L, -4L, 0L))
    val out = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "s", "e"),
      col("p"), col("s"), col("e"), bucketWidth = 5)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 11L)))
  }

  test("plan is an equi-join on the bucket key, not a nested-loop join") {
    val points = (0L until 100L).map(i => (i, i * 3)).toDF("pid", "p")
    val ivs = (0L until 50L).map(i => (i, i * 5, i * 5 + 10)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, ivs,
      col("p"), col("s"), col("e"), bucketWidth = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product plan:\n$plan")
  }

  private def naiveOverlap(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)]) =
    (for {
      (lid, a, b) <- ls
      (rid, c, d) <- rs
      if a <= d && c <= b
    } yield (lid, rid)).toSet

  test("intervalOverlap matches the naive cross-product join, duplicate-free") {
    val ls = Seq((1L, 0L, 9L), (2L, 5L, 20L), (3L, 100L, 110L), (4L, -10L, -1L))
    val rs = Seq((10L, 8L, 12L), (11L, -5L, 0L), (12L, 200L, 300L), (13L, 0L, 1000L))
    val out = RangeJoin.intervalOverlap(
      ls.toDF("lid", "a", "b"), rs.toDF("rid", "c", "d"),
      col("a"), col("b"), col("c"), col("d"), bucketWidth = 7)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq
    assert(out.toSet == naiveOverlap(ls, rs))
    // (13) spans every bucket: each overlapping pair still appears ONCE
    assert(out.size == out.toSet.size, s"duplicates: $out")
  }

  test("intervalOverlap: inclusive touch, inverted/null intervals drop, floor buckets") {
    val ls = Seq((1L, Some(0L), Some(5L)), (2L, Some(9L), Some(3L)), (3L, None, Some(4L)))
    val rs = Seq((10L, Some(5L), Some(8L)), (11L, Some(-7L), Some(-1L)))
    val out = RangeJoin.intervalOverlap(
      ls.toDF("lid", "a", "b"), rs.toDF("rid", "c", "d"),
      col("a"), col("b"), col("c"), col("d"), bucketWidth = 4)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L))) // endpoints touching at 5 count; inverted 2 drops
  }

  test("epochMicros accepts both TIMESTAMP and TIMESTAMP_NTZ columns") {
    // the driver's parquet testdata switched to tz-naive timestamps mid-
    // project (Spark reads them as TIMESTAMP_NTZ); bare unix_micros fails
    // analysis on that type, so the helper must be identical on both
    val df = Seq("2024-03-01 12:30:00", "1969-12-31 23:59:59")
      .toDF("s")
      .withColumn("tz", col("s").cast("timestamp"))
      .withColumn("ntz", col("s").cast("timestamp_ntz"))
    val rows = df.select(
      RangeJoin.epochMicros(col("tz")).as("a"),
      RangeJoin.epochMicros(col("ntz")).as("b"),
      unix_micros(col("tz")).as("ref"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, ref) =>
      assert(a == ref && b == ref, s"epochMicros mismatch: $a / $b vs $ref")
    }
  }

  test("pointInInterval works end-to-end on TIMESTAMP_NTZ event times") {
    val views = Seq((1L, "2024-01-01 00:10:00"), (2L, "2024-01-01 03:00:00"))
      .toDF("view_id", "s")
      .select(col("view_id"), col("s").cast("timestamp_ntz").as("view_ts"))
    val purchases = Seq((10L, "2024-01-01 00:00:00"))
      .toDF("purchase_id", "s")
      .select(col("purchase_id"), col("s").cast("timestamp_ntz").as("start_ts"))
      .withColumn("end_ts", col("start_ts") + expr("INTERVAL 1 HOUR"))
    val out = RangeJoin.pointInInterval(views, purchases,
      RangeJoin.epochMicros(col("view_ts")),
      RangeJoin.epochMicros(col("start_ts")),
      RangeJoin.epochMicros(col("end_ts")),
      bucketWidth = 3600L * 1000000L)
      .select($"view_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("intervalOverlap plans as a bucket equi-join") {
    val ls = (0L until 100L).map(i => (i, i * 3, i * 3 + 5)).toDF("lid", "a", "b")
    val rs = (0L until 50L).map(i => (i, i * 5, i * 5 + 10)).toDF("rid", "c", "d")
    val out = RangeJoin.intervalOverlap(ls, rs,
      col("a"), col("b"), col("c"), col("d"), bucketWidth = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a product plan:\n$plan")
  }
}
