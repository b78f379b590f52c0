package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("snapshot sequence through scd2Apply equals the batch scd2 derivation") {
    // three snapshots of a 3-key dimension
    val s1 = Seq((1L, "A"), (2L, "P"), (3L, "X")).toDF("k", "status")
    val s2 = Seq((1L, "B"), (2L, "P"), (3L, "X")).toDF("k", "status") // 1 changes
    val s3 = Seq((1L, "B"), (2L, "Q"), (3L, "X")).toDF("k", "status") // 2 changes
    val h1 = MergeIO.scd2Init(s1, Seq("k"), Seq("status"), ts(1))
    val h2 = MergeIO.scd2Apply(h1, s2, Seq("k"), Seq("status"), ts(2))
    val h3 = MergeIO.scd2Apply(h2, s3, Seq("k"), Seq("status"), ts(3))
    // equivalent event stream: every key observed at every snapshot time
    val events = Seq(
      (1L, "A", ts(1), 1L), (2L, "P", ts(1), 2L), (3L, "X", ts(1), 3L),
      (1L, "B", ts(2), 4L), (2L, "P", ts(2), 5L), (3L, "X", ts(2), 6L),
      (1L, "B", ts(3), 7L), (2L, "Q", ts(3), 8L), (3L, "X", ts(3), 9L)
    ).toDF("k", "status", "at", "tie")
    val derived = graft.analytics.Analytics.scd2(events, "k", "status", "at", "tie")
      .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5))).sortBy(x => (x._1, x._5)).toSeq
    assert(canon(h3) == canon(derived),
      s"merge ${canon(h3)} vs derived ${canon(derived)}")
  }

  test("new keys open at version 1; closeMissing soft-deletes; absent keys carry otherwise") {
    val h1 = MergeIO.scd2Init(Seq((1L, "A")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(1))
    // key 1 vanishes, key 2 appears
    val s2 = Seq((2L, "Z")).toDF("k", "status")
    val carried = MergeIO.scd2Apply(h1, s2, Seq("k"), Seq("status"), ts(2))
    val byKey = carried.collect().map(r => (r.getLong(0), r.getBoolean(5))).toMap
    assert(byKey == Map(1L -> true, 2L -> true), "absent key stays current by default")
    val closedOut = MergeIO.scd2Apply(h1, s2, Seq("k"), Seq("status"), ts(2),
      closeMissing = true)
    val k1 = closedOut.filter($"k" === 1L).collect().head
    assert(!k1.getBoolean(5) && k1.getTimestamp(3) == ts(2),
      "closeMissing must close the vanished key at asOf")
    val k2 = closedOut.filter($"k" === 2L).collect().head
    assert(k2.getBoolean(5) && k2.getLong(4) == 1L)
  }

  test("scd2Upsert maintains the on-disk history through the crash-safe swap") {
    val dir = tmpDir("scd2_upsert") + "/hist"
    val s1 = Seq((1L, "A"), (2L, "P")).toDF("k", "status")
    MergeIO.scd2Upsert(spark, dir, s1, Seq("k"), Seq("status"), ts(1))
    assert(spark.read.parquet(dir).count() == 2)
    val s2 = Seq((1L, "B"), (2L, "P")).toDF("k", "status")
    MergeIO.scd2Upsert(spark, dir, s2, Seq("k"), Seq("status"), ts(2))
    val h = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getBoolean(5)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(h == Seq((1L, "A", 1L, false), (1L, "B", 2L, true),
      (2L, "P", 1L, true)), s"history: $h")
    // an orphaned __old (simulated crash before promote) recovers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old"))
    MergeIO.scd2Upsert(spark, dir, Seq((3L, "X")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(3))
    val keys = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(keys == Set(1L, 2L, 3L), "recovery must restore the prior history")
  }

  test("a key closed via closeMissing that reappears continues its version chain") {
    val h1 = MergeIO.scd2Init(Seq((1L, "A")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(1))
    // key vanishes -> soft-closed at v1
    val h2 = MergeIO.scd2Apply(h1, Seq.empty[(Long, String)].toDF("k", "status"),
      Seq("k"), Seq("status"), ts(2), closeMissing = true)
    assert(h2.collect().forall(!_.getBoolean(5)), "all rows closed after vanish")
    // key reappears -> must open at version 2, not a duplicate version 1
    val h3 = MergeIO.scd2Apply(h2, Seq((1L, "B")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(3), closeMissing = true)
    val rows = h3.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._3).toSeq
    assert(rows == Seq((1L, "A", 1L, false), (1L, "B", 2L, true)),
      s"reappeared key must continue the version chain: $rows")
    assert(rows.map(x => (x._1, x._3)).distinct.size == rows.size,
      "(key, version) must stay unique")
    // vanish AGAIN and reappear AGAIN -> v3 (max over closed rows only)
    val h4 = MergeIO.scd2Apply(h3, Seq.empty[(Long, String)].toDF("k", "status"),
      Seq("k"), Seq("status"), ts(4), closeMissing = true)
    val h5 = MergeIO.scd2Apply(h4, Seq((1L, "C")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(5), closeMissing = true)
    val vers = h5.collect().map(r => (r.getString(1), r.getLong(4))).sortBy(_._2).toSeq
    assert(vers == Seq(("A", 1L), ("B", 2L), ("C", 3L)), s"chain: $vers")
  }

  test("null attribute values compare null-safely (no spurious version)") {
    val s1 = Seq((1L, None: Option[String])).toDF("k", "status")
    val h1 = MergeIO.scd2Init(s1, Seq("k"), Seq("status"), ts(1))
    val h2 = MergeIO.scd2Apply(h1, s1, Seq("k"), Seq("status"), ts(2))
    assert(h2.count() == 1 && h2.collect().head.getLong(4) == 1L,
      "null == null must not open a new version")
    val h3 = MergeIO.scd2Apply(h2, Seq((1L, Some("v"))).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(3))
    assert(h3.count() == 2, "null -> value must version")
  }
}
