package graft.stream

import graft.SparkSpec
import graft.ops.Bucketing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, time: String, v: Double) =
    Ev(id, Timestamp.valueOf(time), user, "view", v)

  test("flatMapGroupsWithState sessionization: gap splits, timeout flushes") {
    val mem = MemoryStream[Ev](spark)
    val sessions = Sessionize.sessionize(
      mem.toDF().selectExpr("user_id", "ts", "value"), gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 5m apart (one session), then 2h later another (new session)
      mem.addData(
        ev(1, 1, "2024-01-01 10:00:00", 1.0),
        ev(2, 1, "2024-01-01 10:05:00", 2.0),
        ev(3, 2, "2024-01-01 10:00:00", 5.0))
      q.processAllAvailable()
      mem.addData(ev(4, 1, "2024-01-01 12:00:00", 4.0)) // closes user1's first session in-batch
      q.processAllAvailable()
      // advance the watermark far enough to time out all open sessions
      mem.addData(ev(99, 9, "2024-01-01 20:00:00", 0.0))
      q.processAllAvailable()
      mem.addData(ev(100, 9, "2024-01-02 09:00:00", 0.0))
      q.processAllAvailable()

      val out = spark.table("sess_out").as[UserSession].collect()
        .map(s => (s.user_id, s.session_start.toString, s.n_events, s.sum_value)).toSet
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 2L, 3.0))) // merged pair
      assert(out.contains((1L, "2024-01-01 12:00:00.0", 1L, 4.0))) // split by gap
      assert(out.contains((2L, "2024-01-01 10:00:00.0", 1L, 5.0))) // flushed by timeout
    } finally q.stop()
  }

  test("late in-watermark event from a later batch cannot rewind the session") {
    val mem = MemoryStream[Ev](spark)
    val sessions = Sessionize.sessionize(
      mem.toDF().selectExpr("user_id", "ts", "value"), gapMinutes = 30, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(
        ev(1, 1, "2024-01-01 10:00:00", 1.0),
        ev(2, 1, "2024-01-01 10:20:00", 2.0))
      q.processAllAvailable()
      // batch 2: a LATE event (10:10, within the 1h watermark) arrives after
      // the 10:20 end. Before the max/min merge fix this rewound end to
      // 10:10, so the 10:45 event (25m after the true end) would wrongly
      // split the session AND the timeout would fire from the rewound end.
      mem.addData(ev(3, 1, "2024-01-01 10:10:00", 4.0))
      q.processAllAvailable()
      mem.addData(ev(4, 1, "2024-01-01 10:45:00", 8.0)) // 25m gap from true end
      q.processAllAvailable()
      // push the watermark far ahead so the (single) session times out
      mem.addData(ev(99, 9, "2024-01-02 20:00:00", 0.0))
      q.processAllAvailable()

      val out = spark.table("sess_late").as[UserSession].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.toString, s.session_end.toString, s.n_events, s.sum_value))
      assert(out.toSeq == Seq(("2024-01-01 10:00:00.0", "2024-01-01 10:45:00.0", 4L, 15.0)),
        s"expected one un-rewound session, got ${out.toSeq}")
    } finally q.stop()
  }
}

class BucketingSpec extends SparkSpec {

  test("bucketed tables sort-merge-join with zero shuffle exchanges") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = graft.T.load(spark, "/root/testdata/sf0.001", "orders")
    Bucketing.writeBucketed(li.withColumnRenamed("l_orderkey", "okey"),
      "li_bkt", Seq("okey"), buckets = 4)
    Bucketing.writeBucketed(ord.withColumnRenamed("o_orderkey", "okey"),
      "ord_bkt", Seq("okey"), buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.bucketedJoin(spark, "li_bkt", "ord_bkt", Seq("okey"))
      assert(!Bucketing.joinHasShuffle(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() == li.count()) // every lineitem matches its order
      // control: the same join on raw (unbucketed) frames must shuffle
      val raw = li.withColumnRenamed("l_orderkey", "okey")
        .join(ord.withColumnRenamed("o_orderkey", "okey"), Seq("okey"))
      assert(Bucketing.joinHasShuffle(raw))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
