package graft.stream

import graft.{DemoContracts, SparkSpec, T}
import org.apache.spark.sql.streaming.Trigger

class RecoverySpec extends SparkSpec {

  test("governed stream restarts from its checkpoint exactly-once") {
    val base = tmpDir("graft_recov")
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")

    def runOnce(): Unit = {
      val stream = ContractStream.read(spark, src, DemoContracts.lineitemAlign)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start(out)
      q.awaitTermination()
    }

    // first tranche
    li.limit(1000).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 1000)

    // restart with new files only: checkpoint must skip the old tranche
    li.limit(1500).write.mode("append").parquet(src) // 1500 more rows in new files
    runOnce()
    val total = spark.read.parquet(out)
    assert(total.count() == 2500, "restart must process exactly the new files")
    // aligned schema survived both runs
    assert(total.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name))

    // a third run with nothing new appends nothing
    runOnce()
    assert(spark.read.parquet(out).count() == 2500)
  }

  test("StreamSemanticDup bucket state survives a checkpointed restart") {
    import spark.implicits._
    val base = tmpDir("ssd_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val v = Seq(1f, 0f, 1f, 0f) // identical vectors share every band bucket

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("vec_id long, embedding array<float>, label int")
        .parquet(src)
      val q = StreamSemanticDup.candidates(stream, dim = 4, nBits = 16, bandBits = 4)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq((1L, v, 0), (2L, v, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(src)
    runOnce()
    def pairs = spark.read.parquet(out)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))

    // restart: vec 3 must pair against the RECOVERED bucket members 1 and 2
    Seq((3L, v, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(src)
    runOnce()
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "state must survive the restart: cross-restart pairs prove recovery")
  }

  test("StreamFunnel stage state survives a checkpointed restart") {
    import spark.implicits._
    val base = tmpDir("funnel_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def ev(id: Long, user: Long, typ: String, sec: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), user, typ, 1.0)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double")
        .parquet(src)
      val q = StreamFunnel.track(stream)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    // pre-restart: view completes stage 1
    Seq(ev(1, 1, "view", 1), ev(2, 1, "purchase", 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    def stages = spark.read.parquet(out)
      .select("stage").as[Int].collect().sorted.toSeq
    assert(stages == Seq(1), s"pre-restart: $stages")

    // post-restart: the click must advance the RECOVERED stage-1 state,
    // and the purchase after it completes stage 3 — only possible if
    // (stageIndex, lastTs) survived the checkpoint
    Seq(ev(3, 1, "click", 3), ev(4, 1, "purchase", 4))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    assert(stages == Seq(1, 2, 3),
      "funnel progress must continue from recovered state across restarts")
  }

  test("StreamEwma fold state survives a checkpointed restart bit-exactly") {
    import spark.implicits._
    val base = tmpDir("ewma_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double")
        .parquet(src)
      val q = StreamEwma.track(stream, halvings = 4)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq((1L, ts(1), 7L, "view", 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    // restart: the recovered e = 100e6 must seed the next fold step
    Seq((2L, ts(2), 7L, "view", 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    val byEid = spark.read.parquet(out)
      .select("event_id", "ewma_s6").as[(Long, Long)].collect().toMap
    assert(byEid == Map(1L -> 100000000L,
      2L -> (100000000L + (50000000L - 100000000L) / 16)),
      s"recovered fold state must continue bit-exactly: $byEid")
  }

  test("StreamTransitions last-event state survives a checkpointed restart") {
    import spark.implicits._
    val base = tmpDir("trans_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string, value double")
        .parquet(src)
      val q = StreamTransitions.pairs(stream)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq((1L, ts(1), 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 0, "first event emits no pair")
    // restart: the pair (view -> click) is only possible if the
    // last-event-type state survived the checkpoint
    Seq((2L, ts(2), 7L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(src)
    runOnce()
    val pairs = spark.read.parquet(out)
      .as[(Long, String, String)].collect().toSeq
    assert(pairs == Seq((7L, "view", "click")), s"got $pairs")
  }

  test("StreamScd2 open-version state survives a checkpointed restart") {
    import spark.implicits._
    val base = tmpDir("scd2_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("k long, status string, at timestamp, tie long")
        .parquet(src)
      val q = StreamScd2.track(stream, "k", "status", "at", "tie")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq((1L, "O", ts(1), 10L)).toDF("k", "status", "at", "tie")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 0, "open version is state, not output")
    // restart: the change must close the RECOVERED version 1 with its
    // ORIGINAL valid_from — only possible if (attr, from, version) survived
    Seq((1L, "F", ts(5), 11L)).toDF("k", "status", "at", "tie")
      .write.mode("append").parquet(src)
    runOnce()
    val rows = spark.read.parquet(out)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, "O",
      ts(1).getTime * 1000L, ts(5).getTime * 1000L, 1L)),
      s"recovered open version must close with its original span: $rows")
  }
}
