package graft.stream

import graft.{DemoContracts, SparkSpec}
import graft.analytics.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val batch1 = Seq(
    Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(5), 1, "view", 2.0),
    Ev(3, ts(10), 2, "click", 3.0))
  private val batch2 = Seq(
    Ev(4, ts(20), 1, "view", 4.0), Ev(5, ts(30), 3, "view", 5.0),
    Ev(6, ts(40), 2, "click", 6.0))

  test("watermarked tumbling window agg matches the batch twin semantics") {
    val mem = MemoryStream[Ev](spark)
    val out = ContractStream.eventsWindow(mem.toDF(), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // push the watermark far forward so all windows close and emit
      mem.addData(Ev(99, Timestamp.valueOf("2024-01-01 13:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batchTwin = Analytics.eventsWindow((batch1 ++ batch2).toDF())
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(batchTwin.subsetOf(streamed), s"streamed=$streamed batch=$batchTwin")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps first event per key in arrival order") {
    val mem = MemoryStream[Ev](spark)
    val out = ContractStream.eventsDedup(mem.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*) // events 4 and 6 duplicate (user,type) keys from batch1
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("event_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 5L))
      val batchTwin = Analytics.eventsDedup((batch1 ++ batch2).toDF())
        .select("event_id").as[Long].collect().toSet
      assert(kept == batchTwin) // ordered arrival -> same keepers as batch earliest
    } finally q.stop()
  }

  test("per-batch observation metrics reach the listener with a verdict") {
    val contract = DemoContracts.orders
    val schemaDf = Seq((1L, 1L, "O", 10.0, ts(0))).toDF(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val observations = new java.util.concurrent.ConcurrentLinkedQueue[BatchObservation]()
    val listener = new ContractStream.ValidationListener(
      contract, graft.quality.SchemaSnapshot.of(schemaDf).toMap, observations.add(_))
    spark.streams.addListener(listener)
    val mem = MemoryStream[Ev](spark)
    // adapt events to the orders contract shape: one violation (status "X")
    val shaped = mem.toDF().select(
      col("event_id").as("o_orderkey"), col("user_id").as("o_custkey"),
      when(col("event_id") === 2, "X").otherwise("O").as("o_orderstatus"),
      col("value").as("o_totalprice"), col("ts").as("o_orderdate"))
    val observed = ContractStream.observed(shaped, contract)
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (observations.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!observations.isEmpty, "no batch observation arrived")
      val obs = observations.peek()
      assert(obs.metrics("row_count") == 3L)
      assert(obs.metrics("violations.enum_o_orderstatus") == 1L)
      assert(obs.validation.errors.exists(_.contains("o_orderstatus")))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}

final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamFingerprintDedupSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp
  import spark.implicits._

  test("streaming fingerprint dedup keeps one arrival per normalised text") {
    val mem = MemoryStream[Doc](spark)
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = ContractStream.dedupByFingerprint(docs).writeStream
      .format("memory").queryName("fp_dedup").outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(Doc(1L, t, "Hello  World"), Doc(2L, t, "hello world"), Doc(3L, t, "other"))
      q.processAllAvailable()
      mem.addData(Doc(4L, t, "HELLO WORLD")) // later batch, same fingerprint
      q.processAllAvailable()
      val kept = spark.table("fp_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.contains(3L))
      assert(kept.intersect(Set(1L, 2L, 4L)).size == 1) // one survivor of the dup group
    } finally q.stop()
  }
}
