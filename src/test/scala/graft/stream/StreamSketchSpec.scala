package graft.stream

import graft.SparkSpec
import graft.ops.Sketch

/** The sketch family's ingest-time twins need NO separate streaming
  * operator: both sketches are bounded-state semilattice merges, so the
  * batch spellings ARE valid Structured Streaming aggregations (typed
  * k-min-distinct aggregation for KMV, (row, bucket) count for CM) in
  * complete/update mode. These specs pin the exactness contract that
  * makes that claim honest: after any prefix of the stream, the
  * streaming state equals the batch operator over the union of all
  * batches — order- and batching-insensitive, bit for bit. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv sketch streams exactly: state after N batches == batch over union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, String)](spark)
    val src = mem.toDF().toDF("source", "shingle")
    val q = Sketch.kmvSketch(src, "source", "shingle", k = 8)
      .writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("complete").start()
    // overlapping values across batches: the distinct contract means
    // re-arrivals must not perturb the buffer
    val b1 = (0 until 30).map(i => ("s1", s"v${i % 17}")) ++
      (0 until 10).map(i => ("s2", s"w$i"))
    val b2 = (0 until 25).map(i => ("s1", s"v${i + 5}")) ++ Seq(("s3", "x"))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("kmv_stream_out")
        .as[(String, Seq[Long])].collect().toMap
      val batch = Sketch.kmvSketch((b1 ++ b2).toDF("source", "shingle"),
        "source", "shingle", k = 8).as[(String, Seq[Long])].collect().toMap
      assert(streamed == batch,
        s"streaming kmv state diverged from batch:\n$streamed\nvs\n$batch")
      // the estimator over the streamed state is the batch estimate too
      val se = Sketch.kmvEstimate(spark.table("kmv_stream_out"), 8)
        .as[(String, Long)].collect().toMap
      val be = Sketch.kmvEstimate(Sketch.kmvSketch(
        (b1 ++ b2).toDF("source", "shingle"), "source", "shingle", k = 8), 8)
        .as[(String, Long)].collect().toMap
      assert(se == be)
      // under-filled buffers report exact distinct counts
      assert(se("s3") == 1L)
    } finally q.stop()
  }

  test("count-min grid streams exactly with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String](spark)
    val src = mem.toDF().toDF("tok")
    val q = Sketch.countMin(src, "tok", d = 2, w = 16)
      .writeStream.format("memory").queryName("cm_stream_out")
      .outputMode("complete").start()
    val b1 = (0 until 50).map(i => s"t${i % 7}")
    val b2 = (0 until 40).map(i => s"t${i % 11}")
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      def grid(df: org.apache.spark.sql.DataFrame) =
        df.as[(Int, Long, Long)].collect()
          .map { case (r, b, c) => (r, b) -> c }.toMap
      val streamed = grid(spark.table("cm_stream_out"))
      val batch = grid(Sketch.countMin((b1 ++ b2).toDF("tok"), "tok", d = 2, w = 16))
      assert(streamed == batch,
        s"streaming cm grid diverged from batch:\n$streamed\nvs\n$batch")
      // the state bound is structural: ≤ d × w counters however long
      // the stream runs
      assert(streamed.size <= 2 * 16)
      // total mass is conserved per hash row (counts, not samples)
      (0 until 2).foreach { r =>
        val mass = streamed.collect { case ((`r`, _), c) => c }.sum
        assert(mass == (b1.size + b2.size).toLong, s"row $r mass $mass")
      }
    } finally q.stop()
  }

  test("quantile sketch streams exactly: min-k rows state == batch over union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Long, Long)](spark)
    val src = mem.toDF().toDF("g", "id", "v")
    val q = Sketch.quantileSketch(src, "g", "id", "v", k = 8)
      .writeStream.format("memory").queryName("qs_stream_out")
      .outputMode("complete").start()
    // disjoint row ids across batches (rows have multiplicity — the
    // disjointness contract mergeQuantile documents)
    val b1 = (1 to 40).map(i => ("s1", i.toLong, (i * 13 % 97).toLong))
    val b2 = (41 to 80).map(i => ("s1", i.toLong, (i * 13 % 97).toLong)) ++
      Seq(("s2", 1L, 5L))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("qs_stream_out")
        .as[(String, Seq[(Long, Long)])].collect().toMap
      val batch = Sketch.quantileSketch((b1 ++ b2).toDF("g", "id", "v"),
        "g", "id", "v", k = 8).as[(String, Seq[(Long, Long)])].collect().toMap
      assert(streamed == batch,
        s"streaming quantile state diverged from batch:\n$streamed\nvs\n$batch")
      // and the estimates over the streamed state match the batch path
      val se = Sketch.quantileEstimate(spark.table("qs_stream_out"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(t => t._1 -> t).toMap
      val be = Sketch.quantileEstimate(Sketch.quantileSketch(
        (b1 ++ b2).toDF("g", "id", "v"), "g", "id", "v", k = 8))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(t => t._1 -> t).toMap
      assert(se == be)
    } finally q.stop()
  }
}
