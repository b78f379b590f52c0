package graft.stream

import graft.SparkSpec
import graft.ops.VectorOps

class StreamSemanticDupSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  // two tight clusters (cos > 0.99 within, ~0 across) + noise + a zero vector
  private def vecs: Seq[(Long, Seq[Float], Int)] = Seq(
    (1L, Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), 0),
    (2L, Seq(1f, 0.05f, 0f, 0f, 1f, 0f, 0f, 0f), 0),  // near-dup of 1
    (3L, Seq(0f, 1f, 0f, 1f, 0f, 0f, 1f, 0f), 0),
    (4L, Seq(0f, 1f, 0.05f, 1f, 0f, 0f, 1f, 0f), 0),  // near-dup of 3
    (5L, Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f), 0), // noise
    (6L, Seq(1f, 0f, 0f, 0f, 1f, 0.05f, 0f, 0f), 1),  // near-dup of 1/2, OTHER label
    (7L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0)      // zero-norm: null cosine
  )
  private def embDf = vecs.toDF("vec_id", "embedding", "label")

  test("per-row banded signatures match the batch LSH construction bit for bit") {
    // same planes => the stream's banded frame must equal one built from the
    // batch helper's own exprs over prepared()
    val planes = VectorOps.rademacherPlanes(32, Dim, seed = 7)
    val bands = VectorOps.lshBandExprs(
      org.apache.spark.sql.functions.col("v"), planes, bandBits = 4)
    val expected = VectorOps.prepared(embDf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.array(bands: _*))
          .as(Seq("band", "band_val")))
      .as[(Long, Int, Int, Long)].collect().toSet
    val got = StreamSemanticDup.bandedSignatures(embDf, Dim, nBits = 32,
      bandBits = 4, seed = 7)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("stream candidates + verify tail reproduce the batch LSH pair miner across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = VectorOps.embeddingPairsLsh(embDf, threshold = 0.8,
      nBits = 32, bandBits = 4, seed = 42)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(batch.exists(p => p._1 == 1L && p._2 == 2L), "fixture must contain near-dups")
    assert(batch.exists(p => p._1 == 3L && p._2 == 4L))

    val mem = MemoryStream[(Long, Seq[Float], Int)](spark)
    val src = mem.toDF().toDF("vec_id", "embedding", "label")
    val out = StreamSemanticDup.verified(
      StreamSemanticDup.candidates(src, Dim, nBits = 32, bandBits = 4, seed = 42),
      vecStore = embDf, threshold = 0.8)
    val q = out.writeStream.format("memory").queryName("ssd_verified")
      .outputMode("append").start()
    try {
      // split so the (1,2) and (3,4) pairs must be found ACROSS the boundary
      val rows = vecs
      mem.addData(rows(0), rows(2), rows(4))
      q.processAllAvailable()
      mem.addData(rows(1), rows(3), rows(5), rows(6))
      q.processAllAvailable()
      val streamed = spark.table("ssd_verified")
        .select("vec_a", "vec_b", "label", "cosine")
        .as[(Long, Long, Int, Double)].collect().toSet // set: repeats collapse
      assert(streamed == batch, s"stream=$streamed, batch=$batch")
      // label blocking: vec 6 is near-identical to 1/2 but in label 1
      assert(!streamed.exists(p => (p._1 == 6L || p._2 == 6L) && p._3 == 0))
      // zero-norm vector: null cosine, never verified
      assert(!streamed.exists(p => p._1 == 7L || p._2 == 7L))
    } finally q.stop()
  }

  test("bucket state caps at maxBucket") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Seq[Float], Int)](spark)
    val src = mem.toDF().toDF("vec_id", "embedding", "label")
    val v = Seq(1f, 0f, 1f, 0f, 1f, 0f, 1f, 0f) // identical => same buckets everywhere
    val q = StreamSemanticDup.candidates(src, Dim, nBits = 16, bandBits = 4,
      maxBucket = 2)
      .writeStream.format("memory").queryName("ssd_cap")
      .outputMode("append").start()
    try {
      mem.addData((1L, v, 0), (2L, v, 0), (3L, v, 0), (4L, v, 0))
      q.processAllAvailable()
      val pairs = spark.table("ssd_cap")
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(!pairs.contains((3L, 4L)), s"capped bucket must not keep vec 3: $pairs")
      assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((1L, 4L)))
    } finally q.stop()
  }
}
