package graft.stream

import graft.SparkSpec
import graft.ops.{HashMode, NearDup}
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"), // near-dup of 1
    (3L, "completely different content about spark streaming state"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"),  // exact dup of 1
    (5L, "unrelated words nothing shared here at all truly")
  ).toDF("doc_id", "text")

  test("graft_minhash60 K matches the minhash family; null/empty arrays yield null sigs") {
    assert(graft.functions.MinhashSigs60.K == NearDup.MinHashK,
      "native signature width must track MinHashK")
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq.empty[String]),
      (3L, Seq(null.asInstanceOf[String]))
    ).toDF("id", "sh")
      .withColumn("sigs", call_function("graft_minhash60", col("sh")))
    val rows = df.select("id", "sigs").as[(Long, Seq[java.lang.Long])]
      .collect().toMap
    // non-empty: every sig equals the lambda spelling's value
    val lambda = df.filter(col("id") === 1)
      .withColumn("hh", transform(col("sh"),
        s => call_function("graft_md5hh", s.cast("binary"))))
      .select((0 until NearDup.MinHashK).map(i =>
        array_min(transform(col("hh"),
          p => element_at(p, 1) + lit(i.toLong) * element_at(p, 2)))): _*)
      .collect()(0)
    assert(rows(1L).zipWithIndex.forall { case (v, i) => v == lambda.getLong(i) })
    assert(rows(2L).forall(_ == null) && rows(2L).size == NearDup.MinHashK)
    assert(rows(3L).forall(_ == null))
  }

  test("per-row banded signatures are bit-identical to the batch explode+aggregate family") {
    for (mode <- Seq[HashMode](HashMode.Default, HashMode.Portable)) {
      val rows = NearDup.MinHashK / NearDup.MinHashBands
      val batchSig = NearDup.minhashSignatures(docs, k = 3, mode)
      val bandCols = (0 until NearDup.MinHashBands).map { bnd =>
        mode.hash((bnd * rows until (bnd + 1) * rows).map(i => col(s"mh$i")): _*)
      }
      val batchBanded = batchSig.select(col("doc_id"), col("nsh"),
        posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
        .as[(Long, Long, Int, Long)].collect().toSet
      val streamed = StreamNearDup.bandedSignatures(docs, k = 3, mode)
        .as[(Long, Long, Int, Long)].collect().toSet
      assert(streamed == batchBanded, s"banded frame drifted for $mode")
    }
  }

  test("streaming candidates catch every batch-verified pair, including across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val verified = NearDup.minhashPairs(docs, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty, "fixture must contain near-dups")

    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val q = StreamNearDup.candidates(src, threshold = 0.7)
      .writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    try {
      // docs 1-3 in batch one; the exact dup (4) and noise (5) in batch two:
      // the (1,4)/(2,4) pairs must be found ACROSS the batch boundary
      mem.addData((1L, docs.collect()(0).getString(1)), (2L, docs.collect()(1).getString(1)),
        (3L, docs.collect()(2).getString(1)))
      q.processAllAvailable()
      mem.addData((4L, docs.collect()(3).getString(1)), (5L, docs.collect()(4).getString(1)))
      q.processAllAvailable()
      val candidates = spark.table("snd_out")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(verified.subsetOf(candidates),
        s"missed verified pairs: ${verified -- candidates}")
      assert(candidates.contains((1L, 4L)), "cross-batch exact dup must surface")
      // unrelated docs never collide on a full band at these lengths
      assert(!candidates.exists(p => p._1 == 5L || p._2 == 5L))
    } finally q.stop()
  }

  test("streaming verify tail reproduces the batch verified pairs on the candidate stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batchVerified = NearDup.minhashPairs(docs, threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val out = StreamNearDup.verified(
      StreamNearDup.candidates(src, threshold = 0.7), docStore = docs)
    val q = out.writeStream.format("memory").queryName("snd_verified")
      .outputMode("append").start()
    try {
      docs.collect().foreach(r => mem.addData((r.getLong(0), r.getString(1))))
      q.processAllAvailable()
      val streamed = spark.table("snd_verified")
        .as[(Long, Long, Double)].collect().toSet // set: candidate repeats collapse
      assert(streamed == batchVerified,
        s"stream=${streamed}, batch=${batchVerified}")
    } finally q.stop()
  }

  test("bucket state caps at maxBucket: later docs only pair against kept members") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    // identical text -> every doc lands in the same buckets for all bands
    val text = "same exact words in every single one of these documents"
    val q = StreamNearDup.candidates(src, threshold = 0.7, maxBucket = 2)
      .writeStream.format("memory").queryName("snd_cap")
      .outputMode("append").start()
    try {
      mem.addData((1L, text), (2L, text), (3L, text), (4L, text))
      q.processAllAvailable()
      val pairs = spark.table("snd_cap")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // with the cap at 2 only the first two kept docs are pairable targets:
      // (1,2) plus (1,3),(2,3),(1,4),(2,4) — never (3,4)
      assert(!pairs.contains((3L, 4L)), s"capped bucket must not keep doc 3: $pairs")
      assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((1L, 4L)))
    } finally q.stop()
  }
}
