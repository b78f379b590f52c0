package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted Hamming-fingerprint artifact: probe ≡ the in-memory
  * engine, merge ≡ a fresh build on the concatenated corpus, the pinned
  * kind/layout metadata refuses every silent-mismatch class, and the
  * parquet round trip preserves the band-layout tag the probe guard
  * reads. */
class HammingIndexSpec extends SparkSpec {
  import spark.implicits._

  // fingerprints with a planted structure: id i carries hash i<<8 (far
  // apart); arrivals 100+i carry the corpus hash with `i % 3` low bits
  // flipped — Hamming 0/1/2 twins, all within radius 3
  private def corpusHashes = (0L until 40L)
    .map(i => (i, i << 8)).toDF("doc_id", "fp")
  private def arrivalHashes = (0L until 40L)
    .map(i => (100L + i, (i << 8) ^ ((1L << (i % 3).toInt) - 1L)))
    .toDF("doc_id", "fp")

  test("persisted probe ≡ the in-memory hammingIndex/hammingProbe engine") {
    val dir = tmpDir("graft_hix")
    HammingIndex.build(corpusHashes, dir, maxHamming = 3,
      kind = "test-fp", hashCol = "fp")
    assert(HammingIndex.meta(spark, dir) == ("test-fp", 64, 3))
    val persisted = HammingIndex.probe(spark, dir, arrivalHashes,
      expectedKind = "test-fp", hashCol = "fp")
      .collect().map(_.toSeq).toSet
    val inMemory = NearDup.hammingProbe(
      NearDup.hammingIndex(corpusHashes, 3, "fp"),
      arrivalHashes, 3, "fp").collect().map(_.toSeq).toSet
    assert(persisted == inMemory)
    // every arrival finds its PLANTED twin at the planted distance
    // (shifted corpus hashes are close to each other too — e.g. 1<<8 vs
    // 3<<8 is Hamming 1 — so extra legitimate pairs exist alongside)
    assert((0L until 40L).forall(i =>
      persisted.contains(Seq(100L + i, i, i % 3))))
  }

  test("merge ≡ a fresh build on the concatenated fingerprint frames") {
    val dir = tmpDir("graft_hix_m")
    val (a, b) = (corpusHashes.filter(col("doc_id") < 20),
      corpusHashes.filter(col("doc_id") >= 20))
    HammingIndex.build(a, s"$dir/a", maxHamming = 3, kind = "test-fp",
      hashCol = "fp")
    HammingIndex.merge(spark, s"$dir/a", b, s"$dir/merged",
      expectedKind = "test-fp", hashCol = "fp")
    HammingIndex.build(corpusHashes, s"$dir/fresh", maxHamming = 3,
      kind = "test-fp", hashCol = "fp")
    def probeAll(d: String) = HammingIndex.probe(spark, d, arrivalHashes,
      expectedKind = "test-fp", hashCol = "fp").collect().map(_.toSeq).toSet
    assert(probeAll(s"$dir/merged") == probeAll(s"$dir/fresh"))
    assert(HammingIndex.meta(spark, s"$dir/merged") == ("test-fp", 64, 3),
      "merge preserves the pinned metadata")
    // stored band ROWS agree too, not just probe results
    def rows(d: String) = spark.read.parquet(s"$d/data")
      .collect().map(_.toSeq).toSet
    assert(rows(s"$dir/merged") == rows(s"$dir/fresh"))
    // in-place merge is refused (it would delete the input mid-plan)
    intercept[IllegalArgumentException](
      HammingIndex.merge(spark, s"$dir/a", b, s"$dir/a",
        expectedKind = "test-fp", hashCol = "fp"))
    // a cross-kind merge is refused like a cross-kind probe: folding
    // audio contours into an image index would contaminate every later
    // probe that passes the kind check
    val e = intercept[IllegalArgumentException](
      HammingIndex.merge(spark, s"$dir/a", b, s"$dir/merged2",
        expectedKind = "audio-dhash", hashCol = "fp"))
    assert(e.getMessage.contains("test-fp") &&
      e.getMessage.contains("audio-dhash"))
  }

  test("kind and layout mismatches are refused loudly") {
    val dir = tmpDir("graft_hix_k")
    HammingIndex.build(corpusHashes, dir, maxHamming = 3,
      kind = "image-dhash", hashCol = "fp")
    // probing an image index with audio fingerprints: same hash space,
    // meaningless pairs — must refuse by name
    val e = intercept[IllegalArgumentException](
      HammingIndex.probe(spark, dir, arrivalHashes,
        expectedKind = "audio-dhash", hashCol = "fp"))
    assert(e.getMessage.contains("image-dhash") &&
      e.getMessage.contains("audio-dhash"))
    // the band-layout tag survives the parquet round trip: a DIRECT
    // NearDup probe of the loaded frame under a different radius (a
    // different band layout) still trips the schema-metadata guard
    val loaded = spark.read.parquet(s"$dir/data")
    val e2 = intercept[IllegalArgumentException](
      NearDup.hammingProbe(loaded, arrivalHashes, maxHamming = 8,
        hashCol = "fp"))
    assert(e2.getMessage.contains("layout mismatch"))
    // a bare directory is not an artifact
    intercept[IllegalArgumentException](
      HammingIndex.probe(spark, tmpDir("graft_hix_empty"), arrivalHashes,
        expectedKind = "image-dhash", hashCol = "fp"))
  }

  test("freshAgainst refuses a stale index (the provenance guard)") {
    val dir = tmpDir("graft_hix_f")
    val docs = (0L until 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    HammingIndex.build(corpusHashes, dir, maxHamming = 3, kind = "test-fp",
      hashCol = "fp",
      provenance = Some(ArtifactProvenance.Target("docs", "1",
        snapshot = Some(docs))))
    // matching snapshot passes
    HammingIndex.probe(spark, dir, arrivalHashes, expectedKind = "test-fp",
      hashCol = "fp", freshAgainst = Some(docs)).collect()
    // edited corpus is refused (requireFresh's stale-artifact contract)
    val edited = docs.withColumn("text",
      when(col("doc_id") === 3L, lit("EDITED")).otherwise(col("text")))
    val e = intercept[IllegalArgumentException](
      HammingIndex.probe(spark, dir, arrivalHashes, expectedKind = "test-fp",
        hashCol = "fp", freshAgainst = Some(edited)).collect())
    assert(e.getMessage.contains("stale artifact"), e.getMessage)
  }

  test("probe is stream-admissible: a MemoryStream probes identically to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir("graft_hix_s")
    HammingIndex.build(corpusHashes, dir, maxHamming = 3, kind = "test-fp",
      hashCol = "fp")
    val rows = (0L until 40L)
      .map(i => (100L + i, (i << 8) ^ ((1L << (i % 3).toInt) - 1L)))
    val batch = HammingIndex.probe(spark, dir,
      rows.toDF("doc_id", "fp"), expectedKind = "test-fp", hashCol = "fp")
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, Long)](spark)
    val q = HammingIndex.probe(spark, dir,
      mem.toDF().toDF("doc_id", "fp"), expectedKind = "test-fp",
      hashCol = "fp")
      .writeStream.format("memory").queryName("hix_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hix_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, "stream-static probe ≡ batch probe")
    } finally q.stop()
  }
}
