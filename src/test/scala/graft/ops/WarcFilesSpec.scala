package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The file-reader seam for the crawl family: real `.warc`/`.warc.gz`
  * FILES on disk parse identically to the in-memory byte path, the
  * streaming twin lands shards across micro-batches with the same
  * records, and the full files → records → StreamCurate pipeline is
  * batch ≡ stream — the production crawl-ingest deployment shape. */
class WarcFilesSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  // payload is Array[Byte]: render rows comparable by value
  private def comparable(s: Seq[Any]): Seq[Any] = s.map {
    case a: Array[Byte] => a.toSeq
    case x => x
  }

  test("readWarc over real .warc/.warc.gz files parses identically to the in-memory path") {
    val dir = tmpDir("warc_files")
    val docs = Seq(2L, 3L, 4L, 5L) // even gzipped, odd plain (fixture convention)
    docs.foreach { d =>
      val ext = if (d % 2 == 0) "warc.gz" else "warc"
      writeFile(dir, s"shard$d.$ext", WarcOps.syntheticWarc(d))
    }
    // a non-warc file in the directory is excluded by the default glob
    writeFile(dir, "notes.txt", "not a warc".getBytes("UTF-8"))

    val got = WarcOps.readWarc(spark, dir)
    assert(got.schema == WarcOps.FileSchema)
    val all = got.collect()
    assert(!all.exists(r => r.getString(0).endsWith("notes.txt")))

    docs.foreach { d =>
      val ext = if (d % 2 == 0) "warc.gz" else "warc"
      val rows = all.filter(_.getString(0).endsWith(s"shard$d.$ext"))
        .sortBy(_.getLong(2)) // rec_index
      val mem = WarcOps.parseFile(d, WarcOps.syntheticWarc(d))
      assert(rows.length == mem.length && rows.nonEmpty, s"doc $d")
      rows.zip(mem).foreach { case (f, m) =>
        // everything after (path, doc_id) matches the in-memory parse
        assert(comparable(f.toSeq.drop(2)) == comparable(m.toSeq.drop(1)),
          s"doc $d rec ${m.get(1)}")
      }
      // the path-derived doc_id is one stable value per file
      assert(rows.map(_.getLong(1)).distinct.length == 1)
    }
    // distinct files get distinct ids (SHA-256 prefix, not hashCode)
    assert(all.map(_.getLong(1)).distinct.length == docs.length)
  }

  test("a damaged shard on disk degrades per the totality contract, not the whole scan") {
    val dir = tmpDir("warc_files_damage")
    writeFile(dir, "ok.warc", WarcOps.syntheticWarc(3L))
    val whole = WarcOps.syntheticWarc(2L) // gzipped, 4 records
    writeFile(dir, "cut.warc.gz", whole.take(whole.length / 2))
    writeFile(dir, "junk.warc", Array[Byte](1, 2, 3))
    val got = WarcOps.readWarc(spark, dir).collect()
    val byFile = got.groupBy(r => r.getString(0).split('/').last)
    assert(byFile("ok.warc").length == WarcOps.parseFile(3L, WarcOps.syntheticWarc(3L)).length)
    val cutExpected = WarcOps.parseFile(2L, whole.take(whole.length / 2)).length
    assert(byFile.getOrElse("cut.warc.gz", Array.empty).length == cutExpected,
      "the truncated shard keeps its intact-member prefix")
    assert(!byFile.contains("junk.warc"))
  }

  test("streaming twin: shards parse as they land across micro-batches, equal to batch") {
    val src = tmpDir("warc_stream_src")
    writeFile(src, "shard2.warc.gz", WarcOps.syntheticWarc(2L))
    writeFile(src, "shard3.warc", WarcOps.syntheticWarc(3L))

    val stream = WarcOps.readWarcStream(spark, src, maxFilesPerTrigger = Some(1))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("warc_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a later shard LANDS while the query runs — the second wave
      writeFile(src, "shard4.warc.gz", WarcOps.syntheticWarc(4L))
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "maxFilesPerTrigger=1 must spread the shards over micro-batches")
      val streamed = spark.table("warc_stream_out").collect()
        .map(r => comparable(r.toSeq)).toSet
      val batch = WarcOps.readWarc(spark, src).collect()
        .map(r => comparable(r.toSeq)).toSet
      assert(streamed == batch, "file-stream records must equal the batch scan")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("files → records → StreamCurate: the crawl-ingest pipeline, batch ≡ stream") {
    val src = tmpDir("warc_ingest_src")
    writeFile(src, "a.warc.gz", WarcOps.syntheticWarc(2L))
    writeFile(src, "b.warc", WarcOps.syntheticWarc(7L))

    val corpus = Seq((1L, "corpus body text right here")).toDF("doc_id", "text")
    val artifacts = graft.stream.StreamCurate.Artifacts(
      Curate.frequentLines(corpus),
      ExactSubstr.frequentShingles(corpus),
      Seq((900L, "held out eval text")).toDF("doc_id", "text"))

    def pipeline(records: DataFrame): DataFrame =
      graft.stream.StreamCurate.curate(
        records
          .filter(col("warc_type") === "response" && col("payload_text").isNotNull)
          .select((col("doc_id") + col("rec_index")).as("doc_id"),
            col("payload_text").as("text")),
        artifacts)

    val batch = pipeline(WarcOps.readWarc(spark, src)).collect()
      .map(r => comparable(r.toSeq)).toSet
    val q = pipeline(WarcOps.readWarcStream(spark, src, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("warc_curate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("warc_curate").collect()
        .map(r => comparable(r.toSeq)).toSet
      assert(streamed.nonEmpty && streamed == batch,
        "the composed files→records→curation chain must be a pure projection")
    } finally q.stop()
  }

  test("parseWarc itself runs on a streaming frame (typed projection, no RDD hop)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Array[Byte])](spark)
    val out = WarcOps.parseWarc(spark, mem.toDF().toDF("doc_id", "warc"))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("warc_mem_parse")
      .outputMode("append").start()
    try {
      mem.addData((5L, WarcOps.syntheticWarc(5L)))
      q.processAllAvailable()
      val streamed = spark.table("warc_mem_parse").collect()
        .map(r => comparable(r.toSeq)).toSet
      val direct = WarcOps.parseFile(5L, WarcOps.syntheticWarc(5L))
        .map(r => comparable(r.toSeq)).toSet
      assert(streamed == direct)
    } finally q.stop()
  }
}
