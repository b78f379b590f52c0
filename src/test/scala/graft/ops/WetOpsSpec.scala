package graft.ops

import graft.SparkSpec
import graft.stream.StreamCurate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** WET/WAT companion readers: closed-form field read-back, the
  * totality battery the shared byte-walk guarantees (truncation,
  * damaged gzip members, garbage), the file/stream entries, and the
  * composition with the StreamCurate cleaning chain (batch ≡ stream —
  * WET shards ARE the chain's production input). */
class WetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Long) = (0L until n).map(Tuple1(_)).toDF("doc_id")

  test("parseWet reads every conversion field back from the closed-form fixtures") {
    val recs = WarcOps.parseWarc(spark, WetOps.wetPayloads(spark, ids(12)))
    val out = WetOps.parseWet(recs)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rec_index") - 1) ->
        (r.getAs[String]("target_uri"), r.getAs[String]("text"),
          r.getAs[Long]("n_chars"))).toMap
    val expected = (for {
      doc <- 0L until 12L
      j <- 0L to doc % 3
    } yield (doc, j) -> (WarcOps.fixtureUri(doc, j), WetOps.wetText(doc, j),
      WetOps.wetText(doc, j).length.toLong)).toMap
    assert(out == expected)
    // the warcinfo record never leaks into the text rows
    assert(!WetOps.parseWet(recs).collect()
      .exists(_.getAs[String]("text").contains("graft-wet-fixture")))
    // both physical layouts parsed (even ids gzip, odd plain)
    assert(out.keySet.map(_._1).exists(_ % 2 == 0) &&
      out.keySet.map(_._1).exists(_ % 2 == 1))
  }

  test("totality: truncation, damaged gzip members and garbage degrade, never throw") {
    // plain-file truncation: cut mid-final-record keeps the earlier ones
    val plain = WetOps.syntheticWet(5L) // odd -> plain, 1 + 5%3 = 3 conversions
    val cut = java.util.Arrays.copyOfRange(plain, 0, plain.length - 10)
    val kept = WetOps.parseWet(WarcOps.parseWarc(spark,
      Seq((5L, cut)).toDF("doc_id", "warc")))
    assert(kept.count() >= 1 && kept.count() < 3,
      "records before the damage point survive; the cut record drops")
    // gzip member damage: corrupt the LAST member's bytes — earlier
    // members' records survive
    val gz = WetOps.syntheticWet(4L) // even -> gzip member-per-record
    val dmg = gz.clone(); dmg(dmg.length - 12) = 0x7F
    val keptGz = WetOps.parseWet(WarcOps.parseWarc(spark,
      Seq((4L, dmg)).toDF("doc_id", "warc")))
    assert(keptGz.count() >= 1, "earlier gzip members' records survive damage")
    // pure garbage and empty input yield empty frames
    assert(WetOps.parseWet(WarcOps.parseWarc(spark,
      Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "warc"))).count() == 0)
    assert(WetOps.parseWet(WarcOps.parseWarc(spark,
      Seq((1L, Array.empty[Byte])).toDF("doc_id", "warc"))).count() == 0)
  }

  test("parseWat extracts the envelope through the declared schema; damage is total") {
    val out = WetOps.parseWat(
      WarcOps.parseWarc(spark, WetOps.watPayloads(spark, ids(12))))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rec_index") - 1) -> r)
      .toMap
    for (doc <- 0L until 12L; j <- 0L to doc % 3) {
      val r = out((doc, j))
      assert(r.getAs[String]("target_uri") == WarcOps.fixtureUri(doc, j),
        "the record header URI always survives")
      if (WetOps.watMalformed(doc, j)) {
        assert(r.getAs[String]("wat_uri") == null &&
          r.getAs[String]("title") == null &&
          r.getAs[Long]("n_links") == 0L &&
          r.getAs[String]("first_link") == null,
          s"damaged envelope ($doc,$j) must null out, never throw")
      } else {
        assert(r.getAs[String]("wat_uri") == WarcOps.fixtureUri(doc, j))
        assert(r.getAs[String]("title") == s"T$doc-$j")
        val n = WetOps.watLinkCount(doc, j)
        assert(r.getAs[Long]("n_links") == n)
        assert(r.getAs[String]("first_link") ==
          (if (n > 0) s"http://l0.example/$doc/$j" else null))
      }
    }
  }

  test("readWet: real files through the binaryFile entry equal the in-memory parse") {
    val dir = tmpDir("wet_files")
    for (doc <- 0L until 8L) {
      val name = if (doc % 2 == 0) s"doc_$doc.warc.wet.gz" else s"doc_$doc.warc.wet"
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        WetOps.syntheticWet(doc))
    }
    // a non-WET file the glob must skip
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/notes.txt"),
      "not a wet shard".getBytes("UTF-8"))
    val fromFiles = WetOps.readWet(spark, dir)
      .withColumn("doc", regexp_extract(col("path"), "doc_([0-9]+)[.]warc", 1)
        .cast("long"))
      .select(col("doc"), col("rec_index"), col("target_uri"), col("text"))
      .collect().map(_.toSeq).toSet
    val inMemory = WetOps.parseWet(
      WarcOps.parseWarc(spark, WetOps.wetPayloads(spark, ids(8))))
      .select(col("doc_id"), col("rec_index"), col("target_uri"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(fromFiles == inMemory)
    assert(fromFiles.nonEmpty)
  }

  test("watLinks: one row per well-formed outlink; malformed and link-less " +
    "records contribute nothing") {
    val links = WetOps.watLinks(
      WarcOps.parseWarc(spark, WetOps.watPayloads(spark, ids(12))))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rec_index") - 1,
        r.getAs[String]("link")))
    val expected = for {
      doc <- 0L until 12L
      j <- 0L to doc % 3
      if !WetOps.watMalformed(doc, j)
      k <- 0L until WetOps.watLinkCount(doc, j)
    } yield (doc, j, s"http://l$k.example/$doc/$j")
    assert(links.toSet == expected.toSet && links.length == expected.length,
      "exactly the well-formed envelopes' links, one row each")
  }

  test("readWat: file entry with shard-path lineage, parity with the in-memory parse") {
    val dir = tmpDir("wat_files")
    for (doc <- 0L until 8L) {
      val name = if (doc % 2 == 0) s"doc_$doc.warc.wat.gz" else s"doc_$doc.warc.wat"
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        WetOps.syntheticWat(doc))
    }
    val fromFiles = WetOps.readWat(spark, dir)
    // r15 review fix: parseWat preserves the path column exactly like
    // parseWet — tracing a damaged envelope back to its shard needs it
    assert(fromFiles.columns.head == "path")
    assert(fromFiles.filter(col("path").isNull).count() == 0)
    val rows = fromFiles
      .withColumn("doc", regexp_extract(col("path"), "doc_([0-9]+)[.]warc", 1)
        .cast("long"))
      .select(col("doc"), col("rec_index"), col("wat_uri"), col("title"),
        col("n_links"), col("first_link"))
      .collect().map(_.toSeq).toSet
    val inMemory = WetOps.parseWat(
      WarcOps.parseWarc(spark, WetOps.watPayloads(spark, ids(8))))
      .select(col("doc_id"), col("rec_index"), col("wat_uri"), col("title"),
        col("n_links"), col("first_link"))
      .collect().map(_.toSeq).toSet
    assert(rows == inMemory && rows.nonEmpty)
  }

  test("WET shards feed StreamCurate with no adapter: stream ≡ batch through the chain") {
    // offline artifacts from a tiny corpus (the StreamCurateSpec recipe)
    val corpus = Seq((1L, "Corpus doc body here.\nsubscribe now"),
      (2L, "Another corpus doc.\nsubscribe now")).toDF("doc_id", "text")
    val artifacts = StreamCurate.Artifacts(
      frequentLines = Curate.frequentLines(corpus),
      frequentShingles = ExactSubstr.frequentShingles(corpus),
      evalDocs = Seq((900L, "held out evaluation answer string for " +
        "benchmark questions exactly this very sentence of thirteen tokens"))
        .toDF("doc_id", "text"))
    val dir = tmpDir("wet_stream")
    for (doc <- 0L until 6L)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/doc_$doc.warc.wet"),
        WetOps.syntheticWet(doc))
    def chain(docs: org.apache.spark.sql.DataFrame) =
      StreamCurate.curate(
        docs.select(
          // WET rows are (shard, record)-keyed; the chain wants one id
          // (pmod first: file-sourced doc ids are full-range 64-bit
          // path digests, and *100 on those overflows under ANSI)
          (pmod(col("doc_id"), lit(1L << 40)) * 100 + col("rec_index"))
            .as("doc_id"),
          col("text")),
        artifacts)
    val batch = chain(WetOps.readWet(spark, dir))
      .collect().map(_.toSeq).toSet
    val out = tmpDir("wet_stream_out"); val ckpt = tmpDir("wet_stream_ckpt")
    val q = chain(WetOps.readWetStream(spark, dir))
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").start(out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty,
      "the WET → curate chain must be batch/stream identical")
  }
}
