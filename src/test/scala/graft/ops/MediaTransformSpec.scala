package graft.ops

import graft.SparkSpec

/** The transforms are tested against the CLOSED FORM, not against
  * themselves: resize must reproduce `pixelValue(doc, c, (x*w)/outW,
  * (y*h)/outH)` per output pixel (the nearest-neighbor floor mapping
  * in exact integer arithmetic), frame-sampling must reproduce the
  * exact per-window Long Σv / Σv² / min / max of `sampleValue` — a
  * broken mapping, window boundary, or channel order is a mismatch. */
class MediaTransformSpec extends SparkSpec {
  import spark.implicits._

  private val OutW = 6
  private val OutH = 4
  private val Win = 8

  private def expectedResize(doc: Long): Seq[(Long, Long, Long, Long)] = {
    val (w, h) = MediaDecode.imageDims(doc)
    for (y <- 0 until OutH; x <- 0 until OutW; c <- 0 until 3) yield {
      val sx = (x * w) / OutW
      val sy = (y * h) / OutH
      (c.toLong, x.toLong, y.toLong,
        MediaDecode.pixelValue(doc, c, sx, sy).toLong)
    }
  }

  test("resize reproduces the floor mapping per pixel (up- and downscale)") {
    // doc 0: w=4 (< OutW: horizontal upscale), h=3 (< OutH: vertical
    // upscale); doc 8: w=7, h=3 (horizontal downscale); doc 5: w=4, h=4
    // (h == OutH identity rows). PNG and BMP both exercised.
    for ((doc, fmt) <- Seq((0L, "png"), (8L, "bmp"), (5L, "bmp"))) {
      val rows = MediaTransform.resizeOne(
        doc, MediaDecode.syntheticImage(doc, fmt), OutW, OutH)
      assert(rows.size == OutW * OutH * 3, s"doc $doc: full pixel grid")
      assert(rows.forall(_.getString(1) == fmt))
      val got = rows.map(r =>
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).sorted
      assert(got == expectedResize(doc).sorted, s"doc $doc $fmt mapping")
    }
  }

  test("resize is total: wav, truncated jpeg, garbage, bombs, nulls → marker rows") {
    val wav = MediaTransform.resizeOne(1L, MediaDecode.syntheticWav(1L), OutW, OutH)
    assert(wav.size == 1 && wav.head.getString(1) == "wav" && wav.head.isNullAt(5))
    // a bare JPEG header (no scan data) enters the runtime decode path
    // and degrades to an undecodable marker
    val jpegHeader = Array(0xff, 0xd8, 0xff, 0xc0, 0, 17, 8, 0, 2, 0, 2, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    assert(MediaTransform.resizeOne(2L, jpegHeader, OutW, OutH)
      .head.getString(1) == "undecodable")
    assert(MediaTransform.resizeOne(3L, null, OutW, OutH)
      .head.getString(1) == "unknown")
    assert(MediaTransform.resizeOne(4L, "garbage".getBytes, OutW, OutH)
      .head.getString(1) == "unknown")
    // 65536x65536 PNG header: guarded BEFORE allocation
    val bombSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13).map(_.toByte) ++ "IHDR".getBytes ++
      Array(0, 1, 0, 0, 0, 1, 0, 0, 8, 2, 0, 0, 0).map(_.toByte)
    assert(MediaTransform.resizeOne(5L, bombSig, OutW, OutH)
      .head.getString(1) == "oversize")
    // a nonsense target is a caller bug, not a data bug: it must not
    // silently degrade to a marker row
    assertThrows[IllegalArgumentException](
      MediaTransform.resizeOne(6L, MediaDecode.syntheticImage(6L, "png"), 0, 4))
  }

  private def expectedFrames(doc: Long): Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val (nch, nFrames) = MediaDecode.wavShape(doc)
    for (c <- 0 until nch; w <- 0 to (nFrames - 1) / Win) yield {
      val vs = (w * Win until math.min((w + 1) * Win, nFrames))
        .map(i => MediaDecode.sampleValue(doc, c, i).toLong)
      (c.toLong, w.toLong, vs.size.toLong, vs.sum, vs.map(v => v * v).sum,
        vs.min, vs.max)
    }
  }

  test("frame windows reproduce exact Long stats, incl. the partial tail") {
    // doc 1: nch=2, nFrames=17 → windows of 8, 8, 1 (partial tail);
    // doc 16: nch=1, nFrames=32 → exactly 4 full windows
    for (doc <- Seq(1L, 16L, 7L)) {
      val rows = MediaTransform.frameOne(doc, MediaDecode.syntheticWav(doc), Win)
      assert(rows.forall(_.getString(1) == "wav"))
      val got = rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).sorted
      assert(got == expectedFrames(doc).sorted, s"doc $doc windows")
    }
  }

  test("frame-sampling is total: images, garbage, nulls → marker rows") {
    val png = MediaTransform.frameOne(0L, MediaDecode.syntheticImage(0L, "png"), Win)
    assert(png.size == 1 && png.head.getString(1) == "png" &&
      png.head.getLong(4) == 0L && png.head.isNullAt(5))
    assert(MediaTransform.frameOne(1L, null, Win).head.getString(1) == "unknown")
    assert(MediaTransform.frameOne(2L, "x".getBytes, Win).head.getString(1) == "unknown")
    assertThrows[IllegalArgumentException](
      MediaTransform.frameOne(3L, MediaDecode.syntheticWav(3L), 0))
  }

  test("distributed seams skip null ids and degrade null payloads (total)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(7L, MediaDecode.syntheticImage(7L, "png")),
      Row(null, MediaDecode.syntheticImage(8L, "png")),
      Row(9L, null),
      Row(10L, MediaDecode.syntheticWav(10L)))
    val df = spark.createDataFrame(rows, schema)
    val rs = MediaTransform.resizePixels(spark, df, OutW, OutH).collect()
    assert(rs.map(_.getLong(0)).toSet == Set(7L, 9L, 10L))
    assert(rs.count(_.getLong(0) == 7L) == OutW * OutH * 3)
    assert(rs.filter(_.getLong(0) == 9L).forall(_.isNullAt(5)))
    val fs = MediaTransform.frameStats(spark, df, Win).collect()
    assert(fs.map(_.getLong(0)).toSet == Set(7L, 9L, 10L))
    assert(fs.filter(_.getLong(0) == 10L).forall(_.getLong(4) > 0L))
  }

  test("fixture queries run end to end with the expected row counts") {
    val ids = (0L until 30L).toDF("doc_id")
    val payloads = MediaDecode.syntheticPayloads(spark, ids)
    val r = MediaTransform.resizePixels(spark, payloads, OutW, OutH)
    // 20 image docs × 72 pixel rows + 10 wav marker rows
    assert(r.count() == 20L * OutW * OutH * 3 + 10L)
    val f = MediaTransform.frameStats(spark, payloads, Win)
    val expected = (0L until 30L).map { doc =>
      if (doc % 3 == 1) {
        val (nch, nFrames) = MediaDecode.wavShape(doc)
        nch.toLong * ((nFrames + Win - 1) / Win)
      } else 1L
    }.sum
    assert(f.count() == expected)
  }

  private def expectedDhash(doc: Long): Long = {
    val (w, h) = MediaDecode.imageDims(doc)
    def luma(gx: Int, gy: Int): Int = {
      val sx = (gx * w) / MediaTransform.DhashW
      val sy = (gy * h) / MediaTransform.DhashH
      (299 * MediaDecode.pixelValueWavy(doc, 0, sx, sy) +
        587 * MediaDecode.pixelValueWavy(doc, 1, sx, sy) +
        114 * MediaDecode.pixelValueWavy(doc, 2, sx, sy)) / 1000
    }
    var hash = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (luma(gx + 1, gy) > luma(gx, gy)) hash |= 1L << (gy * 8 + gx)
    hash
  }

  test("dhash reproduces the closed form bit for bit; hashes are content-diverse") {
    // the WAVY fixture: the stride-7 ramp is monotone within a row, so
    // its dhash depends only on the image WIDTH (every doc of the same
    // dims hashes identically) — the wavy strides wrap the byte ring so
    // the hash depends on actual content
    // docs 0 and 20 share dims (4,3): the pair that would collide if
    // the hash degenerated to a dims-only function again
    val hashes = for ((doc, fmt) <- Seq((0L, "png"), (20L, "png"), (3L, "png"),
      (8L, "bmp"), (17L, "bmp")))
      yield {
        val rows = MediaTransform.dhashOne(doc, MediaDecode.syntheticImageWavy(doc, fmt))
        assert(rows.size == 1 && rows.head.getString(1) == fmt)
        assert(rows.head.getLong(2) == expectedDhash(doc), s"doc $doc $fmt")
        rows.head.getLong(2)
      }
    assert(hashes.distinct.size == hashes.size,
      s"same-dims docs must not collide under the wavy fixture: $hashes")
  }

  test("dhash is a PERCEPTUAL hash: the same pixels hash identically across codecs") {
    // the exact byte hashes of a PNG and a BMP of the same image differ;
    // the dhash must not (that is the point of the operator)
    for (doc <- Seq(2L, 5L, 9L)) {
      val png = MediaTransform.dhashOne(doc, MediaDecode.syntheticImageWavy(doc, "png"))
      val bmp = MediaTransform.dhashOne(doc, MediaDecode.syntheticImageWavy(doc, "bmp"))
      assert(png.head.getLong(2) == bmp.head.getLong(2), s"doc $doc codec parity")
    }
  }

  test("dhash totality: wav, jpeg, garbage, nulls -> null-hash marker rows") {
    val wav = MediaTransform.dhashOne(1L, MediaDecode.syntheticWav(1L))
    assert(wav.size == 1 && wav.head.getString(1) == "wav" && wav.head.isNullAt(2))
    assert(MediaTransform.dhashOne(2L, null).head.isNullAt(2))
    assert(MediaTransform.dhashOne(3L, "junk".getBytes).head.getString(1) == "unknown")
    val out = MediaTransform.dhash(spark,
      MediaDecode.syntheticPayloads(spark, (0L until 30L).toDF("doc_id")))
    assert(out.count() == 30L)
    assert(out.filter(org.apache.spark.sql.functions.col("dhash").isNull).count() == 10L)
  }

  private def expectedAudioDhash(doc: Long): Long = {
    val (nch, nFrames) = MediaDecode.wavShape(doc)
    val grid = MediaTransform.AudioDhashGrid
    val energy = Array.ofDim[Long](nch, grid)
    for (f <- 0 until nFrames; c <- 0 until nch) {
      val v = MediaDecode.sampleValueWavy(doc, c, f).toLong
      energy(c)((f * grid) / nFrames) += v * v
    }
    var hash = 0L
    for (c <- 0 until nch; i <- 0 until grid - 1)
      if (energy(c)(i + 1) > energy(c)(i)) hash |= 1L << (c * 16 + i)
    hash
  }

  test("audioDhash reproduces the closed form, incl. empty grid slots") {
    // WAVY fixture (stride 4409): the stride-7 ramp is monotone over
    // these short clips — every contour bit would be 0 and the test
    // vacuous. doc 16: mono, nFrames=32 (every slot hit); doc 1:
    // stereo, nFrames=17 — exactly one frame per slot; doc 4: mono,
    // nFrames=20; doc 34: mono, nFrames=16 < 17 slots — slot 16 stays
    // EMPTY (energy 0), the convention the oracle coalesces
    for (doc <- Seq(16L, 1L, 4L, 34L)) {
      val rows = MediaTransform.audioDhashOne(doc, MediaDecode.syntheticWavWavy(doc))
      assert(rows.size == 1 && rows.head.getString(1) == "wav")
      assert(rows.head.getLong(2) == expectedAudioDhash(doc), s"doc $doc")
      assert(rows.head.getLong(2) != 0L,
        s"doc $doc: a zero hash means the fixture is monotone and the gate vacuous")
    }
  }

  test("audioDhash totality and the distributed seam") {
    val png = MediaTransform.audioDhashOne(0L, MediaDecode.syntheticImage(0L, "png"))
    assert(png.head.getString(1) == "png" && png.head.isNullAt(2))
    assert(MediaTransform.audioDhashOne(1L, null).head.isNullAt(2))
    assert(MediaTransform.audioDhashOne(2L, "x".getBytes).head.getString(1) == "unknown")
    val out = MediaTransform.audioDhash(spark,
      MediaDecode.syntheticPayloads(spark, (0L until 30L).toDF("doc_id")))
    assert(out.count() == 30L)
    assert(out.filter(org.apache.spark.sql.functions.col("ahash").isNotNull).count() == 10L)
  }

  test("perceptual dedup composition: cross-codec duplicates pair at Hamming 0") {
    val ids = Seq(0L, 3L, 6L).toDF("doc_id")
    val pairs = NearDup.hammingPairs(
      MediaTransform.dhash(spark, MediaDecode.perceptualPayloads(spark, ids)),
      maxHamming = 8, hashCol = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every (doc, doc+1000) cross-codec pair must surface at distance 0
    for (doc <- Seq(0L, 3L, 6L))
      assert(pairs.contains((doc, doc + 1000L, 0L)),
        s"codec twin of $doc missing from ${pairs.mkString(",")}")
  }

  test("videoDhash: re-mux invariant (mp4 == webm of the same payload), content-diverse, total") {
    // re-mux invariance IS the operator's point: the two container
    // families carry the SAME closed-form media payload for a given
    // doc, so wrapping must not move a single bit
    for (doc <- Seq(2L, 7L, 15L)) {
      val mp4 = MediaTransform.videoDhashOne(doc, MediaProbe.syntheticMp4(doc))
      val webm = MediaTransform.videoDhashOne(doc, MediaProbe.syntheticWebm(doc))
      assert(mp4.head.get(1) == "mp4" && webm.head.get(1) == "webm")
      assert(mp4.head.get(2) != null, s"doc $doc hash must be non-null")
      assert(mp4.head.get(2) == webm.head.get(2),
        s"doc $doc: re-muxing must not change the container-payload hash")
    }
    // content diversity (the wavy-fixture non-vacuousness bar): distinct
    // payloads produce overwhelmingly distinct, non-zero hashes
    val hashes = (0L until 60L).map(d =>
      MediaTransform.videoDhashOne(d, MediaProbe.syntheticMp4(d)).head.getLong(2))
    assert(hashes.distinct.size >= 55 && !hashes.contains(0L),
      s"degenerate fixture: ${hashes.distinct.size} distinct")
    // a re-ENCODE (payload bytes change) must move the hash: zero the
    // first half of the media payload — the early buckets' energies
    // collapse in every lane, flipping contour bits (verified against
    // the closed form: all three docs' hashes move)
    val original = MediaProbe.syntheticMp4(2L)
    val edited = original.clone()
    val payloadOff = edited.length - MediaProbe.videoPayloadLen(2L).toInt
    for (k <- 0 until MediaProbe.videoPayloadLen(2L).toInt / 2)
      edited(payloadOff + k) = 0
    val origHash = MediaTransform.videoDhashOne(2L, original).head.getLong(2)
    val editHash = MediaTransform.videoDhashOne(2L, edited).head.getLong(2)
    assert(origHash != editHash,
      "a payload re-encode must re-fingerprint (metadata-only edits must not)")
    // totality: images/audio/garbage/null degrade to null-hash markers
    assert(MediaTransform.videoDhashOne(1L, null).head.get(2) == null)
    assert(MediaTransform.videoDhashOne(1L, Array[Byte](9, 9, 9)).head.get(2) == null)
    assert(MediaTransform.videoDhashOne(1L,
      MediaDecode.syntheticWav(4L)).head.get(2) == null)
    // a container with NO media payload (header-only init segment)
    val headerOnly = original.take(
      original.length - MediaProbe.videoPayloadLen(2L).toInt - 8)
    val ho = MediaTransform.videoDhashOne(1L, headerOnly).head
    assert(ho.get(1) == "mp4" && ho.get(2) == null)
    // ISO-BMFF size variants the walk must honor: a final mdat with the
    // legal size==0 (extends to EOF) and the size==1 64-bit largesize
    // header both hash identically to the plain-size container
    val header = original.take(payloadOff - 8)
    val payload = original.drop(payloadOff)
    val mdatEof = header ++ MediaProbe.be32(0L) ++
      "mdat".getBytes("US-ASCII") ++ payload
    val large = header ++ MediaProbe.be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      MediaProbe.be32(0L) ++ MediaProbe.be32(16L + payload.length) ++ payload
    assert(MediaTransform.videoDhashOne(2L, mdatEof).head.getLong(2) == origHash,
      "size==0 (to-EOF) mdat must hash like the sized box")
    assert(MediaTransform.videoDhashOne(2L, large).head.getLong(2) == origHash,
      "size==1 (largesize) mdat must hash like the sized box")
  }

  test("videoDhash composes with the Hamming machinery: re-muxed copies dedup at distance 0") {
    // corpus: mp4 shards; arrivals: the WEBM re-mux of each (identical
    // media payload, rewritten metadata) — the exact copy class exact
    // file hashing can never catch
    val corpusIds = Seq(2L, 4L, 6L, 8L).toDF("doc_id")
    val corpus = MediaTransform.videoDhash(spark,
      MediaProbe.videoPayloads(spark, corpusIds)) // even ids → mp4
    val arrivalRows = Seq(2L, 4L, 6L, 8L).map(d =>
      org.apache.spark.sql.Row(d + 1000L, MediaProbe.syntheticWebm(d)))
    val arrivals = MediaTransform.videoDhash(spark,
      spark.createDataFrame(spark.sparkContext.parallelize(arrivalRows),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType, nullable = true)))))
    val index = NearDup.hammingIndex(corpus, maxHamming = 4, hashCol = "vhash")
    val got = NearDup.hammingProbe(index, arrivals, maxHamming = 4,
      hashCol = "vhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (d <- Seq(2L, 4L, 6L, 8L))
      assert(got.contains((d + 1000L, d, 0L)),
        s"re-muxed twin of $d must probe at Hamming 0: $got")
  }
}
