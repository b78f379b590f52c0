package graft.ops

import graft.SparkSpec

/** The decoder is tested against the CLOSED FORM, not against itself:
  * payloads are encoded through the real JDK codecs from a modular
  * pixel/sample formula, and the decoded stats must equal the formula's
  * own aggregation — a broken encoder, decoder, channel order, or
  * endianness shows up as a mismatch. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def expectedImageStats(doc: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val (w, h) = MediaDecode.imageDims(doc)
    (0 until 3).map { c =>
      val vs = for (x <- 0 until w; y <- 0 until h)
        yield MediaDecode.pixelValue(doc, c, x, y).toLong
      (c.toLong, vs.size.toLong, vs.sum, vs.min, vs.max)
    }
  }

  test("PNG and BMP round-trip: decoded pixel stats equal the closed form") {
    for ((doc, fmt) <- Seq((0L, "png"), (3L, "png"), (17L, "bmp"), (2L, "bmp"))) {
      val rows = MediaDecode.decode(doc, MediaDecode.syntheticImage(doc, fmt))
      assert(rows.size == 3, s"doc $doc: 3 channel rows")
      assert(rows.head.getString(1) == fmt)
      val got = rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      assert(got == expectedImageStats(doc), s"doc $doc $fmt: $got")
    }
  }

  test("WAV round-trip through javax.sound: mono and stereo PCM16") {
    for (doc <- Seq(1L, 4L, 7L)) { // doc % 3 == 1 shapes
      val (nch, nFrames) = MediaDecode.wavShape(doc)
      val rows = MediaDecode.decode(doc, MediaDecode.syntheticWav(doc))
      assert(rows.size == nch && rows.forall(_.getString(1) == "wav"))
      for ((r, c) <- rows.zipWithIndex) {
        val vs = (0 until nFrames).map(i => MediaDecode.sampleValue(doc, c, i).toLong)
        assert(r.getLong(2) == c.toLong && r.getLong(3) == nFrames.toLong)
        assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((vs.sum, vs.min, vs.max)),
          s"doc $doc ch $c")
      }
    }
  }

  test("GIF decodes through the same path (flat-color image survives the palette)") {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 3) img.setRGB(x, y, 0x102030)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val rows = MediaDecode.decode(9L, out.toByteArray)
    assert(rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))) ==
      Seq((0L, 12L, 0x10L, 0x10L), (1L, 12L, 0x20L, 0x20L), (2L, 12L, 0x30L, 0x30L)))
  }

  test("JPEG runtime decode: dims exact, means near-lossless, deterministic, hash stable") {
    // JPEG pixel values are IDCT-implementation-dependent, so the spec
    // pins INVARIANTS (tighter than the gated query's): exact dims,
    // channel means within ±2 of the lossless twin (measured worst
    // case 1.37 across the 120-doc fixture), byte-identical stats on a
    // second decode, dHash within 8/64 bits of the twin's (measured 7)
    // and content-diverse across docs (non-degeneracy — the r10
    // fixture lesson).
    val hashes = scala.collection.mutable.Set[Long]()
    for (doc <- 0L until 120L) {
      val jp = MediaDecode.syntheticJpeg(doc)
      val tw = MediaDecode.syntheticJpegTwin(doc)
      val (w, h) = MediaDecode.jpegDims(doc)
      assert(MediaProbe.probe(jp) ==
        MediaProbe.Probed("jpeg", Some(w.toLong), Some(h.toLong),
          channels = Some(3L), bitDepth = Some(8L)),
        s"doc $doc: header probe must agree with the closed-form dims")
      val rows = MediaDecode.decode(doc, jp)
      assert(rows.size == 3 && rows.head.getString(1) == "jpeg" &&
        rows.forall(_.getLong(3) == w.toLong * h), s"doc $doc: 3 channels of w*h pixels")
      val twin = MediaDecode.decode(doc, tw)
      for ((r, t) <- rows.zip(twin)) {
        val meanJ = r.getLong(4).toDouble / r.getLong(3)
        val meanT = t.getLong(4).toDouble / t.getLong(3)
        assert(math.abs(meanJ - meanT) <= 2.0,
          s"doc $doc ch ${r.getLong(2)}: jpeg mean $meanJ vs lossless $meanT")
      }
      assert(MediaDecode.decode(doc, jp) == rows, s"doc $doc: decode must be deterministic")
      val hj = MediaTransform.dhashOne(doc, jp).head
      val ht = MediaTransform.dhashOne(doc, tw).head
      assert(!hj.isNullAt(2) && hj.getString(1) == "jpeg",
        s"doc $doc: jpeg payloads must hash, not no-op")
      val dist = java.lang.Long.bitCount(hj.getLong(2) ^ ht.getLong(2))
      assert(dist <= 8, s"doc $doc: jpeg dhash drifted $dist bits from its lossless twin")
      hashes += hj.getLong(2)
    }
    assert(hashes.size >= 100,
      s"fixture degeneracy: only ${hashes.size} distinct jpeg hashes across 120 docs")
  }

  test("lossy, garbage, bombs, and truncation degrade to n=0 rows, never throw") {
    // a bare JPEG header (no scan data) enters the runtime decode path
    // and degrades to an undecodable marker — never throws
    val jpegHeader = Array(0xff, 0xd8, 0xff, 0xc0, 0, 17, 8, 0, 2, 0, 2, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    val j = MediaDecode.decode(1L, jpegHeader)
    assert(j.size == 1 && j.head.getString(1) == "undecodable" && j.head.getLong(3) == 0L)
    assert(MediaDecode.decode(2L, null).head.getString(1) == "unknown")
    assert(MediaDecode.decode(3L, "garbage".getBytes).head.getString(1) == "unknown")
    // a PNG whose header declares a 2^32-pixel canvas is guarded BEFORE
    // any buffer allocation
    val bombSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13).map(_.toByte) ++ "IHDR".getBytes ++
      Array(0, 1, 0, 0, 0, 1, 0, 0, 8, 2, 0, 0, 0).map(_.toByte) // 65536x65536
    val b = MediaDecode.decode(4L, bombSig)
    assert(b.size == 1 && b.head.getString(1) == "oversize" && b.head.getLong(3) == 0L)
    // a well-formed header with the pixel stream cut mid-IDAT is
    // undecodable (or at worst partial), never fatal
    val full = MediaDecode.syntheticImage(5L, "png")
    val trunc = full.take(34) // signature + IHDR only, IDAT gone
    val t = MediaDecode.decode(5L, trunc)
    assert(t.nonEmpty && t.forall(_.getLong(0) == 5L), "total, keyed, no throw")
    assert(t.head.getLong(3) == 0L, s"headerless-body decode must skip: $t")
  }

  test("decodeStats runs the distributed seam end to end and means are exact") {
    val ids = (0L until 30L).toDF("doc_id")
    val payloads = MediaDecode.syntheticPayloads(spark, ids)
    val out = MediaDecode.decodeStats(spark, payloads).collect()
    // every doc emitted: images 3 channel rows, wav 1-2
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == (0L until 30L).toSet)
    for (doc <- 0L until 30L) {
      val rows = byDoc(doc)
      if (doc % 3 == 1) {
        val (nch, nFrames) = MediaDecode.wavShape(doc)
        assert(rows.length == nch && rows.forall(_.getString(1) == "wav"))
        val vs = (0 until nFrames).map(i => MediaDecode.sampleValue(doc, 0, i).toLong)
        val r0 = rows.find(_.getLong(2) == 0L).get
        val mean = BigDecimal(vs.sum.toDouble / nFrames)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r0.getDouble(4) == mean, s"doc $doc mean")
      } else {
        assert(rows.length == 3)
        assert(rows.head.getString(1) == (if (doc % 3 == 0) "png" else "bmp"))
      }
    }
  }

  test("decodeStats skips null ids instead of throwing (total posture)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(7L, MediaDecode.syntheticImage(7L, "png")),
      Row(null, MediaDecode.syntheticImage(8L, "png")),
      Row(9L, null))
    val df = spark.createDataFrame(rows, schema)
    val out = MediaDecode.decodeStats(spark, df).collect()
    // null id skipped; null payload degrades to an n=0 row; real doc decodes
    assert(out.map(_.getLong(0)).toSet == Set(7L, 9L))
    assert(out.filter(_.getLong(0) == 9L).forall(_.getLong(3) == 0L))
    assert(out.filter(_.getLong(0) == 7L).forall(_.getLong(3) > 0L))
  }
}
