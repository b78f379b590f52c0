package graft.ops

import graft.SparkSpec

/** Byte-accurate fixtures: each payload is a REAL minimal header of its
  * format (what an actual file of that type begins with), so the parser
  * is tested against the specs, not against itself. */
class MediaProbeSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def pngBytes(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13) ++ "IHDR".getBytes ++                    // IHDR length+type
      bytes(w >> 24, w >> 16, w >> 8, w, h >> 24, h >> 16, h >> 8, h,
        depth, colorType, 0, 0, 0)

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ bytes(w & 0xff, w >> 8, h & 0xff, h >> 8, 0xf7, 0, 0)

  private def bmpBytes(w: Int, h: Int, bpp: Int): Array[Byte] =
    "BM".getBytes ++ bytes(0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0,                                              // DIB size
      w & 0xff, (w >> 8) & 0xff, (w >> 16) & 0xff, (w >> 24) & 0xff,
      h & 0xff, (h >> 8) & 0xff, (h >> 16) & 0xff, (h >> 24) & 0xff,
      1, 0, bpp & 0xff, bpp >> 8)

  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    bytes(0xff, 0xd8,                       // SOI
      0xff, 0xe0, 0, 16) ++ "JFIF".getBytes ++ bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc0, 0, 17, 8,                 // SOF0, len, precision
      h >> 8, h & 0xff, w >> 8, w & 0xff, 3, // dims + 3 components
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)

  private def wavBytes(rate: Int, chans: Int, bits: Int,
                       dataLen: Int): Array[Byte] =
    "RIFF".getBytes ++ bytes(36 + dataLen, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ bytes(16, 0, 0, 0, 1, 0, chans, 0,
        rate & 0xff, (rate >> 8) & 0xff, (rate >> 16) & 0xff, rate >> 24,
        0, 0, 0, 0, 0, 0, bits, 0) ++
      "data".getBytes ++ bytes(dataLen & 0xff, (dataLen >> 8) & 0xff, 0, 0) ++
      Array.fill(dataLen)(0.toByte)

  test("probe parses real container headers for all five formats") {
    assert(MediaProbe.probe(pngBytes(1920, 1080, 8, 6)) ===
      MediaProbe.Probed("png", Some(1920L), Some(1080L),
        channels = Some(4L), bitDepth = Some(8L)))
    assert(MediaProbe.probe(gifBytes(320, 200)) ===
      MediaProbe.Probed("gif", Some(320L), Some(200L)))
    assert(MediaProbe.probe(bmpBytes(640, 480, 24)) ===
      MediaProbe.Probed("bmp", Some(640L), Some(480L), bitDepth = Some(24L)))
    assert(MediaProbe.probe(jpegBytes(4032, 3024)) ===
      MediaProbe.Probed("jpeg", Some(4032L), Some(3024L),
        channels = Some(3L), bitDepth = Some(8L)))
    // 100 16-bit stereo frames: 400 data bytes
    assert(MediaProbe.probe(wavBytes(44100, 2, 16, 400)) ===
      MediaProbe.Probed("wav", sampleRate = Some(44100L), channels = Some(2L),
        bitDepth = Some(16L), nSamples = Some(100L)))
  }

  test("top-down BMP and grayscale PNG variants") {
    // negative height = top-down row order; dimension is the magnitude
    val topDown = bmpBytes(100, -50 & 0xffffffff, 8)
    assert(MediaProbe.probe(topDown).height === Some(50L))
    assert(MediaProbe.probe(pngBytes(7, 9, 16, 0)) ===
      MediaProbe.Probed("png", Some(7L), Some(9L),
        channels = Some(1L), bitDepth = Some(16L)))
  }

  test("garbage, truncation, and nulls degrade to unknown, never throw") {
    assert(MediaProbe.probe(null).format === "unknown")
    assert(MediaProbe.probe(Array.empty[Byte]).format === "unknown")
    assert(MediaProbe.probe("not media at all".getBytes).format === "unknown")
    // right magic, truncated header
    assert(MediaProbe.probe(pngBytes(10, 10, 8, 2).take(14)).format === "unknown")
    assert(MediaProbe.probe(bytes(0xff, 0xd8, 0xff)).format === "unknown")
    // JPEG that ends (EOI) before any frame header
    assert(MediaProbe.probe(bytes(0xff, 0xd8, 0xff, 0xd9)).format === "unknown")
    // WAV with a lying chunk size that would overflow the walk
    val bad = "RIFF".getBytes ++ bytes(8, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ bytes(0xff, 0xff, 0xff, 0x7f)
    assert(MediaProbe.probe(bad).format === "unknown")
  }

  test("probeMeta runs the distributed seam end to end") {
    val rows = Seq(
      (1L, pngBytes(32, 16, 8, 2)),
      (2L, wavBytes(16000, 1, 16, 3200)),
      (3L, "garbage".getBytes),
      (4L, jpegBytes(100, 60)))
    val out = MediaProbe.probeMeta(spark, rows.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) === "png")
    assert(out(1L).getLong(3) === 32L && out(1L).getLong(4) === 16L)
    assert(out(2L).getString(2) === "wav")
    assert(out(2L).getLong(5) === 16000L) // sample_rate
    assert(out(2L).getLong(8) === 1600L)  // n_samples = 3200 / (1ch × 2B)
    assert(out(3L).getString(2) === "unknown")
    assert(out(3L).isNullAt(3), "unknown rows carry null dimensions")
    assert(out(4L).getString(2) === "jpeg")
    // byte_len is the raw payload length regardless of parse outcome
    assert(out(3L).getLong(1) === "garbage".getBytes.length.toLong)
    // stills/audio carry null video fields
    assert(out(1L).isNullAt(9) && out(1L).isNullAt(10))
  }

  test("MP4: box walk reads mvhd duration, tkhd 16.16 dims, stsd fourcc") {
    for (doc <- Seq(0L, 2L, 4L, 6L, 38L)) {
      val p = MediaProbe.probe(MediaProbe.syntheticMp4(doc))
      val (w, h) = MediaProbe.mp4Dims(doc)
      assert(p === MediaProbe.Probed("mp4", Some(w), Some(h),
        durationMs = Some(MediaProbe.mp4DurationMs(doc)),
        codec = Some(MediaProbe.mp4Codec(doc))), s"doc $doc: $p")
    }
    // ftyp alone (moov past the probed prefix) still detects as mp4
    val streaming = MediaProbe.probe(
      java.util.Arrays.copyOf(MediaProbe.syntheticMp4(0L), 16))
    assert(streaming.format === "mp4" && streaming.width.isEmpty)
    // truncated mid-moov: best-effort fields, never a throw
    val cut = MediaProbe.probe(
      java.util.Arrays.copyOf(MediaProbe.syntheticMp4(0L), 40))
    assert(cut.format === "mp4")
  }

  test("MP4: audio-first track order and non-video ftyp brands classify correctly") {
    import MediaProbe._
    // audio-first file: trak(mp4a, 0x0 tkhd dims) BEFORE trak(video) —
    // dims and codec must come from the VIDEO track, never the first
    def trak(fourcc: String, w: Long, h: Long): Array[Byte] = {
      val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
        be32(0) ++ be32(0) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
        new Array[Byte](36) ++ be32(w << 16) ++ be32(h << 16))
      val stsd = box("stsd", be32(0) ++ be32(1) ++
        box(fourcc, new Array[Byte](8)))
      box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(4000) ++ new Array[Byte](80))
    val audioFirst = ftyp ++ box("moov",
      mvhd ++ trak("mp4a", 0, 0) ++ trak("avc1", 1280, 720))
    assert(MediaProbe.probe(audioFirst) === Probed("mp4", Some(1280L), Some(720L),
      durationMs = Some(4000L), codec = Some("avc1")))
    // audio-only (no video trak): codec best-effort, no dims
    val audioOnly = ftyp ++ box("moov", mvhd ++ trak("mp4a", 0, 0))
    val ao = MediaProbe.probe(audioOnly)
    assert(ao.format === "mp4" && ao.width.isEmpty && ao.codec.contains("mp4a"))
    // ftyp brands that are NOT video containers must not read as mp4
    def withBrand(brand: String): Array[Byte] =
      box("ftyp", brand.getBytes("US-ASCII") ++ be32(0))
    assert(MediaProbe.probe(withBrand("heic")).format === "heic")
    assert(MediaProbe.probe(withBrand("avif")).format === "avif")
    assert(MediaProbe.probe(withBrand("M4A ")).format === "m4a")
    assert(MediaProbe.probe(withBrand("qt  ")).format === "mov")
    assert(MediaProbe.probe(withBrand("mp42")).format === "mp4")
  }

  test("WebM: an audio-first Matroska reports the VIDEO track's dims and codec") {
    import MediaProbe._
    def entry(codec: String, video: Option[(Long, Long)]): Array[Byte] =
      ebmlEl(IdTrackEntry,
        ebmlEl(IdCodecId, codec.getBytes("US-ASCII")) ++
          video.fold(Array.empty[Byte]) { case (w, h) =>
            ebmlEl(IdVideo, ebmlEl(IdPixelWidth, ebmlUintBytes(w)) ++
              ebmlEl(IdPixelHeight, ebmlUintBytes(h)))
          })
    val header = ebmlEl(EbmlMagic, ebmlEl(IdDocType, "webm".getBytes("US-ASCII")))
    val audioFirst = header ++ ebmlEl(IdSegment,
      ebmlEl(IdTracks, entry("A_OPUS", None) ++ entry("V_VP9", Some((1920L, 1080L)))))
    val p = MediaProbe.probe(audioFirst)
    assert(p.format === "webm" && p.width.contains(1920L) &&
      p.height.contains(1080L) && p.codec.contains("V_VP9"), s"$p")
    // audio-only: codec best-effort from the first entry, no dims
    val audioOnly = header ++ ebmlEl(IdSegment,
      ebmlEl(IdTracks, entry("A_OPUS", None)))
    val ao = MediaProbe.probe(audioOnly)
    assert(ao.format === "webm" && ao.width.isEmpty && ao.codec.contains("A_OPUS"))
  }

  test("WebM: EBML walk reads DocType, TimecodeScale x Duration, dims, CodecID") {
    for (doc <- Seq(1L, 3L, 5L, 7L, 41L)) {
      val p = MediaProbe.probe(MediaProbe.syntheticWebm(doc))
      val (w, h) = MediaProbe.webmDims(doc)
      assert(p === MediaProbe.Probed("webm", Some(w), Some(h),
        durationMs = Some(MediaProbe.webmDurationMs(doc)),
        codec = Some(MediaProbe.webmCodec(doc))), s"doc $doc: $p")
    }
    // a bare EBML magic with an unreadable DocType is unknown, not a throw
    val junk = Array(0x1a, 0x45, 0xdf, 0xa3, 0x84, 1, 2, 3, 4).map(_.toByte)
    assert(MediaProbe.probe(junk).format === "unknown")
    // truncated mid-Segment: format survives, fields degrade
    val cut = MediaProbe.probe(
      java.util.Arrays.copyOf(MediaProbe.syntheticWebm(1L), 14))
    assert(cut.format === "webm")
  }
}
