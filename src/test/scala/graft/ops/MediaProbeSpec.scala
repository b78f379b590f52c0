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
  }
}
