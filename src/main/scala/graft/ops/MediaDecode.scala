package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pixel/sample decode — the step [[Multimodal]] kept behind a stub
  * seam is now an actual codec round-trip: images decode through
  * `javax.imageio` (PNG/BMP/GIF — the JDK's real decoders), audio
  * decodes through `javax.sound.sampled` (RIFF/WAVE PCM), and the
  * operator emits per-channel value statistics (count / mean / min /
  * max) — the "is this image black / clipped / silent audio" signals a
  * multimodal curation pipeline filters on right after the
  * [[MediaProbe]] metadata pass.
  *
  * Decode envelope (stated, not implied):
  *   - LOSSLESS stills (png, bmp, gif): their decoded pixels are
  *     bit-exact by spec, so stats are engine-independent and
  *     value-exact oracle-gateable.
  *   - JPEG decodes AT RUNTIME through the same `javax.imageio` path
  *     (real crawl corpora are majority JPEG — a skip here would no-op
  *     resize/dhash/perceptual-dedup on the dominant web format), but
  *     its pixel values are IDCT-implementation-dependent, so JPEG
  *     stays OUT of the value-exact cross-engine oracles: the gated
  *     query checks INVARIANTS (dims vs the closed-form fixture,
  *     channel means within a stated tolerance, decode-twice
  *     determinism, non-null perceptual hashes) and
  *     `MediaDecodeSpec` pins the same invariants with tighter bounds.
  *   - PCM WAV (8/16-bit integer): raw sample values per channel.
  *   - A decompression-bomb guard ([[MaxPixels]]) bounds the pixel
  *     buffer any one payload may allocate: a tiny PNG declaring a
  *     2^32-pixel canvas is skipped as `oversize`, not inflated — at
  *     corpus scale the guard is what keeps one hostile row from
  *     OOM-killing an executor.
  *   - Anything undecodable degrades to a single `n = 0` row; the
  *     operator is TOTAL and never throws (the [[MediaProbe]] posture).
  *
  * Scale shape: the same `mapPartitions` seam as [[MediaProbe.probeMeta]]
  * — per-partition batch decode, zero driver involvement, stats folded
  * while streaming pixels/samples so the emitted row is O(channels) per
  * payload regardless of resolution. No shuffle anywhere: per-document
  * stats never cross partitions. */
object MediaDecode {

  /** Pixel-count cap per payload (16 MPix ≈ 64 MB ARGB buffer). */
  val MaxPixels: Long = 1L << 24

  /** Raw per-channel accumulator schema (sum kept exact in Long;
    * 16 MPix × 255 and 16 MPix × 32768 both fit comfortably). */
  private val RawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channel", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("v_sum", LongType, nullable = true),
    StructField("v_min", LongType, nullable = true),
    StructField("v_max", LongType, nullable = true)))

  private def skipped(docId: Long, format: String): Seq[Row] =
    Seq(Row(docId, format, 0L, 0L, null, null, null))

  /** Shared guarded still-image open — the decode envelope in ONE place,
    * used by [[imageStats]] and [[MediaTransform.resizeOne]]: the bomb
    * guard runs on the HEADER-declared dimensions (already parsed by
    * [[MediaProbe]]) BEFORE `ImageIO.read` allocates anything —
    * guarding after the read would be guarding after the OOM — then
    * re-guards on the actual decoded dims. Left is the skip-marker
    * format string. */
  private[ops] def openImage(bytes: Array[Byte],
                             declared: MediaProbe.Probed): Either[String, java.awt.image.BufferedImage] = {
    val bomb = (for (w <- declared.width; h <- declared.height)
      yield w * h > MaxPixels).getOrElse(false)
    if (bomb) Left("oversize")
    else {
      javax.imageio.ImageIO.setUseCache(false) // no executor temp files
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) Left("undecodable")
      else if (img.getWidth.toLong * img.getHeight > MaxPixels) Left("oversize")
      else Right(img)
    }
  }

  /** Decoded integer-PCM buffer with the per-sample extraction rule in
    * ONE place (8-bit unsigned, 16-bit signed, either endianness) —
    * shared by [[wavStats]] and [[MediaTransform.frameOne]] so an
    * envelope or extraction fix can never diverge between them. */
  private[ops] final case class Pcm(data: Array[Byte], nch: Int, bits: Int,
                                    frameSize: Int, bigEndian: Boolean) {
    def nFrames: Int = data.length / frameSize
    def sample(f: Int, c: Int): Long = {
      val i = f * frameSize + c * (bits / 8)
      if (bits == 8) (data(i) & 0xff).toLong
      else if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toLong
      else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toLong
    }
  }

  /** Shared guarded WAV open (envelope: integer PCM, 8/16-bit, ≥1
    * channel, known frame length under the cap, ≥1 frame). */
  private[ops] def openWav(bytes: Array[Byte]): Either[String, Pcm] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val nch = fmt.getChannels
      val enc = fmt.getEncoding.toString
      val pcm = enc == "PCM_SIGNED" || enc == "PCM_UNSIGNED"
      // getFrameLength reports NOT_SPECIFIED (-1) for some streams — a
      // negative length would sail past the > MaxPixels bomb cap, so it
      // is out-of-envelope too (the cap must actually bind)
      val frameLen = ais.getFrameLength
      if (!pcm || (bits != 8 && bits != 16) || nch < 1 ||
          frameLen < 0 || frameLen > MaxPixels) Left("wav")
      else {
        val p = Pcm(ais.readAllBytes(), nch, bits, fmt.getFrameSize, fmt.isBigEndian)
        if (p.nFrames == 0) Left("wav") else Right(p)
      }
    } finally ais.close()
  }

  /** Decode one still through javax.imageio ([[openImage]] envelope)
    * and fold per-channel (R=0, G=1, B=2) stats over `getRGB` values —
    * color-model-correct regardless of the reader's internal raster
    * layout. */
  private def imageStats(docId: Long, format: String, bytes: Array[Byte],
                         declared: MediaProbe.Probed): Seq[Row] = {
    val img = openImage(bytes, declared) match {
      case Left(reason) => return skipped(docId, reason)
      case Right(i) => i
    }
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Long](3)
    val mn = Array.fill(3)(Long.MaxValue)
    val mx = Array.fill(3)(Long.MinValue)
    var y = 0
    // row-at-a-time getRGB: one int per pixel, bounded row buffer
    val rowBuf = new Array[Int](w)
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        var c = 0
        while (c < 3) {
          val v = ((rgb >> (16 - 8 * c)) & 0xff).toLong
          sum(c) += v
          if (v < mn(c)) mn(c) = v
          if (v > mx(c)) mx(c) = v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (0 until 3).map(c => Row(docId, format, c.toLong, n, sum(c), mn(c), mx(c)))
  }

  /** Decode integer-PCM WAV ([[openWav]] envelope) and fold raw
    * per-channel sample stats (16-bit: signed; 8-bit: unsigned — the
    * container conventions, reported as-is). */
  private def wavStats(docId: Long, bytes: Array[Byte]): Seq[Row] = {
    val p = openWav(bytes) match {
      case Left(reason) => return skipped(docId, reason)
      case Right(pcm) => pcm
    }
    val nFrames = p.nFrames
    val sum = new Array[Long](p.nch)
    val mn = Array.fill(p.nch)(Long.MaxValue)
    val mx = Array.fill(p.nch)(Long.MinValue)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < p.nch) {
        val v = p.sample(f, c)
        sum(c) += v
        if (v < mn(c)) mn(c) = v
        if (v > mx(c)) mx(c) = v
        c += 1
      }
      f += 1
    }
    (0 until p.nch).map(c =>
      Row(docId, "wav", c.toLong, nFrames.toLong, sum(c), mn(c), mx(c)))
  }

  /** The payload-operator seam shared by every media operator
    * ([[decodeStats]], [[MediaTransform.resizePixels]] /
    * [[MediaTransform.frameStats]] / [[MediaTransform.dhash]] /
    * [[MediaTransform.audioDhash]]): cast `(idCol, payloadCol)`, skip
    * null ids (no document to attribute output to — the total-posture
    * rule), pass null payloads through to `one` (which degrades them to
    * marker rows), and run per partition with zero driver involvement
    * and zero shuffle. ONE implementation so a fix to the null seam can
    * never diverge between operators. */
  private[ops] def perPayload(spark: SparkSession, df: DataFrame,
                              idCol: String, payloadCol: String,
                              schema: StructType)
                             (one: (Long, Array[Byte]) => Seq[Row]): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
    val rdd = src.rdd.mapPartitions(_.filter(r => !r.isNullAt(0)).flatMap(r =>
      one(r.getLong(0),
        if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))))
    spark.createDataFrame(rdd, schema)
  }

  /** Decode one payload to per-channel stat rows. Total: garbage, nulls,
    * truncation, bombs, and lossy formats all degrade to `n = 0` rows. */
  def decode(docId: Long, bytes: Array[Byte]): Seq[Row] =
    try {
      if (bytes == null || bytes.isEmpty) skipped(docId, "unknown")
      else {
        val p = MediaProbe.probe(bytes)
        p.format match {
          // jpeg decodes at RUNTIME (see the envelope note above); it
          // is merely excluded from value-exact cross-engine oracles
          case f @ ("png" | "bmp" | "gif" | "jpeg") => imageStats(docId, f, bytes, p)
          case "wav"  => wavStats(docId, bytes)
          // formats the probe positively identifies (mp4/webm/heic/…)
          // keep their name in the marker row — a curation pass
          // accounting skip reasons by format must see the same labels
          // decode-stats-side as the transforms report
          case other  => skipped(docId, other)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => skipped(docId, "undecodable") }

  /** Distributed per-channel decode stats over `(idCol, payloadCol)`:
    * doc_id, format, channel, n, v_mean (round 6), v_min, v_max. One
    * pass, no shuffle — stats fold inside the decode partition. */
  def decodeStats(spark: SparkSession, df: DataFrame,
                  idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    perPayload(spark, df, idCol, payloadCol, RawSchema)(decode)
      .select(col("doc_id"), col("format"), col("channel"), col("n"),
        // exact Long sum, one correctly-rounded divide, round 6 — the
        // corrByGroup determinism convention
        when(col("n") > 0,
          round(col("v_sum").cast(DoubleType) / col("n").cast(DoubleType), 6))
          .as("v_mean"),
        col("v_min"), col("v_max"))
  }

  // ---- deterministic synthetic payloads --------------------------------
  // The testdata carries no real media bytes, so the gated query
  // SYNTHESIZES them: pixels/samples follow a closed-form modular
  // formula of (doc_id, channel, x, y), ENCODED through the real JDK
  // codecs here and independently recomputed from the formula by the
  // DuckDB oracle. A bug in either the encoder plumbing or the decoder
  // shows up as a stats mismatch — the fixtures test the codec path
  // against the spec, not against itself.

  /** Closed-form pixel value — mirrored verbatim in the oracle SQL. */
  def pixelValue(doc: Long, c: Int, x: Int, y: Int): Int =
    ((doc * 31 + x * 7 + y * 13 + c * 29) % 256).toInt

  /** Image dims: w in 4..8, h in 3..6. */
  def imageDims(doc: Long): (Int, Int) =
    ((4 + doc % 5).toInt, (3 + doc % 4).toInt)

  /** Closed-form pixel with WRAPPING strides — the perceptual-hash
    * fixture formula ([[pixelValue]]'s stride-7 ramp is monotone in x
    * over a ≤ 8-pixel row, so every dHash difference bit reduces to
    * "did the grid column advance" — a dims-only hash, identical for
    * every doc of the same width, making the gate nearly vacuous;
    * strides 97/131 wrap the byte ring inside the image, so bits
    * depend on the actual content). Mirrored in the oracle SQL. */
  def pixelValueWavy(doc: Long, c: Int, x: Int, y: Int): Int =
    ((doc * 31 + x * 97 + y * 131 + c * 29) % 256).toInt

  /** Encode a synthetic still via the real JDK encoder (`fmt` =
    * "png" | "bmp"). */
  def syntheticImage(doc: Long, fmt: String): Array[Byte] =
    assembleImage(doc, fmt, pixelValue)

  /** [[syntheticImage]] with the wavy pixel formula. */
  def syntheticImageWavy(doc: Long, fmt: String): Array[Byte] =
    assembleImage(doc, fmt, pixelValueWavy)

  /** One image assembler for all pixel formulas. */
  private def assembleImage(doc: Long, fmt: String,
                            pixel: (Long, Int, Int, Int) => Int,
                            dims: Long => (Int, Int) = imageDims): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val (w, h) = dims(doc)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pixel(doc, 0, x, y) << 16) |
          (pixel(doc, 1, x, y) << 8) | pixel(doc, 2, x, y))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  // ---- JPEG fixture (invariant-gated, never value-exact) ---------------

  /** JPEG fixture dims: multiples of 8 (whole MCU blocks — no
    * partial-block edge behavior in the codec), w ∈ {24..56}, h ∈
    * {16..32}. Mirrored in the oracle SQL (the DIMS are the one
    * value-exact fact about a JPEG the oracle can check: n = w·h). */
  def jpegDims(doc: Long): (Int, Int) =
    ((24 + (doc % 5) * 8).toInt, (16 + (doc % 3) * 8).toInt)

  /** Closed-form pixel for the JPEG fixture: gentle strides (11/17)
    * over the [[jpegDims]] canvas wrap the byte ring a few times —
    * content-determined (non-degenerate dHash) yet smooth enough that
    * DCT quantisation moves channel MEANS by only a few counts. Not
    * mirrored in any oracle (JPEG pixel values are
    * IDCT-implementation-dependent); the spec and the gated query
    * check tolerance invariants against it instead. */
  def pixelValueJpeg(doc: Long, c: Int, x: Int, y: Int): Int =
    ((doc * 31 + x * 11 + y * 17 + c * 29) % 256).toInt

  /** Encode one synthetic JPEG via the real JDK encoder (default
    * quality). Deterministic within a JVM — the decode-twice and
    * hash-stability invariants the gate checks never compare bytes
    * across JVMs. */
  def syntheticJpeg(doc: Long): Array[Byte] =
    assembleImage(doc, "jpg", pixelValueJpeg, jpegDims)

  /** Matching LOSSLESS twin of [[syntheticJpeg]] (same pixels, PNG) —
    * what the tolerance invariants compare the lossy decode against. */
  def syntheticJpegTwin(doc: Long): Array[Byte] =
    assembleImage(doc, "png", pixelValueJpeg, jpegDims)

  /** Distributed JPEG-fixture payloads: `(doc_id, payload)` built per
    * partition through the real encoder — `payload` defaults to the
    * lossy [[syntheticJpeg]]; pass [[syntheticJpegTwin]] for the
    * lossless same-pixels comparison frame. */
  def jpegPayloads(spark: SparkSession, ids: DataFrame,
                   idCol: String = "doc_id",
                   payload: Long => Array[Byte] = syntheticJpeg): DataFrame = {
    val src = ids.select(col(idCol).cast(LongType))
    val rdd = src.rdd.mapPartitions(_.map(r =>
      Row(r.getLong(0), payload(r.getLong(0)))))
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Closed-form PCM16 sample value — mirrored in the oracle SQL. */
  def sampleValue(doc: Long, ch: Int, i: Int): Int =
    ((doc * 31 + ch * 29 + i * 7) % 65536).toInt - 32768

  /** WAV shape: 1–2 channels, 16–32 frames. */
  def wavShape(doc: Long): (Int, Int) =
    ((1 + doc % 2).toInt, (16 + doc % 17).toInt)

  /** Closed-form PCM16 sample with a WRAPPING frame stride — the
    * audio-hash fixture formula ([[sampleValue]]'s stride-7 ramp is
    * monotone over a ≤ 33-frame clip, so per-slot energies strictly
    * decrease and every contour bit degenerates to 0 — a vacuous gate;
    * stride 4409 wraps the 16-bit ring inside the clip, so slot
    * energies genuinely rise and fall). Mirrored in the oracle SQL. */
  def sampleValueWavy(doc: Long, ch: Int, i: Int): Int =
    ((doc * 31 + ch * 29 + i * 4409) % 65536).toInt - 32768

  /** [[syntheticWav]] with the wavy sample formula. */
  def syntheticWavWavy(doc: Long): Array[Byte] =
    assembleWav(doc, sampleValueWavy)

  /** Hand-assembled RIFF/WAVE PCM16LE container (the format is fully
    * specified byte arithmetic) — decoded back through javax.sound. */
  def syntheticWav(doc: Long): Array[Byte] =
    assembleWav(doc, sampleValue)

  /** One container assembler for both sample formulas. */
  private def assembleWav(doc: Long, sample: (Long, Int, Int) => Int): Array[Byte] = {
    val (nch, nFrames) = wavShape(doc)
    val rate = 8000
    val dataLen = nFrames * nch * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(nch.toShort)
    bb.putInt(rate).putInt(rate * nch * 2).putShort((nch * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < nch) { bb.putShort(sample(doc, c, f).toShort); c += 1 }
      f += 1
    }
    bb.array()
  }

  /** Synthetic still with ONE perturbed pixel — the near-duplicate twin
    * for the perceptual-dedup gate: every channel of pixel (0, 0)
    * shifts by `delta` (mod 256), every other pixel follows
    * [[pixelValueWavy]]. Mirrored verbatim in the oracle SQL. */
  def syntheticImageShift(doc: Long, fmt: String, delta: Int): Array[Byte] =
    assembleImage(doc, fmt, (d, c, x, y) =>
      (pixelValueWavy(d, c, x, y) + (if (x == 0 && y == 0) delta else 0)) % 256)

  /** Perceptual-dedup fixture: for each input id, THREE payload
    * variants — `(doc, png)`, `(doc + 1000, bmp of the SAME pixels)` —
    * the cross-codec duplicate whose dHash must match at Hamming 0 —
    * and `(doc + 2000, png with pixel (0, 0) shifted +8)` — the
    * near-duplicate whose distance the oracle recomputes exactly. */
  def perceptualPayloads(spark: SparkSession, ids: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val src = ids.select(col(idCol).cast(LongType))
    val rdd = src.rdd.flatMap { r =>
      val doc = r.getLong(0)
      Seq(Row(doc, syntheticImageWavy(doc, "png")),
        Row(doc + 1000, syntheticImageWavy(doc, "bmp")),
        Row(doc + 2000, syntheticImageShift(doc, "png", 8)))
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Distributed fixture generator: `(doc_id, payload)` with
    * doc_id % 3 → 0: png, 1: wav, 2: bmp — built per partition through
    * the real encoders, nothing driver-side. */
  def syntheticPayloads(spark: SparkSession, ids: DataFrame,
                        idCol: String = "doc_id",
                        wav: Long => Array[Byte] = syntheticWav,
                        img: (Long, String) => Array[Byte] = syntheticImage): DataFrame = {
    val src = ids.select(col(idCol).cast(LongType))
    val rdd = src.rdd.mapPartitions(_.map { r =>
      val doc = r.getLong(0)
      val payload = (doc % 3) match {
        case 0 => img(doc, "png")
        case 1 => wav(doc)
        case _ => img(doc, "bmp")
      }
      Row(doc, payload)
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }
}
