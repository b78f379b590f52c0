package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal TRANSFORMS — the two standard payload-shaping steps a
  * training-data pipeline runs right after [[MediaDecode]]'s filter
  * pass: image RESIZE (thumbnail / model-input normalization) and audio
  * FRAME-SAMPLING (fixed-window feature extraction). Both stay inside
  * the decode envelope [[MediaDecode]] states (lossless stills, integer
  * PCM WAV, bomb guard on header-declared dims, TOTAL degradation — a
  * bad payload yields a marker row, never a throw).
  *
  * Determinism contracts (what makes these oracle-gateable):
  *   - Resize is NEAREST-NEIGHBOR with the floor mapping
  *     `src = (dst * srcDim) / outDim` in exact integer arithmetic — no
  *     interpolation, no float rounding, so every output pixel is a
  *     verbatim source pixel the oracle can name. (Bilinear/Lanczos
  *     would be kernel-implementation-dependent — the JPEG-IDCT problem
  *     again — so the engine pins the one resampling mode that is
  *     engine-independent by construction.)
  *   - Frame windows fold EXACT Long sums and sums-of-squares (the
  *     per-window energy signal); 16-bit samples bound `v² ≤ 2^30` and
  *     the [[MediaDecode.MaxPixels]] cap bounds frames per payload at
  *     2^24, so `Σv² ≤ 2^54` — no overflow, no doubles in the fold.
  *
  * Scale shape: the same `mapPartitions` seam as [[MediaDecode]] — per
  * partition batch decode+transform, zero driver involvement, zero
  * shuffle (per-document output never crosses partitions). Output is
  * O(outW·outH·channels) per image and O(frames/window · channels) per
  * clip regardless of source resolution, so the transform SHRINKS the
  * data in flight — the property that matters when the input is 100 TB
  * of media bytes. */
object MediaTransform {

  // ---- image resize -----------------------------------------------------

  /** Shared still-image preamble — probe, [[MediaDecode.openImage]]
    * envelope, and the total-posture degradation in ONE place for
    * [[resizeOne]] and [[dhashOne]] (the [[withWav]] twin). */
  private def withImage(bytes: Array[Byte])(skip: String => Seq[Row])
                       (run: (String, java.awt.image.BufferedImage) => Seq[Row]): Seq[Row] =
    try {
      if (bytes == null || bytes.isEmpty) skip("unknown")
      else {
        val p = MediaProbe.probe(bytes)
        p.format match {
          // jpeg included: transforms decode it at runtime (the
          // [[MediaDecode]] envelope note — value-exact oracles exclude
          // it; resize/dhash over real crawl corpora must not no-op on
          // the dominant web format)
          case f @ ("png" | "bmp" | "gif" | "jpeg") =>
            MediaDecode.openImage(bytes, p) match {
              case Left(reason) => skip(reason)
              case Right(img) => run(f, img)
            }
          case other  => skip(other)
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => skip("undecodable")
    }


  private val ResizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channel", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("v", LongType, nullable = true)))

  private def resizeSkipped(docId: Long, format: String): Seq[Row] =
    Seq(Row(docId, format, 0L, 0L, 0L, null))

  /** Resize one still to `outW × outH` by nearest-neighbor (floor
    * mapping) and emit one row per output pixel per channel. Non-image,
    * lossy, oversize, and undecodable payloads degrade to a single
    * null-`v` marker row (the [[MediaDecode.decode]] posture). */
  def resizeOne(docId: Long, bytes: Array[Byte], outW: Int, outH: Int): Seq[Row] = {
    // a nonsense target is a CALLER bug — it must fail loudly, not
    // degrade into marker rows like bad DATA does (hence outside the
    // total-posture preamble)
    require(outW > 0 && outH > 0, "resize target must be positive")
    withImage(bytes)(resizeSkipped(docId, _)) { (f, img) =>
      val (w, h) = (img.getWidth, img.getHeight)
      val out = Seq.newBuilder[Row]
      var y = 0
      while (y < outH) {
        val sy = ((y.toLong * h) / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = ((x.toLong * w) / outW).toInt
          val rgb = img.getRGB(sx, sy)
          var c = 0
          while (c < 3) {
            out += Row(docId, f, c.toLong, x.toLong, y.toLong,
              ((rgb >> (16 - 8 * c)) & 0xff).toLong)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out.result()
    }
  }

  /** Distributed nearest-neighbor resize over `(idCol, payloadCol)`:
    * one row per (doc, channel, x, y) output pixel. One pass, no
    * shuffle — the transform folds inside the decode partition. */
  def resizePixels(spark: SparkSession, df: DataFrame, outW: Int, outH: Int,
                   idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame =
    MediaDecode.perPayload(spark, df, idCol, payloadCol, ResizeSchema)(
      resizeOne(_, _, outW, outH))

  // ---- perceptual image hashing (dHash) -----------------------------------

  /** dHash grid: 9×8 lumas → 8 horizontal differences × 8 rows = 64
    * bits. The standard difference-hash dimensions. */
  val DhashW = 9
  val DhashH = 8

  private val DhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("dhash", LongType, nullable = true)))

  /** Difference hash of one still — the perceptual fingerprint that
    * makes IMAGE near-dup detection a 64-bit Hamming problem: resize to
    * the 9×8 grid with the same exact integer floor mapping as
    * [[resizeOne]], grayscale with the integer ITU-R 601 luma
    * (`(299R + 587G + 114B) div 1000` — floor division, no float), set
    * bit `y·8 + x` iff the right neighbour is strictly brighter.
    * Re-encoded, resized, or lightly re-compressed copies of an image
    * keep a small Hamming distance while exact hashes diverge — feed
    * the hashes to the [[NearDup]] simhash banding machinery (also
    * 64-bit Hamming) for corpus-scale perceptual dedup.
    *
    * Deterministic end to end (nearest-neighbor + integer luma +
    * strict-inequality bits — no kernel, no float), so the closed-form
    * fixture oracle can recompute every bit. Non-image / lossy /
    * oversize / undecodable payloads degrade to a null-`dhash` marker
    * row (the [[MediaDecode.decode]] posture). */
  def dhashOne(docId: Long, bytes: Array[Byte]): Seq[Row] =
    withImage(bytes)(reason => Seq(Row(docId, reason, null))) { (f, img) =>
      val (w, h) = (img.getWidth, img.getHeight)
      val luma = Array.ofDim[Int](DhashH, DhashW)
      var y = 0
      while (y < DhashH) {
        val sy = ((y.toLong * h) / DhashH).toInt
        var x = 0
        while (x < DhashW) {
          val sx = ((x.toLong * w) / DhashW).toInt
          val rgb = img.getRGB(sx, sy)
          luma(y)(x) = (299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
      var hash = 0L
      y = 0
      while (y < DhashH) {
        var x = 0
        while (x < DhashW - 1) {
          if (luma(y)(x + 1) > luma(y)(x)) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Seq(Row(docId, f, hash))
    }

  /** Distributed dHash over `(idCol, payloadCol)`: one row per document
    * with its 64-bit perceptual hash (null for out-of-envelope
    * payloads). One pass, no shuffle. */
  def dhash(spark: SparkSession, df: DataFrame,
            idCol: String = "doc_id",
            payloadCol: String = "payload"): DataFrame =
    MediaDecode.perPayload(spark, df, idCol, payloadCol, DhashSchema)(dhashOne)

  // ---- perceptual audio hashing (energy contour) ---------------------------

  /** Shared WAV-consumer preamble — probe, [[MediaDecode.openWav]]
    * envelope, and the total-posture degradation in ONE place for
    * [[frameOne]] and [[audioDhashOne]] (the perPayload argument:
    * envelope fixes must not be able to diverge between consumers). */
  private def withWav(bytes: Array[Byte])(skip: String => Seq[Row])
                     (run: MediaDecode.Pcm => Seq[Row]): Seq[Row] =
    try {
      val probedFormat =
        if (bytes == null || bytes.isEmpty) "unknown"
        else MediaProbe.probe(bytes).format
      if (probedFormat != "wav") skip(probedFormat)
      else MediaDecode.openWav(bytes) match {
        case Left(reason) => skip(reason)
        case Right(pcm) => run(pcm)
      }
    } catch {
      case scala.util.control.NonFatal(_) => skip("undecodable")
    }


  /** Audio hash grid: 17 equal time buckets → 16 energy-difference bits
    * per channel; up to 4 channels folded → ≤ 64 bits. The require runs
    * at object load — OUTSIDE any per-row total-posture catch, so a
    * grid change that overflows the 64-bit budget fails the first use
    * loudly instead of degrading every WAV to a marker row. */
  val AudioDhashGrid = 17
  val AudioDhashMaxCh = 4
  private val AudioStride = AudioDhashGrid - 1
  require(AudioDhashMaxCh * AudioStride <= 64, "audio hash exceeds 64 bits")

  private val AudioDhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("ahash", LongType, nullable = true)))

  /** Energy-contour hash of one PCM clip — [[dhashOne]]'s audio twin:
    * frames bucketed onto a fixed [[AudioDhashGrid]]-slot time grid with
    * the same exact integer floor mapping (`(f·grid) div nFrames`),
    * per-(channel, bucket) energy Σv² folded exactly in Long, bit
    * `c·16 + i` set iff bucket `i+1` is strictly louder than bucket `i`.
    * The contour survives re-encoding and gain that preserves
    * loudness ORDER between slots — while exact hashes diverge on any
    * byte change (a TRIM does not preserve it: the fixed grid
    * re-buckets every frame when nFrames changes); feed the hashes to the simhash Hamming
    * banding for corpus-scale near-dup audio. Buckets no frame maps to
    * (short clips) have energy 0 — deterministic, mirrored by the
    * oracle. Channels beyond [[AudioDhashMaxCh]] are ignored (64-bit
    * budget). Non-WAV payloads degrade to a null-`ahash` marker row. */
  def audioDhashOne(docId: Long, bytes: Array[Byte]): Seq[Row] =
    withWav(bytes)(reason => Seq(Row(docId, reason, null))) { p =>
      val nFrames = p.nFrames
      val nch = math.min(p.nch, AudioDhashMaxCh)
      val energy = Array.ofDim[Long](nch, AudioDhashGrid)
      var f = 0
      while (f < nFrames) {
        val b = ((f.toLong * AudioDhashGrid) / nFrames).toInt
        var c = 0
        while (c < nch) {
          val v = p.sample(f, c)
          energy(c)(b) += v * v
          c += 1
        }
        f += 1
      }
      // channel stride = bits per channel = grid - 1 (AudioStride; the
      // 64-bit-budget require runs at object load, outside withWav's
      // total-posture catch)
      val stride = AudioStride
      var hash = 0L
      var c = 0
      while (c < nch) {
        var i = 0
        while (i < stride) {
          if (energy(c)(i + 1) > energy(c)(i)) hash |= 1L << (c * stride + i)
          i += 1
        }
        c += 1
      }
      Seq(Row(docId, "wav", hash))
    }

  /** Distributed audio energy-contour hash over `(idCol, payloadCol)`.
    * One pass, no shuffle. */
  def audioDhash(spark: SparkSession, df: DataFrame,
                 idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    MediaDecode.perPayload(spark, df, idCol, payloadCol, AudioDhashSchema)(
      audioDhashOne)

  // ---- perceptual video hashing (container-payload contour) ---------------

  /** Video hash grid: [[VideoDhashLanes]] byte-position lanes ×
    * ([[VideoDhashGrid]]−1) energy-difference bits = 64 bits exactly.
    * Load-time require, outside any per-row catch (the audio-grid
    * convention). */
  val VideoDhashGrid = 17
  val VideoDhashLanes = 4
  private val VideoStride = VideoDhashGrid - 1
  require(VideoDhashLanes * VideoStride <= 64, "video hash exceeds 64 bits")

  private val VideoDhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("vhash", LongType, nullable = true)))

  /** Container-level perceptual video hash — [[audioDhashOne]]'s video
    * twin, closing the perceptual-dedup family (images [[dhashOne]],
    * audio [[audioDhashOne]], video here): the container's MEDIA
    * payload bytes ([[MediaProbe.mediaPayload]]: `mdat` boxes / Segment
    * Clusters — never the metadata atoms) are bucketed onto a fixed
    * [[VideoDhashGrid]]-slot grid with the same exact integer floor
    * mapping, per-(lane, bucket) byte-energy Σv² folded in Long with
    * byte position mod [[VideoDhashLanes]] as the lane, and bit
    * `c·16 + i` set iff bucket `i+1` is strictly louder than bucket `i`
    * in lane `c`. No codec is decoded: the contour survives re-muxing
    * and re-description (metadata rewrites leave the payload bytes, and
    * so the hash, untouched — while exact file hashes diverge); a
    * re-ENCODE changes the payload and legitimately produces a new
    * fingerprint. Feed the hashes to [[NearDup.hammingIndex]] /
    * [[NearDup.hammingPairs]] for corpus-scale near-dup video exactly
    * like the image/audio hashes. Non-container payloads and containers
    * with no media payload degrade to a null-`vhash` marker row. */
  def videoDhashOne(docId: Long, bytes: Array[Byte]): Seq[Row] =
    try MediaProbe.mediaPayload(bytes) match {
      case None =>
        val fmt =
          if (bytes == null || bytes.isEmpty) "unknown"
          else MediaProbe.probe(bytes).format
        Seq(Row(docId, fmt, null))
      case Some((fmt, payload)) if payload.isEmpty =>
        Seq(Row(docId, fmt, null))
      case Some((fmt, payload)) =>
        val n = payload.length
        val energy = Array.ofDim[Long](VideoDhashLanes, VideoDhashGrid)
        var i = 0
        while (i < n) {
          val b = ((i.toLong * VideoDhashGrid) / n).toInt
          val v = (payload(i) & 0xff).toLong
          energy(i % VideoDhashLanes)(b) += v * v
          i += 1
        }
        var hash = 0L
        var c = 0
        while (c < VideoDhashLanes) {
          var k = 0
          while (k < VideoStride) {
            if (energy(c)(k + 1) > energy(c)(k)) hash |= 1L << (c * VideoStride + k)
            k += 1
          }
          c += 1
        }
        Seq(Row(docId, fmt, hash))
    } catch {
      case scala.util.control.NonFatal(_) => Seq(Row(docId, "undecodable", null))
    }

  /** Distributed container-payload video hash over `(idCol,
    * payloadCol)`. One pass, no shuffle. */
  def videoDhash(spark: SparkSession, df: DataFrame,
                 idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    MediaDecode.perPayload(spark, df, idCol, payloadCol, VideoDhashSchema)(
      videoDhashOne)

  // ---- audio frame-sampling ---------------------------------------------

  private val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channel", LongType, nullable = false),
    StructField("win", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("s_sum", LongType, nullable = true),
    StructField("s_sumsq", LongType, nullable = true),
    StructField("s_min", LongType, nullable = true),
    StructField("s_max", LongType, nullable = true)))

  private def frameSkipped(docId: Long, format: String): Seq[Row] =
    Seq(Row(docId, format, 0L, 0L, 0L, null, null, null, null))

  /** Split one integer-PCM WAV into fixed windows of `frameWin` frames
    * (the last window may be partial) and fold exact per-(channel,
    * window) stats: n, Σv, Σv², min, max. Σv² is the window ENERGY —
    * the silence/clipping detector a speech pipeline gates on. Non-WAV
    * and undecodable payloads degrade to one n=0 marker row. */
  def frameOne(docId: Long, bytes: Array[Byte], frameWin: Int): Seq[Row] = {
    require(frameWin > 0, "frame window must be positive") // caller bug: loud
    withWav(bytes)(frameSkipped(docId, _)) { p =>
      val nFrames = p.nFrames
      val nch = p.nch
      val nWin = (nFrames + frameWin - 1) / frameWin
      val n = Array.ofDim[Long](nch, nWin)
      val sum = Array.ofDim[Long](nch, nWin)
      val sumSq = Array.ofDim[Long](nch, nWin)
      val mn = Array.fill(nch, nWin)(Long.MaxValue)
      val mx = Array.fill(nch, nWin)(Long.MinValue)
      var f = 0
      while (f < nFrames) {
        val w = f / frameWin
        var c = 0
        while (c < nch) {
          val v = p.sample(f, c)
          n(c)(w) += 1
          sum(c)(w) += v
          sumSq(c)(w) += v * v
          if (v < mn(c)(w)) mn(c)(w) = v
          if (v > mx(c)(w)) mx(c)(w) = v
          c += 1
        }
        f += 1
      }
      for (c <- 0 until nch; w <- 0 until nWin)
        yield Row(docId, "wav", c.toLong, w.toLong, n(c)(w), sum(c)(w),
          sumSq(c)(w), mn(c)(w), mx(c)(w))
    }
  }

  /** Distributed fixed-window PCM frame stats over `(idCol,
    * payloadCol)`: one row per (doc, channel, window). One pass, no
    * shuffle. */
  def frameStats(spark: SparkSession, df: DataFrame, frameWin: Int,
                 idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    MediaDecode.perPayload(spark, df, idCol, payloadCol, FrameSchema)(
      frameOne(_, _, frameWin))
}
