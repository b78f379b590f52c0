package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL media container probing — magic-number sniffing plus container
  * header parsing for the formats that need no codec library: PNG
  * (IHDR), GIF (logical screen descriptor), BMP (DIB header), JPEG
  * (SOF frame header scan), WAV (RIFF fmt/data chunks), MP4/ISO-BMFF
  * (moov box walk: mvhd timescale+duration, tkhd 16.16 dims, stsd
  * codec fourcc), and WebM/Matroska (EBML element walk: TimecodeScale
  * + Duration, PixelWidth/PixelHeight, CodecID). This upgrades
  * the multimodal story from "stub by design" to "container metadata
  * decode is real; PIXEL/SAMPLE decode stays a seam" — the honest cut
  * in a container with no image/audio codecs, and exactly the metadata
  * a curation pipeline filters on (resolution floors, aspect-ratio
  * bands, duration caps, format mix) before it ever pays for a full
  * decode.
  *
  * Everything is bounds-checked byte arithmetic on the payload prefix;
  * any malformed/truncated/unknown payload degrades to format
  * `unknown` with null dimensions — a probe NEVER throws, because at
  * corpus scale some bytes are always garbage and a crashed task on
  * row 10^11 is the failure mode this family exists to avoid.
  *
  * Scale shape: [[probeMeta]] is the same `mapPartitions` seam as
  * [[Multimodal.decodeMeta]] — per-partition batch iteration, nothing
  * driver-side; [[probeExpr]]-style use in a projection is not offered
  * because header scans (JPEG especially) are imperative byte walks —
  * the seam is the right tool, and it keeps the decode swappable. */
object MediaProbe {

  /** Probe output schema: dimensions for stills/video, audio shape for
    * WAV, duration + codec for video containers; fields that do not
    * apply to a format are null. */
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("bit_depth", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  /** Probe result: `format` is `png|gif|bmp|jpeg|wav|mp4|webm|mkv|unknown`. */
  final case class Probed(format: String,
                          width: Option[Long] = None,
                          height: Option[Long] = None,
                          sampleRate: Option[Long] = None,
                          channels: Option[Long] = None,
                          bitDepth: Option[Long] = None,
                          nSamples: Option[Long] = None,
                          durationMs: Option[Long] = None,
                          codec: Option[String] = None)

  private val Unknown = Probed("unknown")

  // bounds-checked unsigned reads; None past the end — parse failures
  // become Unknown, never exceptions
  private def u8(b: Array[Byte], i: Int): Option[Int] =
    if (i >= 0 && i < b.length) Some(b(i) & 0xff) else None
  private def u16be(b: Array[Byte], i: Int): Option[Int] =
    for (h <- u8(b, i); l <- u8(b, i + 1)) yield (h << 8) | l
  private def u16le(b: Array[Byte], i: Int): Option[Int] =
    for (l <- u8(b, i); h <- u8(b, i + 1)) yield (h << 8) | l
  private def u32be(b: Array[Byte], i: Int): Option[Long] =
    for (a <- u8(b, i); c <- u8(b, i + 1); d <- u8(b, i + 2); e <- u8(b, i + 3))
      yield ((a.toLong << 24) | (c << 16) | (d << 8) | e) & 0xffffffffL
  private def u32le(b: Array[Byte], i: Int): Option[Long] =
    for (a <- u8(b, i); c <- u8(b, i + 1); d <- u8(b, i + 2); e <- u8(b, i + 3))
      yield ((e.toLong << 24) | (d << 16) | (c << 8) | a) & 0xffffffffL
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  private def png(b: Array[Byte]): Option[Probed] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 8 || !sig.indices.forall(i => (b(i) & 0xff) == sig(i))) return None
    if (!ascii(b, 12, "IHDR")) return Some(Unknown) // signed PNG, broken IHDR
    for {
      w <- u32be(b, 16); h <- u32be(b, 20)
      depth <- u8(b, 24); colorType <- u8(b, 25)
    } yield {
      val chans = colorType match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case _ => return Some(Unknown)
      }
      Probed("png", Some(w), Some(h), channels = Some(chans),
        bitDepth = Some(depth.toLong))
    }
  }

  private def gif(b: Array[Byte]): Option[Probed] = {
    if (!(ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) return None
    for (w <- u16le(b, 6); h <- u16le(b, 8))
      yield Probed("gif", Some(w.toLong), Some(h.toLong))
  }

  private def bmp(b: Array[Byte]): Option[Probed] = {
    if (!ascii(b, 0, "BM")) return None
    u32le(b, 14) match {
      // BITMAPINFOHEADER and successors (V4/V5 headers extend it)
      case Some(dib) if dib >= 40 =>
        for {
          w <- u32le(b, 18); h <- u32le(b, 22); bpp <- u16le(b, 28)
        } yield Probed("bmp", Some(w.toInt.toLong),
          // height may be negative (top-down rows); magnitude is the size
          Some(math.abs(h.toInt).toLong), bitDepth = Some(bpp.toLong))
      case _ => Some(Unknown)
    }
  }

  private def jpeg(b: Array[Byte]): Option[Probed] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    // walk the marker stream to the first frame header (SOFn)
    var i = 2
    var guard = 0
    while (i + 3 < b.length && guard < 10000) {
      guard += 1
      if ((b(i) & 0xff) != 0xff) return Some(Unknown)
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill bytes
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2 // standalone
      else {
        val len = u16be(b, i + 2).getOrElse(return Some(Unknown))
        if (len < 2) return Some(Unknown)
        val sof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (sof) {
          return for {
            depth <- u8(b, i + 4); h <- u16be(b, i + 5)
            w <- u16be(b, i + 7); comps <- u8(b, i + 9)
          } yield Probed("jpeg", Some(w.toLong), Some(h.toLong),
            channels = Some(comps.toLong), bitDepth = Some(depth.toLong))
        }
        if (marker == 0xd9 || marker == 0xda) return Some(Unknown) // EOI/SOS before SOF
        i += 2 + len
      }
    }
    Some(Unknown)
  }

  private def wav(b: Array[Byte]): Option[Probed] = {
    if (!(ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"))) return None
    // chunk walk: fmt  carries the shape, data carries the sample bytes
    var i = 12
    var rate, chans, bits: Option[Long] = None
    var dataLen: Option[Long] = None
    var guard = 0
    while (i + 8 <= b.length && guard < 10000 &&
           (rate.isEmpty || dataLen.isEmpty)) {
      guard += 1
      val size = u32le(b, i + 4).getOrElse(return Some(Unknown))
      if (ascii(b, i, "fmt ")) {
        chans = u16le(b, i + 10).map(_.toLong)
        rate = u32le(b, i + 12)
        bits = u16le(b, i + 22).map(_.toLong)
      } else if (ascii(b, i, "data")) dataLen = Some(size)
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (i < 0) return Some(Unknown) // overflowed size field
    }
    (rate, chans, bits) match {
      case (Some(r), Some(c), Some(bd)) if c > 0 && bd >= 8 =>
        val samples = dataLen.map(d => d / (c * (bd / 8)))
        Some(Probed("wav", sampleRate = Some(r), channels = Some(c),
          bitDepth = Some(bd), nSamples = samples))
      case _ => Some(Unknown)
    }
  }

  // ---- MP4 / ISO-BMFF ----------------------------------------------------

  /** Find the first box matching `path` (nested), returning its start
    * offset. Bounds-checked sequential walk; 64-bit `largesize` and
    * to-end (size 0) boxes are out of the probe envelope → None. */
  private def findBox(b: Array[Byte], start: Int, end: Int,
                      path: List[String]): Option[Int] = {
    var i = start
    var guard = 0
    while (i + 8 <= end && guard < 10000) {
      guard += 1
      val size = u32be(b, i).getOrElse(return None)
      if (size < 8 || size > Int.MaxValue) return None
      val boxEnd = i + size.toInt
      if (boxEnd > end || boxEnd <= i) return None
      if (ascii(b, i + 4, path.head)) {
        if (path.tail.isEmpty) return Some(i)
        val r = findBox(b, i + 8, boxEnd, path.tail)
        if (r.isDefined) return r
      }
      i = boxEnd
    }
    None
  }

  private def asciiStr(b: Array[Byte], i: Int, len: Int): Option[String] =
    if (i >= 0 && i + len <= b.length &&
        (i until i + len).forall(j => b(j) >= 0x20 && b(j) < 0x7f))
      Some(new String(b, i, len, java.nio.charset.StandardCharsets.US_ASCII))
    else None

  /** All direct child boxes named `fourcc` inside [start, end): their
    * start offsets and ends — [[findBox]]'s sibling for cases where
    * "first match" is wrong (a file's first trak is often audio). */
  private def childBoxes(b: Array[Byte], start: Int, end: Int,
                         fourcc: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = start
    var guard = 0
    var ok = true
    while (ok && i + 8 <= end && guard < 10000) {
      guard += 1
      u32be(b, i) match {
        case Some(size) if size >= 8 && size <= Int.MaxValue &&
            i + size.toInt > i && i + size.toInt <= end =>
          if (ascii(b, i + 4, fourcc)) out += ((i, i + size.toInt))
          i += size.toInt
        case _ => ok = false
      }
    }
    out.result()
  }

  /** ISO-BMFF family: detected by the `ftyp` box at offset 4, with the
    * MAJOR BRAND deciding the format label — crawl corpora are full of
    * ftyp-bearing NON-video files (iPhone HEIC photos, M4A audio, MOV,
    * AVIF), and labeling those `mp4` would misroute them through video
    * curation filters. Duration from `mvhd` (duration/timescale, ms);
    * dims + codec from the first VIDEO track — the trak whose `tkhd`
    * carries nonzero 16.16 dims (sound tracks are 0x0) — never blindly
    * from the first trak (often audio). Fields are best-effort: a
    * streaming-only file with `moov` past the probed prefix still
    * reports its format. */
  private def mp4(b: Array[Byte]): Option[Probed] = {
    if (b.length < 12 || !ascii(b, 4, "ftyp")) return None
    val fmt = asciiStr(b, 8, 4).map(_.trim) match {
      case Some(brand) if Set("heic", "heix", "mif1", "msf1", "heif").contains(brand) => "heic"
      case Some("avif") | Some("avis") => "avif"
      case Some("M4A") | Some("M4B") => "m4a"
      case Some("qt") => "mov"
      case _ => "mp4" // isom/iso2/mp41/mp42/avc1/3gp*/dash and friends
    }
    val end = b.length
    val durMs = for {
      mvhd <- findBox(b, 0, end, List("moov", "mvhd"))
      v <- u8(b, mvhd + 8)
      tsDur <- v match {
        case 0 => for (t <- u32be(b, mvhd + 20); d <- u32be(b, mvhd + 24)) yield (t, d)
        case 1 => for {
          t <- u32be(b, mvhd + 28)
          dh <- u32be(b, mvhd + 32); dl <- u32be(b, mvhd + 36)
        } yield (t, (dh << 32) | dl)
        case _ => None
      }
      if tsDur._1 > 0
    } yield tsDur._2 * 1000L / tsDur._1
    // per-trak probe: (dims if the tkhd carries them, codec fourcc)
    def trakInfo(ts: Int, te: Int): (Option[(Long, Long)], Option[String]) = {
      val dims = for {
        tkhd <- findBox(b, ts + 8, te, List("tkhd"))
        v <- u8(b, tkhd + 8)
        off = if (v == 1) 96 else 84
        w <- u32be(b, tkhd + off); h <- u32be(b, tkhd + off + 4)
        if w > 0 && h > 0
      } yield (w >> 16, h >> 16) // 16.16 fixed point
      val codec = for {
        stsd <- findBox(b, ts + 8, te, List("mdia", "minf", "stbl", "stsd"))
        fourcc <- asciiStr(b, stsd + 20, 4)
      } yield fourcc
      (dims, codec)
    }
    val traks = findBox(b, 0, end, List("moov")).toSeq.flatMap { moov =>
      val moovEnd = u32be(b, moov).fold(end)(s => moov + s.toInt)
      childBoxes(b, moov + 8, math.min(moovEnd, end), "trak")
    }.map { case (ts, te) => trakInfo(ts, te) }
    // the VIDEO track = the first trak with real dims; its stsd names
    // the video codec. Files with no video track (m4a) fall back to the
    // first trak's codec with no dims.
    val video = traks.find(_._1.isDefined)
    val dims = video.flatMap(_._1)
    val codec = video.flatMap(_._2).orElse(traks.headOption.flatMap(_._2))
    Some(Probed(fmt, dims.map(_._1), dims.map(_._2),
      durationMs = durMs, codec = codec))
  }

  // ---- WebM / Matroska (EBML) ---------------------------------------------

  /** EBML variable-length integer at `i`: (value, byteLength). Element
    * IDs keep the marker bit (`mask = false`, compared against class
    * ids verbatim); SIZES mask it. All-ones size payloads ("unknown
    * size", used by live-streamed Segments) come back as the masked
    * max — [[findEbml]] treats a size that overruns the buffer as
    * extending to the end, which covers that case. */
  private def evint(b: Array[Byte], i: Int, mask: Boolean): Option[(Long, Int)] =
    u8(b, i).flatMap { first =>
      if (first == 0) None
      else {
        val len = Integer.numberOfLeadingZeros(first) - 23
        var v = (if (mask) first & ((1 << (8 - len)) - 1) else first).toLong
        var k = 1
        while (k < len) {
          val nb = u8(b, i + k).getOrElse(return None)
          v = (v << 8) | nb
          k += 1
        }
        Some((v, len))
      }
    }

  /** Find the first EBML element matching the nested `path` of element
    * ids (marker bit included), returning its payload bounds. */
  private def findEbml(b: Array[Byte], start: Int, end: Int,
                       path: List[Long]): Option[(Int, Int)] = {
    var i = start
    var guard = 0
    while (i < end && guard < 10000) {
      guard += 1
      val (id, idLen) = evint(b, i, mask = false).getOrElse(return None)
      val (sz, szLen) = evint(b, i + idLen, mask = true).getOrElse(return None)
      val pStart = i + idLen + szLen
      // unknown-size / overrunning elements extend to the probed end
      val pEnd = if (sz > (end - pStart).toLong) end else pStart + sz.toInt
      if (id == path.head) {
        if (path.tail.isEmpty) return Some((pStart, pEnd))
        val r = findEbml(b, pStart, pEnd, path.tail)
        if (r.isDefined) return r
      }
      i = pEnd // pEnd >= pStart > i (id and size are >= 1 byte): progress
    }
    None
  }

  private def ebmlUint(b: Array[Byte], bounds: (Int, Int)): Option[Long] = {
    val (s, e) = bounds
    if (e - s < 1 || e - s > 8) return None
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (u8(b, i).getOrElse(return None)); i += 1 }
    Some(v)
  }

  private def ebmlFloat(b: Array[Byte], bounds: (Int, Int)): Option[Double] = {
    val (s, e) = bounds
    (e - s) match {
      case 4 => u32be(b, s).map(bits => java.lang.Float.intBitsToFloat(bits.toInt).toDouble)
      case 8 => for (h <- u32be(b, s); l <- u32be(b, s + 4))
        yield java.lang.Double.longBitsToDouble((h << 32) | l)
      case _ => None
    }
  }

  // Matroska class IDs (marker bit included)
  private[ops] val EbmlMagic = 0x1A45DFA3L
  private[ops] val IdDocType = 0x4282L
  private[ops] val IdSegment = 0x18538067L
  private[ops] val IdInfo = 0x1549A966L
  private[ops] val IdTimecodeScale = 0x2AD7B1L
  private[ops] val IdDuration = 0x4489L
  private[ops] val IdTracks = 0x1654AE6BL
  private[ops] val IdTrackEntry = 0xAEL
  private[ops] val IdCodecId = 0x86L
  private[ops] val IdVideo = 0xE0L
  private[ops] val IdPixelWidth = 0xB0L
  private[ops] val IdPixelHeight = 0xBAL
  private[ops] val IdCluster = 0x1F43B675L

  /** All direct child EBML elements with `id` inside [start, end):
    * payload bounds — [[findEbml]]'s sibling, for "first matching
    * TrackEntry" selection rather than blind first-element reads. */
  private def childEbml(b: Array[Byte], start: Int, end: Int,
                        id: Long): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = start
    var guard = 0
    var ok = true
    while (ok && i < end && guard < 10000) {
      guard += 1
      (for {
        (eid, idLen) <- evint(b, i, mask = false)
        (sz, szLen) <- evint(b, i + idLen, mask = true)
      } yield {
        val pStart = i + idLen + szLen
        val pEnd = if (sz > (end - pStart).toLong) end else pStart + sz.toInt
        if (eid == id) out += ((pStart, pEnd))
        i = pEnd
      }).getOrElse { ok = false }
    }
    out.result()
  }

  /** Matroska/WebM: detected by the EBML magic; format from DocType
    * (`webm` → webm, `matroska` → mkv); duration from Info's float
    * Duration × TimecodeScale (default 1 ms/tick); dims AND codec from
    * the first TrackEntry that carries a Video child — never blindly
    * from the first TrackEntry, which is often the audio track (an
    * audio-first file must not report `A_OPUS` with video dims).
    * Audio-only files fall back to the first entry's CodecID with no
    * dims. Best-effort like [[mp4]]. */
  private def webm(b: Array[Byte]): Option[Probed] = {
    if (b.length < 4) return None
    evint(b, 0, mask = false) match {
      case Some((EbmlMagic, _)) => ()
      case _ => return None
    }
    val fmt = (for {
      hdr <- findEbml(b, 0, b.length, List(EbmlMagic))
      dt <- findEbml(b, hdr._1, hdr._2, List(IdDocType))
      s <- asciiStr(b, dt._1, dt._2 - dt._1)
    } yield s) match {
      case Some("webm") => "webm"
      case Some("matroska") => "mkv"
      case _ => return Some(Unknown)
    }
    val seg = findEbml(b, 0, b.length, List(IdSegment))
    def inSeg(path: List[Long]): Option[(Int, Int)] =
      seg.flatMap { case (s, e) => findEbml(b, s, e, path) }
    val scale = inSeg(List(IdInfo, IdTimecodeScale))
      .flatMap(ebmlUint(b, _)).getOrElse(1000000L) // spec default: 1 ms
    val durMs = for {
      d <- inSeg(List(IdInfo, IdDuration)).flatMap(ebmlFloat(b, _))
      if scale > 0
    } yield math.round(d * scale / 1e6)
    val entries = inSeg(List(IdTracks)).toSeq.flatMap { case (s, e) =>
      childEbml(b, s, e, IdTrackEntry)
    }
    def video(entry: (Int, Int)): Option[(Int, Int)] =
      findEbml(b, entry._1, entry._2, List(IdVideo))
    val videoEntry = entries.find(video(_).isDefined)
    val dims = for {
      entry <- videoEntry; v <- video(entry)
      w <- findEbml(b, v._1, v._2, List(IdPixelWidth)).flatMap(ebmlUint(b, _))
      h <- findEbml(b, v._1, v._2, List(IdPixelHeight)).flatMap(ebmlUint(b, _))
    } yield (w, h)
    val codec = videoEntry.orElse(entries.headOption).flatMap { entry =>
      findEbml(b, entry._1, entry._2, List(IdCodecId))
        .flatMap(c => asciiStr(b, c._1, c._2 - c._1))
    }
    Some(Probed(fmt, dims.map(_._1), dims.map(_._2),
      durationMs = durMs, codec = codec))
  }

  /** Concatenated MEDIA payload of a video container, with its probed
    * format: every top-level `mdat` box (ISO-BMFF family) or every
    * Segment-level Cluster (EBML family), in file order. This is the
    * codec-agnostic byte stream a CONTAINER-LEVEL fingerprint hashes —
    * re-muxing or re-describing a copy rewrites `moov`/`Info`/`Tracks`
    * metadata but not these bytes. `None` for non-container formats;
    * an empty array for containers with no media payload yet (header-
    * only fixtures, init segments). */
  private[ops] def mediaPayload(bytes: Array[Byte]): Option[(String, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) return None
    val p = probe(bytes)
    p.format match {
      case f @ ("mp4" | "mov" | "m4a" | "heic" | "avif") =>
        // dedicated top-level walk rather than childBoxes: `mdat` is the
        // one box that legally uses size==0 (extends to EOF — common as
        // the final box of a straight-to-disk recording) and size==1
        // (64-bit largesize header, 16-byte preamble); childBoxes'
        // size>=8 guard treats both as damage and would drop the whole
        // payload, so those files would silently escape perceptual dedup
        val out = new java.io.ByteArrayOutputStream()
        val end = bytes.length
        var i = 0
        var ok = true
        var guard = 0
        while (ok && i + 8 <= end && guard < 10000) {
          guard += 1
          val size32 = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
            ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
          val isMdat = bytes(i + 4) == 'm' && bytes(i + 5) == 'd' &&
            bytes(i + 6) == 'a' && bytes(i + 7) == 't'
          val (payloadAt, boxEnd): (Long, Long) =
            if (size32 == 0L) (i + 8L, end.toLong) // to end of file
            else if (size32 == 1L && i + 16 <= end) { // 64-bit largesize
              var big = 0L
              var k = 0
              while (k < 8) { big = (big << 8) | (bytes(i + 8 + k) & 0xffL); k += 1 }
              if (big < 16L) (0L, -1L) else (i + 16L, math.min(i + big, end.toLong))
            } else if (size32 >= 8L) (i + 8L, math.min(i + size32, end.toLong))
            else (0L, -1L)
          if (boxEnd <= i) ok = false // damaged size: stop, keep what we have
          else {
            if (isMdat && payloadAt < boxEnd)
              out.write(bytes, payloadAt.toInt, (boxEnd - payloadAt).toInt)
            i = boxEnd.toInt
          }
        }
        Some((f, out.toByteArray))
      case f @ ("webm" | "mkv") =>
        val out = new java.io.ByteArrayOutputStream()
        findEbml(bytes, 0, bytes.length, List(IdSegment)).foreach {
          case (ss, se) => childEbml(bytes, ss, se, IdCluster).foreach {
            case (s, e) => out.write(bytes, s, e - s)
          }
        }
        Some((f, out.toByteArray))
      case _ => None
    }
  }

  /** Sniff + parse one payload. Total: never throws, `unknown` on
    * anything unrecognised or malformed. */
  def probe(bytes: Array[Byte]): Probed =
    try {
      if (bytes == null) Unknown
      else png(bytes).orElse(gif(bytes)).orElse(bmp(bytes))
        .orElse(jpeg(bytes)).orElse(wav(bytes))
        .orElse(mp4(bytes)).orElse(webm(bytes)).getOrElse(Unknown)
    } catch { case scala.util.control.NonFatal(_) => Unknown }

  /** Per-partition batched probe — the same distributed seam as
    * [[Multimodal.decodeStubPartition]], but parsing real headers. */
  def probePartition(rows: Iterator[(Long, Array[Byte])]): Iterator[Row] =
    rows.map { case (docId, bytes) =>
      val p = probe(bytes)
      val len = if (bytes == null) 0L else bytes.length.toLong
      Row(docId, len, p.format, p.width.orNull, p.height.orNull,
        p.sampleRate.orNull, p.channels.orNull, p.bitDepth.orNull,
        p.nSamples.orNull, p.durationMs.orNull, p.codec.orNull)
    }

  // ---- deterministic synthetic video containers ---------------------------
  // The testdata carries no video bytes; the gated query SYNTHESIZES
  // minimal-but-valid containers from closed-form formulas (the
  // MediaDecode fixture convention), assembled here by the same byte
  // arithmetic the parsers read back — the oracle recomputes dims/
  // duration/codec from the formulas alone, so builder and parser
  // cross-check each other against the spec, not against themselves.

  /** MP4 fixture formulas — mirrored in the oracle SQL. */
  def mp4Dims(doc: Long): (Long, Long) =
    (320 + (doc % 5) * 16, 240 + (doc % 3) * 16)
  def mp4DurationMs(doc: Long): Long = 1500 + doc * 10
  def mp4Codec(doc: Long): String = if (doc % 4 < 2) "avc1" else "hvc1"

  /** WebM fixture formulas — mirrored in the oracle SQL. */
  def webmDims(doc: Long): (Long, Long) =
    (640 + (doc % 4) * 8, 360 + (doc % 2) * 8)
  def webmDurationMs(doc: Long): Long = 2000 + doc * 5
  def webmCodec(doc: Long): String = if (doc % 4 == 1) "V_VP8" else "V_VP9"

  /** MEDIA-payload fixture formulas (both container families carry the
    * SAME byte stream — the container-level fingerprint must see through
    * the wrapper): closed-form length and per-byte value, mirrored in
    * the q_video_dhash oracle. `i²·mod` oscillates (the q_audio_dhash
    * wavy-fixture lesson: a monotone ramp zeroes every energy
    * comparison and makes the hash gate vacuous). */
  def videoPayloadLen(doc: Long): Long = 160 + (doc % 7) * 24
  def videoPayloadByte(doc: Long, i: Long): Long =
    ((i * i) % 211 + (doc % 29) * 7 + (i % 13) * 5) % 256
  private[ops] def videoPayloadBytes(doc: Long): Array[Byte] =
    Array.tabulate(videoPayloadLen(doc).toInt)(i =>
      videoPayloadByte(doc, i.toLong).toByte)

  private[ops] def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private[ops] def box(fourcc: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ fourcc.getBytes("US-ASCII") ++ payload

  /** Minimal valid ISO-BMFF: ftyp + moov{mvhd v0, trak{tkhd v0,
    * mdia{minf{stbl{stsd}}}}} with timescale 1000 (duration field IS
    * milliseconds). */
  def syntheticMp4(doc: Long): Array[Byte] = {
    val (w, h) = mp4Dims(doc)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    // mvhd v0: version/flags, ctime, mtime, timescale, duration, then
    // rate/volume/reserved/matrix/predefined/next-track as zeros
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(mp4DurationMs(doc)) ++ new Array[Byte](80))
    // tkhd v0: version/flags .. duration, reserved, layer/alt/volume/
    // reserved, identity-free zero matrix, then 16.16 width/height
    val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(mp4DurationMs(doc)) ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ new Array[Byte](36) ++
      be32(w << 16) ++ be32(h << 16))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      box(mp4Codec(doc), new Array[Byte](8)))
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ moov ++ box("mdat", videoPayloadBytes(doc))
  }

  private[ops] def ebmlSize(n: Int): Array[Byte] = {
    require(n >= 0 && n < 127, "fixture elements stay under one-byte sizes")
    Array((0x80 | n).toByte)
  }
  /** Two-byte EBML size (`0x40xx` form) — the Segment and Cluster carry
    * the media payload and outgrow the one-byte budget. */
  private[ops] def ebmlSize2(n: Int): Array[Byte] = {
    require(n >= 0 && n < (1 << 14) - 1, "fixture elements stay under two-byte sizes")
    Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  }
  private[ops] def ebmlId(id: Long): Array[Byte] = {
    val len = if (id > 0xffffffL) 4 else if (id > 0xffffL) 3
      else if (id > 0xffL) 2 else 1
    (0 until len).map(k => ((id >> (8 * (len - 1 - k))) & 0xff).toByte).toArray
  }
  private[ops] def ebmlEl(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length) ++ payload
  private[ops] def ebmlUintBytes(v: Long): Array[Byte] = {
    val len = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (0 until len).map(k => ((v >> (8 * (len - 1 - k))) & 0xff).toByte).toArray
  }

  /** Minimal valid WebM: EBML{DocType webm} + Segment{Info{TimecodeScale,
    * Duration(float64)}, Tracks{TrackEntry{CodecID, Video{PixelWidth,
    * PixelHeight}}}}. */
  def syntheticWebm(doc: Long): Array[Byte] = {
    val (w, h) = webmDims(doc)
    val header = ebmlEl(EbmlMagic,
      ebmlEl(IdDocType, "webm".getBytes("US-ASCII")))
    val durBits = java.lang.Double.doubleToLongBits(webmDurationMs(doc).toDouble)
    val info = ebmlEl(IdInfo,
      ebmlEl(IdTimecodeScale, ebmlUintBytes(1000000L)) ++
      ebmlEl(IdDuration, be32(durBits >>> 32) ++ be32(durBits & 0xffffffffL)))
    val video = ebmlEl(IdVideo,
      ebmlEl(IdPixelWidth, ebmlUintBytes(w)) ++
      ebmlEl(IdPixelHeight, ebmlUintBytes(h)))
    val tracks = ebmlEl(IdTracks, ebmlEl(IdTrackEntry,
      ebmlEl(IdCodecId, webmCodec(doc).getBytes("US-ASCII")) ++ video))
    val payload = videoPayloadBytes(doc)
    val cluster = ebmlId(IdCluster) ++ ebmlSize2(payload.length) ++ payload
    val segPayload = info ++ tracks ++ cluster
    header ++ ebmlId(IdSegment) ++ ebmlSize2(segPayload.length) ++ segPayload
  }

  /** Distributed video fixture: `(doc_id, payload)` — even ids MP4, odd
    * ids WebM, built per partition. */
  def videoPayloads(spark: SparkSession, ids: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val src = ids.select(col(idCol).cast(LongType))
    val rdd = src.rdd.mapPartitions(_.map { r =>
      val doc = r.getLong(0)
      Row(doc, if (doc % 2 == 0) syntheticMp4(doc) else syntheticWebm(doc))
    })
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Distributed probe over `(idCol, payloadCol)`: one pass, per-partition
    * batches, no driver involvement. */
  def probeMeta(spark: SparkSession, df: DataFrame,
                idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
    val rdd = src.rdd.mapPartitions(it =>
      probePartition(it.map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)))))
    spark.createDataFrame(rdd, Schema)
  }
}
