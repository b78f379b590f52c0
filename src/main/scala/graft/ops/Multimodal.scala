package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata extracted alongside.
  *
  * Decode is layered, shallow to deep, all through the same
  * per-partition seam: (1) [[extractMeta]] keeps a deterministic
  * byte-length-derived metadata stub for the stable correctness gate;
  * (2) [[MediaProbe]] parses REAL container headers (PNG/GIF/BMP/JPEG/
  * WAV — dimensions, channels, bit depth, sample counts) so curation
  * can filter on resolution floors / duration caps / format mix without
  * paying for a full decode; (3) [[MediaDecode]] performs REAL
  * pixel/sample decode for the deterministic envelope (lossless stills
  * via javax.imageio, PCM WAV via javax.sound) and reduces to
  * per-channel value stats in one streaming pass. A heavier codec (JNI,
  * `mapInPandas` batch UDF) drops in behind the identical seam without
  * touching the plumbing. */
object Multimodal {

  /** Typed metadata schema every decoder must produce. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Expression-only metadata extraction over an opaque binary payload —
    * codegen'd, one scan, used by the correctness gate. The payload here is
    * the UTF-8 bytes of `text` standing in for real media bytes; the
    * "decode" derives deterministic fake dimensions from the byte length. */
  def extractMeta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val byteLen = length(payload).cast(LongType)
    docs.select(
      col("doc_id"),
      byteLen.as("byte_len"),
      md5(payload).as("checksum"),
      when(pmod(byteLen, lit(3L)) === 0L, lit("image"))
        .when(pmod(byteLen, lit(3L)) === 1L, lit("audio"))
        .otherwise(lit("video")).as("format"),
      (pmod(byteLen, lit(1280L)) + 64L).as("width"),
      (pmod(byteLen * 7L, lit(720L)) + 64L).as("height"),
      (pmod(byteLen, lit(30L)) + 1L).as("n_frames"))
  }

  /** STUB decode: where a real codec would parse media bytes. Deterministic
    * fake so tests are stable; signature and batch shape (iterator of rows
    * per partition, no driver collect) match what a real decoder needs. */
  def decodeStubPartition(rows: Iterator[(Long, Array[Byte])]): Iterator[Row] =
    rows.map { case (docId, bytes) =>
      val len = bytes.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val checksum = md.digest(bytes).map("%02x".format(_)).mkString
      val format = (len % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      Row(docId, len, checksum, format, (len % 1280) + 64, ((len * 7) % 720) + 64, (len % 30) + 1)
    }

  /** Frame-sampling plumbing over decoded metadata: one row per sampled
    * frame index (`0, everyN, 2·everyN, …` up to `n_frames`), with a
    * deterministic per-frame feature stub derived from (checksum, frame).
    * The explode is the real Spark shape — a decoder swaps the stub for
    * actual frame bytes/features without touching the query structure.
    * Scale: pure Generate + projection, no shuffle; frames scale the row
    * count, never the driver. */
  def sampleFrames(meta: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    meta.select(
        col("doc_id"), col("checksum"), col("format"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong))).as("frame_idx"))
      .withColumn("frame_feature",
        // STUB: deterministic stand-in for a decoded frame embedding/hash
        md5(concat_ws(":", col("checksum"), col("frame_idx"))))
  }

  /** Resize plumbing: aspect-preserving fit of (width, height) into a
    * target box, emitting the scaled dimensions and a deterministic
    * payload-reference stub for the resized artifact. Integer math only
    * (floor scaling), so Spark and any re-implementation agree exactly.
    * A real resizer consumes the same (doc_id, width, height → new_w,
    * new_h) contract and replaces `resized_ref` with actual bytes. */
  def resizeStub(meta: DataFrame, targetW: Long, targetH: Long): DataFrame = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    // pick the binding edge, derive the other by exact integer ratio
    // (w·tH ≥ h·tW ⇔ width/height ≥ targetW/targetH, no FP involved)
    val wider = col("width") * targetH >= col("height") * targetW
    val fitW = when(wider, lit(targetW))
      .otherwise(greatest(lit(1L), ((col("width") * targetH) / col("height")).cast(LongType)))
    val fitH = when(wider, greatest(lit(1L), ((col("height") * targetW) / col("width")).cast(LongType)))
      .otherwise(lit(targetH))
    meta.select(
      col("doc_id"), col("checksum"), col("width"), col("height"),
      fitW.as("resized_w"), fitH.as("resized_h"))
      .withColumn("resized_ref",
        md5(concat_ws("x", col("checksum"), col("resized_w"), col("resized_h"))))
  }

  /** Per-partition batched decode over (doc_id, payload) — the
    * `mapPartitions` seam a real decoder plugs into. Distributed: each
    * partition decodes its own batch, nothing reaches the driver. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id").cast(LongType), col("text").cast(BinaryType))
    val rdd = src.rdd.mapPartitions(it =>
      decodeStubPartition(it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))))
    spark.createDataFrame(rdd, MetadataSchema)
  }
}
