package graft.stream

import graft.ops.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-duplicate CANDIDATE detection — SemDeDup at
  * ingest time, the vector sibling of [[StreamNearDup]] (reference ANN
  * dedup surface: `dc43-integrations` embedding pipeline; the batch twin
  * is [[VectorOps.embeddingPairsLsh]]).
  *
  * Same architectural split as the text path:
  *
  *  - sign-LSH band values are computed PER ROW ([[VectorOps.lshBandExprs]]
  *    — nBits codegen'd dot products, zero shuffle, no aggregation), built
  *    from the SAME Rademacher hyperplanes as the batch miner so a stream
  *    and a batch over the same corpus land in the same buckets. The one
  *    asymmetry: a stream cannot sniff the embedding dimension from data,
  *    so `dim` is a parameter here and MUST match the corpus (the batch
  *    path derives it; [[VectorOps.rademacherPlanes]] makes the two
  *    constructions bit-identical given the same `(nBits, dim, seed)`);
  *  - `(label, band, band_val)` buckets become `flatMapGroupsWithState`
  *    groups whose state is the vec_ids seen in that bucket — each
  *    arriving vector pairs against one bounded bucket, exactly the work
  *    the batch band self-join does, incrementally.
  *
  * Output is a CANDIDATE stream: a pair may repeat across bands or
  * batches (the batch pipeline dedupes with a `distinct()` that has no
  * bounded-state equivalent) — dedupe downstream
  * (`dropDuplicatesWithinWatermark`) and verify with [[verified]] against
  * a vector store. State per bucket is capped at `maxBucket` vectors
  * (recall trade, same contract as [[StreamNearDup.candidates]]).
  *
  * Recall follows the batch miner's band math (object doc at
  * [[VectorOps.embeddingPairsLsh]]): defaults target the cos ≥ 0.8
  * true-near-dup regime; low thresholds are not LSH-prunable on a stream
  * either.
  */
object StreamSemanticDup {

  /** Stateless per-row banded sign-LSH projection
    * `(vec_id, label, band, band_val)` — the frame the batch miner builds
    * before its self-join, as pure column expressions so it runs
    * unchanged on a stream. */
  def bandedSignatures(embeddings: DataFrame, dim: Int, nBits: Int = 128,
                       bandBits: Int = 8, seed: Long = 42): DataFrame = {
    require(nBits % bandBits == 0, "nBits must be a multiple of bandBits")
    require(dim > 0, "dim must be positive")
    val planes = VectorOps.rademacherPlanes(nBits, dim, seed)
    val bands = VectorOps.lshBandExprs(col("v"), planes, bandBits)
    VectorOps.prepared(embeddings)
      .select(col("vec_id"), col("label"),
        posexplode(array(bands: _*)).as(Seq("band", "band_val")))
  }

  /** Candidate near-dup pairs `(label, vec_a, vec_b)`, `vec_a < vec_b`,
    * from a streaming embedding frame `(vec_id, embedding, label)`. See
    * the object doc for the contract (candidates, possible repeats,
    * bounded buckets, `dim` must match the corpus). Labels must be
    * non-null (they key the bucket state; the batch miner's label join
    * DROPS null-label rows, and this path's tuple encoding rejects
    * them — normalise nulls to a sentinel label upstream if they must
    * participate). */
  def candidates(embeddings: DataFrame, dim: Int, nBits: Int = 128,
                 bandBits: Int = 8, seed: Long = 42,
                 maxBucket: Int = 64): DataFrame = {
    require(maxBucket > 1, "maxBucket must be at least 2")
    val spark = embeddings.sparkSession
    import spark.implicits._
    bandedSignatures(embeddings, dim, nBits, bandBits, seed)
      .select(col("vec_id").cast("long"), col("label").cast("int"),
        col("band").cast("int"), col("band_val").cast("long"))
      .as[(Long, Int, Int, Long)]
      .groupByKey(t => (t._2, t._3, t._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Int, Long), batch: Iterator[(Long, Int, Int, Long)],
         state: GroupState[List[Long]]) => {
          var kept = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[(Int, Long, Long)]
          batch.foreach { case (id, _, _, _) =>
            kept.foreach { oid =>
              if (oid != id)
                out += ((key._1, math.min(id, oid), math.max(id, oid)))
            }
            if (kept.lengthCompare(maxBucket) < 0) kept = id :: kept
          }
          state.update(kept)
          out.result().iterator
        })
      .toDF("label", "vec_a", "vec_b")
  }

  /** Exact-verification tail: joins each candidate pair against a STATIC
    * vector store (two stream-static joins — stateless, per micro-batch)
    * and keeps pairs with exact cosine ≥ `threshold`. Output columns and
    * values match [[VectorOps.embeddingPairsLsh]] on the candidate subset;
    * degenerate (zero/NaN-norm) vectors carry a null cosine and are
    * dropped by the threshold, the family's standing NaN contract. */
  def verified(candidatePairs: DataFrame, vecStore: DataFrame,
               threshold: Double = 0.8): DataFrame = {
    val e = VectorOps.prepared(vecStore)
    val ea = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    candidatePairs
      .join(ea, Seq("vec_a"))
      .join(eb, Seq("vec_b"))
      .withColumn("cosine", VectorOps.cosR(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
  }
}
