package graft.stream

import graft.ops.{HashMode, NearDup, TextOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate CANDIDATE detection — dedup at
  * ingest time, the streaming sibling of [[NearDup.minhashPairs]].
  *
  * The batch pipeline's shape (explode shingles → groupBy(doc) signature
  * aggregation → band-bucket self-join) has no bounded-state streaming
  * equivalent: a stream-stream self-join on band buckets would buffer the
  * whole history on both sides. Instead:
  *
  *  - signatures are computed PER ROW with array lambdas (no explode, no
  *    aggregation — a doc's text is row-local), bit-identical to the batch
  *    family via [[HashMode.minhashPrepElem]]/[[HashMode.seededHashElem]];
  *  - band buckets become `flatMapGroupsWithState` groups whose state is
  *    the docs seen in that bucket so far — each arriving doc pairs
  *    against ONE bounded bucket, exactly the work the batch band join
  *    does, incrementally.
  *
  * Output is a CANDIDATE stream (share-a-band + size-ratio block), the
  * streaming analogue of the batch pipeline's pre-verify candidate set: a
  * pair may repeat across bands or batches (batch dedupes with a
  * `distinct()` that has no bounded-state equivalent) — dedupe downstream
  * (`dropDuplicatesWithinWatermark`) and/or verify exact Jaccard against
  * a document store keyed by the emitted ids.
  *
  * State per bucket is capped at `maxBucket` docs: a pathological bucket
  * (every doc hashing one band value) stops growing and later docs only
  * pair against the kept members — the recall trade that bounds state;
  * the batch pipeline over the full corpus remains the exact reference.
  * Long-running streams should also set a state-store TTL or re-run the
  * batch dedup periodically: NoTimeout state lives for the stream's life.
  */
object StreamNearDup {

  /** Stateless per-row banded-signature projection:
    * `(doc_id, nsh, band, band_hash)` — the same frame the batch pipeline
    * builds by explode + aggregate, here as pure column expressions so it
    * runs unchanged on a stream. The token / shingle / precursor arrays
    * each materialise through a Generate barrier (1-element-array
    * explode): without it CollapseProject inlines tokenisation into every
    * lambda element access and the projection goes O(n²) per doc. */
  def bandedSignatures(docs: DataFrame, k: Int = 3,
                       mode: HashMode = HashMode.Default): DataFrame = {
    val rows = NearDup.MinHashK / NearDup.MinHashBands
    val sharded = docs
      .withColumn("_snd_toks",
        explode(array(split(TextOps.normText(col("text")), " "))))
      .withColumn("_snd_sh",
        explode(array(NearDup.shinglesOf(col("_snd_toks"), k))))
    val withSigs = mode match {
      case HashMode.Portable =>
        // native path: graft_minhash60 digests each shingle once and
        // advances all K minima in one codegen'd call — the lambda
        // spelling below is bit-identical but interpreted (no codegen
        // for higher-order functions; measured 2.7× slower at sf0.1)
        sharded
          .withColumn("_snd_sigs",
            call_function("graft_minhash60", col("_snd_sh")))
          .select(Seq(col("doc_id"), size(col("_snd_sh")).cast("long").as("nsh"))
            ++ (0 until NearDup.MinHashK).map(i =>
              element_at(col("_snd_sigs"), i + 1).as(s"mh$i")): _*)
      case _ =>
        val sigs = (0 until NearDup.MinHashK).map(i =>
          array_min(transform(col("_snd_prep"), p => mode.seededHashElem(i, p)))
            .as(s"mh$i"))
        sharded
          .withColumn("_snd_prep",
            explode(array(transform(col("_snd_sh"), s => mode.minhashPrepElem(s)))))
          .select(Seq(col("doc_id"), size(col("_snd_sh")).cast("long").as("nsh"))
            ++ sigs: _*)
    }
    val bandCols = (0 until NearDup.MinHashBands).map { bnd =>
      mode.hash((bnd * rows until (bnd + 1) * rows).map(i => col(s"mh$i")): _*)
    }
    withSigs.select(col("doc_id"), col("nsh"),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
  }

  /** Exact-verification tail for [[candidates]]: joins each candidate
    * pair against a STATIC document store (two stream-static joins —
    * stateless, per micro-batch) and computes the exact shingle Jaccard
    * PER ROW with array expressions (`array_intersect` over the two
    * distinct shingle sets — no explode, no aggregation), keeping pairs
    * at or above `threshold`. Output equals the batch
    * [[NearDup.ngramPairs]] verdict on the candidate subset; repeats in
    * the candidate stream produce repeated verified rows — dedupe
    * downstream like the candidates themselves.
    *
    * The doc store is the static side by design: verifying against
    * in-stream text would need the stream buffered forever; a store the
    * pipeline writes anyway (or the batch corpus being appended to) is
    * the natural source of truth. */
  def verified(candidatePairs: DataFrame, docStore: DataFrame,
               k: Int = 3, threshold: Double = 0.7): DataFrame = {
    def shingleSet(textCol: Column): Column =
      NearDup.shinglesOf(textCol, k) // distinct by default
    val a = docStore
      .withColumn("_v_toks", explode(array(split(TextOps.normText(col("text")), " "))))
      .select(col("doc_id").as("doc_a"), shingleSet(col("_v_toks")).as("_sh_a"))
    val b = docStore
      .withColumn("_v_toks", explode(array(split(TextOps.normText(col("text")), " "))))
      .select(col("doc_id").as("doc_b"), shingleSet(col("_v_toks")).as("_sh_b"))
    candidatePairs
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b"))
      .withColumn("_common", size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("long"))
      .withColumn("jaccard",
        round(col("_common").cast("double") /
          (size(col("_sh_a")) + size(col("_sh_b")) - col("_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Candidate near-dup pairs `(doc_a, doc_b)`, `doc_a < doc_b`, from a
    * streaming document frame `(doc_id, text)`. See the object doc for
    * the exact contract (candidates, possible repeats, bounded buckets). */
  def candidates(docs: DataFrame, k: Int = 3, threshold: Double = 0.7,
                 mode: HashMode = HashMode.Default,
                 maxBucket: Int = 64): DataFrame = {
    require(maxBucket > 1, "maxBucket must be at least 2")
    val spark = docs.sparkSession
    import spark.implicits._
    bandedSignatures(docs, k, mode)
      .select(col("doc_id").cast("long"), col("nsh").cast("long"),
        col("band").cast("int"), col("band_hash").cast("long"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), batch: Iterator[(Long, Long, Int, Long)],
         state: GroupState[List[(Long, Long)]]) => {
          var kept = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[(Long, Long)]
          batch.foreach { case (id, nsh, _, _) =>
            kept.foreach { case (oid, onsh) =>
              // the same size-ratio block the batch candidate join applies
              if (oid != id &&
                  math.min(nsh, onsh) >= threshold * math.max(nsh, onsh))
                out += ((math.min(id, oid), math.max(id, oid)))
            }
            if (kept.lengthCompare(maxBucket) < 0) kept = (id, nsh) :: kept
          }
          state.update(kept)
          out.result().iterator
        })
      .toDF("doc_a", "doc_b")
  }
}
