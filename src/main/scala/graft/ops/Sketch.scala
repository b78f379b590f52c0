package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-memory cardinality and frequency sketches: KMV ("k minimum
  * values") distinct-count estimation and a count-min frequency sketch.
  *
  * Why these are first-class training-data operators: corpus curation
  * constantly asks "how many distinct shingles / URLs / users does each
  * source contribute?" and "which tokens are heavy hitters?" — at 100 TB
  * the exact answers (`count(distinct …)`, a full vocabulary count) cost
  * a corpus-sized shuffle, while the sketched answers cost O(keys × k)
  * respectively O(d × w) state and ONE pass. Both sketches here are
  * mergeable (the basis of [[SketchIndex]], the build-once artifact
  * twin), so per-day summaries combine into per-year summaries without
  * re-reading the data — the reference's observation/metrics layer
  * records exactly this kind of per-version profile
  * (dc43 `integrations/spark/data_quality.py` metric collection), and
  * these sketches are its sublinear-state analogue.
  *
  * Determinism contract (what makes the DuckDB gates possible): a KMV
  * buffer is a pure function of the value SET under a fixed hash —
  * no RNG, no insertion-order dependence — and the estimator divides
  * exact integers. Under [[HashMode.Portable]] every hash is the 60-bit
  * md5 value the oracles recompute, so the estimates match bit-for-bit
  * across engines. [[HashMode.Default]] (codegen xxhash64) is the
  * production path when cross-engine replay is not needed.
  *
  * Stream admissibility: all three sketches below are valid Structured
  * Streaming aggregations as-is (complete/update mode) — the KMV
  * buffer, the CM grid, and the min-k quantile sample are semilattice
  * merges, so the streaming state after any prefix equals the batch
  * operator over the union of all batches, bit for bit
  * (StreamSketchSpec pins each). No separate streaming twin is needed.
  */
object Sketch {

  /** 2^60 — the size of the Portable hash domain. The KMV estimator
    * treats hashes as uniform draws from [0, Domain). */
  val Domain: Long = 1L << 60

  /** Per-group KMV sketch over a (group, value) stream: one row per
    * group with the k smallest distinct 60-bit hashes of `valueCol`
    * (ascending `kmv` array, ≤ k entries). Duplicate values hash
    * identically and occupy one slot — the sketch summarises the value
    * SET. Null values are dropped (no distinct identity to count).
    *
    * Scale shape: one projection (hash per row, codegen) into a bounded
    * [[TopK.MinKDistinct]] aggregation — partial aggregation reduces
    * every input partition to ≤ k longs per group before the exchange;
    * the value stream itself is never shuffled. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int, salt: String = "kmv",
                mode: HashMode = HashMode.Portable): DataFrame = {
    // k ≥ 2 also guarantees the estimator's divisor is nonzero: the k-th
    // smallest DISTINCT non-negative hash can only be 0 at position 1
    require(k >= 2, "k must be at least 2")
    val spark = df.sparkSession
    import spark.implicits._
    // null filter BEFORE hashing: the Portable family's concat_ws skips
    // null components, so a null value would otherwise hash as the bare
    // salt and count as a phantom distinct
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast(StringType).as("_kmv_g"),
        mode.hash(lit(salt), col(valueCol).cast(StringType)).as("_kmv_h"))
      .filter(col("_kmv_h").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK.minKDistinct(k))
      .toDF("group", "kmv")
  }

  /** Distinct-count estimates from a KMV sketch frame (`group`,
    * `kmv` ascending array): `(group, est_distinct LONG)`.
    *
    * A buffer that never filled (fewer than k distinct values) IS the
    * exact distinct count. A full buffer estimates
    * `(k-1) × Domain / kmv[k-1]` — the classic KMV estimator: if the
    * k-th smallest of n uniform draws from [0, D) sits at h, then
    * n ≈ (k-1)·D/h. The division is exact integer arithmetic
    * (DECIMAL(38,0) product, integral `div`), so any engine reproduces
    * the estimate bit-for-bit — no float rounding in the gate. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    sketch.select(col("group"),
      when(size(col("kmv")) < k, size(col("kmv")).cast(LongType))
        .otherwise(expr(
          s"(CAST(${k - 1} AS DECIMAL(38,0)) * CAST($Domain AS DECIMAL(38,0)))" +
            s" div CAST(element_at(kmv, $k) AS DECIMAL(38,0))"))
        .as("est_distinct"))
  }

  /** One-call per-group distinct estimate: [[kmvSketch]] → [[kmvEstimate]]. */
  def distinctKmv(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int, salt: String = "kmv",
                  mode: HashMode = HashMode.Portable): DataFrame =
    kmvEstimate(kmvSketch(df, groupCol, valueCol, k, salt, mode), k)
      .withColumnRenamed("group", groupCol)

  /** Per-group QUANTILE sketch: the k rows with the smallest 60-bit
    * hashes of `keyCol` form a UNIFORM without-replacement row sample
    * per group (min-k-by-hash — the same semilattice as the KMV buffer,
    * so sketches MERGE: the min-k of a union is the min-k of the two
    * min-k's; [[mergeQuantile]]), carrying `valueCol` alongside each
    * kept row. Nearest-rank order statistics of the sample estimate the
    * group's value quantiles in ONE pass with O(groups × k) state — the
    * 100 TB alternative to sorting the corpus (exact percentiles) or
    * approx_percentile (engine-specific buffers no oracle can replay).
    * Deterministic: no RNG, no insertion-order dependence — a pure
    * function of the row set under the fixed hash, so retries and
    * re-runs agree and the DuckDB gate can re-derive every sample row.
    *
    * `keyCol` must identify rows uniquely (it is what gets sampled);
    * `valueCol` must be exactly representable as LONG — fixed-point
    * scale decimals/lengths/counts before calling (a raw double would
    * make the gate engine-dependent through cast rounding).
    *
    * Scale shape: one hash projection into the bounded
    * [[TopK.MinKPairs]] aggregation — partial aggregation reduces every
    * input partition to ≤ k (hash, value) pairs per group before the
    * exchange; the corpus is never shuffled. */
  def quantileSketch(df: DataFrame, groupCol: String, keyCol: String,
                     valueCol: String, k: Int, salt: String = "qs",
                     mode: HashMode = HashMode.Portable): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast(StringType).as("_qs_g"),
        mode.hash(lit(salt), col(keyCol).cast(StringType)).as("_qs_h"),
        col(valueCol).cast(LongType).as("_qs_v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.minKPairs(k))
      .toDF("group", "sample")
  }

  /** Nearest-rank quantile estimates from a [[quantileSketch]] frame
    * (`group`, `sample`): for each percentile p the
    * `ceil(n·p/100)`-th smallest sampled value — spelled in exact
    * integer arithmetic (`(n·p + 99) div 100`) so any engine reproduces
    * the rank bit-for-bit. A buffer that never filled holds the WHOLE
    * group, making the estimates exact order statistics (same
    * exact-below-k posture as [[kmvEstimate]]). Output: `group`,
    * `n_sample`, and one `p<pct>` LONG column per requested pct. */
  def quantileEstimate(sketch: DataFrame,
                       pcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    val base = sketch
      .withColumn("_qs_vals", array_sort(expr("transform(sample, x -> x._2)")))
      .withColumn("n_sample", size(col("_qs_vals")).cast(LongType))
    pcts.foldLeft(base) { (acc, p) =>
      acc.withColumn(s"p$p",
        expr(s"element_at(_qs_vals, CAST((size(_qs_vals) * $p + 99) div 100 AS INT))"))
    }.select(col("group") +: col("n_sample") +: pcts.map(p => col(s"p$p")): _*)
  }

  /** Merge two quantile-sketch frames built with the SAME (k, salt,
    * mode) over DISJOINT row sets (each row sampled by exactly one
    * input — a row shared between inputs would occupy two slots, since
    * rows, unlike KMV's distinct values, have multiplicity): min-k over
    * the union of samples — the semilattice property that lets
    * per-shard/per-day sketches combine into corpus sketches without
    * re-reading data (SketchSpec pins merge ≡ sketch-of-union).
    *
    * `k` must be ≤ the k the INPUTS were built with: rows ranked past
    * the build k were already discarded at sketch time, so merging with
    * a larger k would return extra pairs that are NOT the min-k of the
    * union — a biased sample [[quantileEstimate]] cannot detect (the
    * build k is not recorded in the frame, so this contract cannot be
    * checked here; it is the same same-parameters discipline
    * [[cmEstimate]] states for (d, w, salt)). */
  def mergeQuantile(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = a.sparkSession
    import spark.implicits._
    a.unionByName(b)
      .select(col("group"), explode(col("sample")).as("p"))
      .select(col("group"), col("p._1").as("h"), col("p._2").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.minKPairs(k))
      .toDF("group", "sample")
  }

  /** Count-min sketch of a value stream: `d` independent hash rows ×
    * `w` buckets of exact counts — `(row, bucket, cnt)`, one output row
    * per NON-EMPTY counter (≤ d × w rows regardless of input size).
    * Row i's hash is the Portable/Default hash salted with `"$salt$i"`,
    * so the oracle can re-derive every bucket.
    *
    * Scale shape: a single map-side-combined groupBy over (row, bucket)
    * — the exchange carries ≤ d × w rows per input partition. The
    * sketch is mergeable by elementwise addition of `cnt` (same
    * (d, w, salt) required), which is what [[SketchIndex.mergeCm]]
    * exploits. */
  def countMin(df: DataFrame, valueCol: String, d: Int, w: Int,
               salt: String = "cm",
               mode: HashMode = HashMode.Portable): DataFrame = {
    require(d >= 1, "d (hash rows) must be at least 1")
    require(w >= 2, "w (buckets) must be at least 2")
    val rows = (0 until d).map { i =>
      struct(lit(i).as("row"),
        (mode.nonNegHash(lit(s"$salt$i"), col(valueCol).cast(StringType)) % w)
          .as("bucket"))
    }
    df.filter(col(valueCol).isNotNull)
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate lookups against a count-min frame: for each row of
    * `probes` (column `valueCol`, pre-deduplicated by the caller if
    * multiplicity matters), the minimum over the d hash rows of the
    * probed bucket's count — the standard CM upper-bound estimate
    * (never below the true count; above it only on bucket collisions).
    * Output: (`valueCol`, `est_count`). Probes must use the sketch's
    * (d, w, salt, mode). */
  def cmEstimate(cm: DataFrame, probes: DataFrame, valueCol: String,
                 d: Int, w: Int, salt: String = "cm",
                 mode: HashMode = HashMode.Portable): DataFrame = {
    require(d >= 1 && w >= 2, "estimate parameters must match the sketch")
    val rows = (0 until d).map { i =>
      struct(lit(i).as("row"),
        (mode.nonNegHash(lit(s"$salt$i"), col(valueCol).cast(StringType)) % w)
          .as("bucket"))
    }
    probes
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol), explode(array(rows: _*)).as("rb"))
      .select(col(valueCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      // inner join: countMin only materialises non-empty counters, but a
      // probe value was hashed into SOME bucket of every row — if the
      // counter is absent the count is 0, hence the coalesce via a left
      // join would matter only for probes never inserted; spell it left
      // so unseen probes estimate 0 instead of disappearing
      .join(cm, Seq("row", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Heavy hitters via count-min: distinct values of `valueCol` whose
    * CM estimate reaches `minShare` of the total stream count. The
    * candidate set here is the distinct values themselves (exact recall
    * — CM never underestimates, so no true heavy hitter is missed; a
    * collision can only promote a light value). At 100 TB the same
    * sketch serves a STREAMING heavy-hitter pass where candidates are
    * tracked in bounded state; the batch gate pins the estimator. */
  def heavyHitters(df: DataFrame, valueCol: String, d: Int, w: Int,
                   minShare: Double, salt: String = "cm",
                   mode: HashMode = HashMode.Portable): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    // the grid is ≤ d×w rows but closes over a corpus scan — cache it so
    // the estimate join and the total below share one pass; the stream
    // TOTAL is the row-0 counter sum (every value lands in exactly one
    // row-0 bucket), so no separate count() scan is needed
    val cm = Caching.ensureCachedLazy(countMin(df, valueCol, d, w, salt, mode))
    val total = cm.filter(col("row") === 0)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("_cm_total"))
    val probes = df.filter(col(valueCol).isNotNull).select(col(valueCol)).distinct()
    cmEstimate(cm, probes, valueCol, d, w, salt, mode)
      .crossJoin(broadcast(total))
      .filter(col("est_count") >= ceil(lit(minShare) * col("_cm_total")))
      .select(col(valueCol), col("est_count"))
  }
}
