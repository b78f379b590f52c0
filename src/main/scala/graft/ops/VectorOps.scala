package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity operators: cosine near-dup pairs, brute-force ANN,
  * and IVF-style clustered ANN.
  *
  * Dot products go through the codegen'd [[graft.functions.DotProduct]]
  * expression (sessions must install [[graft.functions.GraftExtensions]];
  * [[dotFold]] is the extension-free composable equivalent, bit-identical
  * results). Norms are precomputed once per row as a projection so pair
  * scoring is one multiply-divide per candidate. Scale shape: near-dup is
  * label-blocked (join key), brute-force ANN is broadcast(probes) × one
  * corpus scan (no shuffle of the corpus), IVF prunes the corpus to the
  * probed clusters.
  */
object VectorOps {

  /** array<float> → array<double>, so all scoring runs in double. */
  def vecD(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Native allocation-free dot product (requires GraftExtensions). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Composable fallback: same ascending-order accumulation, so results
    * are bit-identical to [[dot]] — usable on sessions without the
    * extension, at the cost of a zipped intermediate array per row. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Norm with the degenerate cases nulled ONCE per row: a zero norm
    * (undefined direction) or NaN norm (NaN/garbage components) becomes
    * NULL here, so every downstream cosine division is ANSI-safe by
    * construction — the divisor is either positive or null, never 0 —
    * and no NaN cosine can be born to outrank real scores. Paying this
    * at the ROW level is what lets the quadratic pair loops run a plain
    * round(dot/(na·nb)) with no per-pair nullif/isnan (measured ~25% of
    * q_dedup_semantic's wall clock at sf0.1). */
  private[ops] def safeNrm(n: Column): Column =
    when(!isnan(n) && n =!= 0.0, n)

  /** Corpus with vector cast to double and null-guarded norm (see
    * [[safeNrm]]) precomputed.
    *
    * The RAW norm is materialised through a Generate barrier (the
    * explode(array(..)) idiom NearDup's shingle pipeline uses) before the
    * guard wraps it: without the barrier, project-collapse would inline
    * the norm's whole defining expression — sqrt(graft_dot(v,v)) times
    * every branch of the guard — into EVERY downstream reference, and the
    * 16-centroid assignment lambda references nrm once per centroid in
    * interpreted (non-codegen) higher-order functions. Measured at sf0.1
    * that inlining more than doubled q_dedup_semantic (1.2 s → 2.8 s);
    * behind the barrier the norm is one dot product per row and the
    * guard is a CASE WHEN over a materialised attribute. */
  def prepared(embeddings: DataFrame, fanOut: Boolean = false): DataFrame =
    // fanOut (r16): the all-pairs grid miners downstream of SemDeDup's
    // cluster blocking are compute-bound per row and measured 42% faster
    // fanned; the literal-centroid scan paths (annBrute/IVF/k-means) are
    // already one cheap projection where the extra exchange measured
    // 30-60% SLOWER — so fanning is per-call-site, not blanket
    (if (fanOut) Parallel.fan(embeddings) else embeddings)
      .select(col("vec_id"), col("label"), vecD(col("embedding")).as("v"))
      .select(col("vec_id"), col("label"), col("v"),
        explode(array(l2norm(col("v")))).as("_nrm_raw"))
      .select(col("vec_id"), col("label"), col("v"),
        safeNrm(col("_nrm_raw")).as("nrm"))

  /** cosine rounded to 6 dp — rounding makes the value stable across
    * engines/evaluation orders for oracle comparison. Norms come from
    * [[safeNrm]] (null for zero/NaN), so the division can never raise
    * ANSI divide-by-zero and never produce NaN from a degenerate vector:
    * a null norm propagates to a null cosine, which every consumer drops
    * (threshold filters — null comparison is never true — TopK's
    * null-score drop, null-aware array_max/min_by seeding). */
  private[graft] def cosR(va: Column, na: Column, vb: Column, nb: Column): Column =
    round(dot(va, vb) / (na * nb), 6)

  /** Rademacher (±1-entry) hyperplanes for sign-LSH, a pure function of
    * `(nBits, dim, seed)` — factored out so the batch pair miner and the
    * streaming candidate path build BIT-IDENTICAL signatures (the stream
    * cannot sniff `dim` from data, so it takes it as a parameter and must
    * agree with the batch construction for the same corpus). */
  private[graft] def rademacherPlanes(nBits: Int, dim: Int,
                                      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Band values for sign-LSH over `v` (double array column): bit i is
    * `sign(v · r_i)`, packed `bandBits` at a time into one long per band.
    * A pure per-row projection — nBits codegen'd dot products, zero
    * shuffle — safe on batch and streaming frames alike. */
  private[graft] def lshBandExprs(v: Column, planes: Array[Array[Double]],
                                  bandBits: Int): Seq[Column] = {
    val bits = planes.toSeq.map { p =>
      (dot(v, array(p.map(lit).toSeq: _*)) >= 0).cast(LongType)
    }
    bits.grouped(bandBits).map { grp =>
      grp.zipWithIndex.map { case (b, j) => b * lit(1L << j) }.reduce(_ + _)
    }.toSeq
  }

  /** Embedding-cosine near-dup pairs, blocked by label, with a skew-proof
    * triangle-grid join inside each label.
    *
    * A plain `join on label` makes one task per label hold all n_l² pairs —
    * one hot label degrades to a straggling (or OOM-ing) task at corpus
    * scale. Each label is therefore cut into `g = ceil(n_l / targetBlock)`
    * buckets by `pmod(vec_id, g)` and the pair space into g(g+1)/2 cells:
    * a row in bucket i joins cells (i, i..g-1) as the left member and cells
    * (0..i, i) as the right member, so every unordered pair lands in exactly
    * one cell and every cell holds ≤ targetBlock² pairs. Replication is
    * ~g/2 = √(cells) per row — the classic exact all-pairs bound. Labels
    * smaller than targetBlock get g = 1: the plan degenerates to the plain
    * label join with zero overhead, and the output is identical for every g
    * (cosine is orientation-invariant: dot accumulates in dimension order
    * either way, so the swap to (least, greatest) ids is bit-stable).
    *
    * Exact low-threshold pair mining is inherently quadratic within a block;
    * for high thresholds (true near-dup), [[embeddingPairsLsh]] prunes the
    * pair space instead of just bounding the tasks. */
  def embeddingPairs(embeddings: DataFrame, threshold: Double = 0.35,
                     targetBlock: Int = 4096): DataFrame =
    gridPairs(prepared(embeddings, fanOut = true), "label", threshold,
      targetBlock)

  /** The triangle-grid all-pairs join over an arbitrary blocking column
    * (see [[embeddingPairs]] for the cell math) — shared by label-blocked
    * and cluster-blocked (SemDeDup) pair mining, and by
    * [[IvfIndex.semanticPairs]] over the physical layout. Expects
    * `(vec_id, v, nrm, blockCol)` columns. */
  /** `canonSet`, when set, is `(column, maxLen)`: the column holds EVERY
    * block the row belongs to (multi-probe assignment replicates rows
    * across blocks, at most `maxLen` of them): a pair is then emitted
    * only in the canonical block — the MINIMUM block id the two rows
    * share — so a pair whose members co-occur in several blocks still
    * comes out exactly once, with zero post-hoc `distinct` shuffle (the
    * same canonical-bucket trick the interval join uses).
    *
    * For `maxLen` ≤ [[CanonStaticMax]] the canonical test is a STATIC
    * maxLen² scalar-comparison tree over `get()` of the two arrays —
    * "no shared block id is smaller than this one" — which whole-stage
    * codegen compiles; the `array_min(array_intersect(...))` spelling it
    * replaces is a higher-order function Spark evaluates INTERPRETED per
    * candidate pair, i.e. inside the quadratic loop — the same pitfall
    * as [[nearestCidStatic]]/PQ.encodeExprStatic, measured ~2× on the
    * whole multi-probe query at sf0.1. */
  val CanonStaticMax = 8

  private[ops] def gridPairs(e: DataFrame, blockCol: String, threshold: Double,
                             targetBlock: Int,
                             canonSet: Option[(String, Int)] = None): DataFrame = {
    val canonSetCol = canonSet.map(_._1)
    val grids = e.groupBy(col(blockCol))
      .agg(ceil(count(lit(1)).cast(DoubleType) / targetBlock).cast(IntegerType).as("g"))
    val eg = e.join(broadcast(grids), Seq(blockCol))
      .withColumn("bkt", pmod(col("vec_id"), col("g")).cast(IntegerType))
    val canonA = canonSetCol.toSeq.map(c => col(c).as("_cs_a"))
    val canonB = canonSetCol.toSeq.map(c => col(c).as("_cs_b"))
    val a = eg.select(Seq(col(blockCol),
      col("bkt").as("ci"), explode(sequence(col("bkt"), col("g") - 1)).as("cj"),
      col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")) ++ canonA: _*)
    val b = eg.select(Seq(col(blockCol),
      explode(sequence(lit(0), col("bkt"))).as("ci"), col("bkt").as("cj"),
      col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")) ++ canonB: _*)
    val paired = a.join(b, Seq(blockCol, "ci", "cj"))
      .filter(col("ci") < col("cj") || col("id_a") < col("id_b"))
    val canonical = canonSet.fold(paired) { case (_, maxLen) =>
      if (maxLen <= CanonStaticMax) {
        // emit iff NO element shared by both probe sets is < this block.
        // Out-of-range get() is NULL; NULL terms OR together to NULL and
        // coalesce to false — absent probes impose no constraint.
        val smallerShared = (for { i <- 0 until maxLen; j <- 0 until maxLen }
          yield {
            val ai = get(col("_cs_a"), lit(i))
            (ai === get(col("_cs_b"), lit(j))) && (ai < col(blockCol))
          }).reduce(_ || _)
        paired.filter(!coalesce(smallerShared, lit(false)))
      } else
        paired.filter(col(blockCol) ===
          array_min(array_intersect(col("_cs_a"), col("_cs_b"))))
    }
    canonical
      .withColumn("cosine", cosR(col("va"), col("na"), col("vb"), col("nb")))
      // degenerate vectors carry a NULL norm (safeNrm), so their cosine
      // is NULL and the bare threshold comparison drops them — no
      // per-pair isnan needed in this quadratic loop
      .filter(col("cosine") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("vec_a"),
        greatest(col("id_a"), col("id_b")).as("vec_b"),
        col(blockCol), col("cosine"))
  }

  /** SemDeDup-style semantic dedup pairs: embedding near-duplicates
    * WITHIN coarse semantic clusters — unsupervised, the cluster
    * assignment (same zero-exchange centroid argmax the IVF family uses,
    * optionally Lloyd-refined) replacing [[embeddingPairs]]' label
    * blocking. Pair work is Σ n_c² over clusters instead of n² — at
    * 100 TB the cluster count is the knob that bounds the quadratic —
    * and within each cluster the triangle grid bounds per-task pair
    * space exactly as in [[embeddingPairs]]. A near-dup threshold
    * (≥ 0.9) is the SemDeDup-paper regime; cross-cluster near-dups
    * straddling a centroid boundary are missed — the standard trade,
    * mitigated by more `kmeansIters` or fewer, larger clusters. */
  def semanticPairs(embeddings: DataFrame, threshold: Double = 0.9,
                    nCentroids: Int = 16, kmeansIters: Int = 0,
                    literalMax: Int = CentroidLiteralMax,
                    targetBlock: Int = 4096,
                    spreadSeed: Boolean = false): DataFrame = {
    // NOT fanned: single-probe blocking keeps the grid light enough that
    // the extra exchange measured net-negative (unlike the multi-probe
    // variant below, whose replicated pair work is compute-bound)
    val e = prepared(embeddings)
    assignCids(e, nCentroids, kmeansIters, literalMax, spreadSeed) match {
      case None => e.limit(0)
        .select(col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
          col("vec_id").as("cid"), col("nrm").as("cosine"))
      case Some((_, _, assigned)) =>
        gridPairs(assigned, "cid", threshold, targetBlock)
    }
  }

  /** [[semanticPairs]] with multi-probe assignment: each vector joins its
    * `probes` NEAREST clusters (not just the argmax), so a near-dup pair
    * straddling a centroid boundary — the standard SemDeDup blind spot —
    * is still discovered as long as the two vectors share ANY of their
    * probed clusters. Recall at the boundary rises steeply with probes=2
    * (`SemanticMultiProbeSpec` measures it); pair work scales by at most
    * probes² per cluster, the explicit knob.
    *
    * Exactly-once output with no dedup shuffle: rows carry their full
    * probed-cluster set and [[gridPairs]] emits a pair only in the
    * MINIMUM shared cluster (`cid` in the output is that canonical
    * cluster). probes=1 degenerates to [[semanticPairs]] exactly.
    *
    * `probeMargin` makes the probing ADAPTIVE: a probe beyond the argmax
    * survives only when its cosine is within the margin of the best — an
    * interior vector (unambiguous assignment) costs a single replica and
    * only genuinely boundary vectors fan out, so replication tracks the
    * boundary fraction instead of a flat probes×. The default (2.0 ≥ any
    * cosine gap) keeps every probe; 0 degenerates to single-probe.
    * Recall is unchanged for any pair whose members sit within
    * `probeMargin` of their shared boundary — the pairs multi-probe
    * exists to recover (spec-pinned).
    *
    * Scale shape: the literal path stays zero-exchange per assignment
    * (top-probes picked inside the scan's projection); above `literalMax`
    * centroids the broadcast-join path scores against the centroid FRAME,
    * partial-aggregates a bounded top-probes per vector, and pays one
    * vec_id-keyed join to rehydrate vectors — the same cutover economics
    * as the argmax family. */
  def semanticPairsMultiProbe(embeddings: DataFrame, threshold: Double = 0.9,
                              nCentroids: Int = 16, probes: Int = 2,
                              kmeansIters: Int = 0,
                              literalMax: Int = CentroidLiteralMax,
                              targetBlock: Int = 4096,
                              spreadSeed: Boolean = false,
                              probeMargin: Double = 2.0): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    require(probeMargin >= 0, "probeMargin must be non-negative")
    val e = prepared(embeddings, fanOut = true)
    assignCidsMulti(e, nCentroids, probes, kmeansIters, literalMax, spreadSeed,
        probeMargin) match {
      case None => e.limit(0)
        .select(col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
          col("vec_id").as("cid"), col("nrm").as("cosine"))
      case Some(assigned) =>
        gridPairs(assigned, "cid", threshold, targetBlock,
          canonSet = Some(("cids", probes)))
    }
  }

  /** Top-`probes` cluster assignment: rows replicated once per probed
    * cluster (`cid`), each carrying the full probed set (`cids`) for
    * canonical-block pair emission. Ranking is the SAME rounded-cosine
    * DESC, cid ASC contract as the argmax paths — probes=1 reproduces
    * [[assignCids]]' assignment bit-for-bit. */
  private[ops] def assignCidsMulti(e: DataFrame, nCentroids: Int, probes: Int,
                              kmeansIters: Int, literalMax: Int,
                              spreadSeed: Boolean,
                              probeMargin: Double = 2.0): Option[DataFrame] = {
    val seeds =
      if (spreadSeed) seedCentroidsSpread(e, nCentroids)
      else seedLowestIds(e, nCentroids)
    val cents =
      if (kmeansIters > 0) refineCentroids(e, seeds, kmeansIters, literalMax, nCentroids)
      else seeds
    if (nCentroids > literalMax) {
      // an empty centroid frame falls through naturally: scored/sets are
      // empty, the join keeps nothing, gridPairs emits the empty frame
      val scored = e.select(col("vec_id"), col("v"), col("nrm"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          cosR(col("v"), col("nrm"), col("cv"), col("cn")).as("_pcos"))
      val ranked = TopK.topKPerKey(scored, "vec_id", "cid", "_pcos", probes)
      // adaptive probing inside the per-vec aggregation this path already
      // pays (no window, no extra shuffle): a probe beyond the argmax
      // survives only when its cosine is within probeMargin of the best
      val sets = ranked
        .groupBy(col("vec_id"))
        .agg(max(when(col("rank") === 1, col("_pcos"))).as("_mp_best"),
          collect_list(struct(col("rank"), col("cid"), col("_pcos"))).as("_mp_es"))
        .select(col("vec_id"),
          sort_array(transform(
            filter(col("_mp_es"), en => en.getField("rank") === 1 ||
              en.getField("_pcos") >= col("_mp_best") - probeMargin),
            en => en.getField("cid"))).as("cids"))
      Some(e.join(sets, Seq("vec_id"))
        .withColumn("cid", explode(col("cids")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"),
          col("cids"), col("cid")))
    } else centroidLiteral(cents).map { cl =>
      // adaptive probing, expression-level: keep ranked entry i iff it is
      // the argmax or within probeMargin of it (negcos ascending, so the
      // test is negcos <= best_negcos + margin). _mp_arr is materialised
      // through a Generate barrier ([[prepared]]'s explode(array(..))
      // idiom): `cids` references it twice, and without the barrier
      // project-collapse inlines the interpreted array_sort(transform(..))
      // assignment into both sites — 2× the per-row assignment cost.
      e.select(col("*"),
          explode(array(nearestClusterArray(cl, probes))).as("_mp_arr"))
        .withColumn("cids",
          transform(filter(col("_mp_arr"), s =>
            s.getField("negcos") <=
              element_at(col("_mp_arr"), 1).getField("negcos") + lit(probeMargin)),
            s => s.getField("cid")))
        .withColumn("cid", explode(col("cids")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"),
          col("cids"), col("cid"))
    }
  }

  /** Seeded (optionally Lloyd-refined) centroids plus the corpus cluster
    * assignment — the ONE spelling of the seed → refine → literal-vs-join
    * argmax dance, shared by the IVF search family and [[semanticPairs]]
    * so the paths cannot drift. Returns `(centroids, literal, assigned)`
    * where `literal` is the centroid array literal when the literal path
    * is active (callers reuse it for probe-side selection without a
    * second driver collect); None when no centroid can be seeded. */
  /** Below this many centroids the corpus-side argmax is a STATIC
    * `least()` over per-centroid struct expressions — each cosine a
    * codegen'd dot against a one-node vector literal — instead of the
    * `array_sort(transform(centroid-array-literal))` spelling, which
    * Spark evaluates INTERPRETED per row (higher-order functions never
    * enter whole-stage codegen). Same PQ-encoder trick
    * ([[PQ.encodeExprStatic]]); above the cutover the generated-code
    * size (k × dim-loop dots in one method) stops paying, so the
    * literal-array spelling keeps the 33..literalMax regime and the
    * broadcast join everything above. All three paths are
    * output-identical (rounded cosine DESC, cid ASC — `KMeansIvfSpec`
    * pins them). */
  val StaticArgmaxMax = 32

  /** Static argmax-cosine cid for collected centroid rows (cid, cv, cn) —
    * ties to the lower cid via the (negcos, cid) struct order, exactly
    * [[nearestClusterArray]]'s contract. */
  private[ops] def nearestCidStatic(rows: Array[org.apache.spark.sql.Row]): Column = {
    val entries = rows.sortBy(_.getLong(0)).map { r =>
      struct(
        (-cosR(col("v"), col("nrm"),
          typedLit(r.getSeq[Double](1)), lit(r.getDouble(2)))).as("negcos"),
        lit(r.getLong(0)).as("cid"))
    }
    val best = if (entries.length == 1) entries.head else least(entries.toSeq: _*)
    best.getField("cid")
  }

  private[ops] def assignCids(e: DataFrame, nCentroids: Int, kmeansIters: Int,
                         literalMax: Int, spreadSeed: Boolean)
      : Option[(DataFrame, Option[Column], DataFrame)] = {
    val seeds =
      if (spreadSeed) seedCentroidsSpread(e, nCentroids)
      else seedLowestIds(e, nCentroids)
    val cents =
      if (kmeansIters > 0) refineCentroids(e, seeds, kmeansIters, literalMax, nCentroids)
      else seeds
    if (nCentroids > literalMax)
      Some((cents, None, assignByJoin(e, cents, Seq("label", "v", "nrm"))))
    else {
      val rows = cents.select(col("cid"), col("cv"), col("cn")).collect()
      centroidLiteralOf(rows).map { cl =>
        val cidExpr =
          if (rows.length <= StaticArgmaxMax) nearestCidStatic(rows)
          else element_at(nearestClusterArray(cl, 1), 1).getField("cid")
        (cents, Some(cl), e
          .withColumn("cid", cidExpr)
          .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("cid")))
      }
    }
  }

  /** Cluster-balanced selection — the diversification step of D4-style
    * pipelines (Tirumala et al. 2023, "D4: Improving LLM Pretraining via
    * Document De-Duplication and Diversification"): assign every vector
    * to its nearest seeded centroid, then keep at most `cap` members per
    * cluster (lowest vec_id — the family's deterministic survivor rule),
    * bounding any one semantic region's share of the corpus.
    *
    * Scale shape: assignment is the zero-exchange centroid-literal
    * argmax ([[annIvf]]'s path — the cid is born in the scan's
    * projection); the quota is [[Curate.capPerSource]]'s bounded MinKIds
    * aggregation + broadcast semi-join, so nothing corpus-sized
    * shuffles. Output `(vec_id, cid)` for the survivors. */
  def clusterSample(embeddings: DataFrame, nCentroids: Int = 8,
                    cap: Int = 40, kmeansIters: Int = 0,
                    literalMax: Int = CentroidLiteralMax): DataFrame = {
    require(cap > 0, "cap must be positive")
    val e = prepared(embeddings)
    assignCids(e, nCentroids, kmeansIters, literalMax, spreadSeed = false) match {
      case None =>
        e.limit(0).select(col("vec_id"), col("vec_id").as("cid"))
      case Some((_, _, assigned)) =>
        Curate.capPerSource(assigned.select(col("vec_id"), col("cid")),
          cap, sourceCol = "cid", idCol = "vec_id")
    }
  }

  /** Approximate embedding near-dup pairs: random-hyperplane LSH candidate
    * generation + exact cosine verification, label kept as a secondary
    * blocking key. Candidates no longer scale with label skew — they scale
    * with the number of genuinely similar pairs.
    *
    * Signature bit i is `sign(v · r_i)` for a Rademacher (±1-entry)
    * hyperplane r_i derived from `seed` — a pure projection (nBits
    * codegen'd dot products per row, zero shuffle). Bits are banded
    * `bandBits` at a time; a pair is a candidate iff some band agrees
    * exactly (plus same label), then exact `cosR` keeps pairs ≥ threshold.
    *
    * Recall/pruning math (P[bit agrees] = 1 − θ/π): at cos θ = 0.35 a
    * 2-bit band agrees with p ≈ 0.38, so 15 bands miss a true pair with
    * prob (1−p)^15 ≈ 8·10⁻⁴ — but random near-orthogonal pairs collide
    * somewhere too (15·0.25 expected bands), so pruning is weak: LOW
    * thresholds are fundamentally not LSH-prunable; use [[embeddingPairs]]
    * there. At cos 0.8+ (true near-dup), 8-bit bands agree with p ≈ 0.16
    * while random pairs agree with p ≈ 0.004/band — 16 bands give ≥ 94%
    * recall at the 0.8 boundary (99.6% at 0.9) and prune ~94% of random
    * pairs. Defaults target that regime. */
  def embeddingPairsLsh(embeddings: DataFrame, threshold: Double = 0.8,
                        nBits: Int = 128, bandBits: Int = 8,
                        seed: Long = 42): DataFrame = {
    require(nBits % bandBits == 0, "nBits must be a multiple of bandBits")
    val e = prepared(embeddings)
    val firstDim = embeddings.select(size(col("embedding"))).limit(1).collect()
    if (firstDim.isEmpty) // empty corpus: no hyperplanes to build, no pairs
      return e.limit(0).select(col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
        col("label"), col("nrm").as("cosine"))
    val dim = firstDim.head.getInt(0)
    val planes = rademacherPlanes(nBits, dim, seed)
    val bands = lshBandExprs(col("v"), planes, bandBits)
    val banded = e.select(col("vec_id"), col("label"),
      posexplode(array(bands: _*)).as(Seq("band", "band_val")))
    val cand = banded.alias("x")
      .join(banded.alias("y"), Seq("label", "band", "band_val"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("label"), col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val ea = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cosine", cosR(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
  }

  /** Brute-force cosine top-k: broadcast the probe set against a single
    * corpus scan, rank per probe. Linear in corpus size, zero corpus
    * shuffle — the right baseline at any scale.
    *
    * Ranking is the bounded [[TopK.topKPerKey]] aggregation (same
    * `cosine DESC, id ASC` tiebreak as a row_number window, but
    * partial-aggregated): each scan partition reduces to ≤ topK rows per
    * probe before the exchange, so the shuffle carries O(probes × topK)
    * rows instead of funnelling the whole scored corpus into one task per
    * probe — the difference between shuffling the candidate set and
    * shuffling the answer at 100 TB.
    *
    * NaN contract (inherited by [[annIvf]] and PQ rerank): a zero-norm
    * embedding has NaN cosine against everything, and [[TopK.topKPerKey]]
    * DROPS NaN/null-scored rows rather than ranking them (a NaN in the
    * bounded buffer would sort partition-order-dependently). A window
    * `row_number` over `cosine DESC` would instead rank NaN first — so
    * zero-norm vectors silently vanish from top-k results here; filter
    * or repair them upstream if they must be surfaced. */
  def annBrute(embeddings: DataFrame, nProbes: Int = 10, topK: Int = 5): DataFrame = {
    val e = prepared(embeddings)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val scored = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosR(col("pv"), col("pn"), col("v"), col("nrm")))
    TopK.topKPerKey(scored, "probe_id", "vec_id", "cosine", topK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Radius search: every corpus vector within cosine ≥ `threshold` of
    * each probe — the fixed-similarity twin of [[annBrute]]'s fixed-count
    * top-k (the right primitive for "all near-duplicates of these
    * documents" / recall-complete retrieval, where top-k would truncate
    * dense neighborhoods and pad sparse ones).
    *
    * Scale shape is even simpler than top-k: broadcast(probes) × one
    * corpus scan with the threshold filter fused into the projection —
    * ZERO exchanges end to end, no ranking state at all; output size is
    * the true neighborhood size. Degenerate vectors carry a null norm
    * ([[safeNrm]]) and hence a null cosine, which the bare threshold
    * comparison drops — the same contract TopK.topKPerKey enforces for
    * the ranking paths. */
  def annRadius(embeddings: DataFrame, nProbes: Int = 10,
                threshold: Double = 0.3): DataFrame = {
    val e = prepared(embeddings)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosR(col("pv"), col("pn"), col("v"), col("nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** Driver-side centroid row for the literal — a named case class so
    * `typedLit` produces fields `cid`/`cv`/`cn` that the assignment
    * lambdas address by name. */
  private[ops] case class Centroid(cid: Long, cv: Seq[Double], cn: Double)

  /** Centroids collected to the driver (k rows of k×dim scalars —
    * legitimately tiny, never corpus data) and re-emitted as a literal
    * `array<struct<cid, cv, cn>>`, sorted by cid for a deterministic
    * expression. This is what lets cluster assignment be a pure projection:
    * no crossJoin row expansion, no window, zero exchange. */
  private[ops] def centroidLiteral(cents: DataFrame): Option[Column] =
    centroidLiteralOf(cents.select(col("cid"), col("cv"), col("cn")).collect())

  /** Same, from already-collected (cid, cv, cn) rows — callers that also
    * need the rows driver-side collect once and build both from it.
    *
    * ONE `typedLit` Literal carrying the whole array, not an
    * `array(struct(lit, …))` tree of k × dim scalar nodes: the values are
    * identical, but a k=16 × dim=64 tree is ~10³ expression nodes that
    * every analysis/optimization pass must walk (and the optimizer only
    * folds back into the single Literal this builds directly) — driver
    * CPU cost that scales with k×dim and, under a contended driver,
    * dominated the whole query's wall clock. A Literal is one node
    * regardless of k. */
  private[ops] def centroidLiteralOf(rows: Array[org.apache.spark.sql.Row]): Option[Column] = {
    val sorted = rows.sortBy(_.getLong(0))
    // an empty array literal would be unaddressable anyway — getField on
    // its elements has nothing to bind to — so the no-centroids case must
    // be handled by the caller (empty corpus / no vec_id below the seed
    // bound)
    if (sorted.isEmpty) None
    else Some(typedLit(sorted.toSeq.map { r =>
      Centroid(r.getLong(0), r.getSeq[Double](1), r.getDouble(2))
    }))
  }

  /** The `keep` nearest centroids of each row's `v`/`nrm`, as a sorted
    * array of `struct<negcos, cid>` — ascending (negcos, cid) is exactly
    * "cosine desc, cid asc". A pure projection over the centroid literal:
    * the argmax that previously forced a full shuffle of the k×-expanded
    * corpus (row_number over partitionBy(vec_id)) is now zero-exchange. */
  private[ops] def nearestClusterArray(centsLit: Column, keep: Int): Column =
    slice(array_sort(transform(centsLit, c =>
      struct((-cosR(col("v"), col("nrm"), c.getField("cv"), c.getField("cn"))).as("negcos"),
        c.getField("cid").as("cid")))), 1, keep)

  /** Above this many centroids the assignment switches from the
    * zero-exchange centroid-literal argmax to a broadcast-join argmax.
    * The literal embeds k × dim scalar literals into one expression —
    * ideal while small (assignment is born in the scan's projection, no
    * exchange at all), but thousands of embedded literals blow past JVM
    * method/constant-pool limits and fall out of codegen. The join path
    * broadcasts the centroid FRAME instead (k × dim doubles of data, not
    * code), expands each row k ways inside its task, and partial-aggregates
    * the argmax back to one row per vector before the single corpus-keyed
    * exchange. Both paths are argmax over the same rounded cosine with
    * ties on the lower cid — output-identical (StressTool proves it at
    * k = 1024; `KMeansIvfSpec` pins equivalence in tests). */
  val CentroidLiteralMax = 128

  /** Broadcast-join argmax assignment: rows (needing `vec_id`, `v`, `nrm`)
    * × broadcast(cents) → per-vector best cid via `max_by` partial
    * aggregation, carrying `carry` columns through (valid because vec_id
    * is unique, so every row of a group agrees on them). */
  private[ops] def assignByJoin(rows: DataFrame, cents: DataFrame,
                                carry: Seq[String]): DataFrame =
    rows.crossJoin(broadcast(cents))
      .withColumn("_acos", cosR(col("v"), col("nrm"), col("cv"), col("cn")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("_acos"), (-col("cid")).as("nc"))).as("cid"),
        carry.map(c => first(col(c)).as(c)): _*)
      .select((Seq("vec_id") ++ carry ++ Seq("cid")).map(col): _*)

  /** Lloyd k-means over the corpus, expressed as DataFrame ops: assign each
    * vector via an expression-level argmax over the centroid literal (one
    * corpus scan, no shuffle), then recompute centroids as element-wise
    * means (posexplode → groupBy (cluster, dim) → rebuild arrays with order
    * restored by sort_array). Each iteration is one corpus scan + one
    * (cluster, dim)-keyed shuffle whose size is k × dim — independent of
    * corpus size.
    *
    * Fully deterministic, the `dsum` way: seeds are the lowest vec_ids,
    * assignment ties break on cid, and the per-dim mean accumulates as
    * DECIMAL(25,6) — a double `avg` is shuffle-order-dependent in its last
    * ulp, which would make refined centroids (and every ranking computed
    * from them) flap between runs and diverge from an external oracle.
    * Rounding each component at scale 6 is engine-unambiguous: a binary
    * fraction can't terminate exactly halfway at a decimal digit, so
    * Spark's and DuckDB's double→decimal casts agree, and the unscaled
    * per-(cid, dim) sum stays far below 2^53 (|x| ≲ 10, so exactness holds
    * to ~10^8 vectors per cluster; beyond that raise the guard). */
  def kmeansCentroids(e: DataFrame, k: Int, iterations: Int,
                      literalMax: Int = CentroidLiteralMax): DataFrame =
    refineCentroids(e, seedLowestIds(e, k), iterations, literalMax, k)

  /** The original deterministic seed: the vectors with `vec_id < k`,
    * centroid id = vector id. */
  def seedLowestIds(e: DataFrame, k: Int): DataFrame =
    // null-norm rows (zero/NaN vectors, see safeNrm) can't serve as a
    // direction — excluding them keeps every centroid's cn positive, so
    // the literal's Centroid(cn: Double) never unboxes a null
    e.filter(col("vec_id") < k && col("nrm").isNotNull)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))

  /** Lloyd refinement from an explicit initial centroid frame
    * (cid, cv, cn): [[kmeansCentroids]] is this over [[seedLowestIds]];
    * [[seedCentroidsSpread]] feeds it balanced seeds. `k` is the nominal
    * centroid count driving the literal-vs-join assignment cutover. */
  def refineCentroids(e: DataFrame, init: DataFrame, iterations: Int,
                      literalMax: Int = CentroidLiteralMax,
                      k: Int = CentroidLiteralMax): DataFrame = {
    var cents = init.select(col("cid"), col("cv"), col("cn"))
    for (_ <- 0 until iterations) {
      val assigned =
        if (k > literalMax) assignByJoin(e, cents, Seq("v")).select(col("cid"), col("v"))
        else {
          val rows = cents.select(col("cid"), col("cv"), col("cn")).collect()
          if (rows.isEmpty) return cents.limit(0) // empty corpus: nothing to refine
          val cidExpr =
            if (rows.length <= StaticArgmaxMax) nearestCidStatic(rows)
            else element_at(nearestClusterArray(
              centroidLiteralOf(rows).get, 1), 1).getField("cid")
          e.select(cidExpr.as("cid"), col("v"))
        }
      cents = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(25, 6))).cast(DoubleType) /
          count(lit(1))).as("m"))
        .groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("cv"))
        .withColumn("cn", safeNrm(l2norm(col("cv"))))
        // a refined centroid with no usable direction (all-zero mean)
        // cannot attract vectors — drop it rather than carry a null cn
        .filter(col("cn").isNotNull)
    }
    cents
  }

  /** Deterministic farthest-point ("maxmin" — the k-means++ spreading
    * idea without its randomness) centroid seeding: start from the lowest
    * vec_id, then repeatedly pick the vector with the SMALLEST maximum
    * cosine to the centroids chosen so far (rounded to 6 dp; ties to the
    * lower vec_id) — the most dissimilar remaining direction. Lowest-id
    * seeding draws centroids from whatever corner of the space happens to
    * hold the first ids, which on clustered corpora leaves most vectors
    * assigned to a handful of nearby centroids — unbounded probe cost on
    * the hot cluster. Spread seeds cap cluster occupancy by construction
    * (StressTool prints the max/mean ratio on a skewed synthetic corpus).
    *
    * Cost: k − 1 driver-coordinated aggregation jobs of one corpus scan
    * each — a BUILD-TIME path for coarse-quantizer k (tens to low
    * thousands), not a per-query one. An exact duplicate of a chosen
    * centroid can never be picked (its max-cosine is 1, the sort's
    * ceiling), so a corpus with fewer than k distinct directions returns
    * fewer than k centroids rather than repeating one. Centroid id = the
    * seed's vec_id, like [[seedLowestIds]].
    *
    * Zero-norm vectors are excluded from seeding (the ranking paths' NaN
    * contract): a zero-norm seed scores NaN against EVERY vector, which
    * would poison each subsequent max-cosine pick and collapse the seed
    * set to one centroid. */
  def seedCentroidsSpread(e: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = e.sparkSession
    import spark.implicits._
    val cand = e.filter(col("nrm") > 0)
    val picked = scala.collection.mutable.ArrayBuffer.empty[Centroid]
    val firstRow = cand.select(
      min_by(struct(col("vec_id"), col("v"), col("nrm")), col("vec_id")).as("s"))
      .select(col("s.vec_id"), col("s.v"), col("s.nrm")).collect()
    if (firstRow.isEmpty || firstRow.head.isNullAt(0))
      return e.limit(0).select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    picked += Centroid(firstRow.head.getLong(0), firstRow.head.getSeq[Double](1),
      firstRow.head.getDouble(2))
    var exhausted = false
    while (picked.size < k && !exhausted) {
      val centsLit = typedLit(picked.toSeq)
      val maxCos = array_max(transform(centsLit, c =>
        cosR(col("v"), col("nrm"), c.getField("cv"), c.getField("cn"))))
      val nxt = cand.select(
        min_by(struct(col("vec_id"), col("v"), col("nrm")),
          struct(maxCos.as("mc"), col("vec_id"))).as("s"))
        .select(col("s.vec_id"), col("s.v"), col("s.nrm")).collect().head
      if (nxt.isNullAt(0) || picked.exists(_.cid == nxt.getLong(0))) exhausted = true
      else picked += Centroid(nxt.getLong(0), nxt.getSeq[Double](1), nxt.getDouble(2))
    }
    picked.toSeq.toDF("cid", "cv", "cn")
  }

  /** IVF-style ANN: deterministic centroid seed (lowest vec_ids), optional
    * Lloyd refinement, assign every vector to its nearest centroid via an
    * expression-level argmax over the centroid literal (one corpus scan,
    * ZERO exchange — the assignment column is born in the scan's projection),
    * then search only the `nProbeClusters` closest clusters per probe. At
    * scale the cluster assignment is the partition key, so a probe touches
    * ~nProbeClusters/nCentroids of the corpus.
    *
    * Inherits [[annBrute]]'s NaN contract: zero-norm embeddings score NaN
    * and are dropped from the ranking, not ranked first.
    *
    * `spreadSeed = true` swaps the lowest-id seeds for the farthest-point
    * [[seedCentroidsSpread]] — an eager, build-time-priced choice that
    * bounds hot-cluster occupancy on clustered corpora (composable with
    * `kmeansIters` refinement). */
  def annIvf(embeddings: DataFrame, nCentroids: Int = 16, nProbes: Int = 10,
             nProbeClusters: Int = 2, topK: Int = 5, kmeansIters: Int = 0,
             literalMax: Int = CentroidLiteralMax,
             spreadSeed: Boolean = false): DataFrame =
    ivfScored(embeddings, nCentroids, nProbes, nProbeClusters, kmeansIters,
        literalMax, spreadSeed) match {
      case None => emptyIvfResult(embeddings, withRank = true)
      case Some(scored) =>
        // bounded ranking: partial-aggregated top-k, O(probes × topK)
        // through the exchange — never one corpus-sized task per probe
        TopK.topKPerKey(scored, "probe_id", "neighbor_id", "cosine", topK)
          .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
    }

  /** IVF-pruned radius search — [[annRadius]]'s scale path: the probe only
    * scores its `nProbeClusters` nearest clusters, so the scan is pruned
    * the same way [[annIvf]] prunes top-k (and with [[IvfIndex]] layouts,
    * to probed PARTITIONS). Approximate exactly like annIvf is: neighbors
    * above the threshold living outside the probed clusters are missed —
    * the standard IVF recall trade. The threshold filter is fused into the
    * candidate projection; no ranking state at all. Degenerate rows
    * (null-norm → null cosine) drop in the threshold filter (see
    * [[annRadius]]). */
  def annIvfRadius(embeddings: DataFrame, threshold: Double = 0.3,
                   nCentroids: Int = 16, nProbes: Int = 10,
                   nProbeClusters: Int = 2, kmeansIters: Int = 0,
                   literalMax: Int = CentroidLiteralMax,
                   spreadSeed: Boolean = false): DataFrame =
    ivfScored(embeddings, nCentroids, nProbes, nProbeClusters, kmeansIters,
        literalMax, spreadSeed) match {
      case None => emptyIvfResult(embeddings, withRank = false)
      case Some(scored) =>
        scored.filter(col("cosine") >= threshold)
          .select(col("probe_id"), col("neighbor_id"), col("cosine"))
    }

  /** Empty result with the ANN output schema (no centroids: empty corpus
    * or no vec_id below the seed bound) — graceful, as the pre-literal
    * crossJoin formulation gave. */
  private def emptyIvfResult(embeddings: DataFrame, withRank: Boolean): DataFrame = {
    val e = prepared(embeddings).limit(0)
    if (withRank)
      e.select(col("vec_id").as("probe_id"), col("vec_id").as("neighbor_id"),
        col("vec_id").as("rank"), col("nrm").as("cosine"))
    else
      e.select(col("vec_id").as("probe_id"), col("vec_id").as("neighbor_id"),
        col("nrm").as("cosine"))
  }

  /** Scored in-cluster candidates shared by [[annIvf]] and
    * [[annIvfRadius]]: (probe_id, neighbor_id, cosine, …) for every
    * corpus vector in one of its probe's `nProbeClusters` nearest
    * clusters. None when no centroids can be seeded. */
  private def ivfScored(embeddings: DataFrame, nCentroids: Int, nProbes: Int,
                        nProbeClusters: Int, kmeansIters: Int,
                        literalMax: Int, spreadSeed: Boolean): Option[DataFrame] = {
    val e = prepared(embeddings)
    assignCids(e, nCentroids, kmeansIters, literalMax, spreadSeed).map {
      case (cents, litOpt, assigned) =>
        val probes = e.filter(col("vec_id") < nProbes)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
        val probeClusters = litOpt match {
          case None =>
            // large-k cutover (see CentroidLiteralMax): broadcast-join
            // argmax, bounded top-nProbeClusters for the probes
            val pScored = probes.crossJoin(broadcast(cents))
              .withColumn("_pcos", cosR(col("pv"), col("pn"), col("cv"), col("cn")))
              .select(col("probe_id"), col("cid"), col("_pcos"))
            TopK.topKPerKey(pScored, "probe_id", "cid", "_pcos", nProbeClusters)
              .select(col("probe_id"), col("cid"))
              .join(probes, Seq("probe_id"))
          case Some(centsLit) =>
            e.filter(col("vec_id") < nProbes)
              .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"),
                explode(nearestClusterArray(centsLit, nProbeClusters)).as("_sc"))
              .withColumn("cid", col("_sc").getField("cid"))
              .drop("_sc")
        }
        probeClusters
          .join(assigned.withColumnRenamed("vec_id", "neighbor_id"), Seq("cid"))
          .filter(col("neighbor_id") =!= col("probe_id"))
          .withColumn("cosine", cosR(col("pv"), col("pn"), col("v"), col("nrm")))
    }
  }
}
