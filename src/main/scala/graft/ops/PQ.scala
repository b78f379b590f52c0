package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011) — the memory-compression
  * scale path for vector search: each dim-D vector becomes M codes of
  * log2(K) bits (64 floats → 8 bytes at the defaults), and probe scoring
  * replaces the D-multiply dot product with M table lookups.
  *
  * Spark shape (the part that matters at 100 TB):
  *  - Codebook training is per-iteration ONE corpus scan + a
  *    (block, code, dim)-keyed aggregation of M×K×D/M scalars —
  *    corpus-size-independent shuffle, like the IVF k-means.
  *  - Encoding is a pure projection against the codebook literal
  *    (argmin via `array_sort` over `struct(dist, code)`, no shuffle).
  *  - Scoring: the probe set is collected (probes are few by definition),
  *    per-probe lookup tables `T[m][k] = dot(probe_m, c[m][k])` become one
  *    literal, and the approximate dot of every (row, probe) pair is M
  *    `element_at`s + adds inside the scan's projection — zero corpus
  *    shuffle, then a bounded [[TopK]] aggregation (O(probes × k') rows
  *    through the exchange).
  *  - Optional exact re-rank of the top `rerank × topK` candidates
  *    restores exact cosine ordering on the survivors.
  *
  * The direction is quantized, the norm is kept exact per row, so the
  * approximate score is `Σ_m T[m][code_m] / (|p| |v|)` — a cosine whose
  * numerator is PQ-approximated. */
object PQ {

  /** [m][k][dsub] codebooks. Deterministic: seeded from the lowest
    * `k` vec_ids' subvectors, optionally refined by Lloyd iterations
    * (empty codes keep their previous centroid). */
  def train(embeddings: DataFrame, m: Int = 8, k: Int = 16,
            iterations: Int = 2): Array[Array[Array[Double]]] = {
    val e = VectorOps.prepared(embeddings)
    val firstDim = embeddings.select(size(col("embedding"))).limit(1).collect()
    require(firstDim.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dim = firstDim.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val dsub = dim / m
    // seed from the first k vectors in vec_id order (NOT `vec_id < k`:
    // sparse or offset id spaces would under-fill the codebook and crash)
    val seeds = e.orderBy(col("vec_id")).limit(k).select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray.grouped(dsub).toArray)
    require(seeds.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val kEff = seeds.length // corpora smaller than k get a smaller codebook
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, kEff)((b, c) => seeds(c)(b))
    for (_ <- 0 until iterations) {
      val codes = encodeExprStatic(books)
      // one corpus scan: explode dims, key by (block, code, dim) — the
      // aggregation output is m*k*dsub scalars, independent of corpus size.
      // Means accumulate as DECIMAL(25,6) (the kmeansCentroids determinism
      // contract): a double avg is shuffle-order-dependent in its last
      // ulp, which would make codebooks — and every ANN ranking computed
      // from them — flap between runs
      val means = e.select(col("v"), codes.as("codes"))
        .select(col("codes"), posexplode(col("v")).as(Seq("i", "x")))
        .withColumn("block", (col("i") / dsub).cast(IntegerType))
        .withColumn("dim", col("i") % dsub)
        .withColumn("code", element_at(col("codes"), col("block") + 1))
        .groupBy(col("block"), col("code"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(25, 6))).cast(DoubleType) /
          count(lit(1))).as("c"))
        .collect()
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      books = next
    }
    books
  }

  /** Codebooks as a literal `array<array<array<double>>>` [m][k][dsub]. */
  private def booksLiteral(books: Array[Array[Array[Double]]]): Column =
    array(books.map(blk => array(blk.map(c => array(c.map(lit): _*)): _*)): _*)

  /** `array<int>` of per-block argmin-L2 codes for column `v` — a pure
    * projection (ascending `struct(dist, code)` sort per block).
    *
    * The comparison value is `‖c‖² − 2·s·c` — the L2 distance minus the
    * code-invariant `‖s‖²` term, expanded into the same codegen'd
    * ascending-order dot product both engines share and ROUNDED to 6 dp.
    * Not a zipped `Σ(x−y)²` fold: the expansion makes the floating-point
    * evaluation order identical in Spark and the DuckDB oracle (each term
    * one sequential dot, combined in one fixed a−2b order), and the
    * rounding pins the argmin's tie-break (ties go to the lower code) so
    * encoding is engine-exact — what lets `q_ann_pq` be hash-gated rather
    * than recall-gated. The same argmin mathematically; values within
    * 1e-6 of a tie may code differently than the unrounded fold, which no
    * consumer observes (codes are an internal quantization, scored
    * through the same tables). */
  private[ops] def encodeExpr(booksLit: Column, m: Int, dsub: Int): Column =
    array((0 until m).map { b =>
      val sub = slice(col("v"), b * dsub + 1, dsub)
      val scored = transform(element_at(booksLit, b + 1),
        (c, ci) => struct(
          round(VectorOps.dot(c, c) - lit(2.0) * VectorOps.dot(sub, c), 6).as("dist"),
          ci.as("code")))
      element_at(array_sort(scored), 1).getField("code")
    }: _*)

  /** [[encodeExpr]] as a STATIC expression tree: the codebook is a
    * driver-side constant, so the per-block argmin can be `least()` over
    * k `struct(dist, code)` expressions — every distance a codegen'd
    * [[VectorOps.dot]] against a one-node vector literal — instead of an
    * `array_sort(transform(...))` pair that Spark evaluates INTERPRETED
    * per row. Bit-identical scores: the `‖c‖²` term is folded driver-side
    * with the same ascending-fold IEEE adds the in-engine dot performs,
    * the `− 2·s·c` spelling and 6 dp round are unchanged, and struct
    * ordering breaks ties to the lower code exactly as the sorted array
    * did (`PQSpec` pins codes equal). Generated-code size is
    * m × k small dot loops — fine at PQ's k ≤ 64; the IVF assignment
    * keeps the literal-array spelling for its k ≤ 128 regime. */
  private[ops] def encodeExprStatic(books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val dsub = books.head.head.length
    array((0 until m).map { b =>
      val sub = slice(col("v"), b * dsub + 1, dsub)
      val entries = books(b).indices.map { ci =>
        val c = books(b)(ci)
        val cn2 = c.map(x => x * x).sum // same ascending IEEE fold as dot(c, c)
        struct(
          round(lit(cn2) - lit(2.0) * VectorOps.dot(sub, typedLit(c.toSeq)), 6).as("dist"),
          lit(ci).as("code"))
      }
      // least() wants >= 2 args; a 1-entry codebook (1-vector corpus)
      // trivially codes 0
      val best = if (entries.lengthCompare(1) == 0) entries.head
                 else least(entries: _*)
      best.getField("code")
    }: _*)
  }

  /** Corpus encoded to `(vec_id, label, nrm, codes)`. */
  def encode(embeddings: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val dsub = books.head.head.length
    VectorOps.prepared(embeddings)
      .select(col("vec_id"), col("label"), col("nrm"),
        encodeExprStatic(books).as("codes"))
  }

  /** Empty result in [[VectorOps.annBrute]]'s output schema — the graceful
    * degenerate for no-probe / no-centroid corpora (a zero-element literal
    * would fail analysis instead). */
  private[ops] def emptyAnnResult(e: DataFrame): DataFrame =
    e.limit(0).select(col("vec_id").as("probe_id"), col("vec_id").as("neighbor_id"),
      col("vec_id").as("rank"), col("nrm").as("cosine"))

  /** Collected probe rows (vec_id, v, nrm), id-sorted. */
  private[ops] def collectProbes(e: DataFrame, nProbes: Int): Array[org.apache.spark.sql.Row] =
    e.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), col("v"), col("nrm")).collect().sortBy(_.getLong(0))

  /** `T[p][m][k]` lookup-table literal: dot of probe p's block m with
    * codebook entry k (the trained codebook may be smaller than the
    * requested k on small corpora). */
  private[ops] def probeTablesLit(probeRows: Array[org.apache.spark.sql.Row],
                                  books: Array[Array[Array[Double]]]): Column = {
    val dsub = books.head.head.length
    val kEff = books.head.length
    val tables = probeRows.map { pr =>
      val pv = pr.getSeq[Double](1).toArray
      Array.tabulate(books.length, kEff) { (b, c) =>
        val sub = pv.slice(b * dsub, (b + 1) * dsub)
        sub.zip(books(b)(c)).map { case (x, y) => x * y }.sum
      }
    }
    array(tables.map(t => array(t.map(row => array(row.map(lit): _*)): _*)): _*)
  }

  /** Approximate dot of the row's `codes` against table `tP` — M
    * element_at lookups + adds. */
  private[ops] def approxDot(tP: Column, m: Int): Column =
    (0 until m).map { b =>
      element_at(element_at(tP, b + 1), element_at(col("codes"), b + 1) + 1)
    }.reduce(_ + _)

  /** Exact cosine re-rank of the candidate survivors (O(probes × pool)
    * rows — the corpus never reappears). Shared tail of the ANN paths.
    * Ranking via the bounded [[TopK.topKPerKey]] aggregation — harmless on
    * today's bounded pools, but it keeps the one-task-per-probe window
    * pattern out of the codebase entirely. */
  private def exactRerank(cands: DataFrame, e: DataFrame,
                          nProbes: Int, topK: Int): DataFrame =
    exactRerankWith(cands, e,
      e.filter(col("vec_id") < nProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"),
          col("nrm").as("pn")),
      topK)

  /** [[exactRerank]] generalised to an EXTERNAL probe frame
    * `(probe_id, pv, pn)` — what [[PqIndex.search]] needs, where probes
    * are arrivals rather than a corpus-id prefix. */
  private[ops] def exactRerankWith(cands: DataFrame, e: DataFrame,
                                   probes: DataFrame, topK: Int): DataFrame = {
    val rescored = cands.withColumnRenamed("vec_id", "neighbor_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("cosine",
        // nullif: zero norms yield NULL, not an ANSI division error
        // (see VectorOps.cosR); TopK drops null scores
        round(VectorOps.dot(col("pv"), col("v"))
          / nullif(col("pn") * col("nrm"), lit(0.0)), 6))
    TopK.topKPerKey(rescored, "probe_id", "neighbor_id", "cosine", topK)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** ANN over the encoded corpus: approximate-dot table scoring + bounded
    * top-k, then exact cosine re-rank of the `rerank × topK` survivors.
    * Output schema matches [[VectorOps.annBrute]]. */
  def annPq(embeddings: DataFrame, nProbes: Int = 10, topK: Int = 5,
            m: Int = 8, k: Int = 64, iterations: Int = 2,
            rerank: Int = 4): DataFrame = {
    val e = VectorOps.prepared(embeddings)
    // probe check BEFORE training: the degenerate no-probe case must not
    // pay `iterations` corpus scans for a discarded result
    val probeRows = collectProbes(e, nProbes)
    if (probeRows.isEmpty) return emptyAnnResult(e)
    val books = train(embeddings, m, k, iterations)
    val encoded = encode(embeddings, books)
    val tLit = probeTablesLit(probeRows, books)

    // per-row array of struct(probe, approx): M element_ats + adds per
    // probe, all inside the scan's projection — zero corpus shuffle
    // approx rounded to 6 dp like every cross-engine score in the repo:
    // the candidate-pool boundary tie-breaks on (approx DESC, id ASC),
    // and rounding is what makes that boundary engine-exact
    val perProbe = array(probeRows.zipWithIndex.map { case (pr, i) =>
      struct(lit(pr.getLong(0)).as("probe_id"),
        round(approxDot(element_at(tLit, i + 1), books.length) /
          (lit(pr.getDouble(2)) * col("nrm")), 6).as("approx"))
    }: _*)

    val scored = encoded
      .select(col("vec_id"), col("codes"), col("nrm"))
      .select(col("vec_id"), explode(perProbe).as("s"))
      .select(col("s.probe_id").as("probe_id"), col("vec_id"), col("s.approx").as("approx"))
      .filter(col("vec_id") =!= col("probe_id"))
    val cands = TopK.topKPerKey(scored, "probe_id", "vec_id", "approx", topK * rerank)
    exactRerank(cands, e, nProbes, topK)
  }

  /** IVF × PQ (the FAISS-IVFPQ composition, on raw vectors rather than
    * residuals): the coarse IVF assignment prunes the corpus to the
    * probed clusters — a zero-shuffle projection + a broadcast semi-join —
    * and PQ table lookups score only the survivors, so per-probe work is
    * ~`nProbeClusters/nCentroids` of the corpus at M lookups per row.
    * Same bounded top-k + exact re-rank tail as [[annPq]]. */
  def annIvfPq(embeddings: DataFrame, nCentroids: Int = 16, nProbes: Int = 10,
               nProbeClusters: Int = 2, topK: Int = 5,
               m: Int = 8, k: Int = 64, iterations: Int = 2,
               rerank: Int = 4): DataFrame = {
    val e = VectorOps.prepared(embeddings)
    // centroids collected ONCE: the same rows feed the assignment literal
    // and the driver-side probe-cluster selection
    val coarseRaw = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .collect()
    val coarseLit = VectorOps.centroidLiteralOf(coarseRaw).getOrElse(
      return emptyAnnResult(e))
    val probeRows = collectProbes(e, nProbes)
    if (probeRows.isEmpty) return emptyAnnResult(e)

    val books = train(embeddings, m, k, iterations)
    val dsub = books.head.head.length
    // one projection: coarse cluster + PQ codes, both expression-level
    val indexed = e.select(col("vec_id"), col("nrm"),
      (if (coarseRaw.length <= VectorOps.StaticArgmaxMax)
        VectorOps.nearestCidStatic(coarseRaw)
      else element_at(VectorOps.nearestClusterArray(coarseLit, 1), 1)
        .getField("cid")).as("cid"),
      encodeExprStatic(books).as("codes"))
    val tLit = probeTablesLit(probeRows, books)

    // probe → probed coarse clusters, computed on the driver from the
    // already-collected rows; rounding is BigDecimal HALF_UP at 6 dp —
    // bit-identical to the `cosR`/Spark `round` the cluster-assignment
    // expression uses, so probe- and corpus-side ranking can never
    // tie-break differently
    val spark = embeddings.sparkSession
    import spark.implicits._
    val coarseRows = coarseRaw.sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val probeClusters = probeRows.zipWithIndex.flatMap { case (pr, i) =>
      val pv = pr.getSeq[Double](1).toArray
      val pn = pr.getDouble(2)
      coarseRows.map { case (cid, cv, cn) =>
        val raw = pv.zip(cv).map { case (x, y) => x * y }.sum / (pn * cn)
        val cos = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (pr.getLong(0), i, pn, cid, cos)
      }.sortBy { case (_, _, _, cid, cos) => (-cos, cid) }
        .take(nProbeClusters)
    }.toSeq.toDF("probe_id", "t_idx", "pn", "cid", "ccos")

    val scored = indexed
      .join(broadcast(probeClusters.select("probe_id", "t_idx", "pn", "cid")), Seq("cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx",
        round(approxDot(element_at(tLit, col("t_idx") + 1), books.length) /
          (col("pn") * col("nrm")), 6))
      .select(col("probe_id"), col("vec_id"), col("approx"))
    val cands = TopK.topKPerKey(scored, "probe_id", "vec_id", "approx", topK * rerank)
    exactRerank(cands, e, nProbes, topK)
  }

  /** SemDeDup over PQ CODES: cluster-blocked near-dup pair mining where
    * the quadratic loop carries m small code ints (plus id and norm)
    * instead of the raw vector — at 100 TB the difference between
    * shuffling/holding ~32 bytes and ~dim×8 bytes per pair side. Pairs
    * are scored approximately from a driver-built codebook×codebook dot
    * table (`Σ_b X[b][ca][cb]`, exact decimal accumulation with per-term
    * 6 dp rounding — engine-reproducible, which is what lets a DuckDB
    * oracle gate this path end to end), prefiltered at
    * `threshold − margin`, and ONLY the surviving candidates rejoin
    * their raw vectors for the exact cosine that decides membership.
    * Output shape matches [[VectorOps.semanticPairs]]; with `margin`
    * covering the true quantization error the result is identical —
    * spec-measured, and the knob is explicit: larger margin = more
    * exact-verify work, never missed pairs beyond approximation error
    * above it.
    *
    * The candidate frame is small (near-dup-shaped) so the two verify
    * joins broadcast under AQE. Local-scale caveat: the triangle self-join
    * duplicates the encode subtree (two corpus encodes) and training adds
    * one more — at toy scale that overhead dominates and the coded path is
    * SLOWER than raw vectors; the win is shuffle/memory volume at corpus
    * scale, where codes would be persisted once (IvfIndex-style) rather
    * than recomputed per run. */
  def semanticPairsPq(embeddings: DataFrame, threshold: Double = 0.9,
                      margin: Double = 0.2, nCentroids: Int = 16,
                      m: Int = 8, k: Int = 16, iterations: Int = 1,
                      targetBlock: Int = 4096): DataFrame = {
    val e = VectorOps.prepared(embeddings)
    val empty = e.limit(0)
      .select(col("vec_id").as("vec_a"), col("vec_id").as("vec_b"),
        col("vec_id").as("cid"), col("nrm").as("cosine"))
    VectorOps.assignCids(e, nCentroids, 0, VectorOps.CentroidLiteralMax,
        spreadSeed = false) match {
      case None => empty
      case Some((_, _, assigned)) =>
        if (embeddings.isEmpty) return empty
        val books = train(embeddings, m, k, iterations)
        val dsub = books.head.head.length
        val kEff = books.head.length
        // flattened cross-table X[b][i][j] = dot(books(b)(i), books(b)(j))
        val cross = typedLit((for {
          b <- 0 until m; i <- 0 until kEff; j <- 0 until kEff
        } yield books(b)(i).zip(books(b)(j)).map { case (x, y) => x * y }.sum).toSeq)
        val enc = assigned.select(col("vec_id"), col("nrm"), col("cid"),
          encodeExprStatic(books).as("codes"))
        // triangle grid over codes (same cell math as VectorOps.gridPairs)
        val grids = enc.groupBy(col("cid"))
          .agg(ceil(count(lit(1)).cast(DoubleType) / targetBlock).cast(IntegerType).as("g"))
        val eg = enc.join(broadcast(grids), Seq("cid"))
          .withColumn("bkt", pmod(col("vec_id"), col("g")).cast(IntegerType))
        val a = eg.select(col("cid"), col("bkt").as("ci"),
          explode(sequence(col("bkt"), col("g") - 1)).as("cj"),
          col("vec_id").as("id_a"), col("codes").as("ca"), col("nrm").as("na"))
        val b = eg.select(col("cid"), explode(sequence(lit(0), col("bkt"))).as("ci"),
          col("bkt").as("cj"),
          col("vec_id").as("id_b"), col("codes").as("cb"), col("nrm").as("nb"))
        // approx dot: per-term 6 dp round into DECIMAL(25,6), summed as a
        // STATIC m-term expression tree (m is known at plan time) — exact,
        // order-independent, DuckDB-replicable, and codegen-able where an
        // aggregate() lambda would run interpreted on every pair of the
        // quadratic loop (measured 2× the whole query at sf0.1)
        val approxSum = (0 until m).map { blk =>
          round(element_at(cross,
            lit(blk * kEff * kEff) + element_at(col("ca"), blk + 1) * kEff +
              element_at(col("cb"), blk + 1) + 1), 6).cast(DecimalType(25, 6))
        }.reduce((x, y) => (x + y).cast(DecimalType(25, 6)))
        // decimal subtraction: `threshold - margin` in doubles is e.g.
        // 0.4-0.2 = 0.20000000000000004, which would disagree with an
        // oracle's literal 0.2 on exactly-boundary approx scores
        val cut = (BigDecimal(threshold) - BigDecimal(margin)).toDouble
        val cands = a.join(b, Seq("cid", "ci", "cj"))
          .filter(col("ci") < col("cj") || col("id_a") < col("id_b"))
          .withColumn("approx",
            round(approxSum.cast(DoubleType) / (col("na") * col("nb")), 6))
          .filter(col("approx") >= cut)
          .select(col("cid"), col("id_a"), col("id_b"))
        cands
          .join(e.select(col("vec_id").as("id_a"), col("v").as("va"),
            col("nrm").as("na")), Seq("id_a"))
          .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"),
            col("nrm").as("nb")), Seq("id_b"))
          .withColumn("cosine",
            round(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
          .filter(col("cosine") >= threshold)
          .select(least(col("id_a"), col("id_b")).as("vec_a"),
            greatest(col("id_a"), col("id_b")).as("vec_b"),
            col("cid"), col("cosine"))
    }
  }
}
