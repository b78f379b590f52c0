package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution statistics: grouped exact and approximate quantiles.
  *
  * The exact path (`percentile`) buffers every value of a group in its
  * aggregation state — right whenever per-group cardinality is bounded
  * (per-source length profiles, per-tenant latencies), and the one that
  * can be oracle-gated bit-for-bit. The approximate path
  * (`approx_percentile`, a mergeable digest with bounded state) is the
  * 100 TB default when groups are corpus-sized: same call shape, same
  * output schema, tunable accuracy — swap one method name when a group
  * stops fitting.
  *
  * Quantile fractions that are exact binary fractions (0.25, 0.5, 0.75)
  * make the linear interpolation exactly reproducible across engines;
  * fractions like 0.9/0.99 put a non-representable factor into the
  * interpolation and engines may differ in the last ulp (the 6 dp
  * rounding almost always absorbs it, but "almost" is not a gate).
  */
object Stats {

  private def pname(p: Double): String = {
    val b = (BigDecimal(p) * 100).underlying.stripTrailingZeros
    "p" + (if (b.scale <= 0) b.toBigInteger.toString
           else b.toPlainString.replace('.', '_'))
  }

  private def checkFractions(ps: Seq[Double]): Unit = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantile fractions must be in [0, 1]")
    // duplicate fractions (or fractions whose generated names collide,
    // e.g. 0.5 and 0.50 via copy-paste) would emit two identically-named
    // columns — any downstream select on the name fails with ambiguity
    require(ps.map(pname).distinct.size == ps.size,
      s"quantile fractions must be distinct, got ${ps.mkString(", ")}")
  }

  private def summarize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        ps: Seq[Double], q: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        q.as("_q"))
    ps.zipWithIndex.foldLeft(agg) { case (d, (p, i)) =>
      // cast: approx_percentile yields the input type (e.g. long), the
      // exact path yields double — pin one output schema for both
      d.withColumn(pname(p), round(element_at(col("_q"), i + 1).cast("double"), 6))
    }.drop("_q")
  }

  /** Exact grouped quantiles: one row per group with `n`, `min_v`,
    * `max_v`, and a rounded `p<NN>` column per requested fraction. */
  def groupedQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    checkFractions(ps)
    summarize(df, groupCols, valueCol, ps,
      percentile(col(valueCol), array(ps.map(lit): _*)))
  }

  /** [[groupedQuantiles]] through `approx_percentile` — bounded
    * aggregation state per group, the shape that survives corpus-sized
    * groups. `accuracy` is the standard inverse-error knob (10000 ≈
    * 0.01% rank error). */
  def groupedQuantilesApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
                             ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    checkFractions(ps)
    summarize(df, groupCols, valueCol, ps,
      approx_percentile(col(valueCol), array(ps.map(lit): _*), lit(accuracy)))
  }

  /** Population Stability Index of each group's `valueCol` distribution
    * against the overall corpus — the standard production drift metric
    * (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action):
    * `PSI_g = Σ_b (p_b − q_b) · ln(p_b / q_b)` over fixed-width value
    * bins, where p is the group's bin share and q the corpus's. The same
    * monitoring seam as `vocabDrift` (KL over the vocabulary), for
    * NUMERIC signals: length profiles, quality scores, LM scores across
    * sources or snapshots.
    *
    * A group share of zero (a corpus bin the group never hits) is
    * substituted with `eps` — PSI's standard zero-bin handling; corpus
    * shares are positive by construction (the bin domain IS the corpus's
    * bins). Null values are dropped. Determinism: shares are exact
    * integer ratios, each term rounds to 9 dp and sums as exact decimals,
    * the PSI rounds to 6 dp — the family's ln-parity contract.
    *
    * Scale shape: one binned aggregation over the corpus (map-side
    * combined, one row per (group, bin) through the exchange), then all
    * remaining work happens on (groups × bins)-sized frames — the
    * group×bin grid is built from two tiny aggregates, never the
    * corpus. */
  def psiByGroup(df: DataFrame, valueCol: String, groupCol: String,
                 binWidth: Long, eps: Double = 1e-6): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(eps > 0, "eps must be positive")
    val binned = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_grp"),
        floor(col(valueCol) / binWidth).cast("long").as("_bin"))
    val gb = binned.groupBy(col("_grp"), col("_bin"))
      .agg(count(lit(1)).as("_n_gb"))
    val g = gb.groupBy(col("_grp")).agg(sum(col("_n_gb")).as("_n_g"))
    val b = gb.groupBy(col("_bin")).agg(sum(col("_n_gb")).as("_n_b"))
    val tot = b.agg(sum(col("_n_b")).as("_n")).select(col("_n"))
    val grid = g.crossJoin(broadcast(b)).crossJoin(broadcast(tot))
      .join(gb, Seq("_grp", "_bin"), "left")
      .select(col("_grp"), col("_bin"), col("_n_g"), col("_n_b"), col("_n"),
        coalesce(col("_n_gb"), lit(0L)).as("_n_gb"))
    val p = greatest(col("_n_gb").cast("double") / col("_n_g"), lit(eps))
    val q = col("_n_b").cast("double") / col("_n")
    grid
      .select(col("_grp"),
        round((p - q) * log(p / q), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("_term"))
      .groupBy(col("_grp"))
      .agg(round(sum(col("_term")).cast("double"), 6).as("psi"))
      .select(col("_grp").as(groupCol), col("psi"))
  }

  /** Per-group equi-width histogram: `bin = floor(value / binWidth)`
    * (division and floor are correctly rounded IEEE ops — any engine
    * agrees bit for bit, the `psiByGroup` binning contract), with the
    * bin count and its 6 dp share of the group. The distribution-shape
    * profiling view quantiles compress away (modes, gaps, heavy tails).
    * Nulls are dropped. Scale shape: one map-side-combined aggregation,
    * one row per (group, bin) through the exchange, then the share join
    * happens on the (groups)-sized total frame — profiling cost, not
    * corpus cost. */
  def histogramByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_grp"),
        floor(col(valueCol) / binWidth).cast("long").as("bin"))
    val gb = binned.groupBy(col("_grp"), col("bin")).agg(count(lit(1)).as("n"))
    val g = gb.groupBy(col("_grp")).agg(sum(col("n")).as("_n_g"))
    gb.join(broadcast(g), Seq("_grp"))
      .select(col("_grp").as(groupCol), col("bin"), col("n"),
        round(col("n").cast("double") / col("_n_g"), 6).as("share"))
  }

  /** Robust per-group outlier flagging by median absolute deviation —
    * the production anomaly gate mean/stddev z-scores fail on (one
    * outlier inflates the stddev that is supposed to catch it; the
    * median and MAD are 50%-breakdown robust). A row is an outlier when
    * `|value − median| > k · MAD` (k = 3 ≈ 4.5σ under normality).
    *
    * Determinism: the group median and the MAD are rounded to 6 dp
    * BEFORE the comparison — exact-quantile interpolation is spelled
    * differently across engines in the last ulp (the `groupedQuantiles`
    * lesson), so the gate compares on the rounded values, which any
    * engine reproduces; `|v − med6|` and `k · mad6` are then single
    * correctly-rounded ops. A MAD of zero (> half the group at the
    * median) flags every value off the median — strict `>` keeps the
    * operator total. Output: the flagged rows with their group `med`
    * and `mad` for audit.
    *
    * Scale shape: two exact-percentile aggregations (per-group O(n)
    * state — profiling-grade; `groupedQuantilesApprox` is the
    * corpus-sized-group twin) and two broadcast joins of groups-sized
    * frames back onto the corpus — the corpus itself never shuffles. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCols: Seq[String], k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val vals = df.filter(col(valueCol).isNotNull)
    val med = vals.groupBy(col(groupCol))
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("med"))
    val withMed = vals.join(broadcast(med), Seq(groupCol))
      .withColumn("_dev", abs(col(valueCol) - col("med")))
    val mad = withMed.groupBy(col(groupCol))
      .agg(round(percentile(col("_dev"), lit(0.5)), 6).as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .filter(col("_dev") > lit(k) * col("mad"))
      .select((idCols.map(col) :+ col(groupCol) :+ col(valueCol) :+
        col("med") :+ col("mad")): _*)
  }

  /** Chi-square test of independence between two categorical columns —
    * the categorical companion to [[welchT]] (is language independent
    * of source? does variant correlate with outcome?). Observed counts
    * are exact integers; expected counts `rowTotal·colTotal/N` and the
    * `(o−e)²/e` terms run in doubles, each term 9 dp-rounded and
    * decimal-summed (the PSI/ln-parity contract), the statistic 6 dp.
    * Output: one row with chi2 and the (r−1)(c−1) degrees of freedom.
    * Scale shape: one (a, b) map-side-combined count, then ALL work on
    * the r×c grid — margins from the grid, never the corpus. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val ra = obs.groupBy(col("_a")).agg(sum(col("_o")).as("_ta"))
    val cb = obs.groupBy(col("_b")).agg(sum(col("_o")).as("_tb"))
    val tot = obs.agg(sum(col("_o")).as("_n"))
    // the FULL r×c grid (absent cells are observed 0, expected > 0)
    val grid = ra.crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
      .join(obs, Seq("_a", "_b"), "left")
      .select(col("_ta"), col("_tb"), col("_n"),
        coalesce(col("_o"), lit(0L)).as("_o"))
    // margins product through DECIMAL(38,0): a long product overflows
    // at ~10^9 × 10^9 margins; the exact product casts once to double
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = (col("_ta").cast(d38) * col("_tb").cast(d38)).cast(DoubleType) /
      col("_n")
    val term = round((col("_o") - e) * (col("_o") - e) / e, 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 9))
    val cells = grid.select(term.as("_t"))
      .agg(round(sum(col("_t")).cast(DoubleType), 6).as("chi2"))
    val dims = ra.agg(count(lit(1)).as("_r")).crossJoin(cb.agg(count(lit(1)).as("_c")))
    // Cramér's V from the ROUNDED chi2 (engine-safe): the scale-free
    // effect size in [0,1] — chi2 grows with n, V answers "how strong"
    val minDim = least(col("_r"), col("_c")) - 1
    cells.crossJoin(dims).crossJoin(broadcast(tot))
      .select(col("chi2"),
        ((col("_r") - 1) * (col("_c") - 1)).cast("bigint").as("df"),
        when(minDim < 1, lit(null))
          .otherwise(round(sqrt(col("chi2") /
            (col("_n").cast(DoubleType) * minDim)), 6)).as("cramers_v"))
  }

  /** Deterministic per-group mode: the most frequent `valueCol` with
    * "count DESC, value ASC" resolution — a single `min_by` over the
    * (−count, value) struct (the label-propagation spelling), never a
    * window over the value stream. Null values are excluded. Output:
    * group, mode, its count, and its 6 dp share of the group's non-null
    * rows. Scale shape: one (group, value) map-side-combined count,
    * then group-sized argmax + share frames. */
  def modeByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_n"))
    counts.groupBy(col(groupCol))
      .agg(min_by(struct(col(valueCol).as("v"), col("_n").as("n")),
          struct((-col("_n")).as("nc"), col(valueCol).as("vv"))).as("_win"),
        sum(col("_n")).as("_tot"))
      .select(col(groupCol), col("_win.v").as("mode"),
        col("_win.n").as("n"),
        round(col("_win.n").cast(DoubleType) / col("_tot"), 6).as("share"))
  }

  /** Median imputation: fill null `valueCol` rows with their group's
    * 6 dp-rounded median — the robust default for numeric gap filling
    * (a mean would chase the outliers the MAD/winsorize family exists
    * to contain). Output keeps the original value, the imputed value,
    * and a `was_imputed` audit flag; groups that are ALL null stay
    * null (flagged, nothing invented). Scale shape: one groups-sized
    * exact-percentile aggregation broadcast back — a pure projection
    * after one tiny join. */
  def imputeMedian(df: DataFrame, groupCol: String, valueCol: String,
                   idCols: Seq[String]): DataFrame = {
    val med = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("_med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .select((idCols.map(col) :+ col(groupCol) :+ col(valueCol) :+
        coalesce(col(valueCol), col("_med")).as("value_imputed") :+
        (col(valueCol).isNull && col("_med").isNotNull).as("was_imputed")): _*)
  }

  /** Welch's two-sample t statistic between two groups' `valueCol`
    * distributions, engine-exact: the A/B-comparison primitive
    * (does variant A move the metric?) built on the same exact
    * integer power sums as [[corrByGroup]]/[[momentsByGroup]] — means,
    * the `B = nΣx² − (Σx)²` variance numerators, and the count terms
    * are exact DECIMAL(38,0); the variance ratios, the t quotient and
    * the Welch–Satterthwaite degrees of freedom run in doubles with
    * every step correctly rounded (round 6 outputs). One conditional
    * single-pass aggregation (two FILTERed sum sets), one output row.
    * Degenerate inputs (a group with < 2 rows or zero variance in
    * both) yield null t/df rather than NaN. */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String, decimals: Int = 2): DataFrame = {
    require(decimals >= 0 && decimals <= 6, "decimals must be in [0, 6]")
    require(groupA != groupB, "groups must differ")
    val f = math.pow(10, decimals).toLong
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = expr(s"CAST(round(`$valueCol` * $f) AS DECIMAL(38,0))")
    def side(g: String, tag: String) = Seq(
      count(when(col(groupCol) === g, 1)).cast(d38).as(s"_n$tag"),
      sum(when(col(groupCol) === g, x)).as(s"_s1$tag"),
      sum(when(col(groupCol) === g, x * x)).as(s"_s2$tag"))
    val aggd = df.filter(col(valueCol).isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .agg((side(groupA, "a") ++ side(groupB, "b")).head,
        (side(groupA, "a") ++ side(groupB, "b")).tail: _*)
    def m(tag: String) =
      col(s"_s1$tag").cast(DoubleType) /
        (col(s"_n$tag").cast(DoubleType) * lit(f.toDouble))
    def v(tag: String) = {
      val b = col(s"_n$tag") * col(s"_s2$tag") - col(s"_s1$tag") * col(s"_s1$tag")
      b.cast(DoubleType) /
        ((col(s"_n$tag") * col(s"_n$tag") * (col(s"_n$tag") - 1)).cast(DoubleType) *
          lit((f * f).toDouble))
    }
    val degenerate = col("_na") < 2 || col("_nb") < 2
    val vSum = v("a") + v("b")
    val dfW = (vSum * vSum) /
      ((v("a") * v("a")) / (col("_na") - 1).cast(DoubleType) +
        (v("b") * v("b")) / (col("_nb") - 1).cast(DoubleType))
    aggd.select(
      lit(groupA).as("group_a"), lit(groupB).as("group_b"),
      col("_na").cast("bigint").as("n_a"), col("_nb").cast("bigint").as("n_b"),
      round(m("a"), 6).as("mean_a"), round(m("b"), 6).as("mean_b"),
      when(degenerate || vSum === 0.0, lit(null))
        .otherwise(round((m("a") - m("b")) / sqrt(vSum), 6)).as("t"),
      when(degenerate || vSum === 0.0, lit(null))
        .otherwise(round(dfW, 6)).as("df"))
  }

  /** The per-group `(med, mad)` calibration frame [[madOutliers]]
    * computes internally, exposed as a freezable artifact — compute it
    * once on a calibration corpus, persist it, and flag ANY frame
    * (batch or stream) statelessly with [[outlierFlagWith]]: the
    * compute-offline/flag-online production split (the `LmIndex
    * recordCuts` pattern for numeric anomaly gates). */
  def madStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull)
    val med = vals.groupBy(col(groupCol))
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("med"))
    vals.join(broadcast(med), Seq(groupCol))
      .withColumn("_dev", abs(col(valueCol) - col("med")))
      .groupBy(col(groupCol), col("med"))
      .agg(round(percentile(col("_dev"), lit(0.5)), 6).as("mad"))
      .select(col(groupCol), col("med"), col("mad"))
  }

  /** Stateless outlier flagging against FROZEN `(group, med, mad)`
    * stats — a stream-static broadcast join + pure projection, so it
    * runs unchanged on streaming frames (ingest-time anomaly gating).
    * Flagging the calibration frame itself reproduces [[madOutliers]]'s
    * flagged set exactly (spec-pinned); the point of the split is
    * gating NEW data against a frozen reference, where a self-computed
    * median would drift with the anomalies it is supposed to catch. */
  def outlierFlagWith(df: DataFrame, stats: DataFrame, groupCol: String,
                      valueCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Per-group rank normalization: `percent_rank` of `valueCol` within
    * its group — the uniform-[0,1] feature transform (rank features are
    * outlier-immune where z-scores are not; the winsorize/MAD family's
    * *transform* member). Ties share a rank (standard percent_rank);
    * ranks round at 6 dp; `(value, id)`-ordered so equal values with
    * different ids stay deterministic in output order semantics. Scale
    * shape: one per-group window (hash + sort exchange, the
    * sessionization shape) — per-GROUP ordering, never a global sort;
    * groups are the parallelism unit. */
  def rankNormalize(df: DataFrame, groupCol: String, valueCol: String,
                    idCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    df.filter(col(valueCol).isNotNull)
      .select((idCols.map(col) :+ col(groupCol) :+ col(valueCol) :+
        round(percent_rank().over(w), 6).as("rank_norm")): _*)
  }

  /** Functional-dependency violation report for a candidate rule
    * `lhs → rhs`: every `lhs` value that maps to MORE than one distinct
    * `rhs`, with its row count and the distinct-rhs count — the
    * dependency-discovery signal contract drafting wants before it
    * writes a uniqueness or consistency expectation (`q_metrics_unique`
    * checks a DECLARED key; this finds where a PROPOSED rule breaks).
    * Null-safe: a null rhs counts as its own value (a key mapping to
    * {X, null} IS inconsistent). Scale shape: one map-side-combined
    * aggregation keyed by lhs, one row per lhs group through the
    * exchange, output only the violators. */
  def fdViolations(df: DataFrame, lhsCols: Seq[String],
                   rhsCol: String): DataFrame = {
    require(lhsCols.nonEmpty, "lhsCols must not be empty")
    // count_distinct skips nulls: count the null class via max(isnull)
    df.groupBy(lhsCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (countDistinct(col(rhsCol)) +
          max(col(rhsCol).isNull.cast("int"))).as("n_distinct_rhs"))
      .filter(col("n_distinct_rhs") > 1)
  }

  /** Candidate-key uniqueness profile: for each proposed key column,
    * the exact distinct count, the 6 dp uniqueness ratio, and whether
    * it IS a key (distinct == rows, null-free) — the primary-key
    * discovery pass feeding contract drafting. One aggregation per
    * candidate over a shared cached projection; each is map-side
    * combined with one row through its exchange. */
  def keyProfile(df: DataFrame, candidates: Seq[String]): DataFrame = {
    require(candidates.nonEmpty, "candidates must not be empty")
    val frames = candidates.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(c)).as("n_distinct"),
        sum(col(c).isNull.cast("long")).as("n_null"))
        .select(lit(c).as("column"), col("n_rows"), col("n_distinct"),
          col("n_null"),
          round(col("n_distinct").cast(DoubleType) / col("n_rows"), 6)
            .as("uniqueness"),
          (col("n_distinct") === col("n_rows") && col("n_null") === 0)
            .as("is_key"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** Per-group distribution-shape moments from EXACT integer power
    * sums: mean, population skewness `g1 = A / (B·√B)` and excess
    * kurtosis `g2 = C / B² − 3` where (with values fixed-pointed at
    * `decimals` and S1..S4 the raw power sums in DECIMAL(38,0))
    * `A = n²S3 − 3nS1S2 + 2S1³`, `B = nS2 − S1²`,
    * `C = n³S4 − 4n²S1S3 + 6nS1²S2 − 3S1⁴` — the fixed-point scale
    * cancels in both ratios. The tail-shape completion of the
    * profiling suite (PSI drift, corr, quantile spread): skew says
    * which way the tail leans, kurtosis whether outlier mass exists
    * at all. Like [[corrByGroup]], built-in `skewness`/`kurtosis`
    * accumulate doubles in shuffle order (last-ulp nondeterminism);
    * here every sum and difference is exact integer arithmetic and
    * only the final divide (+ one sqrt) runs in doubles — each step
    * correctly rounded, any engine agrees bit for bit.
    *
    * Magnitude bound (CHECKED, groups-sized): every term in A/B/C is
    * bounded by `6·(n·max|x·10^d|)⁴` (e.g. `n³S4 ≤ n³·n·max|x|⁴ =
    * (n·max|x|)⁴`), so the exact-arithmetic envelope is
    * `n·max|x·10^d| ≤ 2·10⁹` — then every product stays under
    * 9.6·10³⁷ < 10³⁸. Outside it, non-ANSI DECIMAL(38,0) would
    * silently null the product and report a wrong (null) kurtosis, so
    * the operator raises instead: max|x| rides along in the same
    * aggregation and a per-group `raise_error` guard fails LOUDLY,
    * telling the caller to lower `decimals` (the statistic is then
    * defined on the fixed-point values, the [[corrByGroup]]
    * convention). Zero-variance groups yield nulls. Scale shape: one
    * map-side-combined aggregation, one row per group through the
    * exchange; the guard is a groups-sized projection. */
  def momentsByGroup(df: DataFrame, groupCol: String, valueCol: String,
                     decimals: Int = 1): DataFrame = {
    require(decimals >= 0 && decimals <= 2, "decimals must be in [0, 2]")
    val f = math.pow(10, decimals).toLong
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = expr(s"CAST(round(`$valueCol` * $f) AS DECIMAL(38,0))")
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_grp"), x.as("_x"))
      .groupBy(col("_grp"))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_s1"),
        sum(col("_x") * col("_x")).as("_s2"),
        sum(col("_x") * col("_x") * col("_x")).as("_s3"),
        sum(col("_x") * col("_x") * col("_x") * col("_x")).as("_s4"),
        max(abs(col("_x"))).as("_mx"))
    val s1 = col("_s1"); val s2 = col("_s2")
    val s3 = col("_s3"); val s4 = col("_s4")
    // loud envelope guard (see scaladoc): past n·max|x| = 2e9 the
    // quartic products would overflow DECIMAL(38,0) and silently null.
    // The guard rides INSIDE the n every output uses (+0 when in
    // envelope) — an output-only guard column would be removed by
    // column pruning whenever the caller doesn't select it, silently
    // restoring the wrong-null behavior it exists to prevent.
    val gate = when(col("_n") * col("_mx") <= lit(2000000000L).cast(d38),
        lit(0L).cast(d38))
      .otherwise(raise_error(concat(
        lit("momentsByGroup: group "), col("_grp").cast("string"),
        lit(" exceeds the exact-arithmetic envelope (n*max|x*10^d| > 2e9)"),
        lit(" - lower `decimals`"))).cast(d38))
    val n = col("_n") + gate
    val bB = (n * s2 - s1 * s1).cast(DoubleType)
    val aA = (n * n * s3 - lit(3) * n * s1 * s2 + lit(2) * s1 * s1 * s1)
      .cast(DoubleType)
    val cC = (n * n * n * s4 - lit(4) * n * n * s1 * s3 +
      lit(6) * n * s1 * s1 * s2 - lit(3) * s1 * s1 * s1 * s1).cast(DoubleType)
    agg.select(col("_grp").as(groupCol), n.cast("bigint").as("n"),
      round(s1.cast(DoubleType) / (n.cast(DoubleType) * lit(f.toDouble)), 6)
        .as("mean"),
      when(n * s2 - s1 * s1 === 0, lit(null))
        .otherwise(round(aA / (bB * sqrt(bB)), 6)).as("skewness"),
      when(n * s2 - s1 * s1 === 0, lit(null))
        .otherwise(round(cC / (bB * bB) - lit(3.0), 6)).as("kurtosis"))
  }

  /** Per-group Tukey-fence winsorization: clip `valueCol` into
    * `[p25 − k·IQR, p75 + k·IQR]` (k = 1.5, the classic outlier fence) —
    * the *repair* companion to [[madOutliers]]'s *flagging*: heavy tails
    * get bounded instead of dropped, the standard pre-training treatment
    * for numeric features and quality scores.
    *
    * Determinism: quarter-fraction quantiles interpolate with exact
    * binary factors (the `groupedQuantiles` contract) and still round to
    * 6 dp before the fence arithmetic; the fences and the clip
    * (`least`/`greatest`) are then single correctly-rounded ops any
    * engine reproduces. Scale shape: one exact-percentile aggregation
    * (groups-sized) broadcast back over the corpus — a pure projection
    * after one tiny join, no corpus shuffle. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                idCols: Seq[String], k: Double = 1.5): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val vals = df.filter(col(valueCol).isNotNull)
    val fences = vals.groupBy(col(groupCol))
      .agg(round(percentile(col(valueCol), lit(0.25)), 6).as("_p25"),
        round(percentile(col(valueCol), lit(0.75)), 6).as("_p75"))
      .select(col(groupCol),
        (col("_p25") - lit(k) * (col("_p75") - col("_p25"))).as("_lo"),
        (col("_p75") + lit(k) * (col("_p75") - col("_p25"))).as("_hi"))
    vals.join(broadcast(fences), Seq(groupCol))
      .select((idCols.map(col) :+ col(groupCol) :+ col(valueCol) :+
        least(greatest(col(valueCol), col("_lo")), col("_hi")).as("clipped") :+
        (col(valueCol) < col("_lo") || col(valueCol) > col("_hi")).as("was_clipped")): _*)
  }

  /** Per-group Pearson correlation, engine-exact: is a signal worth its
    * storage (does quality score predict LM score? does length predict
    * dedup survival?) — the profiling question next to drift (PSI) and
    * spread (quantiles). Built-in `corr` accumulates doubles in shuffle
    * order (last-ulp nondeterminism, the same reason the engine has
    * `dsum`), so this computes the five power sums EXACTLY instead:
    * values fixed-pointed at `decimals` (`round(x·10^d)` — correctly
    * rounded in any IEEE engine), all sums and the three
    * `n·Σ − Σ·Σ` differences in DECIMAL(38,0) integer arithmetic, and
    * only the final quotient in doubles (cast exact integers, one
    * multiply, one sqrt, one divide, round 6 — every step correctly
    * rounded, so any engine agrees bit for bit). A zero-variance side
    * yields null, not NaN.
    *
    * Magnitude bound (documented, not checked row-wise): with
    * |x|·10^d < 10^9 and < 10^9 rows per group every term stays under
    * 10^36 < DECIMAL(38,0); the guard `require`s d ≤ 6. Scale shape:
    * one map-side-combined aggregation, one row per group through the
    * exchange — profiling cost, not corpus cost. */
  def corrByGroup(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                  decimals: Int = 2): DataFrame = {
    require(decimals >= 0 && decimals <= 6, "decimals must be in [0, 6]")
    val f = math.pow(10, decimals).toLong
    def fix(c: String) = expr(s"CAST(round(`$c` * $f) AS DECIMAL(38,0))")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // fanned: six DECIMAL(38,0) products per row is compute-bound map
    // work, and the small-sf lineitem scan arrives row-group-bound
    Parallel.fan(df).filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("_grp"), fix(xCol).as("_x"), fix(yCol).as("_y"))
      .groupBy(col("_grp"))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
      .select(col("_grp").as(groupCol), col("_n").cast("bigint").as("n"),
        when(col("_n") * col("_sxx") - col("_sx") * col("_sx") === 0 ||
             col("_n") * col("_syy") - col("_sy") * col("_sy") === 0, lit(null))
          .otherwise(round(
            (col("_n") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
              sqrt((col("_n") * col("_sxx") - col("_sx") * col("_sx")).cast("double") *
                   (col("_n") * col("_syy") - col("_sy") * col("_sy")).cast("double")),
            6)).as("corr"))
  }
}
