package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytic query surface: the engine must run arbitrary SQL-shaped
  * workloads (the reference routes custom SQL `query` expectations through
  * Spark — dc43 `spark/data_quality.py:161-196`), so these exercise joins,
  * aggregation, windows, and event-time grouping at TPC-H shape.
  *
  * Determinism note: double sums are order-dependent under shuffle, so every
  * money aggregate goes through an exact decimal accumulation
  * (`dsum`) and is only cast back to double at the end — bit-stable across
  * partitionings and bit-equal to the DuckDB oracle computing the same way.
  */
object Analytics {

  /** Exact decimal sum of a double expression, returned as double.
    * Scale 4 keeps the unscaled sum < 2^53 through ~sf10 money totals, so
    * the decimal→double conversion is exact in both Spark and DuckDB (an
    * unscaled value beyond 2^53 rounds differently between engines). */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(25, scale))).cast(DoubleType)

  /** Exact decimal sum at `accScale`, rounded to `outScale` in decimal
    * space before the double cast. Use when the addend has more true
    * decimal digits than `dsum`'s scale 4 (e.g. price×disc×tax = 6 dp):
    * per-row rounding below the addend's true scale is engine-ambiguous,
    * while rounding the final sum is exact in both. */
  def dsumRound(c: Column, accScale: Int = 6, outScale: Int = 2): Column =
    round(sum(c.cast(DecimalType(25, accScale))), outScale).cast(DoubleType)

  /** TPC-H Q1-style pricing summary. One scan, partial aggregation
    * map-side; the shipdate filter pushes down to the parquet scan. */
  def q1Pricing(lineitem: DataFrame): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge    = discPrice * (lit(1) + col("l_tax"))
    // fanned (r16): seven exact-decimal aggregates per row are
    // compute-bound map work; the filter still pushes to the scan below
    // the (size-gated) repartition
    graft.ops.Parallel.fan(lineitem)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsumRound(charge).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style: 3-way join, aggregate, top-N. Segment/date filters
    * push to the scans; AQE broadcast-joins the filtered dims at small SF
    * while the plan stays shuffle-join-correct at 100 TB. */
  def q3TopN(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1997-06-15").cast(TimestampType)
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style star join. region/nation are tiny at any scale →
    * explicit broadcast; the customer⨝orders⨝lineitem spine shuffles on
    * its join keys. */
  def q5Join5(region: DataFrame, nation: DataFrame, customer: DataFrame,
              supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    region.filter(col("r_name") === "ASIA")
      .join(broadcast(nation), col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
                      col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Latest lineitem per supplier — row_number window with a total
    * deterministic ordering (shipdate, orderkey, linenumber). */
  def windowLatest(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc)
    lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate"), col("l_extendedprice"))
  }

  /** Tumbling 1-hour window aggregation over events — the batch twin of
    * the watermarked streaming aggregation in graft.stream. */
  def eventsWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value"), 6).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))

  /** Gap-based sessionization, batch formulation — the lag-window twin of
    * the streaming `Sessionize` operator: a session breaks where the gap
    * to the previous event exceeds `gapMinutes`; a running sum of breaks
    * numbers the sessions per user. Two window passes + one aggregation,
    * all partitioned by user. Unstamped (null ts) events are dropped —
    * they have no place on a session timeline, and engines disagree on
    * NULL ordering inside windows. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    val tsUs = graft.ops.RangeJoin.epochMicros(col("ts"))
    val prev = lag(tsUs, 1).over(w)
    val brk = when(prev.isNull || tsUs - prev > gapUs, 1L).otherwise(0L)
    events
      .filter(col("ts").isNotNull)
      .withColumn("brk", brk)
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value"), 6).as("sum_value"))
  }

  /** Gap-filled time-bucket resampling per user: every bucket between a
    * user's first and last event exists in the output — zero-filled when
    * empty — so downstream rate/trend math never mistakes "no row" for
    * "no data". Buckets are integral indexes (`epochMicros div width`),
    * not timestamps: exact in any engine and free of timezone-type
    * drift. Scale shape: one aggregation for per-user spans, a
    * `sequence`-explode of each span (output rows = Σ span lengths —
    * sized by retention × bucket width, the caller's explicit knob, and
    * generated distributed, never on the driver), and one left join back
    * to the bucket aggregates on (user, bucket). */
  def resample(events: DataFrame, bucketMinutes: Int = 60): DataFrame = {
    require(bucketMinutes > 0, "bucketMinutes must be positive")
    val widthUs = bucketMinutes * 60L * 1000000L
    val e = events.filter(col("ts").isNotNull)
      .select(col("user_id"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("_us"), col("value"))
      .select(col("user_id"), expr(s"_us div ${widthUs}L").as("bucket"), col("value"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col("user_id"), explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    val agg = e.groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
    grid.join(agg, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Ordered funnel: per user, the earliest occurrence of each stage
    * STRICTLY AFTER the previous stage's match — the sequential-pattern
    * question sessionization and windows cannot answer ("viewed, then
    * clicked after the view, then purchased after the click").
    * Determinism: stage matches order by (ts, event_id) so concurrent
    * events resolve identically everywhere; `stage` counts completed
    * stages. Scale shape: one (user, type)-filtered frame per stage,
    * each reduced by a `min_by` aggregation (map-side combined, one row
    * per user through each exchange) and joined user-keyed — stages are
    * a fixed small list, so this is k aggregations + k joins, never a
    * per-event window over the whole stream. */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("view", "click", "purchase"),
             maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "stages must not be empty")
    require(maxGapUs.forall(_ > 0), "maxGapUs must be positive when set")
    val e = events.filter(col("ts").isNotNull)
    val users = e.select(col("user_id")).distinct()
    // fold left over stages: carry (frame with per-user prev-stage key)
    val tsUs = graft.ops.RangeJoin.epochMicros(col("ts"))
    var acc = users
    var prevKey: Option[String] = None
    stages.zipWithIndex.foreach { case (stage, i) =>
      val kCol = s"ts_$stage"
      val sEv = e.filter(col("event_type") === stage)
        .select(col("user_id"), tsUs.as("_us"), col("event_id").as("_eid"))
      val joined = prevKey match {
        case None => sEv
        case Some(pk) =>
          // conversion window: the next stage must land within maxGapUs
          // of the previous stage's match (the industry-standard funnel
          // timeout — an unbounded funnel credits year-later conversions)
          val gapOk = maxGapUs.map(g => col("_us") - col("_prev") <= g)
            .getOrElse(lit(true))
          sEv.join(acc.select(col("user_id"), col(pk).as("_prev")), "user_id")
            .filter(col("_prev").isNotNull && col("_us") > col("_prev") && gapOk)
            .select(col("user_id"), col("_us"), col("_eid"))
      }
      val firsts = joined.groupBy(col("user_id"))
        .agg(min_by(col("_us"), struct(col("_us"), col("_eid"))).as(kCol))
      acc = acc.join(firsts, Seq("user_id"), "left")
      prevKey = Some(kCol)
    }
    val stageCount = stages.map(s => when(col(s"ts_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select((col("user_id") +: stages.map(s => col(s"ts_$s"))) :+
      stageCount.cast("bigint").as("stage"): _*)
  }

  /** Cohort retention grid: users bucketed by the period of their FIRST
    * `anchorType` event (the cohort), counted per offset period in which
    * they did anything at all afterwards — the classic retention
    * triangle. Periods are integral `epoch_us div width` day buckets
    * (engine-exact, timezone-free); offset 0 is the cohort period
    * itself. Determinism: the anchor is a plain min; activity is a
    * distinct count over (cohort, offset, user). Scale shape: one
    * aggregation for anchors (map-side combined, one row per user), a
    * user-keyed join of the event stream against its own anchor frame
    * (broadcast when users fit, sort-merge beyond), and one
    * (cohort, offset)-grouped distinct count — grid-sized output. */
  def cohortRetention(events: DataFrame, anchorType: String = "signup",
                      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, "periodDays must be positive")
    val widthUs = periodDays * 86400L * 1000000L
    val e = events.filter(col("ts").isNotNull)
      .select(col("user_id"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("_us"), col("event_type"))
      .select(col("user_id"), expr(s"_us div ${widthUs}L").as("_p"),
        col("event_type"))
    val anchors = e.filter(col("event_type") === anchorType)
      .groupBy(col("user_id")).agg(min(col("_p")).as("_cohort"))
    e.join(anchors, "user_id")
      .filter(col("_p") >= col("_cohort"))
      .select(col("_cohort"), (col("_p") - col("_cohort")).as("_offset"),
        col("user_id"))
      .groupBy(col("_cohort"), col("_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("_cohort").as("cohort"), col("_offset").as("offset"),
        col("n_users"))
  }

  /** Exponentially-weighted moving average per user, exact-integer
    * formulation: values fixed-pointed at 6 dp and folded with
    * `e' = e + (x − e) div 2^halvings` (α = 2⁻ᵏ as a truncating integer
    * step — no float accumulation, so the fold is bit-identical in any
    * engine and any partitioning; the same reproducibility stance as
    * `dsum`, applied to a sequential recurrence). First event seeds the
    * average. Emits the running EWMA per event as the exact scaled
    * integer (`ewma_s6`).
    *
    * A recurrence has no window spelling, so the per-user history rides
    * a `sort_array(collect_list(...))` + one `aggregate` lambda — state
    * is per-USER-history-sized (fine for entity streams; for unbounded
    * per-key histories use the O(1)-state streaming twin
    * [[graft.stream.StreamEwma]], spec-pinned to this fold). One
    * aggregation exchange, no window, no driver involvement. */
  def ewma(events: DataFrame, halvings: Int = 4): DataFrame = {
    require(halvings >= 1 && halvings <= 30, "halvings must be in [1, 30]")
    val shift = 1L << halvings
    val prepped = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("us"),
        col("event_id").as("eid"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("xs"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("eid"), col("xs"))))
        .as("evs"))
    val folded = prepped.select(col("user_id"), expr(
      s"""aggregate(evs,
         |  named_struct('init', false, 'e', CAST(0 AS BIGINT),
         |    'arr', CAST(array() AS ARRAY<STRUCT<eid: BIGINT, ew: BIGINT>>)),
         |  (acc, ev) -> named_struct(
         |    'init', true,
         |    'e', CASE WHEN acc.init
         |           THEN acc.e + ((ev.xs - acc.e) div ${shift}L)
         |           ELSE ev.xs END,
         |    'arr', array_append(acc.arr, named_struct(
         |      'eid', ev.eid,
         |      'ew', CASE WHEN acc.init
         |              THEN acc.e + ((ev.xs - acc.e) div ${shift}L)
         |              ELSE ev.xs END))),
         |  acc -> acc.arr)""".stripMargin).as("arr"))
    folded.select(col("user_id"), explode(col("arr")).as("r"))
      .select(col("user_id"), col("r.eid").as("event_id"),
        col("r.ew").as("ewma_s6"))
  }

  /** Time-weighted average of `value` per user: each observation holds
    * until the next one, so its weight is the interval it was live —
    * `TWAP = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)` — the correct
    * "average level" for irregularly-sampled series where the
    * event-count mean over-weights bursts (the finance/ops metric
    * [[movingAvg]] and [[resample]] don't give). The last observation
    * carries no forward interval; single-event users have no interval
    * at all and are absent from the output (no fake number is
    * invented for a zero-length span).
    *
    * Determinism: values fixed-pointed at 6 dp, interval weights are
    * exact epoch-microsecond longs, the weighted sum runs in
    * DECIMAL(38,0) — one double division at the end, round 6. Scale
    * shape: one per-key window (lead) off the single per-key exchange,
    * then a per-user aggregation — the sessionization shape. */
  def twap(events: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us").asc, col("event_id").asc)
    val us = graft.ops.RangeJoin.epochMicros(col("ts"))
    val stepped = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), us.as("_us"),
        col("event_id"),
        expr("CAST(round(value * 1000000) AS DECIMAL(38,0))").as("_vf"))
      .withColumn("_next", lead(col("_us"), 1).over(w))
      .filter(col("_next").isNotNull)
    stepped
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("_vf") * (col("_next") - col("_us")).cast(d38)).as("_ws"),
        (max(col("_next")) - min(col("_us"))).as("_span"))
      .select(col("user_id"), col("n_intervals"),
        round(col("_ws").cast(DoubleType) /
          (col("_span").cast(DoubleType) * lit(1000000.0)), 6).as("twap"))
  }

  /** CUBE subtotal aggregation: every combination of the grouping
    * columns plus a `gid` bitmask (standard `GROUPING()` encoding —
    * first column is the most significant bit) so a consumer can tell a
    * genuine NULL group from a rolled-up one.
    *
    * Execution: NOT `Dataset.cube` — its Expand pushes 2ᵏ copies of
    * every corpus row through the partial aggregate (the r8 plan audit
    * measured the 4× row multiplicity as ~2× q1_pricing's cost). Count
    * and decimal sums are exactly additive, so every coarser level is
    * derived from the FINEST-level aggregate instead: one corpus pass
    * to the (flags × statuses)-sized grid, then three re-aggregations
    * OF THE GRID (grid-sized work, cached). Bit-identical to the
    * Expand spelling — decimal addition is exact in any order — and
    * the corpus cost is exactly one plain grouped aggregation at any
    * scale. The double cast happens once per output row, after the
    * last decimal re-sum. */
  def cubeSummary(lineitem: DataFrame): DataFrame = {
    val a = "l_returnflag"; val b = "l_linestatus"
    val fine = lineitem.groupBy(col(a), col(b))
      .agg(count(lit(1)).as("_n"),
        sum(col("l_quantity").cast(DecimalType(25, 4))).as("_sq"),
        sum(col("l_extendedprice").cast(DecimalType(25, 4))).as("_sp"))
    graft.ops.Caching.ensureCached(fine)
    def level(keep: Seq[String], gid: Int): DataFrame = {
      val g = if (keep.isEmpty) fine.groupBy() else fine.groupBy(keep.map(col): _*)
      val rolled = g.agg(sum(col("_n")).as("_n"),
        sum(col("_sq")).as("_sq"), sum(col("_sp")).as("_sp"))
      rolled.select(
        (if (keep.contains(a)) col(a) else lit(null).cast("string")).as(a),
        (if (keep.contains(b)) col(b) else lit(null).cast("string")).as(b),
        lit(gid.toLong).as("gid"), col("_n").as("n"),
        col("_sq").cast(DoubleType).as("sum_qty"),
        col("_sp").cast(DoubleType).as("sum_price"))
    }
    level(Seq(a, b), 0)
      .unionByName(level(Seq(a), 1))
      .unionByName(level(Seq(b), 2))
      .unionByName(level(Nil, 3))
  }

  /** Slowly-changing-dimension type-2 history build: collapse an ordered
    * per-key attribute stream into versioned validity intervals —
    * one row per consecutive run of equal `attrCol` values, carrying
    * `valid_from` (first event of the run), `valid_to` (start of the
    * next run, null while current), `version` (1-based per key), and
    * `is_current`. The warehouse-dimension primitive `snapshotDiff`
    * (which compares two snapshots) cannot express: this derives the
    * FULL history from the event stream in one pass.
    *
    * Determinism: runs are ordered by (`orderCol`, `tieCol`) so
    * same-timestamp updates resolve identically everywhere; `attrCol`
    * equality is null-safe (a null attribute is a value, not a wildcard).
    * Scale shape: two per-key windows (change-point lag, then
    * lead/row_number over change points only — the second window sees
    * one row per VERSION, not per event) and no corpus-sized shuffle
    * beyond the per-key hash partitioning every per-key window needs. */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           orderCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).asc, col(tieCol).asc)
    val changed = df
      .filter(col(orderCol).isNotNull)
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      // null-safe inequality: <=> is true for null==null, negate it
      .filter(col("_first") || !(col(attrCol) <=> col("_prev")))
      .select(col(keyCol), col(attrCol), col(orderCol).as("valid_from"),
        col(tieCol).as("_tie"))
    val wv = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from").asc, col("_tie").asc)
    changed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("version", row_number().over(wv).cast("bigint"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_tie")
  }

  /** Trailing moving average of `value` over the last `k` events per
    * user, (ts, event_id)-ordered — the smoothing primitive for
    * per-entity rate/trend series ([[resample]] gives the grid, this
    * gives the smoothed signal). Determinism: the window sum
    * accumulates exact decimals (shuffle-order-proof, the `dsum`
    * rationale applied to a window frame); one double division + 6 dp
    * round at the end. Scale shape: one per-key window over the per-key
    * hash partitioning — the same single exchange sessionization pays,
    * frame state bounded at k rows. */
  def movingAvg(events: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-(k - 1), Window.currentRow)
    events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        round(sum(col("value").cast(DecimalType(25, 6))).over(w).cast(DoubleType) /
          count(lit(1)).over(w), 6).as(s"mavg_$k"))
  }

  /** First-order transition statistics over each user's event stream:
    * (from, to) counts for consecutive events plus the conditional
    * probability P(to | from) — the Markov view of user behaviour
    * ([[funnel]] asks about ONE fixed path; this measures every edge).
    * (ts, event_id)-ordered lead; probabilities are exact-count ratios
    * rounded at 6 dp. Scale shape: one per-key window (single
    * exchange), then all aggregation is transition-matrix-sized —
    * |event types|², not corpus-sized. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events.filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("_tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast(DoubleType) / col("_tot"), 6).as("p"))
  }

  /** Status-pivoted order summary: one row per priority with per-status
    * counts and exact-decimal totals — the wide cross-tab reporting
    * shape. Pivot values are EXPLICIT (the `Seq("F","O","P")` overload):
    * at 100 TB the implicit-values variant would run a distinct scan
    * just to name the columns. Execution is the same single grouped
    * aggregation as the long form — pivot only changes the layout. */
  def pivotSummary(orders: DataFrame,
                   statuses: Seq[String] = Seq("F", "O", "P")): DataFrame = {
    require(statuses.nonEmpty, "statuses must not be empty")
    val wide = orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    // pivot names columns "<value>_<aggAlias>": stabilise to snake_case
    val renamed = statuses.flatMap(s =>
      Seq(coalesce(col(s"${s}_n"), lit(0L)).as(s"n_${s.toLowerCase}"),
        coalesce(col(s"${s}_total"), lit(0.0)).as(s"total_${s.toLowerCase}")))
    wide.select(col("o_orderpriority") +: renamed: _*)
  }

  /** Period-over-period change: per event type, integral time-bucket
    * counts with each bucket's delta and 6 dp relative change against
    * the PREVIOUS bucket that has data — the BI trend row (`resample`
    * zero-fills a user grid; this compares adjacent corpus periods).
    * Buckets are `epoch_us div width` (engine-exact); the lag runs
    * over the (type × buckets)-sized GRID, never the event stream.
    * First bucket per type has null change (nothing to compare). */
  def periodOverPeriod(events: DataFrame, bucketHours: Int = 24): DataFrame = {
    require(bucketHours > 0, "bucketHours must be positive")
    val widthUs = bucketHours * 3600L * 1000000L
    val grid = events.filter(col("ts").isNotNull)
      .select(col("event_type"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("_us"))
      .select(col("event_type"), expr(s"_us div ${widthUs}L").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket").asc)
    grid.withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("bucket"), col("n"),
        (col("n") - col("prev_n")).as("delta"),
        round((col("n") - col("prev_n")).cast(DoubleType) / col("prev_n"), 6)
          .as("pct_change"))
  }

  /** Z-score normalization of `value` per event type from EXACT power
    * sums (mean and sample standard deviation via the corr family's
    * DECIMAL(38,0) arithmetic, both rounded to 6 dp BEFORE the per-row
    * transform so the projection is engine-exact) — the parametric
    * companion to the rank transform (ranks are outlier-immune;
    * z-scores preserve distances). Zero-variance groups yield null z.
    * One groups-sized aggregation broadcast back, pure projection. */
  def zscoreNormalize(events: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val x = expr("CAST(round(value * 100) AS DECIMAL(38,0))")
    val stats = events.filter(col("value").isNotNull)
      .select(col("event_type"), x.as("_x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(d38).as("_n"), sum(col("_x")).as("_s1"),
        sum(col("_x") * col("_x")).as("_s2"))
      .select(col("event_type"),
        round(col("_s1").cast(DoubleType) /
          (col("_n").cast(DoubleType) * lit(100.0)), 6).as("_mean"),
        when(col("_n") < 2 || col("_n") * col("_s2") - col("_s1") * col("_s1") === 0,
          lit(null))
          .otherwise(round(sqrt(
            (col("_n") * col("_s2") - col("_s1") * col("_s1")).cast(DoubleType) /
              ((col("_n") * (col("_n") - 1)).cast(DoubleType) * lit(10000.0))), 6))
          .as("_std"))
    events.filter(col("value").isNotNull)
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("_std").isNull, lit(null))
          .otherwise(round((col("value") - col("_mean")) / col("_std"), 6))
          .as("zscore"))
  }

  /** Hour-of-day seasonality profile per event type: counts and 6 dp
    * shares per UTC hour bucket — `(epoch_us div 3600e6) mod 24` is
    * integral and timezone-type-free (the resample/cohort bucket
    * contract applied to the daily cycle). The load-shape view
    * capacity planning and anomaly baselines read. Grid-sized
    * (types × 24) after one map-side-combined aggregation. */
  def hourOfDayProfile(events: DataFrame): DataFrame = {
    val grid = events.filter(col("ts").isNotNull)
      .select(col("event_type"),
        graft.ops.RangeJoin.epochMicros(col("ts")).as("_us"))
      .select(col("event_type"),
        expr("(_us div 3600000000L) % 24").as("hour_utc"))
      .groupBy(col("event_type"), col("hour_utc"))
      .agg(count(lit(1)).as("n"))
    val tot = grid.groupBy(col("event_type")).agg(sum(col("n")).as("_t"))
    grid.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("hour_utc"), col("n"),
        round(col("n").cast(DoubleType) / col("_t"), 6).as("share"))
  }

  /** Gini coefficient of the per-source document distribution — the
    * corpus-concentration number (0 = perfectly balanced sources,
    * →1 = one source dominates) mixture/temperature tuning watches.
    * Exact integer spelling on ASCENDING-ordered counts:
    * `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)` — every term a long/decimal
    * integer, ONE double division, round 6 (ties ordered by source for
    * a total rank order; the statistic is tie-order-invariant since
    * equal x contribute symmetric rank sums). The rank window runs on
    * the GROUPS-sized frame, never the corpus. */
  def sourceGini(docs: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("_x"))
    val w = Window.orderBy(col("_x").asc, col("source").asc)
    val ranked = counts.withColumn("_i", row_number().over(w).cast("long"))
    ranked.agg(count(lit(1)).as("_n"),
      sum(col("_x")).as("_sx"),
      sum(col("_i").cast(d38) * col("_x").cast(d38)).as("_six"))
      .select(col("_n").cast("bigint").as("n_sources"),
        col("_sx").cast("bigint").as("n_docs"),
        round((lit(2).cast(d38) * col("_six") -
          (col("_n") + 1).cast(d38) * col("_sx").cast(d38)).cast(DoubleType) /
          (col("_n").cast(d38) * col("_sx").cast(d38)).cast(DoubleType), 6)
          .as("gini"))
  }

  /** Retention RATES from the cohort triangle: each (cohort, offset)
    * cell as a 6 dp share of its cohort's size (the offset-0 cell) —
    * the normalized view every retention chart actually plots, where
    * [[cohortRetention]] gives absolute counts. Offset 0 is 1.0 by
    * construction. One broadcast join of the triangle against its own
    * offset-0 slice — grid-sized work on top of the triangle. */
  def retentionRates(events: DataFrame, anchorType: String = "signup",
                     periodDays: Int = 7): DataFrame = {
    val tri = cohortRetention(events, anchorType, periodDays)
    val base = tri.filter(col("offset") === 0L)
      .select(col("cohort"), col("n_users").as("_c0"))
    tri.join(broadcast(base), Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_users"),
        round(col("n_users").cast(DoubleType) / col("_c0"), 6).as("retention"))
  }

  /** Lag-1 autocorrelation of event values per event type: Pearson
    * correlation between consecutive (per-user, (ts, event_id)-ordered)
    * value pairs — the is-this-series-momentum-or-noise diagnostic
    * ([[Analytics.ewma]] smooths; this says whether smoothing has
    * anything to grab). Pairs never cross users. Exactness: the pair
    * frame feeds [[graft.ops.Stats.corrByGroup]]'s DECIMAL(38,0) power
    * sums — the engine's correlation contract. One per-key window off
    * the single per-key exchange, then one map-side-combined
    * aggregation. */
  def autocorr(events: DataFrame): DataFrame = {
    // pairs stay within one (user, type) series — cross-type and
    // cross-user "neighbours" are not observations of the same signal
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("_next", lead(col("value"), 1).over(w))
      .filter(col("_next").isNotNull)
    graft.ops.Stats.corrByGroup(pairs, "event_type", "value", "_next")
      .withColumnRenamed("corr", "autocorr")
  }

  /** Earliest event per (user_id, event_type) — the batch twin of
    * streaming `dropDuplicatesWithinWatermark`. */
  def eventsDedup(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
  }
}
