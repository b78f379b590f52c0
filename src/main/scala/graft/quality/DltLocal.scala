package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single expectation evaluation emitted during local DLT execution —
  * field-for-field twin of the reference's `ExpectationReport`
  * (dc43 `spark/dlt_local.py:114-131`). */
final case class ExpectationReport(
    asset: String,
    rule: String,
    predicate: String,
    action: String, // "warn" (expect_all) | "drop" (expect_all_or_drop)
    failedRows: Long,
    runId: Long) {
  def status: String = if (failedRows == 0) "passed" else "failed"
}

/** Local DLT execution harness — the Spark-native re-expression of the
  * reference's `LocalDLTHarness` (dc43 `spark/dlt_local.py:134-323`),
  * which patches the `dlt` module so contract-decorated assets run
  * against a plain SparkSession and their expectation verdicts are
  * recorded. Here assets register directly (no module patching — that's
  * a Python mechanism), with the same execution semantics:
  *
  *  - every registered expectation is evaluated per run and recorded as
  *    an [[ExpectationReport]] (action "warn" for observed /
  *    `expect_all`, "drop" for enforced / `expect_all_or_drop`);
  *  - a failure is a row where `NOT predicate` is TRUE (the reference's
  *    `df.filter(~expr(predicate))` — null predicates don't count);
  *  - a predicate that fails analysis counts every row as failed
  *    (reference catches `AnalysisException` → `failures = df.count()`);
  *  - unlike the reference shim (observe-only), `runAsset` then actually
  *    applies the `drop` action the way deployed DLT would: the returned
  *    frame keeps `total − failedRows` rows per enforced expectation.
  *
  * Scale shape: ALL expectation failure counts of an asset are computed
  * in ONE aggregation pass (conditional sums), not one scan per
  * expectation — the same single-pass design as [[Metrics.compute]];
  * the reference shim re-scans per predicate. */
final class LocalDltHarness(spark: SparkSession) {

  private final case class Asset(fn: () => DataFrame, expectations: DltExpectations)

  private val tables = scala.collection.mutable.LinkedHashMap.empty[String, Asset]
  private val views = scala.collection.mutable.LinkedHashMap.empty[String, Asset]
  private val reportBuf = scala.collection.mutable.ArrayBuffer.empty[ExpectationReport]
  private var runSequence = 0L

  private val NoExpectations = DltExpectations(Map.empty, Map.empty)

  /** Register a table asset (reference `@dlt.table` + expectation
    * decorators, folded into one call since Scala has no module to
    * monkey-patch). */
  def table(name: String, expectations: DltExpectations = NoExpectations)
           (fn: => DataFrame): Unit =
    tables(name) = Asset(() => fn, expectations)

  /** Register a view asset (reference `@dlt.view`). */
  def view(name: String, expectations: DltExpectations = NoExpectations)
          (fn: => DataFrame): Unit =
    views(name) = Asset(() => fn, expectations)

  /** All reports recorded so far, in evaluation order. */
  def reports: Seq[ExpectationReport] = reportBuf.toSeq

  /** Per-asset rollup: "passed" only when every recorded expectation of
    * the asset passed (assets with no reports roll up as "passed"). */
  def assetStatus: Map[String, String] =
    reportBuf.groupBy(_.asset).map { case (a, rs) =>
      a -> (if (rs.forall(_.failedRows == 0)) "passed" else "failed")
    }.toMap

  /** Execute one registered asset: evaluate + record every expectation,
    * then return the frame with enforced-expectation failures dropped. */
  def runAsset(name: String): DataFrame = {
    val asset = tables.get(name).orElse(views.get(name)).getOrElse(
      throw new NoSuchElementException(s"unknown DLT asset: $name"))
    runSequence += 1
    val runId = runSequence
    val df = asset.fn()

    val all = asset.expectations.enforced.toSeq.map { case (k, p) => (k, p, "drop") } ++
      asset.expectations.observed.toSeq.map { case (k, p) => (k, p, "warn") }
    if (all.isEmpty) return df

    // analysis-check each predicate up front so one broken rule doesn't
    // poison the shared aggregation pass
    val (valid, broken) = all.partition { case (_, p, _) =>
      scala.util.Try(df.filter(expr(p)).queryExecution.analyzed).isSuccess
    }
    // one pass: total rows + a conditional sum per valid predicate
    val counts: Map[String, Long] = {
      val aggs = count(lit(1)).as("_total") +:
        valid.map { case (k, p, _) =>
          sum(when(not(expr(p)) <=> true, 1L).otherwise(0L)).as(s"_f_$k")
        }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val total = row.getLong(0)
      valid.zipWithIndex.map { case ((k, _, _), i) =>
        k -> (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
      }.toMap ++ broken.map { case (k, _, _) => k -> total }.toMap
    }
    all.foreach { case (k, p, action) =>
      reportBuf += ExpectationReport(name, k, p, action, counts(k), runId)
    }

    // apply the drop action: keep rows where no ENFORCED predicate is
    // violated (kept == total - failedRows per expectation, consistent
    // with the failure counting above — null predicates keep their row)
    val analyzableEnforced = valid.collect { case (_, p, "drop") => p }
    val brokenEnforced = broken.exists(_._3 == "drop")
    if (brokenEnforced) df.limit(0) // every row failed an enforced rule
    else analyzableEnforced.foldLeft(df) { (d, p) =>
      d.filter(!(not(expr(p)) <=> true))
    }
  }

  /** Execute every registered table, returning name → kept frame
    * (reference `run_all`). */
  def runAll(): Map[String, DataFrame] =
    tables.keys.map(n => n -> runAsset(n)).toMap
}
