package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity checking: orphan foreign-key detection between
  * a child and a parent table — the cross-TABLE data-quality dimension
  * the per-column expectation engine (not_null/enum/range/unique)
  * cannot express, and the first thing a warehouse migration audits.
  *
  * Scale shape: one LEFT ANTI join on the key (null keys excluded —
  * SQL FK semantics ignore null references; [[orphanSummary]] reports
  * them separately). The parent side projects to the key column only
  * before the join, so AQE broadcasts dimension-sized parents and
  * falls back to a shuffle join for fact-sized ones — both correct at
  * 100 TB. */
object RefIntegrity {

  /** Child rows whose `childKey` has no match in `parent.parentKey` —
    * null child keys excluded (a null reference is "absent", not
    * "dangling"; SQL FK semantics). */
  def orphans(child: DataFrame, parent: DataFrame,
              childKey: String, parentKey: String): DataFrame =
    // alias the parent key to a reserved name BEFORE the join: when the
    // child FK and parent PK share a column name (both "id", the common
    // case) unqualified references would be ambiguous or, worse,
    // auto-resolve to a trivially-true self-compare reporting 0 orphans
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("_pk")).distinct(),
        col(childKey) === col("_pk"), "left_anti")

  /** One-row integrity summary: total child rows, null references,
    * checked references, orphans, and the 6 dp orphan rate over the
    * checked set. */
  def orphanSummary(child: DataFrame, parent: DataFrame,
                    childKey: String, parentKey: String): DataFrame = {
    val flagged = child
      .join(parent.select(col(parentKey).as("_pk")).distinct(),
        col(childKey) === col("_pk"), "left")
      .select(col(childKey).isNull.as("_isnull"),
        (col(childKey).isNotNull && col("_pk").isNull).as("_orphan"))
    flagged.agg(
      count(lit(1)).as("n_rows"),
      sum(col("_isnull").cast("long")).as("n_null_refs"),
      sum((!col("_isnull")).cast("long")).as("n_checked"),
      sum(col("_orphan").cast("long")).as("n_orphans"))
      .select(col("n_rows"), col("n_null_refs"), col("n_checked"),
        col("n_orphans"),
        round(col("n_orphans").cast("double") /
          greatest(col("n_checked"), lit(1L)), 6).as("orphan_rate"))
  }
}
