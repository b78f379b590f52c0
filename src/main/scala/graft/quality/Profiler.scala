package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One numeric/string column's observed profile. */
final case class ColumnProfile(
    name: String,
    odcsType: String,
    nullCount: Long,
    approxDistinct: Long,
    min: Option[Double],
    max: Option[Double])

/** One-pass column profiler: null counts, approximate distincts, and
  * numeric min/max for every column in a single `agg` — the observation
  * side of data-driven contract drafting. Approximate distinct uses
  * HyperLogLog (`approx_count_distinct`), so the pass stays
  * streaming/observe-compatible and never shuffles per column. */
object Profiler {

  /** Backtick-quoted column reference — plain `col(name)` would parse a
    * dotted column name as nested-field access. */
  private def qcol(name: String) =
    col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame): Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq
    if (fields.isEmpty) return Nil
    val exprs = fields.flatMap { f =>
      val c = qcol(f.name)
      val numeric = f.dataType.isInstanceOf[NumericType]
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}!nulls"),
        approx_count_distinct(c).as(s"${f.name}!distinct")) ++
        (if (numeric) Seq(min(c).cast(DoubleType).as(s"${f.name}!min"),
                          max(c).cast(DoubleType).as(s"${f.name}!max"))
         else Nil)
    }
    val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
    def get(name: String): Option[Double] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    }
    // sums are NULL (not 0) on an empty frame
    def getLong(name: String): Long = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }
    fields.map { f =>
      ColumnProfile(
        name = f.name,
        odcsType = SchemaSnapshot.odcsTypeName(f.dataType),
        nullCount = getLong(s"${f.name}!nulls"),
        approxDistinct = getLong(s"${f.name}!distinct"),
        min = if (f.dataType.isInstanceOf[NumericType]) get(s"${f.name}!min") else None,
        max = if (f.dataType.isInstanceOf[NumericType]) get(s"${f.name}!max") else None)
    }
  }
}
