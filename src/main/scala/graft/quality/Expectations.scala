package graft.quality

import graft.contracts.{Contract, QualityRule}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A contract rule materialised into a metric key.
  * Mirrors dc43 `data_quality/backend/engine.py:37-163`. */
final case class ExpectationSpec(
    key: String,
    rule: String,
    column: Option[String] = None,
    threshold: Option[BigDecimal] = None,
    values: Seq[String] = Nil,
    valuesAreNumeric: Boolean = false,
    pattern: Option[String] = None,
    query: Option[String] = None,
    optional: Boolean = false
)

object Expectations {

  /** Backtick-quoted top-level column reference: contract field names may
    * contain dots, which bare `col(name)` would parse as nested access. */
  def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** Expectation specs derived from a contract: `not_null` for required
    * fields, `unique` for unique fields, threshold/enum/regex rules from
    * per-field quality entries, and object-level `query` rules. First
    * occurrence per key wins (reference semantics). */
  def fromContract(contract: Contract): Seq[ExpectationSpec] = {
    val specs = Seq.newBuilder[ExpectationSpec]
    for (obj <- contract.schema; f <- obj.properties if f.name.nonEmpty) {
      val optional = !f.required
      if (f.required)
        specs += ExpectationSpec(s"not_null_${f.name}", "not_null", Some(f.name), optional = optional)
      if (f.unique)
        specs += ExpectationSpec(s"unique_${f.name}", "unique", Some(f.name), optional = optional)
      for (dq <- f.quality) {
        dq.mustBeGreaterThan.foreach(t =>
          specs += ExpectationSpec(s"gt_${f.name}", "gt", Some(f.name), threshold = Some(t), optional = optional))
        dq.mustBeGreaterOrEqualTo.foreach(t =>
          specs += ExpectationSpec(s"ge_${f.name}", "ge", Some(f.name), threshold = Some(t), optional = optional))
        dq.mustBeLessThan.foreach(t =>
          specs += ExpectationSpec(s"lt_${f.name}", "lt", Some(f.name), threshold = Some(t), optional = optional))
        dq.mustBeLessOrEqualTo.foreach(t =>
          specs += ExpectationSpec(s"le_${f.name}", "le", Some(f.name), threshold = Some(t), optional = optional))
        dq.rule.map(_.toLowerCase) match {
          case Some("unique") =>
            specs += ExpectationSpec(s"unique_${f.name}", "unique", Some(f.name), optional = optional)
          case Some("enum") if dq.values.nonEmpty =>
            specs += ExpectationSpec(s"enum_${f.name}", "enum", Some(f.name),
              values = dq.values, valuesAreNumeric = dq.valuesAreNumeric, optional = optional)
          case Some("regex") if dq.pattern.isDefined =>
            specs += ExpectationSpec(s"regex_${f.name}", "regex", Some(f.name),
              pattern = dq.pattern, optional = optional)
          case _ =>
        }
      }
    }
    for (obj <- contract.schema; dq <- obj.quality if dq.query.isDefined) {
      val key = dq.name.orElse(dq.rule).getOrElse(if (obj.name.nonEmpty) obj.name else "query")
      specs += ExpectationSpec(key, "query", None, query = dq.query)
    }
    // first occurrence per key wins
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, ExpectationSpec]
    specs.result().foreach(s => if (!seen.contains(s.key)) seen(s.key) = s)
    seen.values.toSeq
  }

  private def literal(spec: ExpectationSpec, v: BigDecimal): Column =
    if (v.isValidLong) lit(v.toLong) else lit(v.toDouble)

  /** Native Catalyst pass-predicate for a spec (codegen'd, push-down-able).
    * None for `unique` (aggregate-level) and `query` (object-level) rules. */
  def passPredicate(spec: ExpectationSpec): Option[Column] = {
    val c = spec.column.map(qcol)
    spec.rule match {
      case "not_null" | "required" => c.map(_.isNotNull)
      case "gt" => for (cc <- c; t <- spec.threshold) yield cc > literal(spec, t)
      case "ge" => for (cc <- c; t <- spec.threshold) yield cc >= literal(spec, t)
      case "lt" => for (cc <- c; t <- spec.threshold) yield cc < literal(spec, t)
      case "le" => for (cc <- c; t <- spec.threshold) yield cc <= literal(spec, t)
      case "enum" if spec.values.nonEmpty =>
        c.map(cc => if (spec.valuesAreNumeric) cc.isin(spec.values.map(BigDecimal(_).toDouble): _*)
                    else cc.isin(spec.values: _*))
      case "regex" => for (cc <- c; p <- spec.pattern) yield cc.rlike(p)
      case _ => None
    }
  }

  private def sqlLit(s: String, numeric: Boolean): String =
    if (numeric) s else "'" + s.replace("'", "\\'") + "'"

  /** Spark-SQL predicate string for interop / serialisable expectation
    * plans (mirrors dc43 `predicates.py:21-50`). */
  def sqlPredicate(spec: ExpectationSpec): Option[String] = {
    spec.column.map(c => s"`${c.replace("`", "")}`").flatMap { ref =>
      spec.rule match {
        case "not_null" | "required" => Some(s"$ref IS NOT NULL")
        case "gt" => spec.threshold.map(t => s"$ref > $t")
        case "ge" => spec.threshold.map(t => s"$ref >= $t")
        case "lt" => spec.threshold.map(t => s"$ref < $t")
        case "le" => spec.threshold.map(t => s"$ref <= $t")
        case "enum" if spec.values.nonEmpty =>
          Some(s"$ref IN (${spec.values.map(sqlLit(_, spec.valuesAreNumeric)).mkString(", ")})")
        case "regex" => spec.pattern.map(p => s"$ref RLIKE '${p.replace("'", "\\'")}'")
        case _ => None
      }
    }
  }
}
