package graft.draft

import graft.contracts.{FieldDef, QualityRule, Contract}
import graft.quality.Profiler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-driven expectation suggestion: read a frame's observed profile
  * and propose the rules a contract author would write — the discovery
  * half of drafting ([[Drafter.fromDataFrame]] drafts the SCHEMA; this
  * drafts the QUALITY surface). Suggestions, with rationale:
  *
  * - `required` when a column has zero observed nulls,
  * - `unique` when exact distinct == row count on a null-free column
  *   (candidates screened with the profiler's HLL, then VERIFIED with
  *   an exact distinct — an approximate uniqueness claim would draft a
  *   rule the very first validation run rejects),
  * - `enum` when a string column's exact distinct count is at most
  *   `enumMaxDistinct` (values collected — a bounded, screened set),
  * - `ge`/`le` range rules for numeric columns, widened by
  *   `rangeMargin` of the observed span so natural drift does not trip
  *   the rule on day one (observed min/max are a sample, not a law).
  *
  * Cost: ONE profiling pass (single agg), plus one exact aggregation
  * over only the screened candidate columns and one bounded enum-value
  * collect. Suggestions are suggestions: [[enrich]] applies them to a
  * contract draft for review, never to a published version. */
object Suggest {

  final case class Suggestion(column: String, kind: String,
                              rule: Option[QualityRule], rationale: String)

  def rules(df: DataFrame, enumMaxDistinct: Int = 20,
            rangeMargin: Double = 0.1): Seq[Suggestion] = {
    require(enumMaxDistinct >= 2, "enumMaxDistinct must be at least 2")
    require(rangeMargin >= 0, "rangeMargin must be non-negative")
    val profs = Profiler.profile(df)
    val nRows = df.count()
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    // screen with the HLL profile (2% slack), verify exactly below
    val uniqueCands = profs.filter(p => p.nullCount == 0 &&
      nRows > 0 && p.approxDistinct >= (nRows * 0.98).toLong).map(_.name)
    val enumCands = profs.filter(p => p.odcsType == "string" &&
      p.approxDistinct <= enumMaxDistinct * 2L).map(_.name)
    val exactNeeded = (uniqueCands ++ enumCands).distinct
    val exact: Map[String, Long] =
      if (exactNeeded.isEmpty) Map.empty
      else {
        val aggs = exactNeeded.map(c => countDistinct(q(c)).as(c))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        exactNeeded.map(c => c -> row.getLong(row.fieldIndex(c))).toMap
      }
    profs.flatMap { p =>
      val required =
        if (p.nullCount == 0 && nRows > 0)
          Seq(Suggestion(p.name, "required", None,
            s"0 nulls in $nRows observed rows"))
        else Nil
      val unique =
        if (uniqueCands.contains(p.name) && exact(p.name) == nRows && nRows > 0)
          Seq(Suggestion(p.name, "unique", None,
            s"exact distinct == $nRows rows, null-free"))
        else Nil
      val enum_ =
        if (enumCands.contains(p.name) && nRows > 0 &&
            exact(p.name) <= enumMaxDistinct && exact(p.name) >= 1) {
          val values = df.select(q(p.name)).filter(q(p.name).isNotNull)
            .distinct().collect().map(_.get(0).toString).sorted.toSeq
          Seq(Suggestion(p.name, "enum",
            Some(QualityRule(rule = Some("enum"), values = values)),
            s"${values.size} distinct values observed"))
        } else Nil
      val range = (p.min, p.max) match {
        case (Some(lo), Some(hi)) =>
          val span = hi - lo
          val lo2 = BigDecimal(lo - rangeMargin * span)
          val hi2 = BigDecimal(hi + rangeMargin * span)
          Seq(Suggestion(p.name, "range",
            Some(QualityRule(mustBeGreaterOrEqualTo = Some(lo2),
              mustBeLessOrEqualTo = Some(hi2))),
            s"observed [$lo, $hi], widened by $rangeMargin span"))
        case _ => Nil
      }
      required ++ unique ++ enum_ ++ range
    }
  }

  /** Apply suggestions to a contract DRAFT: set required/unique flags
    * and append rule suggestions on matching fields (fields absent from
    * the contract are ignored — schema drafting is [[Drafter]]'s job).
    * Returns the enriched contract; status and version are untouched
    * (review decides). */
  def enrich(contract: Contract, suggestions: Seq[Suggestion]): Contract = {
    val byCol = suggestions.groupBy(_.column)
    def patch(f: FieldDef): FieldDef = byCol.get(f.name) match {
      case None => f
      case Some(ss) =>
        val rules = ss.flatMap(_.rule)
        f.copy(
          required = f.required || ss.exists(_.kind == "required"),
          unique = f.unique || ss.exists(_.kind == "unique"),
          quality = f.quality ++ rules.filterNot(f.quality.contains))
    }
    contract.copy(schema = contract.schema.map(o =>
      o.copy(properties = o.properties.map(patch))))
  }
}
