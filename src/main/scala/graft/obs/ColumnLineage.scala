package graft.obs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.json4s.JsonAST._

/** Column-level lineage extraction from a DataFrame's ANALYZED logical
  * plan: for every output column, the set of source (dataset, column)
  * fields it derives from — the OpenLineage `columnLineage` dataset
  * facet, computed from the plan Catalyst already built (no execution,
  * no instrumentation, no extra scan).
  *
  * Mechanics: one bottom-up fold. Leaves seed each relation attribute
  * with its (source, column) identity — `LogicalRelation` sources are
  * named by their first file-index root path, in-memory scans by
  * "memory". Every operator above propagates a map `ExprId → sources`:
  * pass-through attributes keep their entry; computed
  * `NamedExpression`s (projections, aggregates, window expressions)
  * union the sources of every attribute they REFERENCE. Joins/unions
  * merge child maps (union buses the columns of both sides for union —
  * positional — and keeps both sides' ids for joins).
  *
  * The result is transformation-CLOSED lineage ("derives from"), not
  * transformation-TYPED (no identity-vs-aggregate distinction) — the
  * OpenLineage facet's base shape. Filters/sorts/limits contribute
  * nothing (they reference columns but produce none): lineage follows
  * data flow into the output row, which is the contract consumers
  * audit. */
object ColumnLineage {

  /** Output column name → source fields, as `(dataset, column)` pairs. */
  def lineage(df: DataFrame): Map[String, Set[(String, String)]] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    plan.output.map(a =>
      a.name -> m.getOrElse(a.exprId, Set.empty[(String, String)])).toMap
  }

  /** The OpenLineage `columnLineage` facet for [[lineage]]'s result. */
  def facet(df: DataFrame): JObject = {
    val fields = lineage(df).toSeq.sortBy(_._1).map { case (out, srcs) =>
      out -> (JObject(
        "inputFields" -> JArray(srcs.toSeq.sorted.map { case (ds, c) =>
          JObject("namespace" -> JString("graft"), "name" -> JString(ds),
            "field" -> JString(c))
        }.toList)): JValue)
    }
    JObject("fields" -> JObject(fields: _*))
  }

  private def sourcesOf(e: Expression,
                        child: Map[ExprId, Set[(String, String)]]): Set[(String, String)] =
    e.references.toSeq.flatMap(a => child.getOrElse(a.exprId, Set.empty)).toSet

  private def build(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = plan match {
    case r: LogicalRelation =>
      val name = r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.toString).getOrElse("file")
        case other => other.toString
      }
      r.output.map(a => a.exprId -> Set(name -> a.name)).toMap
    case l: LocalRelation =>
      l.output.map(a => a.exprId -> Set("memory" -> a.name)).toMap
    case u: Union =>
      // positional: output column i derives from column i of EVERY child
      val childMaps = u.children.map(build)
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> u.children.zip(childMaps).flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
        }.toSet
      }.toMap
    case p: Project =>
      val child = build(p.child)
      child ++ p.projectList.map(ne => ne.exprId -> sourcesOf(ne, child)).toMap
    case a: Aggregate =>
      val child = build(a.child)
      child ++ a.aggregateExpressions.map(ne => ne.exprId -> sourcesOf(ne, child)).toMap
    case w: Window =>
      val child = build(w.child)
      child ++ w.windowExpressions.map(ne => ne.exprId -> sourcesOf(ne, child)).toMap
    case g: Generate =>
      val child = build(g.child)
      child ++ g.generatorOutput.map(a => a.exprId -> sourcesOf(g.generator, child)).toMap
    case e: Expand =>
      val child = build(e.child)
      child ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(row => sourcesOf(row(i), child)).toSet
      }.toMap
    case other =>
      // joins, filters, sorts, limits, subquery aliases, CTEs: merge the
      // children's maps; any NamedExpression-producing node is matched
      // above, everything else passes attributes through unchanged
      other.children.map(build).foldLeft(
        Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
  }
}
