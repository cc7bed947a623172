package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level data lineage extracted from the ANALYZED Catalyst
  * plan — the provenance question every governed warehouse answers
  * before a schema change or a PII audit: "which physical columns
  * feed this output column?" Computed by folding the plan bottom-up:
  * scan leaves seed each of their attributes with its (table, column)
  * identity, and every node that CREATES attributes (Project /
  * Aggregate / Window aliases) maps the new attribute to the union of
  * its input expressions' lineage. Pass-through nodes (Filter, Join,
  * Sort, …) add nothing: their outputs are child attributes, already
  * seeded. This is VALUE lineage — predicates and join keys shape
  * which rows flow, not which source columns an output value is made
  * of, and are deliberately out of frame (the standard
  * lineage-catalog boundary).
  *
  * Scale note: lineage is pure plan metadata — the fold is
  * plan-sized driver work and never touches data, which is exactly
  * why catalogs can afford to compute it for every query they see.
  */
object Lineage {

  /** The (table, column) sets feeding each output attribute of `df`'s
    * analyzed plan, flattened to one (out_col, src_table, src_col)
    * row per edge, ordered.
    */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    val rows = plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty).toSeq.map { case (t, c) => (a.name, t, c) }
    }
    rows.distinct.sortBy(identity)
  }

  /** Leaf scans name their table by the file path's basename — the
    * identity the data catalog keys on for file-backed tables.
    */
  private def leafTable(p: LogicalPlan): Option[String] = p match {
    case lr: LogicalRelation =>
      lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.getName.replaceAll("\\.(parquet|orc|csv|json)$", ""))
        case _ => None
      }
    case _ => None
  }

  private def build(p: LogicalPlan): Map[ExprId, Set[(String, String)]] =
    leafTable(p) match {
      case Some(table) =>
        p.output.map(a => a.exprId -> Set(table -> a.name)).toMap
      case None =>
        val fromChildren =
          p.children.map(build).foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        def lin(e: Expression): Set[(String, String)] =
          e.references.toSeq.flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty)).toSet
        def fromNamed(es: Seq[NamedExpression]): Map[ExprId, Set[(String, String)]] =
          es.collect { case a: Alias => a.exprId -> lin(a.child) }.toMap
        val created = p match {
          case pr: Project => fromNamed(pr.projectList)
          case ag: Aggregate => fromNamed(ag.aggregateExpressions)
          case w: Window => fromNamed(w.windowExpressions)
          case u: Union =>
            // Union exposes the FIRST child's attribute ids, but a
            // value in column i can come from ANY branch's column i —
            // the lineage is the positional union across branches
            u.output.zipWithIndex.map { case (a, i) =>
              a.exprId -> u.children
                .flatMap(c => fromChildren.getOrElse(c.output(i).exprId, Set.empty))
                .toSet
            }.toMap
          case _ => Map.empty[ExprId, Set[(String, String)]]
        }
        fromChildren ++ created
    }
}
