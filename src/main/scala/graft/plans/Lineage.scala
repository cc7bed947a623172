package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  AttributeReference,
  CreateNamedStruct,
  ExprId,
  Expression,
  GetArrayItem,
  GetArrayStructFields,
  GetMapValue,
  GetStructField,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  Expand,
  Generate,
  LogicalPlan,
  Project,
  Union,
  Window
}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

/** Column- and FIELD-level data lineage extracted from the ANALYZED
  * Catalyst plan — the provenance question every governed warehouse
  * answers before a schema change or a PII audit: "which physical
  * columns (and which FIELDS of them) feed this output column?"
  * Computed by folding the plan bottom-up: scan leaves seed each of
  * their attributes with its (table, column) identity, and every node
  * that CREATES attributes (Project / Aggregate / Window aliases,
  * Generate's exploded columns, Expand's projections) maps the new
  * attribute to the union of its input expressions' lineage. Pass-
  * through nodes (Filter, Join, Sort, …) add nothing: their outputs
  * are child attributes, already seeded. This is VALUE lineage —
  * predicates and join keys shape which rows flow, not which source
  * columns an output value is made of, and are deliberately out of
  * frame (the standard lineage-catalog boundary).
  *
  * Field precision: a `GetStructField` / map-key / array-index /
  * VARIANT-path extraction narrows its input's lineage to the
  * extracted PATH (`profile.name`, `attrs['k']`, `$.m.k`) instead of
  * collapsing to the root column — the granularity real catalogs
  * (field-path lineage) publish, and the difference between "this
  * report touches the profile struct" and "this report exposes the
  * name field". Structs BUILT in the plan (`struct(a, b)`) carry
  * per-field lineage forward, so a later field extraction recovers
  * exactly the branch that fed it.
  *
  * Fail-closed contract: an output attribute the fold cannot trace —
  * created by a plan node outside the modeled set, or read from a
  * non-file leaf — is reported as derived from [[Lineage.Unknown]]
  * rather than silently omitted. A downstream PII gate must escalate
  * an `<unknown>` source; a missing row would read as "not PII".
  *
  * Tables are keyed by their FULL root path (two tables that share a
  * directory basename — `staging/orders` vs `prod/orders` — must not
  * collapse into one provenance identity); [[Lineage.displayName]]
  * shortens for presentation only.
  *
  * Scale note: lineage is pure plan metadata — the fold is plan-sized
  * driver work and never touches data, which is exactly why catalogs
  * can afford to compute it for every query they see.
  */
object Lineage {

  /** Sentinel identity for attributes the fold cannot trace. */
  val Unknown: (String, String) = ("<unknown>", "<unknown>")

  /** Lineage of one value: `direct` = the (tableKey, fieldPath) set
    * the value derives from when referenced whole; `fields` = the
    * per-field refinement for struct values BUILT in the plan, kept
    * so a later `GetStructField` stays field-precise instead of
    * inheriting every branch of the struct. `exact` marks a value
    * that IS a source path (a scan attribute or a chain of
    * extractions from one) — the only case where a later extraction
    * may REFINE lineage by suffixing the path; extracting from a
    * COMPUTED value (`parse_json(concat(id, …))['k']`) must keep the
    * full contributing set, because the computation already mixed it.
    */
  final case class Node(direct: Set[(String, String)], fields: Map[String, Node], exact: Boolean) {
    /** Everything this value can derive from (field refinements
      * flattened) — what a whole-value reference is charged with.
      */
    def all: Set[(String, String)] = direct ++ fields.valuesIterator.flatMap(_.all)
    def merge(o: Node): Node =
      Node(
        direct ++ o.direct,
        (fields.keySet ++ o.fields.keySet).map { k =>
          k -> ((fields.get(k), o.fields.get(k)) match {
            case (Some(a), Some(b)) => a.merge(b)
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case (None, None) => Node.empty
          })
        }.toMap,
        exact = false
      )
  }
  object Node {
    val empty: Node = Node(Set.empty, Map.empty, exact = false)
    def leaf(s: Set[(String, String)]): Node = Node(s, Map.empty, exact = false)
    def source(s: Set[(String, String)]): Node = Node(s, Map.empty, exact = true)
  }

  /** Presentation shortener for a table key: the path basename minus
    * a data-format extension. DISPLAY ONLY — lineage identity stays
    * the full path.
    */
  def displayName(tableKey: String): String =
    tableKey.split('/').last.replaceAll("\\.(parquet|orc|csv|json)$", "")

  /** The (tableKey, fieldPath) sets feeding each output attribute of
    * `df`'s analyzed plan, flattened to one (out_col, src_table,
    * src_col) row per edge, ordered. `src_table` is the full root
    * path (see [[displayName]]); `src_col` is a field PATH when the
    * output extracts below a column root.
    */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan)
    val rows = plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Node.empty).all.toSeq.map { case (t, c) => (a.name, t, c) }
    }
    rows.distinct.sortBy(identity)
  }

  /** Leaf scans key their table by the FULL root path — the identity
    * a catalog must not collapse across directories.
    */
  private def leafTable(p: LogicalPlan): Option[String] = p match {
    case lr: LogicalRelation =>
      lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.headOption.map(_.toString)
        case _ => None
      }
    case _ => None
  }

  /** Lineage of one expression under `env` (the children's attribute
    * lineage). Extraction nodes narrow to field paths; everything
    * else unions its children's flattened lineage.
    */
  private def lin(e: Expression, env: Map[ExprId, Node]): Node = e match {
    case a: AttributeReference => env.getOrElse(a.exprId, Node.empty)
    case al: Alias => lin(al.child, env)
    case g: GetStructField =>
      narrow(lin(g.child, env), g.extractFieldName, sep = ".")
    case g: GetArrayStructFields =>
      narrow(lin(g.child, env), g.field.name, sep = ".")
    case g: GetMapValue =>
      g.key match {
        case Literal(k, _) => narrow(lin(g.child, env), s"['$k']", sep = "")
        case k => Node.leaf(lin(g.child, env).all ++ lin(k, env).all)
      }
    case g: GetArrayItem =>
      g.ordinal match {
        case Literal(i, _) => narrow(lin(g.child, env), s"[$i]", sep = "")
        case i => Node.leaf(lin(g.child, env).all ++ lin(i, env).all)
      }
    case vg: VariantGet =>
      vg.path match {
        case Literal(p: UTF8String, _) =>
          // "$.m.k" → field path "m.k" under the variant column root
          narrow(lin(vg.child, env), p.toString.stripPrefix("$").stripPrefix("."), sep = ".")
        case p => Node.leaf(lin(vg.child, env).all ++ lin(p, env).all)
      }
    case cs: CreateNamedStruct =>
      Node(
        Set.empty,
        cs.names.zip(cs.valExprs).map { case (n, v) => n.toString -> lin(v, env) }.toMap,
        exact = false
      )
    case _ =>
      Node.leaf(e.children.foldLeft(Set.empty[(String, String)])((acc, c) => acc ++ lin(c, env).all))
  }

  /** Narrow a node to one extracted field: a plan-built struct keeps
    * the exact branch; a SOURCE path gets the field suffixed onto its
    * root (and stays a source path, so chains compose); a computed
    * value cannot be refined — its full contributing set stands
    * (empty path = whole-value pass-through, e.g. `$` on a variant).
    */
  private def narrow(n: Node, field: String, sep: String): Node =
    n.fields.get(field) match {
      case Some(sub) => sub
      case None if field.isEmpty => n
      case None if n.exact => Node.source(n.direct.map { case (t, p) => (t, s"$p$sep$field") })
      case None => Node.leaf(n.all)
    }

  private def build(p: LogicalPlan): Map[ExprId, Node] =
    leafTable(p) match {
      case Some(table) =>
        p.output.map(a => a.exprId -> Node.source(Set(table -> a.name))).toMap
      case None =>
        val env =
          p.children.map(build).foldLeft(Map.empty[ExprId, Node])(_ ++ _)
        def fromNamed(es: Seq[NamedExpression]): Map[ExprId, Node] =
          es.collect { case a: Alias => a.exprId -> lin(a.child, env) }.toMap
        val created: Map[ExprId, Node] = p match {
          case pr: Project => fromNamed(pr.projectList)
          case ag: Aggregate => fromNamed(ag.aggregateExpressions)
          case w: Window => fromNamed(w.windowExpressions)
          case g: Generate =>
            // explode / posexplode / inline: every generated column
            // derives from the generator's input value
            val src = Node.leaf(lin(g.generator, env).all)
            g.generatorOutput.map(a => a.exprId -> src).toMap
          case ex: Expand =>
            // rollup/cube/grouping sets: output column i is the
            // positional union across the projection rows
            ex.output.zipWithIndex.map { case (a, i) =>
              a.exprId -> ex.projections.foldLeft(Node.empty)((acc, proj) => acc.merge(lin(proj(i), env)))
            }.toMap
          case u: Union =>
            // Union exposes the FIRST child's attribute ids, but a
            // value in column i can come from ANY branch's column i —
            // the lineage is the positional union across branches
            u.output.zipWithIndex.map { case (a, i) =>
              a.exprId -> u.children.foldLeft(Node.empty) { (acc, c) =>
                acc.merge(env.getOrElse(c.output(i).exprId, Node.empty))
              }
            }.toMap
          case _ => Map.empty[ExprId, Node]
        }
        val known = env ++ created
        // FAIL CLOSED: an output attribute neither inherited nor
        // created above came from a node this fold doesn't model
        // (typed map/flatMap serializers, non-file leaves, …) — it
        // must surface as <unknown>, not vanish from the report
        val untraced = p.output
          .filter(a => !known.contains(a.exprId))
          .map(a => a.exprId -> Node.leaf(Set(Unknown)))
          .toMap
        known ++ untraced
    }
}
