package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BinaryComparison, ElementAt, EqualNullSafe, Expression, GetMapValue, IsNotNull, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule implementing the reference's "promoted column" fast path
  * (/root/reference/README.md:68-84: `ALTER TABLE … ADD COLUMN content_level
  * String DEFAULT fields_string['content.level']` + MATERIALIZE) as an
  * automatic rewrite.
  *
  * A map-subscript predicate (`fields_string['content.level'] = 'error'`)
  * cannot push down to a parquet scan — the whole map column is read and
  * the predicate runs post-scan. When the table was written with a
  * materialized column `promoted_content_level` (naming convention:
  * `promoted_` + key with non-alphanumerics → `_`), this rule rewrites any
  * `element_at(fields_string, 'content.level')` / map-subscript whose
  * promoted twin is in scope to the plain column — after which Catalyst's
  * normal pushdown takes the predicate into the scan (row-group skipping on
  * min/max stats; the same effect the MergeTree materialized column gives
  * ClickHouse). This is where map-heavy query performance lives at 100 TB.
  *
  * Contract (same as the reference's): the promoted column was materialized
  * from the same map key at write time. Resolution is by COLUMN METADATA,
  * not by name: [[graft.model.LogSchema.withPromotedColumns]] records the
  * exact source map and key on each promoted column (and Spark persists
  * struct-field metadata through parquet), so distinct keys that sanitize
  * to the same identifier — `a.b` vs `a_b` — can never capture each other's
  * subscripts, and the rule is a no-op on tables that never opted in to
  * promotion (no metadata in scope → nothing rewrites).
  */
object PromoteMapKeys extends Rule[LogicalPlan] with PredicateHelper {

  val Prefix = "promoted_"

  /** Metadata keys recording a promoted column's provenance — the exact map
    * column and key it was materialized from (a materialized column serves
    * exactly one map key, /root/reference/README.md:68-84).
    */
  val MetaSourceMap = "graft.promoted.map"
  val MetaSourceKey = "graft.promoted.key"

  def promotedName(key: String): String =
    Prefix + key.replaceAll("[^A-Za-z0-9]", "_")

  private val mapColumns = Set("fields_string", "fields_number")

  /** Resolve the promoted twin of (map attribute, key) WITHIN THE SUBTREE
    * that produced the map attribute. Resolution descends from `node` into
    * the child chain whose output carries the map attr's exprId and accepts
    * a metadata-matching promoted column only from single-child (or leaf)
    * nodes on that chain — never at a Join/Union, whose output mixes
    * relations. Without this restriction, a join of a promoted table A with
    * any other frame B carrying a same-named map would let A's promoted
    * column capture B's subscript (different data, silent wrong answers).
    */
  private def resolvePromoted(
      node: LogicalPlan,
      m: AttributeReference,
      key: String,
      dt: DataType): Option[Attribute] = {
    def matches(a: Attribute): Boolean =
      a.metadata.contains(MetaSourceKey) &&
        a.metadata.contains(MetaSourceMap) &&
        a.metadata.getString(MetaSourceKey) == key &&
        a.metadata.getString(MetaSourceMap) == m.name &&
        a.dataType == dt
    def search(p: LogicalPlan): Option[Attribute] =
      if (!p.output.exists(_.exprId == m.exprId)) None
      else {
        val deeper = p.children
          .find(_.output.exists(_.exprId == m.exprId)).flatMap(search)
        deeper.orElse(
          if (p.children.length <= 1) p.output.find(matches) else None)
      }
    node.children.find(_.output.exists(_.exprId == m.exprId)).flatMap(search)
      // The rewritten expression must BIND against the node's direct
      // children: a promoted column can be found deep on the provenance
      // chain yet be PRUNED by an intermediate Project (e.g. a
      // nondeterministic projection that also blocks filter pushdown) —
      // rewriting to it would reference an attribute the child never
      // produces and fail at binding. Out of scope ⇒ leave the subscript.
      .filter(found => node.children.exists(_.output.exists(_.exprId == found.exprId)))
  }

  /** Subscript shapes this rule rewrites: `element_at`/`try_element_at` and
    * the `map[key]` accessor, with a literal string key on one of the log
    * map columns.
    */
  private object MapSubscript {
    def unapply(e: Expression): Option[(AttributeReference, String)] = e match {
      case ElementAt(m: AttributeReference, Literal(k: UTF8String, StringType), _, _)
          if mapColumns.contains(m.name) => Some((m, k.toString))
      case GetMapValue(m: AttributeReference, Literal(k: UTF8String, StringType))
          if mapColumns.contains(m.name) => Some((m, k.toString))
      case _ => None
    }
  }

  /** Map attrs (by exprId) whose subscript sits inside a null-REJECTING
    * comparison conjunct AND resolves to a promoted column. For those, the
    * inferred `isnotnull(map)` conjunct is redundant after the rewrite —
    * the promoted value is `element_at(map, k)` materialized at write time,
    * so a null map implies a null promoted value, which the comparison
    * already rejects — and dropping it is what lets the scan skip the map
    * column entirely.
    *
    * "Null-rejecting" is checked structurally, not by mere containment: the
    * subscript must be reachable from the comparison through NULL-INTOLERANT
    * nodes only (`Expression.nullIntolerant` — null child ⇒ null result),
    * so a null map provably nulls the comparison and the row is filtered.
    * A null-tolerant wrapper (`coalesce(element_at(m,k), 0) > -1`,
    * `isnull(element_at(m,k)) = true`) stops the walk: such a conjunct says
    * nothing about null maps, and dropping an explicit `isnotnull(map)`
    * beside it would let null-map rows through — silent wrong results.
    * (EqualNullSafe passes NULL operands — excluded for the same reason.)
    */
  private def impliedMapIds(node: Filter): Set[org.apache.spark.sql.catalyst.expressions.ExprId] = {
    def nullPropagating(e: Expression): Seq[org.apache.spark.sql.catalyst.expressions.ExprId] =
      e match {
        case sub @ MapSubscript(m, key)
            if resolvePromoted(node, m, key, sub.dataType).isDefined =>
          Seq(m.exprId)
        case _ if e.nullIntolerant => e.children.flatMap(nullPropagating)
        case _ => Seq.empty
      }
    splitConjunctivePredicates(node.condition).collect {
      case c: BinaryComparison if !c.isInstanceOf[EqualNullSafe] =>
        c.children.flatMap(nullPropagating)
    }.flatten.toSet
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node if node.children.nonEmpty =>
      val dropIds = node match {
        case f: Filter => impliedMapIds(f)
        case _ => Set.empty[org.apache.spark.sql.catalyst.expressions.ExprId]
      }
      val rewritten = node.transformExpressionsUp {
        case e @ MapSubscript(m, key) =>
          resolvePromoted(node, m, key, e.dataType).getOrElse(e)
      }
      rewritten match {
        case f @ Filter(cond, child) if dropIds.nonEmpty =>
          val kept = splitConjunctivePredicates(cond).filterNot {
            case IsNotNull(a: AttributeReference) => dropIds.contains(a.exprId)
            case _ => false
          }
          if (kept.isEmpty) child else Filter(kept.reduce(And), child)
        case other => other
      }
  }
}
