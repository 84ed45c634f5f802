package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BinaryComparison, ElementAt, EqualNullSafe, Expression, GetMapValue, IsNotNull, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
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

  private def rewrite(e: Expression, inScope: Seq[Attribute]): Expression = {
    def promoted(mapAttr: AttributeReference, key: String): Option[Attribute] =
      inScope.find(a =>
        a.metadata.contains(MetaSourceKey) &&
        a.metadata.contains(MetaSourceMap) &&
        a.metadata.getString(MetaSourceKey) == key &&
        a.metadata.getString(MetaSourceMap) == mapAttr.name &&
        a.dataType == e.dataType)

    e match {
      case ElementAt(m: AttributeReference, Literal(k: UTF8String, StringType), _, _)
          if mapColumns.contains(m.name) =>
        promoted(m, k.toString).getOrElse(e)
      case GetMapValue(m: AttributeReference, Literal(k: UTF8String, StringType))
          if mapColumns.contains(m.name) =>
        promoted(m, k.toString).getOrElse(e)
      case _ => e
    }
  }

  /** Drop `IsNotNull(map)` conjuncts made redundant by the rewrite.
    *
    * The main optimizer batches run BEFORE this rule, so constraint
    * inference has already added `isnotnull(fields_number)` next to the
    * subscript predicate. After the subscript rewrites to the promoted
    * column that conjunct is the only remaining reference to the map —
    * and it alone forces the scan to read the entire map column, which is
    * exactly the IO the promotion exists to avoid. It is safe to drop when
    * a null-intolerant comparison on a column promoted FROM that map sits
    * in the same conjunction: the promoted value is `element_at(map, k)`
    * materialized at write time, so a null map implies a null promoted
    * value, which the comparison already rejects. (EqualNullSafe is the one
    * comparison that passes NULLs — excluded.)
    */
  private def dropRedundantMapNullChecks(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val mapsImpliedNonNull: Set[String] = conjuncts.collect {
          case c: BinaryComparison if !c.isInstanceOf[EqualNullSafe] =>
            c.references.toSeq.collect {
              case a: AttributeReference if a.metadata.contains(MetaSourceMap) =>
                a.metadata.getString(MetaSourceMap)
            }
        }.flatten.toSet
        val kept = conjuncts.filterNot {
          case IsNotNull(m: AttributeReference) =>
            mapColumns.contains(m.name) && mapsImpliedNonNull.contains(m.name) &&
              // name-based provenance: require the name to be unambiguous in
              // scope (a self-join would carry two same-named map columns)
              child.output.count(_.name == m.name) == 1
          case _ => false
        }
        if (kept.length == conjuncts.length) f
        else if (kept.isEmpty) child
        else Filter(kept.reduce(And), child)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transformUp {
      case node if node.children.nonEmpty =>
        val inScope = node.children.flatMap(_.output)
        node.transformExpressionsUp {
          case e => rewrite(e, inScope)
        }
    }
    dropRedundantMapNullChecks(rewritten)
  }
}
