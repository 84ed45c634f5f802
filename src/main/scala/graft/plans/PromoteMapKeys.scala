package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ElementAt, Expression, GetMapValue, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
  * from the same map key at write time.
  */
object PromoteMapKeys extends Rule[LogicalPlan] {

  val Prefix = "promoted_"

  def promotedName(key: String): String =
    Prefix + key.replaceAll("[^A-Za-z0-9]", "_")

  private val mapColumns = Set("fields_string", "fields_number")

  private def rewrite(e: Expression, inScope: Seq[Attribute]): Expression = {
    def promoted(mapAttr: AttributeReference, key: String): Option[Attribute] =
      inScope.find(a => a.name == promotedName(key) &&
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node if node.children.nonEmpty =>
      val inScope = node.children.flatMap(_.output)
      node.transformExpressionsUp {
        case e => rewrite(e, inScope)
      }
  }
}
