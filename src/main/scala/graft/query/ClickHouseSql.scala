package graft.query

import graft.model.LogSchema
import graft.query.LogQuery._

/** Compile a parsed query to a ClickHouse WHERE clause over the reference
  * storage schema (/root/reference/schema.sql:3-19) — the SQL the
  * reference deployment's front-end issues against klogs-written tables.
  * Together with [[LogQuery.compile]] the same AST serves both backends:
  * Spark executes it natively, and an existing ClickHouse store accepts
  * the emitted clause through the JDBC sink's dialect connection.
  *
  * Operator mapping (the documented front-end semantics):
  * `=~` → `ILIKE`, `!~` → `NOT ILIKE`, `~` → `match()`, `_exists_ f` →
  * `mapContains` on either typed map; everything else is literal. No
  * null plumbing is emitted: ClickHouse map access yields the type
  * default for absent keys, which IS the reference behavior the Spark
  * compiler emulates with null-aware `!=` and two-valued `_not_` — each
  * backend compiles to its own null model to preserve the same observable
  * results.
  */
object ClickHouseSql {

  private val directColumns: Set[String] =
    LogSchema.schema.fieldNames.toSet - "fields_string" - "fields_number"

  /** `'` and `\` escaped the ClickHouse way (backslash escapes). */
  private def sqlString(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def num(d: Double): String =
    if (d == d.toLong && math.abs(d) < 1e15) d.toLong.toString
    else new java.math.BigDecimal(d).toPlainString

  private def ident(f: String): String = {
    require(f.nonEmpty && f.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '.' || c == '-' || c == '/'),
      s"illegal field name for SQL emission: '$f'")
    f
  }

  private def strField(f: String): String =
    if (directColumns(ident(f))) f else s"fields_string['${ident(f)}']"
  private def numField(f: String): String =
    if (directColumns(ident(f))) f else s"fields_number['${ident(f)}']"

  /** Emit one AST node as a ClickHouse boolean expression. */
  def emit(e: Expr): String = e match {
    case And(l, r) => s"(${emit(l)} AND ${emit(r)})"
    case Or(l, r) => s"(${emit(l)} OR ${emit(r)})"
    case Not(x) => s"NOT ${emit(x)}"
    case Exists(f) =>
      if (directColumns(ident(f))) s"$f IS NOT NULL"
      else s"(mapContains(fields_string, ${sqlString(f)})" +
        s" OR mapContains(fields_number, ${sqlString(f)}))"
    case Cmp(f, "=~", SLit(v)) => s"${strField(f)} ILIKE ${sqlString(v)}"
    case Cmp(f, "!~", SLit(v)) => s"${strField(f)} NOT ILIKE ${sqlString(v)}"
    case Cmp(f, "~", SLit(v)) => s"match(${strField(f)}, ${sqlString(v)})"
    case Cmp(f, op, SLit(v)) => s"${strField(f)} $op ${sqlString(v)}"
    case Cmp(f, op, NLit(v)) => s"${numField(f)} $op ${num(v)}"
  }

  /** Parse a query string and emit its WHERE clause; the empty query is
    * the match-everything `1`.
    */
  def where(query: String): String =
    parse(query).map(emit).getOrElse("1")
}
