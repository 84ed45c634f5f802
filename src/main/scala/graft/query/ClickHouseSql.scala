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

  // comparison operators legal in a Cmp node, by literal kind — emit() is
  // a public API over a stringly-typed AST, so the operator must be
  // validated like the field name is: an unknown op (or a pattern op with
  // a numeric literal) is rejected, never interpolated into SQL
  private val strOps = Set("=", "!=", "<", "<=", ">", ">=", "=~", "!~", "~")
  private val numOps = Set("=", "!=", "<", "<=", ">", ">=")

  /** `'` and `\` escaped the ClickHouse way (backslash escapes). */
  private def sqlString(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

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
      // CH string spine columns are non-nullable LowCardinality(String)
      // storing '' for absent values (schema.sql:5-11) — "exists" there
      // means non-empty, matching the Spark compiler's isNotNull on its
      // nullable reading of the same column. timestamp (DateTime64,
      // non-nullable, never "absent") keeps the vacuously-true type-safe
      // form.
      if (ident(f) == "timestamp") "timestamp IS NOT NULL"
      else if (directColumns(f)) s"$f != ''"
      else s"(mapContains(fields_string, ${sqlString(f)})" +
        s" OR mapContains(fields_number, ${sqlString(f)}))"
    case Cmp(f, "=~", SLit(v)) => s"${strField(f)} ILIKE ${sqlString(v)}"
    case Cmp(f, "!~", SLit(v)) => s"${strField(f)} NOT ILIKE ${sqlString(v)}"
    case Cmp(f, "~", SLit(v)) => s"match(${strField(f)}, ${sqlString(v)})"
    case Cmp(f, op, SLit(v)) if strOps(op) => s"${strField(f)} $op ${sqlString(v)}"
    case Cmp(f, op, NLit(v)) if numOps(op) =>
      s"${numField(f)} $op ${LogQuery.formatNum(v)}"
    case Cmp(f, op, v) => throw new IllegalArgumentException(
      s"operator '$op' is not emittable with $v (field '$f')")
  }

  /** Parse a query string and emit its WHERE clause; the empty query is
    * the match-everything `1`.
    */
  def where(query: String): String =
    parse(query).map(emit).getOrElse("1")
}
