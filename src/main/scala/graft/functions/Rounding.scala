package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round` on DOUBLE converts through BigDecimal (HALF_UP on the
  * exact binary value); DuckDB's rounds half-away-from-zero on the double
  * itself (`floor(x*p+0.5)/p` for x ≥ 0). On tie values (…​.xx5) the two
  * disagree, which flips hash-compared results. All query outputs therefore
  * round with this explicit formula, which equals DuckDB `round(x, n)`
  * bit-for-bit so the oracle SQL can keep using plain `round`.
  */
object Rounding {
  /** Native single-eval form ([[graft.expressions.RoundHalfAway]]); the
    * session must have graft functions registered (all query entry points
    * do this via `GraftFunctions.registerAll`).
    */
  def r(c: Column, n: Int): Column =
    call_function("graft_round", c.cast("double"), lit(n))
  def r2(c: Column): Column = r(c, 2)
  def r3(c: Column): Column = r(c, 3)
  def r4(c: Column): Column = r(c, 4)
}
