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
  def r(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    when(c >= 0, floor(c * p + 0.5)).otherwise(ceil(c * p - 0.5)) / p
  }
  def r2(c: Column): Column = r(c, 2)
  def r3(c: Column): Column = r(c, 3)
  def r4(c: Column): Column = r(c, 4)
}
