package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** graft_round(x DOUBLE, n INT) → DOUBLE: half-away-from-zero rounding on
  * the double value — DuckDB's `round(x, n)` semantics (Spark's `round`
  * goes through BigDecimal HALF_UP and disagrees on tie values).
  *
  * Exists as a native expression (rather than the equivalent
  * `when(x>=0, floor(x*p+0.5)).otherwise(ceil(x*p-0.5))/p` Column formula)
  * because the Column formula repeats `x` three times — fatal when `x` is
  * itself expensive (a cosine over a 64-dim vector evaluated per join
  * candidate pair).
  */
case class RoundHalfAway(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_round"
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(xAny: Any, nAny: Any): Any = {
    val x = xAny.asInstanceOf[Double]
    val p = math.pow(10, nAny.asInstanceOf[Int])
    if (x >= 0) math.floor(x * p + 0.5) / p else math.ceil(x * p - 0.5) / p
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, n) => {
      val p = ctx.freshName("p")
      s"""
         |double $p = java.lang.Math.pow(10, $n);
         |${ev.value} = ($x >= 0)
         |  ? java.lang.Math.floor($x * $p + 0.5) / $p
         |  : java.lang.Math.ceil($x * $p - 0.5) / $p;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
