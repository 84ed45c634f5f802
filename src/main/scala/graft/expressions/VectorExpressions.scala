package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math over `ARRAY<DOUBLE>`.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`) are
  * CodegenFallback — they evaluate interpreted, allocating per element. For
  * pairwise similarity (cosine inside a join condition evaluated per
  * candidate PAIR) that is the difference between a tight fused loop and
  * minutes of interpreter overhead, so these are implemented as proper
  * codegen expressions: one pass over both arrays, primitive accumulators,
  * no allocation.
  */
abstract class VectorPairExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** dot(a, b): sequential left-to-right sum of elementwise products (the
  * same association the DuckDB oracle's `list_sum(list_transform(...))`
  * uses, so results are bit-identical).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorPairExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot(a,b) / (||a|| * ||b||), computed in one fused pass.
  * Mirrors the oracle formula term-for-term.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorPairExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $x.getDouble($i); double $yv = $y.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level wrappers. Registration is idempotent and
  * works on any session (no extension config needed); production sessions
  * can instead load [[graft.plans.GraftExtensions]] via
  * `spark.sql.extensions`.
  */
object VectorExprs {
  def register(spark: SparkSession): Unit = GraftFunctions.registerAll(spark)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd dot product (arrays cast elementwise to double). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

  /** Codegen'd cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", asDouble(a), asDouble(b))

  /** Vector L2 norm with EXACTLY [[cosine]]'s internal accumulation order
    * (`sqrt` of the sequential x·x sum). Pair with [[cosineFromNorms]].
    */
  def norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(v, v))

  /** Cosine from norms precomputed via [[norm]]: one dot product per pair
    * instead of cosine's fused three-accumulator pass — 3× fewer flops in
    * O(pairs) scoring loops, with BIT-IDENTICAL results to [[cosine]]:
    * the element accumulation order matches, and `na * nb` preserves the
    * fused form's `sqrt(na) * sqrt(nb)` multiply order (pass the LEFT
    * argument's norm first). This invariant is what keeps hash-compared
    * oracle rows stable — change all of [[cosine]]/[[norm]]/this together
    * or not at all.
    *
    * PRECONDITION: `size(a) == size(b)`. The fused [[cosine]] kernel
    * accumulates dot/na/nb over min(|a|,|b|) elements, while [[norm]] sums
    * the FULL vector — on unequal lengths the decomposed form silently
    * diverges from [[cosine]] and the bit-identity contract above is void.
    * All callers score fixed-dimension embedding columns, where the
    * precondition holds by schema.
    */
  def cosineFromNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
