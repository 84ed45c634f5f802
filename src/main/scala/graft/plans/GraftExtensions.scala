package graft.plans

import graft.expressions.{CosineSimilarity, DotProduct, MinHashSignature, SimHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Public extension entry point: load with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` to get
  * the graft function surface on any session (the query builders also
  * self-register defensively via [[graft.expressions.VectorExprs.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash(es.head)))
  }
}
