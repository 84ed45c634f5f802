package graft.plans

import graft.expressions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Public extension entry point: load with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` to get
  * the graft function surface on any session (the query builders also
  * self-register defensively via [[GraftFunctions.registerAll]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions.GraftFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => PromoteMapKeys)
  }
}
