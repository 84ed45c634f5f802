package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left (event) row, attach the most recent
  * right (dimension) row with `rightTs <= leftTs` on the same key.
  *
  * Implementation is the union+window merge, not a range join: both sides
  * are interleaved per key in time order (dimension rows sorting first on
  * ties so a same-instant state applies), and a running `last(..,
  * ignoreNulls)` window carries the latest dimension values forward onto
  * every event row.
  *
  * Scale rationale: a range join (`l.key = r.key AND r.ts <= l.ts`)
  * materializes one intermediate row per (event × qualifying-dimension-row)
  * — with years of history per key that product explodes long before the
  * aggregation collapses it. The merge form is ONE hash shuffle on the key
  * and a linear per-partition pass, independent of history depth. (DuckDB's
  * native ASOF JOIN does the equivalent sort-merge; the oracle for
  * `join_range_asof` cross-checks both formulations.)
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    val lSide = left
      .withColumn("_k", col(leftKey))
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val rSide = right.select(
      (col(rightKey).as("_k") +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        rightValueCols.map(c => col(c).as(s"_rv_$c"))): _*)
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)

    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = unioned
      .withColumn("asof_ts",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
    val withVals = rightValueCols.foldLeft(withAsof) { (d, c) =>
      d.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(s"_rv_$c")), ignoreNulls = true).over(w))
    }
    withVals
      .where(col("_side") === 1)
      .drop(("_k" +: "_ts" +: "_side" +: rightValueCols.map(c => s"_rv_$c")): _*)
  }
}
