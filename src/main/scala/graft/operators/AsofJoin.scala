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
  * ignoreNulls)` window carries the latest dimension row forward onto
  * every event row (as one atomic struct — its NULL cells stay NULL).
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
    // withColumn silently REPLACES same-named columns: a left frame already
    // carrying one of the working names (plausible after a prior as-of
    // pass: asof_ts, asof_<col>) would be clobbered or corrupt the merge.
    // Fail fast, like interleaveMix does for its reserved names.
    val reserved = Seq("_k", "_ts", "_side", "_asof_row", "asof_ts") ++
      rightValueCols.map(c => s"_rv_$c") ++ rightValueCols.map(c => s"asof_$c")
    reserved.foreach { r =>
      require(!left.columns.contains(r),
        s"asofBackward reserves the column name `$r`; the left frame already has it — rename it first")
    }
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
    // Carry the most-recent dimension row as ONE struct: a per-column
    // last(ignoreNulls) would skip a NULL cell and backfill it from an older
    // row, mixing values across right rows. DuckDB ASOF semantics (and any
    // sane as-of) take the whole latest row, NULLs included — so the window
    // carries a single struct (non-null exactly on dimension rows) and the
    // value columns are projected out of it afterwards.
    val rowStruct = struct(
      (col("_ts").as("_asof_ts") +:
        rightValueCols.map(c => col(s"_rv_$c").as(c))): _*)
    val withAsof = unioned
      .withColumn("_asof_row",
        last(when(col("_side") === 0, rowStruct), ignoreNulls = true).over(w))
      .withColumn("asof_ts", col("_asof_row._asof_ts"))
    val withVals = rightValueCols.foldLeft(withAsof) { (d, c) =>
      d.withColumn(s"asof_$c", col("_asof_row")(c))
    }
    withVals
      .where(col("_side") === 1)
      .drop(("_k" +: "_ts" +: "_side" +: "_asof_row" +:
        rightValueCols.map(c => s"_rv_$c")): _*)
  }
}
