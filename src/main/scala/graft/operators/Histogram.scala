package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The read path of the equal-width histogram (`agg_histogram` writes the
  * buckets; dashboards consume them as percentiles without touching raw
  * data — PromQL's `histogram_quantile` contract, linear interpolation
  * inside the crossing bucket).
  *
  * Estimate for quantile q: rank = q·total; find the first bucket (bins
  * ascending) whose cumulative count reaches rank; interpolate
  * `lo + width·(rank − cumBefore)/cnt` within it. All inputs are exact
  * integer counts, so the double arithmetic is engine-reproducible.
  *
  * Scale shape: operates on the ALREADY-AGGREGATED bucket frame (group ×
  * bins rows — thousands, not raw cardinality); one window pass + a
  * rank-1 selection per (group, q).
  */
object Histogram {

  def histogramQuantile(
      buckets: DataFrame,
      groupCols: Seq[String],
      binCol: String,
      cntCol: String,
      width: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val grp = groupCols.map(col)
    val ordered = Window.partitionBy(grp: _*).orderBy(col(binCol))
    val whole = Window.partitionBy(grp: _*)
    val cum = buckets
      .withColumn("_cum", sum(col(cntCol)).over(ordered))
      .withColumn("_total", sum(col(cntCol)).over(whole))
      .withColumn("q", explode(lit(qs.toArray)))
    val rank = col("q") * col("_total").cast(DoubleType)
    val crossing = Window.partitionBy(grp :+ col("q"): _*).orderBy(col(binCol))
    val est = col(binCol).cast(DoubleType) * width + lit(width) *
      (rank - (col("_cum") - col(cntCol)).cast(DoubleType)) /
      col(cntCol).cast(DoubleType)
    cum
      .where(col("_cum").cast(DoubleType) >= rank)
      .withColumn("_rk", row_number().over(crossing))
      .where(col("_rk") === 1)
      .select(grp ++ Seq(col("q"),
        graft.functions.Rounding.r(est, 4).as("est")): _*)
  }
}
