package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Volume-anomaly detection and spike attribution over the log table — the
  * alerting/triage pair every klogs deployment runs on this exact schema
  * (the kobs volume chart is the manual version: a human looks for the
  * spike, then drills into which app caused it; these make both steps
  * queries).
  *
  * Scale shape: both are one partial-aggregated shuffle to bucket/dimension
  * cardinality (thousands of rows at 100 TB), then window/score arithmetic
  * on that tiny aggregate. The raw table is touched exactly once each, with
  * time predicates eligible for partition pruning on the written layout.
  */
object Anomaly {

  /** Trailing z-score over bucketed counts: each (dims, bucket) count is
    * compared against the mean/stddev of that dimension's `lookback`
    * PRECEDING non-empty buckets; buckets without a full baseline (series
    * head) are dropped.
    *
    * The deviation is floored at the Poisson noise level —
    * `sd_eff = max(sd, sqrt(mu))` — because event counts are ~Poisson: a
    * baseline that HAPPENED to be flat has zero sample variance, which
    * would make the first real spike divide by zero (or flag a +1 blip at
    * infinite sigma). The floor keeps z defined for every bucket and
    * calibrated to count noise.
    *
    * Variance is derived from exact integer window sums (n, Σ, Σ²) rather
    * than a streaming stddev aggregate, so the result is a deterministic
    * function of the counts — reproducible across engines and partition
    * orders bit-for-bit (sample variance: (Σ² − Σ²/n)/(n−1)).
    *
    * Returns (dims…, bucket_ms, cnt, mu, sd, z, is_anomaly); `sd` is the
    * effective (floored) deviation the score uses.
    */
  def volumeAnomalies(
      df: DataFrame,
      tsCol: Column,
      dims: Seq[String],
      bucket: String = "hour",
      lookback: Int = 24,
      minSigma: Double = 3.0): DataFrame = {
    val counts = df
      .groupBy(dims.map(col) :+ date_trunc(bucket, tsCol).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(dims.map(col): _*).orderBy("bucket")
      .rowsBetween(-lookback, -1)
    val withBase = counts
      .withColumn("n_base", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n_base") === lookback)
    val n = col("n_base").cast(DoubleType)
    val mu = col("s1").cast(DoubleType) / n
    val variance =
      (col("s2").cast(DoubleType) - col("s1").cast(DoubleType) * mu) / (n - 1)
    val sd = greatest(sqrt(variance), sqrt(mu))
    val z = (col("cnt").cast(DoubleType) - mu) / sd
    withBase
      .select(dims.map(col) ++ Seq(
        unix_millis(col("bucket")).as("bucket_ms"),
        col("cnt"),
        graft.functions.Rounding.r(mu, 4).as("mu"),
        graft.functions.Rounding.r(sd, 4).as("sd"),
        graft.functions.Rounding.r(z, 4).as("z"),
        (z >= minSigma).as("is_anomaly")): _*)
  }

  /** Shannon entropy of a categorical column per group — the diversity
    * metric for both ops ("did this service's event mix collapse?") and
    * corpus curation ("how balanced is this shard's domain mix?").
    * Returns per group: total rows, distinct values, entropy (nats) and
    * the 0..1 normalized form (H / ln(distinct); 1.0 for the uniform
    * distribution, 0 for a single value — emitted as 0 when a group has
    * one distinct value).
    *
    * One partial-aggregated shuffle to (group, value) cardinality, then
    * a window + final aggregate over that tiny frame.
    */
  def entropy(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val counts = df
      .groupBy(groupCols.map(col) :+ valueCol.as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val p = col("_c").cast(DoubleType) / col("_total").cast(DoubleType)
    val withTotal = counts.withColumn("_total", sum(col("_c")).over(w))
    withTotal
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("_total")).as("n"),
        count(lit(1)).as("n_distinct"),
        (-sum(p * log(p))).as("_h"))
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("n_distinct"),
        graft.functions.Rounding.r(col("_h"), 4).as("entropy"),
        graft.functions.Rounding.r(
          when(col("n_distinct") > 1,
            col("_h") / log(col("n_distinct").cast(DoubleType)))
            .otherwise(lit(0.0)), 4).as("entropy_norm")): _*)
  }

  /** Spike attribution: who drove the volume change between two windows?
    * Per dimension value, count in the spike window vs the baseline
    * window, each as a share of its window's total; `delta_share` ranks
    * contributors (a dimension whose traffic share grew claimed the
    * spike), `lift` is the per-dim rate change normalized by the overall
    * rate change (NULL when the dim is absent from the baseline).
    *
    * One pass over the rows in either window (conditional aggregation);
    * window totals come from an unpartitioned window over the per-dim
    * aggregate — one exchange of the TINY dimension table to a single
    * partition, not a second scan of the raw rows.
    */
  def contributors(
      df: DataFrame,
      tsCol: Column,
      dims: Seq[String],
      spikeFrom: Column, spikeTo: Column,
      baseFrom: Column, baseTo: Column): DataFrame = {
    val inSpike = tsCol >= spikeFrom && tsCol < spikeTo
    val inBase = tsCol >= baseFrom && tsCol < baseTo
    val perDim = df.where(inSpike || inBase)
      .groupBy(dims.map(col): _*)
      .agg(
        count(when(inSpike, 1)).as("cnt_spike"),
        count(when(inBase, 1)).as("cnt_base"))
    val all = Window.partitionBy()
    val shareSpike = col("cnt_spike").cast(DoubleType) / col("total_spike")
    val shareBase = col("cnt_base").cast(DoubleType) / col("total_base")
    val lift = when(col("cnt_base") > 0,
      (col("cnt_spike").cast(DoubleType) * col("total_base")) /
        (col("cnt_base").cast(DoubleType) * col("total_spike")))
    perDim
      .withColumn("total_spike", sum(col("cnt_spike")).over(all))
      .withColumn("total_base", sum(col("cnt_base")).over(all))
      .select(dims.map(col) ++ Seq(
        col("cnt_spike"), col("cnt_base"),
        graft.functions.Rounding.r(shareSpike, 4).as("share_spike"),
        graft.functions.Rounding.r(shareBase, 4).as("share_base"),
        graft.functions.Rounding.r(shareSpike - shareBase, 4).as("delta_share"),
        graft.functions.Rounding.r(lift, 4).as("lift")): _*)
  }
}
