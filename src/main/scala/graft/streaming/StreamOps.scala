package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming query operators over the ingested log stream (SURVEY.md §2.9).
  * All take/return streaming DataFrames; batch equivalents of the windowed
  * aggregations are oracle-checked in the Queries registry.
  */
object StreamOps {

  /** Tumbling-window event counts (the kobs volume chart, incremental).
    * Watermark bounds state: the reference accepts unbounded lateness
    * (main.go:100-101 falls back to now() and any event time lands wherever
    * its date partition says) which cannot scale — a documented divergence.
    */
  def tumblingCounts(
      logStream: DataFrame,
      window_ : String = "1 minute",
      watermark: String = "10 minutes",
      groupCols: Seq[String] = Seq("namespace")): DataFrame =
    logStream
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), window_) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Sliding-window counts. */
  def slidingCounts(
      logStream: DataFrame,
      window_ : String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    logStream
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), window_, slide))
      .agg(count(lit(1)).as("cnt"))

  /** Session windows per metadata key (30 min gap default). */
  def sessionCounts(
      logStream: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes",
      keyCol: String = "pod_name"): DataFrame =
    logStream
      .withWatermark("timestamp", watermark)
      .groupBy(session_window(col("timestamp"), gap), col(keyCol))
      .agg(count(lit(1)).as("cnt"))

  /** Stateful streaming dedup within the watermark on the given keys. */
  def dedupWithinWatermark(
      logStream: DataFrame,
      keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    logStream
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: correlate two live event streams on a
    * key within an event-time band — e.g. join error logs against a
    * deploy/audit stream to tag each error with the deployment that
    * preceded it. Both sides carry watermarks and the join condition
    * time-bounds right against left, which is exactly what Spark needs to
    * (a) know when a buffered left row can never match again and (b) evict
    * that state — an unbounded-condition stream-stream join grows state
    * forever and is unrunnable at log volume. State size ≈ input rate ×
    * (band + watermark), independent of stream lifetime.
    *
    * Inner by default; "left_outer" emits unmatched left rows once their
    * watermark expires (late-arriving right matches are then dropped —
    * the documented Spark semantics).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String = "timestamp",
      rightTime: String = "timestamp",
      lookBack: String = "10 minutes",
      lookAhead: String = "0 seconds",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $lookBack") &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $lookAhead"),
      joinType)
  }

  /** Streaming enrich against a static dimension (stream ⋈ static is
    * broadcast per micro-batch — no state).
    */
  def enrichWithStatic(
      logStream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    // dataset-qualified keys: unqualified col() is AMBIGUOUS_REFERENCE when
    // both sides share the key column name (the natural enrich call)
    logStream.join(broadcast(dim),
      logStream(streamKey) === dim(dimKey), "left_outer")
}
