package graft.streaming

import graft.model.LogSchema
import graft.operators.{Ingest, IngestConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The klogs ingest pipeline as Structured Streaming: the reference's
  * Fluent Bit hook dataflow (/root/reference/main.go:237-377 — decode →
  * timestamp coercion → flatten → type dispatch → route → buffer → batch
  * INSERT) re-expressed as `readStream → ingest projection → foreachBatch
  * partitioned write`.
  *
  * Semantics mapping (and deliberate divergences, SURVEY.md §3.2):
  *  - micro-batch trigger ≈ `Flush_Interval` (size-OR-time buffering
  *    becomes Trigger.ProcessingTime + `maxFilesPerTrigger`; the size bound
  *    is a rate limit, not a row count, in Spark's model);
  *  - the reference is at-least-once (failed INSERT keeps the buffer and
  *    Fluent Bit retries the chunk, clickhouse.go:78-106); checkpointed
  *    foreachBatch + per-batch commit markers skip replayed batch ids, so
  *    duplicates are limited to a crash inside the write→marker window —
  *    the same at-least-once floor as the reference, with the common
  *    restart path deduplicated;
  *  - drain-on-shutdown (main.go:386-396) = stop() after the final batch,
  *    asserted in tests.
  */
object IngestStream {

  /** Raw JSON-lines source (one Fluent Bit record per line). */
  def readJsonLines(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    val r2 = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    r2.text(path)
  }

  /** The ingest projection: raw record line → log-schema row. Event time is
    * taken from a `ts` field when present (coerced per main.go:85-103),
    * else the injected fallback (the reference uses now()).
    */
  def ingested(raw: DataFrame, cfg: IngestConfig = IngestConfig(),
      fallbackTs: Option[java.sql.Timestamp] = None): DataFrame = {
    val fb = fallbackTs.map(t => lit(t)).getOrElse(current_timestamp())
    val ts = Ingest.coerceTimestamp(
      get_json_object(col("value"), "$.ts"), fb)
    Ingest.ingestJson(raw, col("value"), ts, cfg)
  }

  /** Partitioned-parquet sink with the reference's physical design (daily
    * partitions + sort key, LogSchema.writePartitioned) applied per batch.
    *
    * Idempotence: a replayed batch id (checkpoint not yet committed when
    * the driver died) is SKIPPED when its `_graft_batches/<id>` marker
    * exists, so the common restart path does not duplicate data. The
    * marker is written after the data, so a crash in between re-appends
    * that one batch on replay — at-least-once in the worst case, which is
    * exactly the reference's chunk-retry guarantee
    * (/root/reference/pkg/clickhouse/clickhouse.go:78-106). Parquet
    * readers ignore the underscore-prefixed marker directory.
    */
  def sinkPartitionedParquet(
      ingested: DataFrame,
      outPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    ingested.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val base = new org.apache.hadoop.fs.Path(outPath)
        val fs = base.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(base,
          s"_graft_batches/$batchId")
        if (!fs.exists(marker)) {
          LogSchema.writePartitioned(batch, outPath, mode = "append")
          fs.create(marker, true).close()
        }
        ()
      }

  /** End-to-end convenience: JSON-lines dir → ingest → partitioned parquet. */
  def start(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      checkpoint: String,
      cfg: IngestConfig = IngestConfig(),
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    sinkPartitionedParquet(
      ingested(readJsonLines(spark, inPath), cfg),
      outPath, checkpoint, trigger).start()

  /** [[start]] plus the ops surface the reference runs alongside the
    * pipeline (/root/reference/main.go:230-235: metrics server started at
    * plugin init): a [[StreamMetrics]] listener attached to the session and
    * a [[MetricsServer]] serving /health + /metrics on `metricsPort`
    * (0 = ephemeral). Caller stops both: `query.stop(); server.stop()`.
    */
  def startWithMetrics(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      checkpoint: String,
      cfg: IngestConfig = IngestConfig(),
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      metricsPort: Int = 2021): (StreamingQuery, MetricsServer) = {
    val metrics = StreamMetrics.attach(spark)
    val server = new MetricsServer(metrics, metricsPort)
    server.start()
    // if the query fails to start the caller never gets the server handle —
    // release the port (and the listener) instead of leaking them
    try {
      val query = start(spark, inPath, outPath, checkpoint, cfg, trigger)
      // scope the counters to THIS pipeline: other queries on the session
      // would otherwise count into the same totals
      metrics.restrictTo(query.id)
      (query, server)
    } catch {
      case e: Throwable =>
        server.stop()
        spark.streams.removeListener(metrics)
        throw e
    }
  }
}
