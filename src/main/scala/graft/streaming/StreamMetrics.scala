package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Pipeline observability mirroring the reference's Prometheus metrics
  * (/root/reference/main.go:52-74: input_records_total, errors_total,
  * batch_size and flush_time_seconds summaries) via a
  * StreamingQueryListener. Counters are process-local (the reference's are
  * too — per-DaemonSet-pod); export to any metrics sink can hang off
  * [[snapshot]].
  */
class StreamMetrics extends StreamingQueryListener {
  val inputRecordsTotal = new AtomicLong(0)
  val batchesTotal = new AtomicLong(0)
  val lastBatchSize = new AtomicLong(0)
  val lastFlushSeconds = new AtomicReference[Double](0.0)

  // Spark delivers every query's events to every listener on the session;
  // unscoped, two pipelines would double-count into each other's metrics.
  // None = count all queries (the generic attach()); set via restrictToName.
  // Name-based (not query-id) so the restriction can be installed BEFORE
  // the query starts — the id only exists post-start, leaving a window
  // where foreign events would still count.
  private val only = new AtomicReference[Option[String]](None)

  /** Count only the streaming query carrying this `queryName`. */
  def restrictToName(queryName: String): Unit = only.set(Some(queryName))

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (only.get.forall(n => n == p.name)) {
      inputRecordsTotal.addAndGet(p.numInputRows)
      batchesTotal.incrementAndGet()
      lastBatchSize.set(p.numInputRows)
      Option(p.durationMs.get("triggerExecution"))
        .foreach(ms => lastFlushSeconds.set(ms.toDouble / 1000.0))
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, Double] = Map(
    "input_records_total" -> inputRecordsTotal.get.toDouble,
    "batches_total" -> batchesTotal.get.toDouble,
    "batch_size" -> lastBatchSize.get.toDouble,
    "flush_time_seconds" -> lastFlushSeconds.get,
  )
}

object StreamMetrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }
}
