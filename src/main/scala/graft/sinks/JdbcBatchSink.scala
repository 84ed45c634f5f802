package graft.sinks

import java.util.Properties
import java.util.concurrent.{ExecutorService, Executors, Future => JFuture}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** The production-shaped relational sink: transactional batched INSERTs
  * over JDBC, mirroring the reference's ClickHouse client
  * (/root/reference/pkg/clickhouse/clickhouse.go:59-108 — prepared INSERT,
  * per-batch transaction, commit-or-rollback) and its knobs
  * (Batch_Size main.go:37, Async_Insert / Wait_For_Async_Insert
  * clickhouse.go:65-76).
  *
  * Mapping notes:
  *  - Spark's JDBC writer already does prepared-statement batch inserts
  *    with per-partition transactions; `batchSize` maps to its `batchsize`.
  *  - `async=true` reproduces `wait_for_async_insert=0`: the micro-batch
  *    returns immediately and the INSERT completes in the background
  *    (at-most-once on crash — exactly the reference's fire-and-forget
  *    trade-off). `async=false` awaits (at-least-once under retry, the
  *    reference default).
  *  - MAP columns have no ANSI-SQL shape: [[mapsAsJson]] serializes them to
  *    JSON VARCHAR for generic JDBC targets. A ClickHouse JDBC driver with
  *    native Map support can skip that step.
  */
/** Target-dialect specifics. [[ClickHouseDialect]] reproduces the
  * reference's async-insert settings passthrough (clickhouse.go:65-76):
  * `async_insert = 1` hands buffering to the server, and
  * `wait_for_async_insert` picks acked (1) vs fire-and-forget (0) inserts.
  */
sealed trait SinkDialect
case object GenericDialect extends SinkDialect
final case class ClickHouseDialect(
    asyncInsert: Boolean = false,
    waitForAsyncInsert: Boolean = true) extends SinkDialect

case class JdbcSinkConfig(
    url: String,
    table: String,
    batchSize: Int = 10000,          // reference default, main.go:37
    async: Boolean = false,
    user: Option[String] = None,
    password: Option[String] = None,
    dialect: SinkDialect = GenericDialect)

object JdbcBatchSink {

  /** Serialize MAP columns to JSON strings (generic-JDBC compatibility). */
  def mapsAsJson(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: MapType => d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // ONE pool PER SINK (url#table), daemon threads: per-sink isolation must
  // hold at the executor too — with a single shared pool, one sink's hung
  // inserts would keep another sink's queued futures from ever starting,
  // and its drain would block on foreign work. Daemon: a fire-and-forget
  // pool must never keep the driver JVM alive after main returns.
  private val pools =
    scala.collection.concurrent.TrieMap.empty[String, ExecutorService]
  private def poolFor(key: String): ExecutorService =
    pools.getOrElseUpdate(key, Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, s"graft-jdbc-async-${key.hashCode.toHexString}")
        t.setDaemon(true)
        t
      }))
  /** Live per-sink pools — exposed for tests pinning the drain-time
    * eviction (a fully-drained sink must not leave idle threads behind).
    */
  private[graft] def activePoolCount: Int = pools.size

  private val pendingLock = new Object
  // pending futures PER SINK (url#table): one pipeline's drain must not
  // block on — or spin forever because of — another sink's inserts
  private var pending: Map[String, List[JFuture[_]]] = Map.empty

  private def sinkKey(cfg: JdbcSinkConfig): String = s"${cfg.url}#${cfg.table}"

  /** Count of async batches whose background INSERT failed (and was
    * dropped — the documented at-most-once trade-off). Exposed so callers
    * can alert on it; [[graft.streaming.StreamMetrics.recordError]] is the
    * natural wiring for the reference's errors_total.
    */
  val asyncInsertFailures = new java.util.concurrent.atomic.AtomicLong(0)

  private def props(cfg: JdbcSinkConfig): Properties = {
    val p = new Properties()
    p.setProperty("batchsize", cfg.batchSize.toString)
    cfg.user.foreach(p.setProperty("user", _))
    cfg.password.foreach(p.setProperty("password", _))
    p
  }

  /** The SETTINGS clause the reference appends to its INSERT
    * (clickhouse.go:65-76): empty unless the ClickHouse dialect enables
    * async_insert.
    */
  def settingsClause(dialect: SinkDialect): String = dialect match {
    case ClickHouseDialect(true, wait) =>
      s"SETTINGS async_insert = 1, wait_for_async_insert = ${if (wait) 1 else 0}"
    case _ => ""
  }

  /** The prepared INSERT the reference's statement-level writer runs
    * (clickhouse.go:76-77 — `INSERT INTO <table> (cols) VALUES (?…) SETTINGS
    * …`). The stock Spark JDBC writer generates its own statement text, so
    * this form is for statement-level integrations; [[effectiveUrl]] carries
    * the same settings for the Spark-writer path.
    */
  def insertSql(cfg: JdbcSinkConfig, columns: Seq[String]): String = {
    val settings = settingsClause(cfg.dialect)
    val tail = if (settings.isEmpty) "" else " " + settings
    s"INSERT INTO ${cfg.table} (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})$tail"
  }

  /** Dialect settings as JDBC-URL session parameters — the ClickHouse JDBC
    * driver applies URL query params as per-session server settings, so the
    * Spark JDBC writer's generated INSERTs run with the same async-insert
    * behavior the reference requests per statement.
    */
  def effectiveUrl(cfg: JdbcSinkConfig): String = cfg.dialect match {
    case ClickHouseDialect(true, wait) =>
      val sep = if (cfg.url.contains("?")) "&" else "?"
      s"${cfg.url}${sep}async_insert=1&wait_for_async_insert=${if (wait) 1 else 0}"
    case _ => cfg.url
  }

  /** Write one batch (transaction per partition, prepared-stmt batches). */
  def writeBatch(df: DataFrame, cfg: JdbcSinkConfig): Unit =
    mapsAsJson(df).write.mode("append").jdbc(effectiveUrl(cfg), cfg.table, props(cfg))

  /** `foreachBatch` hook honoring the async flag. A failed background
    * INSERT is reported through `onError` (default: log + count in
    * [[asyncInsertFailures]]) and the batch is dropped — the documented
    * at-most-once fire-and-forget trade-off, now OBSERVABLE instead of
    * silent. Pass `onError = m.recordError` to feed a pipeline's
    * errors_total.
    */
  def foreachBatchWriter(
      cfg: JdbcSinkConfig,
      onError: Throwable => Unit = defaultOnError): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      if (cfg.async) {
        // fire-and-forget (wait_for_async_insert=0). localCheckpoint
        // (eager) both materializes the batch AND truncates its lineage:
        // Spark documents the foreachBatch frame as invalid once the
        // invocation returns, so a plain persist could silently recompute
        // a STALE micro-batch plan on the pool thread after cached-block
        // loss (re-reading source files that may have been cleaned). With
        // the lineage cut, block loss fails the write loudly instead.
        val frozen = batch.localCheckpoint()
        // submit AND track under one lock: a drain() between submit and
        // tracking would snapshot an empty list and return while the
        // just-submitted INSERT is in flight
        pendingLock.synchronized {
          val key = sinkKey(cfg)
          val fut = poolFor(key).submit(new Runnable {
            override def run(): Unit =
              try writeBatch(frozen, cfg)
              catch { case e: Throwable => onError(e) }
              finally { releaseCheckpoint(frozen); () }
          })
          pending = pending.updated(key,
            fut :: pending.getOrElse(key, Nil).filterNot(_.isDone))
        }
      } else {
        writeBatch(batch, cfg)
      }
    }

  private def defaultOnError(e: Throwable): Unit = {
    asyncInsertFailures.incrementAndGet()
    log.error("async INSERT failed; batch dropped (at-most-once mode)", e)
  }

  /** Free a localCheckpoint'd batch's blocks promptly. `Dataset.unpersist`
    * only uncaches through the cache manager and is a NO-OP for checkpoint
    * blocks (they live on the underlying RDD, reclaimed lazily by the
    * ContextCleaner after driver GC) — a high-throughput async stream
    * would otherwise accumulate a block per batch between GC cycles.
    */
  private def releaseCheckpoint(frozen: DataFrame): Unit = {
    frozen.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try { lr.rdd.unpersist(false); () } catch { case _: Exception => }
      case _ => ()
    }
    frozen.unpersist()
    ()
  }

  /** Drain THIS sink's outstanding async writes (graceful shutdown — the
    * reference flushes its buffer on exit, main.go:386-396). Call AFTER
    * stopping the streaming query: a still-triggering stream keeps
    * submitting and the drain keeps (correctly) waiting for it.
    */
  def drain(cfg: JdbcSinkConfig): Unit = drainKeys(_ == sinkKey(cfg))

  /** Drain every sink's outstanding async writes (process shutdown). */
  def drain(): Unit = drainKeys(_ => true)

  private def drainKeys(select: String => Boolean): Unit = {
    def snapshot(): Map[String, List[JFuture[_]]] = pendingLock.synchronized {
      val (take, keep) = pending.partition { case (k, _) => select(k) }
      pending = keep
      take
    }
    def restore(m: Map[String, List[JFuture[_]]]): Unit = pendingLock.synchronized {
      m.foreach { case (k, fs) =>
        val live = fs.filterNot(_.isDone)
        if (live.nonEmpty)
          pending = pending.updated(k, live ::: pending.getOrElse(k, Nil))
      }
    }
    // loop: a trigger racing with shutdown can submit after we snapshot —
    // keep draining until a snapshot comes back empty
    var batch = snapshot()
    while (batch.nonEmpty) {
      for ((key, futures) <- batch; (f, i) <- futures.zipWithIndex) {
        try f.get()
        catch {
          case _: InterruptedException =>
            // shutdown wants to CANCEL the wait: restore the interrupt
            // flag, PUT BACK the futures we have not awaited (they were
            // removed by snapshot — abandoning them would make a retried
            // drain() return early while INSERTs are still in flight),
            // and stop draining
            restore(batch.updated(key, futures.drop(i)))
            Thread.currentThread().interrupt()
            return
          case _: Exception => () // write failures already reported via onError
        }
      }
      batch = snapshot()
    }
    // A fully-drained sink's pool is dead weight (2 idle daemon threads per
    // url#table — a driver cycling per-tenant sinks would accumulate them
    // forever): evict it. Under pendingLock so no submitter can race the
    // shutdown — foreachBatchWriter resolves poolFor(key) inside the same
    // lock, and a later batch simply gets a fresh pool from poolFor.
    pendingLock.synchronized {
      for (key <- pools.keys.toList if select(key) && !pending.contains(key))
        pools.remove(key).foreach(_.shutdown())
    }
  }
}
