package graft

import java.nio.file.Files
import graft.operators.IngestConfig
import graft.sinks.{ClickHouseDialect, GenericDialect, JdbcBatchSink, JdbcSinkConfig}
import graft.streaming.IngestStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end JDBC sink against embedded Derby: the production-shaped
  * batched-INSERT path actually inserting and reading back.
  */
class JdbcSinkSpec extends SparkTestBase {

  private def derbyUrl(name: String): String = {
    val dir = tmp("graft-derby")
    s"jdbc:derby:$dir/$name;create=true"
  }

  private def fixture(n: Int): Seq[String] =
    (0 until n).map { i =>
      s"""{"ts":"2026-01-10T08:00:${f"${i % 60}%02d"}Z","kubernetes":{"namespace_name":"ns${i % 2}","pod_name":"pod-$i"},"log":"line $i","content":{"n":$i}}"""
    }

  test("batched INSERT round-trip: stream → derby → read back") {
    val url = derbyUrl("logs")
    val cfg = JdbcSinkConfig(url, "logs_local", batchSize = 50)
    val in = tmp("graft-jin")
    Files.write(java.nio.file.Paths.get(in, "b.json"),
      fixture(120).mkString("\n").getBytes)

    val stream = IngestStream.ingested(
      IngestStream.readJsonLines(spark, in), IngestConfig())
    val q = stream.writeStream
      .option("checkpointLocation", tmp("graft-jckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(JdbcBatchSink.foreachBatchWriter(cfg))
      .start()
    q.processAllAvailable(); q.stop()

    // pushDownPredicate=false: Derby maps strings to CLOB, which rejects
    // pushed equality predicates — filter Spark-side instead
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "logs_local")
      .option("pushDownPredicate", "false").load()
    assert(back.count() == 120)
    // map columns rode as JSON text and survive a parse
    val n7 = back.where(col("POD_NAME") === "pod-7")
      .select(get_json_object(col("FIELDS_NUMBER"), "$['content_n']"))
      .collect()(0).getString(0)
    assert(n7.toDouble == 7.0)
  }

  test("async mode: foreachBatch returns before rows land; drain completes them") {
    val url = derbyUrl("async")
    val cfg = JdbcSinkConfig(url, "logs_async", batchSize = 50, async = true)
    val in = tmp("graft-jin2")
    Files.write(java.nio.file.Paths.get(in, "b.json"),
      fixture(60).mkString("\n").getBytes)

    val stream = IngestStream.ingested(
      IngestStream.readJsonLines(spark, in), IngestConfig())
    val q = stream.writeStream
      .option("checkpointLocation", tmp("graft-jckpt2"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(JdbcBatchSink.foreachBatchWriter(cfg))
      .start()
    q.processAllAvailable(); q.stop()
    JdbcBatchSink.drain() // graceful shutdown flush (main.go:386-396 mirror)

    val back = spark.read.jdbc(url, "logs_async", new java.util.Properties())
    assert(back.count() == 60)
    // a completed global drain must also have EVICTED every sink's pool —
    // a driver cycling per-tenant sinks would otherwise accumulate two
    // idle daemon threads per url#table forever
    assert(JdbcBatchSink.activePoolCount == 0,
      "drained sinks must not leave executor pools behind")
  }

  test("async INSERT failure is observable — onError fires, drain completes, nothing hangs") {
    val before = JdbcBatchSink.asyncInsertFailures.get
    val cfg = JdbcSinkConfig("jdbc:derby:/nonexistent/nope", "logs_bad", async = true)
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val writer = JdbcBatchSink.foreachBatchWriter(cfg,
      onError = _ => { errors.incrementAndGet(); () })
    writer(spark.range(5).toDF("v"), 0L)
    JdbcBatchSink.drain(cfg) // per-sink drain: must not wait on other sinks
    assert(errors.get == 1, "the failed background INSERT must be reported")
    // the default handler (not used here) counts into asyncInsertFailures
    assert(JdbcBatchSink.asyncInsertFailures.get == before)
  }

  test("ClickHouse dialect emits the reference's async_insert SETTINGS passthrough") {
    // clickhouse.go:65-77 parity: the statement form carries the SETTINGS
    // clause, URL form carries the same settings as session params
    val cols = Seq("timestamp", "cluster", "namespace", "app", "pod_name",
      "container_name", "host", "fields_string", "fields_number", "log")
    val fire = JdbcSinkConfig("jdbc:ch://host:8123/db", "db.logs",
      dialect = ClickHouseDialect(asyncInsert = true, waitForAsyncInsert = false))
    assert(JdbcBatchSink.insertSql(fire, cols) ==
      "INSERT INTO db.logs (timestamp, cluster, namespace, app, pod_name, " +
        "container_name, host, fields_string, fields_number, log) " +
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?) " +
        "SETTINGS async_insert = 1, wait_for_async_insert = 0")
    assert(JdbcBatchSink.effectiveUrl(fire) ==
      "jdbc:ch://host:8123/db?async_insert=1&wait_for_async_insert=0")

    val acked = fire.copy(dialect = ClickHouseDialect(asyncInsert = true))
    assert(JdbcBatchSink.insertSql(acked, Seq("a")).endsWith(
      "SETTINGS async_insert = 1, wait_for_async_insert = 1"))
    val withParams = acked.copy(url = "jdbc:ch://host:8123/db?ssl=true")
    assert(JdbcBatchSink.effectiveUrl(withParams) ==
      "jdbc:ch://host:8123/db?ssl=true&async_insert=1&wait_for_async_insert=1")

    // async_insert off or generic dialect: no settings anywhere
    val off = fire.copy(dialect = ClickHouseDialect(asyncInsert = false))
    assert(JdbcBatchSink.insertSql(off, Seq("a")) == "INSERT INTO db.logs (a) VALUES (?)")
    assert(JdbcBatchSink.effectiveUrl(off) == "jdbc:ch://host:8123/db")
    val generic = fire.copy(dialect = GenericDialect)
    assert(JdbcBatchSink.insertSql(generic, Seq("a")) == "INSERT INTO db.logs (a) VALUES (?)")
    assert(JdbcBatchSink.effectiveUrl(generic) == "jdbc:ch://host:8123/db")
  }
}
