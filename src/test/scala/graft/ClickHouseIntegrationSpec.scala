package graft

import java.nio.file.Files
import java.sql.DriverManager
import graft.operators.IngestConfig
import graft.sinks.{ClickHouseDialect, JdbcBatchSink, JdbcSinkConfig}
import graft.streaming.IngestStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** LIVE ClickHouse integration for the JDBC batch sink — the one
  * environment-gated suite in the repo. The sandbox has neither a
  * ClickHouse server nor its JDBC driver, so these tests CANCEL (not
  * fail) unless both are present; on any host with
  *
  * {{{
  *   export GRAFT_CLICKHOUSE_URL='jdbc:clickhouse://localhost:8123/default'
  *   # optional: GRAFT_CLICKHOUSE_USER / GRAFT_CLICKHOUSE_PASSWORD
  *   # plus the clickhouse-jdbc jar on the test classpath
  * }}}
  *
  * they self-activate and drive the production-shaped path end to end:
  * streamed micro-batches through [[JdbcBatchSink.foreachBatchWriter]]
  * with the ClickHouse dialect's `async_insert` SETTINGS passthrough
  * (reference semantics: /root/reference/pkg/clickhouse/clickhouse.go:
  * 59-108 — prepared INSERT, batched appends, async-insert settings),
  * read back over JDBC from a real MergeTree table. Everything the
  * server-free Derby suite (JdbcSinkSpec) cannot witness — the SETTINGS
  * clause being ACCEPTED, MergeTree round-trips, fire-and-forget
  * flushes landing — is covered here.
  */
class ClickHouseIntegrationSpec extends SparkTestBase {

  private val urlOpt = sys.env.get("GRAFT_CLICKHOUSE_URL")
  private val driverPresent = Seq(
    "com.clickhouse.jdbc.ClickHouseDriver", // clickhouse-jdbc ≥ 0.4
    "ru.yandex.clickhouse.ClickHouseDriver" // legacy artifact
  ).exists(c => scala.util.Try(Class.forName(c)).isSuccess)

  private def gate(): String = {
    assume(urlOpt.isDefined,
      "set GRAFT_CLICKHOUSE_URL to run the live ClickHouse suite")
    assume(driverPresent,
      "clickhouse-jdbc driver not on the test classpath")
    val url = urlOpt.get
    val probe = scala.util.Try {
      val c = connect(url); try c.isValid(5) finally c.close()
    }
    assume(probe.toOption.contains(true),
      s"no ClickHouse server answered at $url: $probe")
    url
  }

  private def connect(url: String): java.sql.Connection = {
    val p = new java.util.Properties()
    sys.env.get("GRAFT_CLICKHOUSE_USER").foreach(p.setProperty("user", _))
    sys.env.get("GRAFT_CLICKHOUSE_PASSWORD").foreach(p.setProperty("password", _))
    DriverManager.getConnection(url, p)
  }

  /** MergeTree DDL derived from the frame the sink will actually write
    * ([[JdbcBatchSink.mapsAsJson]] output — maps already rendered to
    * JSON strings), so the suite keeps tracking the ingest schema.
    */
  private def ddl(df: DataFrame, table: String): String = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.map { f =>
      val t = f.dataType match {
        case TimestampType => "DateTime64(3)"
        case DateType => "Date32"
        case LongType | IntegerType => "Int64"
        case DoubleType | FloatType => "Float64"
        case BooleanType => "UInt8"
        case _ => "String"
      }
      s"`${f.name}` ${if (f.nullable) s"Nullable($t)" else t}"
    }
    // tuple() ORDER BY: the suite verifies the SINK, not the layout —
    // the reference's real sort key is schema.sql's; layout tests live
    // against the parquet lake (LogSchemaSpec)
    s"CREATE TABLE $table (${cols.mkString(", ")}) " +
      "ENGINE = MergeTree ORDER BY tuple()"
  }

  private def fixture(n: Int): Seq[String] =
    (0 until n).map { i =>
      s"""{"ts":"2026-01-10T08:00:${f"${i % 60}%02d"}Z","kubernetes":{"namespace_name":"ns${i % 2}","pod_name":"pod-$i"},"log":"ch line $i","content":{"n":$i}}"""
    }

  private def scalarCount(url: String, table: String): Long = {
    val c = connect(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT count() FROM $table")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  private def withTable(url: String, table: String, df: DataFrame)(
      body: => Unit): Unit = {
    val c = connect(url)
    try {
      c.createStatement().execute(s"DROP TABLE IF EXISTS $table")
      c.createStatement().execute(ddl(df, table))
    } finally c.close()
    try body
    finally {
      val c2 = connect(url)
      try c2.createStatement().execute(s"DROP TABLE IF EXISTS $table")
      finally c2.close()
    }
  }

  private def streamInto(cfg: JdbcSinkConfig, rows: Int): DataFrame = {
    val in = tmp("graft-chin")
    Files.write(java.nio.file.Paths.get(in, "b.json"),
      fixture(rows).mkString("\n").getBytes("UTF-8"))
    val stream = IngestStream.ingested(
      IngestStream.readJsonLines(spark, in), IngestConfig())
    val q = stream.writeStream
      .option("checkpointLocation", tmp("graft-chckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(JdbcBatchSink.foreachBatchWriter(cfg))
      .start()
    q.processAllAvailable(); q.stop()
    JdbcBatchSink.mapsAsJson(stream)
  }

  test("acked async_insert round-trip: stream → MergeTree → count + content") {
    val url = gate()
    val table = "graft_it_acked"
    val cfg = JdbcSinkConfig(url, table, batchSize = 50,
      dialect = ClickHouseDialect(asyncInsert = true, waitForAsyncInsert = true))
    val shaped = JdbcBatchSink.mapsAsJson(IngestStream.ingested(
      IngestStream.readJsonLines(spark, tmp("graft-chshape")), IngestConfig()))
    withTable(url, table, shaped) {
      streamInto(cfg, 120)
      // wait_for_async_insert=1: rows are durable when the batch returns
      assert(scalarCount(url, table) == 120L)
      val c = connect(url)
      try {
        val rs = c.createStatement().executeQuery(
          s"SELECT count() FROM $table WHERE pod_name = 'pod-7'")
        rs.next(); assert(rs.getLong(1) == 1L)
      } finally c.close()
    }
  }

  test("fire-and-forget async_insert: drain returns, server flush lands the rows") {
    val url = gate()
    val table = "graft_it_fnf"
    val cfg = JdbcSinkConfig(url, table, batchSize = 50, async = true,
      dialect = ClickHouseDialect(asyncInsert = true, waitForAsyncInsert = false))
    val shaped = JdbcBatchSink.mapsAsJson(IngestStream.ingested(
      IngestStream.readJsonLines(spark, tmp("graft-chshape2")), IngestConfig()))
    withTable(url, table, shaped) {
      streamInto(cfg, 60)
      JdbcBatchSink.drain(cfg)
      // wait_for_async_insert=0 acks before the server-side flush — poll
      // to the server's async_insert_busy_timeout (default 200 ms) ceiling
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = scalarCount(url, table)
      while (n != 60L && System.nanoTime() < deadline) {
        Thread.sleep(250); n = scalarCount(url, table)
      }
      assert(n == 60L, s"async flush never landed: $n/60 rows")
    }
  }

  test("spark jdbc read-back: the sunk table is queryable as a DataFrame") {
    val url = gate()
    val table = "graft_it_read"
    val cfg = JdbcSinkConfig(url, table, batchSize = 50,
      dialect = ClickHouseDialect(asyncInsert = true, waitForAsyncInsert = true))
    val shaped = JdbcBatchSink.mapsAsJson(IngestStream.ingested(
      IngestStream.readJsonLines(spark, tmp("graft-chshape3")), IngestConfig()))
    withTable(url, table, shaped) {
      streamInto(cfg, 30)
      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", table).load()
      assert(back.count() == 30L)
      assert(back.where(col("namespace") === "ns1").count() == 15L)
    }
  }
}
