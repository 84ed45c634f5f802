package graft

import graft.sources.Tables

/** The session reader cache's contracts: identity reuse within a session,
  * the documented pinned-listing staleness after external appends, and
  * invalidate() as the remedy.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("read() reuses one DataFrame per (session, path); invalidate() refreshes after appends") {
    val dir = tmp("tables-cache")
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$dir/region.parquet")
    val first = Tables.read(spark, dir, "region")
    assert(first.count() == 3)
    // same object back — no per-call listing/schema work
    assert(Tables.read(spark, dir, "region") eq first)
    // an external append is invisible to the pinned listing (documented)
    Seq(4L, 5L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    assert(Tables.read(spark, dir, "region").count() == 3,
      "cached reader must pin the listing it resolved with")
    Tables.invalidate(dir)
    val fresh = Tables.read(spark, dir, "region")
    assert(!(fresh eq first))
    assert(fresh.count() == 5, "invalidate() must pick up appended files")
    // spelling variants must not silently no-op
    Seq(6L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    Tables.invalidate(s"$dir///")
    assert(Tables.read(spark, dir, "region").count() == 6,
      "trailing slashes must still invalidate")
    Seq(7L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    Tables.invalidate(s"$dir/region.parquet")
    assert(Tables.read(spark, dir, "region").count() == 7,
      "an exact table path must invalidate its own entry")
  }

  test("events() adapts to either ts encoding the driver has shipped") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    // TIMESTAMP(MICROS): the current generator output — must pass through
    val micros = tmp("tables-ts-micros")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-10 12:00:00")))
      .toDF("event_id", "ts").write.parquet(s"$micros/events.parquet")
    val m = Tables.events(spark, micros)
    assert(m.schema("ts").dataType == TimestampType)
    assert(m.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0) == "2024-01-10 12:00:00")
    // int64 nanos (the TIMESTAMP(NANOS)-under-nanosAsLong shape of earlier
    // rounds): must be truncated to a µs TimestampType, not passed raw
    val nanos = tmp("tables-ts-nanos")
    val epochNs = 1704888000123456789L // 2024-01-10 12:00:00.123456789 UTC
    Seq((1L, epochNs)).toDF("event_id", "ts")
      .write.parquet(s"$nanos/events.parquet")
    val n = Tables.events(spark, nanos)
    assert(n.schema("ts").dataType == TimestampType)
    assert(n.select(unix_micros(col("ts"))).head.getLong(0) == epochNs / 1000)
  }

  test("raw SQL surface: the reference's logs.logs queries run verbatim over a written layout") {
    val dir = tmp("views-logdb")
    graft.model.LogSchema.writePartitioned(
      graft.model.LogSchema.logsFromEvents(
        graft.sources.Tables.events(spark, sf("sf0.001"))), dir)
    graft.sources.Views.registerLogDatabase(spark, dir)
    // the exact commands from /root/reference/README.md:146-151
    val n = spark.sql("SELECT count(*) FROM logs.logs").collect()(0).getLong(0)
    assert(n > 0 && n ==
      graft.sources.Tables.events(spark, sf("sf0.001")).count())
    assert(spark.sql("SELECT * FROM logs.logs LIMIT 10").collect().length == 10)
    assert(spark.sql("SELECT count(*) FROM logs.logs_local")
      .collect()(0).getLong(0) == n)
    // partition pruning works through the catalog table
    val pruned = spark.sql(
      "SELECT count(*) FROM logs.logs WHERE date = DATE'2024-01-10'")
    assert(pruned.queryExecution.executedPlan.toString
      .matches("(?s).*PartitionFilters: \\[[^\\]]*date[^\\]]*\\].*"))

    graft.sources.Views.register(spark, sf("sf0.001"))
    assert(spark.sql(
      "SELECT count(*) FROM logs WHERE namespace = 'error'")
      .collect()(0).getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) > 0)
  }
}
