package graft

import graft.model.LogSchema
import graft.query.LogQuery
import graft.query.LogQuery._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The query-language front-end: parser shape, compiled predicate
  * semantics over the log schema (including the documented ClickHouse
  * missing-key divergences), and the promoted-column pushdown path.
  */
class LogQuerySpec extends SparkTestBase {

  // ------------------------------------------------------------ parser

  test("precedence: _and_ binds tighter than _or_, _not_ tightest") {
    assert(parse("a='1' _or_ b='2' _and_ c='3'") ===
      Some(Or(Cmp("a", "=", SLit("1")),
        And(Cmp("b", "=", SLit("2")), Cmp("c", "=", SLit("3"))))))
    assert(parse("_not_ a='1' _and_ b='2'") ===
      Some(And(Not(Cmp("a", "=", SLit("1"))), Cmp("b", "=", SLit("2")))))
  }

  test("parentheses override precedence") {
    assert(parse("(a='1' _or_ b='2') _and_ c='3'") ===
      Some(And(Or(Cmp("a", "=", SLit("1")), Cmp("b", "=", SLit("2"))),
        Cmp("c", "=", SLit("3")))))
  }

  test("all comparison operators and literal forms lex correctly") {
    assert(parse("f>=1.5") === Some(Cmp("f", ">=", NLit(1.5))))
    assert(parse("f<=-2") === Some(Cmp("f", "<=", NLit(-2.0))))
    assert(parse("f!='x'") === Some(Cmp("f", "!=", SLit("x"))))
    assert(parse("f=~'%GET%'") === Some(Cmp("f", "=~", SLit("%GET%"))))
    assert(parse("f!~'%GET%'") === Some(Cmp("f", "!~", SLit("%GET%"))))
    assert(parse("f~'a.*b'") === Some(Cmp("f", "~", SLit("a.*b"))))
    assert(parse("_exists_ content.level") === Some(Exists("content.level")))
    // bare-word sugar and quote escapes
    assert(parse("level=error") === Some(Cmp("level", "=", SLit("error"))))
    assert(parse("msg='it''s'") === Some(Cmp("msg", "=", SLit("it's"))))
    assert(parse("msg='it\\'s'") === Some(Cmp("msg", "=", SLit("it's"))))
    // a digit-leading word is a field name, not a malformed number
    assert(parse("2xx_rate>0.5") === Some(Cmp("2xx_rate", ">", NLit(0.5))))
    assert(parse("   ") === None)
  }

  test("malformed queries fail with positioned errors") {
    def bad(q: String): Int =
      intercept[ParseException](parse(q)).pos
    assert(bad("a='unterminated") === 2)
    assert(bad("(a='1'") === 0) // points at the unclosed '('
    assert(bad("a='1' b='2'") >= 6) // trailing input
    assert(bad("a ~ 5") >= 4) // regex needs a pattern
    assert(bad("_exists_ =") === 0)
    assert(bad("a=='1'") >= 0) // `==` lexes as `=` then stray `=`
    // a double-overflowing literal is rejected with a position, not
    // deferred to a formatting crash in render/emission
    assert(bad("f>" + "9" * 400) === 2)
  }

  test("the map columns themselves resolve as dynamic field names, not as columns") {
    // `fields_string='x'` must not build MapType === String (analysis
    // error); it reads a dynamic field named fields_string — absent here
    assert(ids("fields_string!='x'") === Seq(1L, 2L, 3L, 4L))
    assert(ids("fields_number<1") === Seq())
    assert(LogQuery.filter(logsDf, "fields_string='x'").count() === 0)
  }

  // --------------------------------------------------------- semantics

  /** Four hand-built rows in the LogSchema shape:
    *   id 1: app=web,  level=error present, code=500
    *   id 2: app=web,  level absent,        code=200
    *   id 3: app=api,  level=info,          code absent
    *   id 4: app absent (null),             both maps empty
    */
  private lazy val logsDf: DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (1L, "web", Map("level" -> "error"), Map("code" -> 500.0)),
      (2L, "web", Map.empty[String, String], Map("code" -> 200.0)),
      (3L, "api", Map("level" -> "info"), Map.empty[String, Double]),
      (4L, null.asInstanceOf[String], Map.empty[String, String], Map.empty[String, Double]),
    ).map { case (id, app, fs, fn) =>
      org.apache.spark.sql.Row(id, app, fs.asJava, fn.asJava)
    }
    spark.createDataFrame(
      rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("app", org.apache.spark.sql.types.StringType),
        LogSchema.schema("fields_string"),
        LogSchema.schema("fields_number"))))
  }

  private def ids(q: String): Seq[Long] =
    LogQuery.filter(logsDf, q).select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("direct column vs dynamic field resolution") {
    assert(ids("app='web'") === Seq(1L, 2L))
    assert(ids("level='error'") === Seq(1L))
    assert(ids("code>=300") === Seq(1L))
    assert(ids("code<300") === Seq(2L))
  }

  test("!= is null-aware: rows missing the key match (reference semantics)") {
    assert(ids("level!='error'") === Seq(2L, 3L, 4L))
    assert(ids("code!=500") === Seq(2L, 3L, 4L))
    // direct columns too: a NULL app is "not web"
    assert(ids("app!='web'") === Seq(3L, 4L))
  }

  test("pattern operators: =~ is case-insensitive LIKE, ~ is regex, !~ null-aware") {
    assert(ids("level=~'%ERR%'") === Seq(1L))
    assert(ids("level~'^(error|fatal)$'") === Seq(1L))
    assert(ids("level!~'%info%'") === Seq(1L, 2L, 4L))
  }

  test("_exists_ checks both maps and direct columns") {
    assert(ids("_exists_ level") === Seq(1L, 3L))
    assert(ids("_exists_ code") === Seq(1L, 2L))
    assert(ids("_exists_ app") === Seq(1L, 2L, 3L))
  }

  test("connectives compose") {
    assert(ids("app='web' _and_ code>=500") === Seq(1L))
    assert(ids("level='info' _or_ code=200") === Seq(2L, 3L))
    assert(ids("_not_ (level='info' _or_ code=200)") === Seq(1L, 4L))
    assert(ids("") === Seq(1L, 2L, 3L, 4L))
  }

  test("logs(): time range + order + limit") {
    val df = logsDf.withColumn("timestamp",
      to_timestamp(concat(lit("2024-01-0"), col("id"), lit(" 00:00:00"))))
    val got = LogQuery.logs(df, "app=~'%'",
      java.time.Instant.parse("2024-01-01T00:00:00Z"),
      java.time.Instant.parse("2024-01-02T23:00:00Z"),
      limit = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    // range keeps ids 1,2 (3 is outside, 4's app is null); newest-first
    // limit 1 → id 2
    assert(got === Seq(2L))
  }

  test("volume: bucketed counts of matching rows") {
    val df = logsDf.withColumn("timestamp",
      to_timestamp(concat(lit("2024-01-01 0"), col("id"), lit(":30:00"))))
    val got = LogQuery.volume(df, "app='web'", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli, 2L)))
  }

  test("fields: dynamic field names with types, filter-scoped") {
    val all = LogQuery.fields(logsDf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(all === Seq(("code", "number"), ("level", "string")))
    val scoped = LogQuery.fields(logsDf, "app='api'")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(scoped === Seq(("level", "string")))
  }

  test("values: distinct field values, prefix- and filter-scoped") {
    def vs(field: String, q: String = "", prefix: String = "") =
      LogQuery.values(logsDf, field, q, prefix)
        .collect().map(_.getString(0)).toSeq
    assert(vs("app") === Seq("api", "web"))
    assert(vs("level") === Seq("error", "info"))
    assert(vs("level", q = "app='web'") === Seq("error"))
    assert(vs("code", prefix = "5") === Seq("500.0"))
    assert(vs("app", prefix = "w") === Seq("web"))
  }

  test("series: metric per (bucket, group)") {
    val df = logsDf.withColumn("timestamp",
      to_timestamp(concat(lit("2024-01-0"), col("id"), lit(" 10:00:00"))))
    val got = LogQuery.series(df, "_exists_ code", "app", bucket = "day",
        op = "sum", metricField = Some("code"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    def day(d: Int) = java.time.Instant.parse(f"2024-01-0$d%dT00:00:00Z").toEpochMilli
    assert(got === Seq((day(1), "web", 500.0), (day(2), "web", 200.0)))
  }

  test("aggregate: count / avg by direct and dynamic group fields") {
    val byApp = LogQuery.aggregate(logsDf, "", "app", "count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byApp === Seq((null, 1L), ("api", 1L), ("web", 2L)))
    val avgCode = LogQuery.aggregate(logsDf, "app='web'", "level", "avg",
      Some("code"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // web rows: (level=error, code=500), (level missing → NULL group, 200)
    assert(avgCode === Seq((null, 200.0), ("error", 500.0)))
    intercept[IllegalArgumentException](
      LogQuery.aggregate(logsDf, "", "app", "avg"))
    intercept[IllegalArgumentException](
      LogQuery.aggregate(logsDf, "", "app", "median", Some("code")))
    // a numeric dynamic group field renders via the number-map fallback
    val byCode = LogQuery.aggregate(logsDf, "", "code", "count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byCode === Seq((null, 2L), ("200.0", 1L), ("500.0", 1L)))
  }

  test("ClickHouse emission: the same AST compiles to the reference dialect") {
    import graft.query.ClickHouseSql
    assert(ClickHouseSql.where("namespace='bookinfo' _and_ content.level='error'") ===
      "(namespace = 'bookinfo' AND fields_string['content.level'] = 'error')")
    assert(ClickHouseSql.where("content.code>=500") ===
      "fields_number['content.code'] >= 500")
    assert(ClickHouseSql.where("log=~'%GET%' _or_ log~'5..'") ===
      "(log ILIKE '%GET%' OR match(log, '5..'))")
    assert(ClickHouseSql.where("_not_ (app!='web' _or_ _exists_ content.trace)") ===
      "NOT (app != 'web' OR (mapContains(fields_string, 'content.trace')" +
        " OR mapContains(fields_number, 'content.trace')))")
    // direct spine columns are non-nullable '' -defaulted in CH: exists =
    // non-empty; timestamp keeps the type-safe vacuous form
    assert(ClickHouseSql.where("_exists_ app") === "app != ''")
    assert(ClickHouseSql.where("_exists_ timestamp") === "timestamp IS NOT NULL")
    // stringly-typed AST nodes built directly: unknown or mismatched
    // operators are rejected, never interpolated
    intercept[IllegalArgumentException](ClickHouseSql.emit(
      graft.query.LogQuery.Cmp("f", "= '' OR 1=1 --", graft.query.LogQuery.SLit("v"))))
    intercept[IllegalArgumentException](ClickHouseSql.emit(
      graft.query.LogQuery.Cmp("f", "=~", graft.query.LogQuery.NLit(5))))
    // value `it's a 100\% match`: the quote doubles on parse; emission
    // escapes both the quote and the literal backslash CH-style
    assert(ClickHouseSql.where("msg='it''s a 100\\% match'") ===
      "fields_string['msg'] = 'it\\'s a 100\\\\% match'")
    assert(ClickHouseSql.where("") === "1")
    // field names that cannot be safely emitted are rejected, not quoted
    intercept[IllegalArgumentException](
      ClickHouseSql.emit(graft.query.LogQuery.Cmp(
        "x'; DROP TABLE logs --", "=", graft.query.LogQuery.SLit("v"))))
  }

  // ----------------------------------------------------------- plans

  test("a query-language predicate on a promoted key pushes into the parquet scan") {
    val dir = tmp("logquery-promoted")
    LogSchema.writePartitioned(
      LogSchema.withPromotedColumns(
        LogSchema.logsFromEvents(
          graft.sources.Tables.events(spark, sf("sf0.001"))),
        numberKeys = Seq("event.value")),
      dir)
    val back = LogSchema.readLogs(spark, dir)
    val filtered = LogQuery.filter(back, "event.value>=150")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(promoted_event_value,150.0)") &&
      plan.contains("PushedFilters: ["),
      s"promoted predicate must reach the scan:\n$plan")
  }

  test("logs(): the time range prunes date partitions of the written layout") {
    val dir = tmp("logquery-pruning")
    LogSchema.writePartitioned(
      LogSchema.logsFromEvents(
        graft.sources.Tables.events(spark, sf("sf0.001"))), dir)
    val back = LogSchema.readLogs(spark, dir)
    val df = LogQuery.logs(back, "namespace='error'",
      java.time.Instant.parse("2024-01-10T00:00:00Z"),
      java.time.Instant.parse("2024-01-12T00:00:00Z"), limit = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*date[^\\]]*\\].*"),
      s"the range must reach the scan as a date partition filter:\n$plan")
    assert(df.count() > 0, "range must select rows at sf0.001")
  }

  test("volumeRouted: a dims-only filter is answered from the rollup and " +
      "matches the raw-table volume exactly") {
    val src = tmp("logquery-rollup-src"); val out = tmp("logquery-rollup-out")
    val logs = LogSchema.logsFromEvents(
      graft.sources.Tables.events(spark, sf("sf0.001")))
    LogSchema.writePartitioned(logs, src)
    graft.model.Rollup.refresh(spark, src, out)
    val raw = LogSchema.readLogs(spark, src)
    val roll = graft.model.Rollup.readRollup(spark, out)
    val q = "cluster='c1' _and_ _not_ namespace=~'%view%'"
    // the routing decision itself
    assert(LogQuery.volumeFromRollup(roll, q).isDefined)
    val routed = LogQuery.volumeRouted(raw, roll, q)
    // the rollup path must not touch the raw table at all
    assert(!routed.queryExecution.analyzed.toString.contains("fields_string"),
      "rollup-answered volume must not read raw log columns")
    val viaRaw = LogQuery.volume(raw, q).collect().toSeq
    assert(routed.collect().toSeq == viaRaw)
    // day buckets re-aggregate hourly rollup rows
    assert(LogQuery.volumeRouted(raw, roll, q, bucket = "day").collect().toSeq ==
      LogQuery.volume(raw, q, bucket = "day").collect().toSeq)
    // the split-by-dimension chart routes too, matching the raw series
    val s = LogQuery.seriesFromRollup(roll, "cluster='c1'", "namespace")
    assert(s.isDefined)
    assert(s.get.collect().toSeq ==
      LogQuery.series(raw, "cluster='c1'", "namespace").collect().toSeq)
    // a non-dim split field refuses routing
    assert(LogQuery.seriesFromRollup(roll, "cluster='c1'", "pod_name").isEmpty)
    // the aggregation tab routes for every op the rollup can merge, and
    // each must equal the raw-table aggregate exactly
    for (op <- Seq("count", "sum", "min", "max", "avg")) {
      val mf = if (op == "count") None else Some("event.value")
      val viaRollup = LogQuery.aggregateFromRollup(
        roll, "cluster='c1'", "namespace", op, mf)
      assert(viaRollup.isDefined, s"op $op must route")
      val merged = viaRollup.get.collect().toSeq
      val direct = LogQuery.aggregate(raw, "cluster='c1'", "namespace", op, mf)
        .collect().toSeq
      assert(merged.map(_.get(0)) == direct.map(_.get(0)), s"op $op groups")
      (merged, direct).zipped.foreach { (m, d) =>
        (m.get(1), d.get(1)) match {
          // sum/avg merge partial sums in a different order than the
          // direct aggregate — equal only up to double associativity
          case (a: Double, b: Double) if op == "sum" || op == "avg" =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
              s"op $op: $a vs $b")
          case (a, b) =>
            assert(a == b, s"op $op: rollup merge must equal raw exactly")
        }
      }
    }
    // a metric key the rollup does not materialize refuses routing
    assert(LogQuery.aggregateFromRollup(
      roll, "cluster='c1'", "namespace", "sum", Some("props.k")).isEmpty)
    // a non-dim group field refuses routing
    assert(LogQuery.aggregateFromRollup(
      roll, "cluster='c1'", "pod_name", "count").isEmpty)
    // percentiles route through the stored KLL state; the estimate is
    // documented-approximate, so certify rank-wise against the exact
    // p85..p95 band rather than equality
    val p90 = LogQuery.aggregateFromRollup(
      roll, "cluster='c1'", "namespace", "p90", Some("event.value"))
    assert(p90.isDefined, "p90 must route when the KLL column exists")
    val bands = LogQuery.aggregate(raw, "cluster='c1'", "namespace", "p85",
        Some("event.value")).withColumnRenamed("value", "lo")
      .join(LogQuery.aggregate(raw, "cluster='c1'", "namespace", "p95",
        Some("event.value")).withColumnRenamed("value", "hi"), "group")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    p90.get.collect().foreach { r =>
      val (lo, hi) = bands(r.getString(0))
      val est = r.getDouble(1)
      assert(est >= lo && est <= hi,
        s"group ${r.getString(0)}: routed p90 $est outside exact [$lo, $hi]")
    }
    // a percentile on a non-materialized metric refuses routing
    assert(LogQuery.aggregateFromRollup(
      roll, "cluster='c1'", "namespace", "p90", Some("props.k")).isEmpty)
    // an unknown op string still refuses
    assert(LogQuery.aggregateFromRollup(
      roll, "cluster='c1'", "namespace", "p0", Some("event.value")).isEmpty)
  }

  test("volumeRouted falls back to the raw table when the filter needs it") {
    val src = tmp("logquery-rollup-src2"); val out = tmp("logquery-rollup-out2")
    val logs = LogSchema.logsFromEvents(
      graft.sources.Tables.events(spark, sf("sf0.001")))
    LogSchema.writePartitioned(logs, src)
    graft.model.Rollup.refresh(spark, src, out)
    val raw = LogSchema.readLogs(spark, src)
    val roll = graft.model.Rollup.readRollup(spark, out)
    // numeric leaf → map column → not rollup-answerable
    assert(LogQuery.volumeFromRollup(roll, "event.value>=150").isEmpty)
    // non-dim string leaf (raw log text) → not answerable
    assert(LogQuery.volumeFromRollup(roll, "log~'[0-9]'").isEmpty)
    // _exists_ on a dynamic key probes the maps → not answerable
    assert(LogQuery.volumeFromRollup(roll, "_exists_ flag.err").isEmpty)
    // sub-hour buckets are below the rollup grain
    assert(LogQuery.volumeFromRollup(roll, "namespace='error'",
      bucket = "minute").isEmpty)
    // OR with one non-dim side must NOT be routed (sum over dims would drop
    // the raw-only matches)
    assert(LogQuery.volumeFromRollup(roll,
      "namespace='error' _or_ event.value>=180").isEmpty)
    // and the fallback produces the same rows as the plain raw call
    val q = "namespace='error' _or_ event.value>=180"
    assert(LogQuery.volumeRouted(raw, roll, q).collect().toSeq ==
      LogQuery.volume(raw, q).collect().toSeq)
    // empty query: answerable, equals the unfiltered raw volume
    assert(LogQuery.volumeRouted(raw, roll, "").collect().toSeq ==
      LogQuery.volume(raw, "").collect().toSeq)
  }

  test("logsAfter: keyset pages tile the full result with no loss or overlap, " +
      "and the cursor tightens the partition bound") {
    val dir = tmp("logquery-keyset")
    LogSchema.writePartitioned(
      LogSchema.logsFromEvents(
        graft.sources.Tables.events(spark, sf("sf0.001"))), dir)
    val back = LogSchema.readLogs(spark, dir)
    val q = "namespace='view'"
    val t0 = java.time.Instant.parse("2024-01-05T00:00:00Z")
    val t1 = java.time.Instant.parse("2024-01-25T00:00:00Z")
    val all = LogQuery.logs(back, q, t0, t1, limit = 100000,
        tieBreak = Seq("id"))
      .select("timestamp", "id").collect().toSeq
    assert(all.size > 30, s"fixture too small: ${all.size}")
    val pageSize = 7
    var fetched = Vector.empty[org.apache.spark.sql.Row]
    var page = LogQuery.logs(back, q, t0, t1, limit = pageSize,
      tieBreak = Seq("id")).select("timestamp", "id").collect().toSeq
    while (page.nonEmpty) {
      fetched ++= page
      val last = page.last
      page = LogQuery.logsAfter(back, q, t0, t1,
          last.getTimestamp(0).toInstant, last.getLong(1), limit = pageSize)
        .select("timestamp", "id").collect().toSeq
    }
    assert(fetched.map(r => (r.getTimestamp(0), r.getLong(1))) ==
      all.map(r => (r.getTimestamp(0), r.getLong(1))),
      "cursor walk must reproduce the total order exactly")
    // newest-first paging walks backward in time: a mid-range cursor must
    // shrink the date partition bound to its own day
    val mid = java.time.Instant.parse("2024-01-10T12:00:00Z")
    val plan = LogQuery.logsAfter(back, q, t0, t1, mid, 0L, limit = 10)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*2024-01-10[^\\]]*\\].*"),
      s"cursor day must appear as the partition upper bound:\n$plan")
  }

  test("query-language filter agrees with the hand-built operator predicates") {
    val logs = LogSchema.logsFromEvents(
      graft.sources.Tables.events(spark, sf("sf0.001")))
    val viaQl = LogQuery.filter(logs,
      "namespace='purchase' _and_ event.value>=150 _and_ _not_ cluster='c0'")
      .select("id")
    val byHand = logs.where(
      col("namespace") === "purchase" &&
        try_element_at(col("fields_number"), lit("event.value")) >= 150.0 &&
        !(col("cluster") === "c0"))
      .select("id")
    assert(viaQl.exceptAll(byHand).isEmpty && byHand.exceptAll(viaQl).isEmpty)
    assert(viaQl.count() > 0, "fixture must select a non-empty row set")
  }
}
