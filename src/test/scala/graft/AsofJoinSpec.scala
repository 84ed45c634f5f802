package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** As-of merge join vs the naive range-join formulation, and edge cases. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("merge as-of equals the range-join + max formulation on testdata") {
    val ev = graft.sources.Tables.events(spark, sf())
    val o = graft.sources.Tables.orders(spark, sf())
    val merge = AsofJoin.asofBackward(ev, o,
        "user_id", "o_custkey", "ts", "o_orderdate", Nil)
      .select(col("event_id"), col("asof_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val naive = ev.join(o,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
        "left_outer")
      .groupBy("event_id").agg(max("o_orderdate").as("asof_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(merge == naive)
  }

  test("keys without any dimension row get null; same-instant state applies; values carry") {
    val events = Seq(
      (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 100L), (4L, "u3", 50L)
    ).toDF("eid", "user", "ets").withColumn("ets", timestamp_seconds(col("ets")))
    val dim = Seq(
      ("u1", 100L, "a"), ("u1", 200L, "b"), ("u2", 150L, "c")
    ).toDF("duser", "dts", "state").withColumn("dts", timestamp_seconds(col("dts")))
    val out = AsofJoin.asofBackward(events, dim, "user", "duser", "ets", "dts",
        Seq("state"))
      .select(col("eid"), col("asof_state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("a")) // dim at the same instant applies (<=)
    assert(out(2L).contains("b")) // latest earlier state
    assert(out(3L).isEmpty)       // u2's only state is later than the event
    assert(out(4L).isEmpty)       // u3 has no dimension rows at all
  }

  test("reserved working-column names on the left frame fail fast instead of silently clobbering") {
    val events = Seq((1L, "u1", 100L)).toDF("eid", "user", "ets")
      .withColumn("ets", timestamp_seconds(col("ets")))
      .withColumn("asof_ts", lit("precious"))
    val dim = Seq(("u1", 50L, "a")).toDF("duser", "dts", "state")
      .withColumn("dts", timestamp_seconds(col("dts")))
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(events, dim, "user", "duser", "ets", "dts", Seq("state"))
    }
    assert(ex.getMessage.contains("asof_ts"))
  }

  test("row atomicity: NULL cells of the latest row stay NULL (no cross-row backfill)") {
    val events = Seq((1L, "u1", 300L))
      .toDF("eid", "user", "ets").withColumn("ets", timestamp_seconds(col("ets")))
    val dim = Seq(
      ("u1", 100L, Some("old-a"), Some(1.0)),
      ("u1", 200L, None: Option[String], Some(2.0)), // latest row: a IS NULL
    ).toDF("duser", "dts", "a", "b").withColumn("dts", timestamp_seconds(col("dts")))
    val row = AsofJoin.asofBackward(events, dim, "user", "duser", "ets", "dts",
        Seq("a", "b"))
      .select(col("asof_a"), col("asof_b")).head()
    // per-column last(ignoreNulls) would resurrect "old-a" from the older
    // row — the whole most-recent row must be carried atomically
    assert(row.isNullAt(0), s"asof_a backfilled across rows: $row")
    assert(row.getDouble(1) == 2.0)
  }
}
