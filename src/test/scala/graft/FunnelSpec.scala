package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkTestBase {

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user", "ms", "t")
      .select(col("user"), timestamp_millis(col("ms")).as("ts"), col("t"))
  }

  private def funnel(df: org.apache.spark.sql.DataFrame, w: Long) =
    Funnel.windowFunnel(df, "user", "ts", w,
      Seq(col("t") === "a", col("t") === "b", col("t") === "c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("windowFunnel: chain depth, window anchored at the chain's own first event") {
    val df = events(
      // u1: full chain inside the window
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 90L, "c"),
      // u2: c arrives outside the window from a
      (2L, 0L, "a"), (2L, 10L, "b"), (2L, 200L, "c"),
      // u3: only the first step
      (3L, 0L, "a"),
      // u4: b before any a never chains
      (4L, 0L, "b"), (4L, 10L, "c"),
      // u5: exact window boundary is inclusive
      (5L, 0L, "a"), (5L, 50L, "b"), (5L, 100L, "c"))
    val got = funnel(df, w = 100L)
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 3))
  }

  test("windowFunnel: a LATER chain start rescues a window the earliest start misses") {
    // greedy max-start exactness: from a@0 the b@150 is out of window, but
    // the fresher a@120 reaches it; c@240 completes within 150 of a@120
    val df = events(
      (1L, 0L, "a"), (1L, 120L, "a"), (1L, 150L, "b"), (1L, 240L, "c"))
    assert(funnel(df, w = 150L) == Map(1L -> 3))
    // with only the early start it would stop at level 1
    val noRescue = events((2L, 0L, "a"), (2L, 160L, "b"), (2L, 240L, "c"))
    assert(funnel(noRescue, w = 150L) == Map(2L -> 1))
  }

  test("windowFunnel: arrival order does not matter (state folds over the sorted list)") {
    val inOrder = events((1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"))
    val shuffled = events((1L, 20L, "c"), (1L, 0L, "a"), (1L, 10L, "b"))
    assert(funnel(inOrder, 100L) == funnel(shuffled.repartition(3), 100L))
  }

  test("windowFunnel: an equal-timestamp follower still chains (non-strict order)") {
    val df = events((1L, 0L, "a"), (1L, 0L, "b"), (1L, 0L, "c"))
    assert(funnel(df, w = 100L) == Map(1L -> 3))
  }

  test("retention: r1 requires the anchor, r_k requires a follower at-or-after it") {
    val df = events(
      // u1: anchor then both followers
      (1L, 0L, "s"), (1L, 10L, "p"), (1L, 20L, "e"),
      // u2: follower BEFORE the anchor does not count
      (2L, 10L, "s"), (2L, 0L, "p"),
      // u3: no anchor at all
      (3L, 0L, "p"), (3L, 10L, "e"))
    val got = Funnel.retention(df, "user", "ts",
        Seq(col("t") === "s", col("t") === "p", col("t") === "e"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(got == Map(
      1L -> ((true, true, true)),
      2L -> ((true, false, false)),
      3L -> ((false, false, false))))
  }

  private def seqMatch(df: org.apache.spark.sql.DataFrame) =
    Funnel.sequenceMatch(df, "user", "ts",
      Seq(col("t") === "a", col("t") === "b", col("t") === "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("sequenceMatch: strictly-increasing chain; order violations and ties do not match") {
    val out = seqMatch(events(
      // u1: clean a < b < c
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
      // u2: c before b → depth stops at 2 (a later c would be needed)
      (2L, 0L, "a"), (2L, 10L, "c"), (2L, 20L, "b"),
      // u3: equal timestamps never chain under strict order
      (3L, 0L, "a"), (3L, 0L, "b"), (3L, 0L, "c"),
      // u4: noise between chain steps is fine
      (4L, 0L, "a"), (4L, 1L, "x"), (4L, 2L, "b"), (4L, 3L, "x"), (4L, 4L, "c")))
    assert(out(1L) == (3L, true))
    assert(out(2L) == (2L, false))
    assert(out(3L) == (1L, false))
    assert(out(4L) == (3L, true))
  }

  test("sequenceMatch: greedy earliest chain is rescued by later candidates (existence semantics)") {
    // earliest b after a is at ts=10; c exists only at ts=5 — no match via
    // that b... but NO b/c combination works here; then a second b at 20
    // and c at 30 complete the chain: greedy must find it
    val out = seqMatch(events(
      (1L, 0L, "a"), (1L, 5L, "c"), (1L, 10L, "b"), (1L, 20L, "b"), (1L, 30L, "c")))
    assert(out(1L) == (3L, true))
  }

  test("sequenceMatch: arrival order does not matter") {
    val fwd = events((1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"))
    val rev = events((1L, 20L, "c"), (1L, 10L, "b"), (1L, 0L, "a"))
    assert(seqMatch(fwd) == seqMatch(rev))
  }

  private def seqCount(df: org.apache.spark.sql.DataFrame) =
    Funnel.sequenceCount(df, "user", "ts",
      Seq(col("t") === "a", col("t") === "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sequenceCount: disjoint chains only; an event never serves two chains") {
    val out = seqCount(events(
      // u1: a b a b → 2 chains
      (1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "b"),
      // u2: a a b → ONE chain (second a cannot start a chain past the
      // single b)
      (2L, 0L, "a"), (2L, 1L, "a"), (2L, 2L, "b"),
      // u3: b a → 0 chains (order)
      (3L, 0L, "b"), (3L, 1L, "a"),
      // u4: next chain must start strictly AFTER the previous chain's end
      (4L, 0L, "a"), (4L, 1L, "b"), (4L, 1L, "a"), (4L, 2L, "b")))
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L), out.toString)
  }

  test("sequenceCount: greedy earliest completion maximizes the count") {
    // a@0, b@10, a@1, b@2: lazy matching (a@0 with b@10) yields 1; greedy
    // (a@0 with b@2... wait, earliest completion pairs a@0+b@2, leaving
    // a@1 unusable but b@10 chainable with nothing → still 1; with a@3
    // added, greedy gets (a@0,b@2)+(a@3,b@10) = 2
    val out = seqCount(events(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 1L, "a"), (1L, 2L, "b"),
      (1L, 3L, "a")))
    assert(out(1L) == 2L)
  }

  test("sessionize: gap splits, boundary-inclusive extension, users independent") {
    val df = events(
      // u1: 0,100 together; break (gap 1000 < 1001); 1101, 1200 together
      (1L, 0L, "a"), (1L, 100L, "a"), (1L, 1101L, "a"), (1L, 1200L, "a"),
      // u1: a gap of exactly gapMs does NOT break
      (1L, 2200L, "a"),
      // u2: single event, its own session
      (2L, 50L, "a"))
    val out = Funnel.sessionize(df, "user", "ts", gapMs = 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      (1L, 1L) -> (0L, 100L, 2L),
      (1L, 2L) -> (1101L, 2200L, 3L), // 2200 − 1200 == gap → same session
      (2L, 1L) -> (50L, 50L, 1L)), out.toString)
  }

  test("funnel plan: one partial-aggregated shuffle, no joins") {
    val df = events((1L, 0L, "a"), (1L, 10L, "b"))
    val plan = Funnel.windowFunnel(df, "user", "ts", 100L,
        Seq(col("t") === "a", col("t") === "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"funnel is one aggregation exchange:\n$plan")
  }
}
