package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Bucketed interval-lookup join: containment semantics and — the point —
  * the equi-join plan where the naive formulation nested-loops.
  */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ranges = Seq(
    (0.0, 50.0, "low"), (50.0, 100.0, "mid"),
    (25.0, 75.0, "overlap"),      // straddles both
    (-100.0, 0.0, "neg"),         // negative band
    (200.0, 250.0, "exact"))      // hi on a bucket boundary
    .toDF("lo", "hi", "tier")

  private def join(vals: Seq[Double], joinType: String = "inner") =
    IntervalJoin.lookupJoin(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
      col("v"), ranges, "lo", "hi", width = 50, joinType)
      .select("id", "tier")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet

  test("containment: inclusive lo, exclusive hi, overlapping ranges multi-match, negatives") {
    val got = join(Seq(0.0, 49.99, 50.0, 30.0, -0.5, 249.9999, 250.0))
    assert(got == Set(
      (0L, "low"),                      // lo inclusive
      (1L, "low"), (1L, "overlap"),     // 49.99 in low and overlap
      (2L, "mid"), (2L, "overlap"),     // hi of low is exclusive
      (3L, "low"), (3L, "overlap"),
      (4L, "neg"),                      // negative bucket arithmetic
      (5L, "exact")                     // just under the boundary hi
      // 250.0 unmatched: hi exclusive on a bucket boundary
    ), got.toString)
  }

  test("left join keeps unmatched facts as one NULL row") {
    val got = join(Seq(30.0, 150.0), joinType = "left")
    assert(got == Set((0L, "low"), (0L, "overlap"), (1L, null)), got.toString)
  }

  test("plan: hash equi-join on the bucket, never a nested-loop/cartesian") {
    val facts = (0 until 1000).map(i => (i.toLong, (i % 500).toDouble))
      .toDF("id", "v")
    val plan = IntervalJoin.lookupJoin(facts, col("v"), ranges,
        "lo", "hi", width = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketed join must not nested-loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"expected an equi-join on the bucket:\n$plan")
  }
}
