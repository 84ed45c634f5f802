package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom-pruned join: exact equivalence with the plain join (false
  * positives must vanish in the exact join), the probe-preserving
  * join-type guard, the empty-build edge, and the plan shape — the
  * might_contain pre-filter must sit on the probe side BEFORE the join.
  */
class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 1000 probe rows over keys 0..199; build matches only keys ≡ 0 (mod 20)
  // → 90% of probe rows are prunable before the join
  private lazy val probe = (0 until 1000)
    .map(i => (i.toLong % 200, s"p$i")).toDF("k", "pv")
  private lazy val build = (0 until 200 by 20)
    .map(i => (i.toLong, s"b$i")).toDF("bk", "bv")

  test("inner and left_semi results equal the plain joins") {
    val inner = BloomJoin.bloomPrunedJoin(probe, "k", build, "bk")
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    val plainInner = probe.join(build, col("k") === col("bk"))
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    assert(inner == plainInner && inner.nonEmpty)

    val semi = BloomJoin.bloomPrunedJoin(probe, "k", build, "bk", "left_semi")
      .collect().map(_.toString).sorted.toSeq
    val plainSemi = probe.join(build, col("k") === col("bk"), "left_semi")
      .collect().map(_.toString).sorted.toSeq
    assert(semi == plainSemi)
  }

  test("mixed int/long key types still match (hash coerced like the join)") {
    // xxhash64 hashes INT 5 and BIGINT 5 differently; without the double
    // coercion the bloom would drop every true match between these sides
    val intProbe = (0 until 100).map(i => (i % 20, s"p$i")).toDF("k", "pv")
    val longBuild = Seq((0L, "b0"), (5L, "b5"), (19L, "b19")).toDF("bk", "bv")
    val got = BloomJoin.bloomPrunedJoin(intProbe, "k", longBuild, "bk")
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    val want = intProbe.join(longBuild, col("k") === col("bk"))
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    assert(got == want && got.size == 15)
    // non-numeric type mismatch is rejected, not silently wrong
    val strBuild = Seq(("5", "s")).toDF("bk", "bv")
    assertThrows[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(intProbe, "k", strBuild, "bk")
    }
  }

  test("probe-emitting join types are rejected") {
    for (jt <- Seq("left_outer", "left_anti", "full_outer", "right"))
      assertThrows[IllegalArgumentException] {
        BloomJoin.bloomPrunedJoin(probe, "k", build, "bk", jt)
      }
  }

  test("empty build side yields the empty inner/semi result") {
    assert(BloomJoin.bloomPrunedJoin(
      probe, "k", build.where(lit(false)), "bk").count() == 0)
  }

  test("the bloom probe is a narrow pre-join filter and actually prunes") {
    // parquet-backed probe: over a LocalRelation the optimizer evaluates
    // the bloom filter at plan time (ConvertToLocalRelation), which hides
    // it from the plan string — a file scan keeps it visible where it
    // runs in production: a Filter directly over the probe's scan
    val probeDir = tmp("graft-bloomjoin-probe")
    probe.write.mode("overwrite").parquet(probeDir)
    val fileProbe = spark.read.parquet(probeDir)
    val joined = BloomJoin.bloomPrunedJoin(fileProbe, "k", build, "bk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"probe side must carry the bloom filter:\n$plan")
    // the filter must prune ~90% of probe rows BEFORE any join operator:
    // replay the operator's own pre-filter and bound its selectivity by
    // the bloom's fpp headroom (10 true keys + ≤ a few fp keys of 200)
    graft.expressions.GraftFunctions.registerAll(spark)
    val bloomBytes = build.select(call_function("graft_bloom_agg",
        xxhash64(col("bk")), lit(1L << 12), lit(1L << 16)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val survivors = probe.where(call_function("graft_might_contain",
      lit(bloomBytes), xxhash64(col("k")))).count()
    assert(survivors >= 50 && survivors <= 200,
      s"bloom pre-filter should keep ~50 of 1000 probe rows, kept $survivors")
  }
}
