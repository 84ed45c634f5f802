package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted skew join: result equivalence with the unsalted join, and the
  * join-type guard (build-side replication would duplicate unmatched build
  * rows under right/full outer).
  */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val probe = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"))
    .toDF("k", "pv")
  private lazy val build = Seq((1, "x"), (2, "y"), (9, "unmatched"))
    .toDF("bk", "bv")

  test("salted inner and left joins equal their unsalted forms") {
    val inner = SkewJoin.saltedJoin(probe, build, "k", "bk", saltFactor = 4)
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    val plainInner = probe.join(build, col("k") === col("bk"))
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    assert(inner == plainInner)

    val left = SkewJoin.saltedJoin(probe, build, "k", "bk", 4, "left")
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    val plainLeft = probe.join(build, col("k") === col("bk"), "left")
      .select("k", "pv", "bv").collect().map(_.toString).sorted.toSeq
    assert(left == plainLeft && left.length == 4) // k=3 survives with null bv
  }

  test("same-name key columns join without AMBIGUOUS_REFERENCE") {
    // the natural equi-join spelling: both sides name the key identically
    val build2 = Seq((1, "x"), (2, "y")).toDF("k", "bv")
    val got = SkewJoin.saltedJoin(probe, build2, "k", "k", saltFactor = 4)
      .select(probe("k"), col("pv"), col("bv"))
      .collect().map(_.toString).sorted.toSeq
    val plain = probe.join(build2, probe("k") === build2("k"))
      .select(probe("k"), col("pv"), col("bv"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == plain && got.length == 3)
  }

  test("right/full outer are rejected — replication would duplicate unmatched build rows") {
    Seq("right", "right_outer", "full", "full_outer", "outer").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(probe, build, "k", "bk", 4, jt)
      }
      assert(e.getMessage.contains("inner/left"), s"wrong error for $jt")
    }
  }
}
