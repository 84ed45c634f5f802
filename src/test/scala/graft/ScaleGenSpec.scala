package graft

import org.apache.spark.sql.functions._

/** The scale-soak generator's methodology guarantees: per-copy transforms
  * must be DISTINCT (shared transforms would hand documents exact twins
  * and quadratically inflate dedup candidates for data reasons, masking
  * plan problems — the thing SCALING.md's ratios exist to expose) and
  * structure-preserving (so per-copy workloads equal the original's).
  */
class ScaleGenSpec extends SparkTestBase {
  import spark.implicits._

  test("text transforms: identity at k=0, pairwise distinct over the full 105-cycle, structure-preserving") {
    val base = "the quick brown fox jumps over a lazy dog with vexing qualms"
    val df = Seq(base).toDF("text")
    def at(k: Int): String =
      df.select(ScaleGen.perturbText(col("text"), k)).head().getString(0)
    val outs = (0 until 105).map(at)
    assert(outs(0) == base, "k=0 must be the identity")
    assert(outs.distinct.size == 105,
      "every copy up to the lcm(5,21) cycle must get a distinct transform")
    outs.foreach { o =>
      assert(o.length == base.length, "letter permutation must preserve length")
      assert(o.count(_ == ' ') == base.count(_ == ' '),
        "word boundaries must be untouched")
    }
    assert(at(105) == base, "the cycle closes exactly at 105")
  }

  test("vector transforms: norm-preserving, identity at k=0, distinct directions up to 2x dim") {
    val dim = 8
    val v = Array.tabulate(dim)(i => (i * i + 1).toFloat) // distinct values
    val df = Seq(v.toSeq).toDF("embedding")
    def at(k: Int): Seq[Float] =
      df.select(ScaleGen.rotateVec(col("embedding"), k, dim))
        .head().getSeq[Float](0)
    assert(at(0) == v.toSeq, "k=0 must be the identity")
    val outs = (0 until 2 * dim).map(at)
    assert(outs.distinct.size == 2 * dim,
      "rotations then negated rotations must all differ")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    outs.foreach { o =>
      val n = math.sqrt(o.map(x => x.toDouble * x).sum)
      assert(math.abs(n - norm) < 1e-9, "orthogonal transforms preserve norms")
    }
  }

  test("end-to-end factor-3 generation: FK-linear row/join scaling, all copies' texts distinct") {
    // the events table is TIMESTAMP(NANOS); ScaleGen's main sets this conf
    // in its builder — mirror it here (the documented session-wide posture,
    // Tables.scala)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val src = sf("sf0.001")
    val dst = tmp("graft-scalegen")
    ScaleGen.run(spark, src, dst, factor = 3)

    def n(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(n(dst, t) == 3 * n(src, t), s"$t must scale exactly 3x")
    assert(n(dst, "nation") == n(src, "nation"), "fixed dims copy through")

    // FK consistency: the lineitem->orders join volume scales exactly
    // linearly — shifted foreign keys must land on the same copy's orders
    def joinCount(dir: String): Long = {
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
      l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    }
    assert(joinCount(dst) == 3 * joinCount(src),
      "shifted FKs must keep join selectivity; cross-copy matches would inflate it")

    // decorrelation: distinct text count scales with the factor (copies
    // sharing a transform would collapse distinct counts)
    val d0 = spark.read.parquet(s"$src/documents.parquet")
      .select("text").distinct().count()
    val d3 = spark.read.parquet(s"$dst/documents.parquet")
      .select("text").distinct().count()
    assert(d3 == 3 * d0, "every copy's corpus must be textually distinct")
  }
}
