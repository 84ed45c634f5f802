package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hot join key concentrates its rows in one shuffle partition; AQE's
  * skew-join split handles sort-merge joins, but pre-salting is the
  * general fix (and the only one for aggregations-over-join patterns).
  * The probe (large, skewed) side gets a row-varying salt in [0, s); the
  * build side is replicated s times with every salt value; the join key
  * becomes (key, salt), spreading each hot key over s partitions. Result
  * set is identical to the unsalted join — asserted by the oracle.
  */
object SkewJoin {

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    // The build side is replicated saltFactor×, so any join type that emits
    // unmatched BUILD rows (right/full outer) would duplicate each of them
    // saltFactor times. Only probe-side-preserving variants are sound.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left variants only, got '$joinType': " +
        "right/full outer would emit each unmatched build row saltFactor times")
    require(!probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt")
    // row-varying deterministic-enough salt: the value never affects the
    // result, only the shuffle spread
    val saltedProbe = probe.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // dataset-qualified keys: unqualified col(probeKey) === col(buildKey)
    // is AMBIGUOUS_REFERENCE whenever both sides share the key name — the
    // natural same-name equi-join (same hazard StreamOps.enrichWithStatic
    // documents)
    saltedProbe.join(saltedBuild,
        saltedProbe("_salt") === saltedBuild("_salt") &&
          saltedProbe(probeKey) === saltedBuild(buildKey),
        joinType)
      .drop("_salt")
  }
}
