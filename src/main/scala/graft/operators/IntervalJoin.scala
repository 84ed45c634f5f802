package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval-lookup join: attach to each fact row the range row whose
  * `[lo, hi)` interval contains the fact's value — IP→geo, latency→SLA
  * tier, price→band. The non-equi shape Spark has no native operator for.
  *
  * A naive `facts JOIN ranges ON v >= lo AND v < hi` plans as
  * BroadcastNestedLoopJoin — every fact row scans EVERY range row, O(n·m)
  * compares, and with a large range table no broadcast fits and the plan
  * degenerates to a cartesian. The bucketed form turns containment into
  * equality: ranges explode to the fixed-width buckets they overlap
  * (bounded by ceil(span/width)+1 rows per range), facts compute their
  * bucket with one narrow expression, and the join is a plain hash
  * equi-join on the bucket followed by the exact bounds filter. Shuffle
  * volume: |facts| + Σ spans/width — both sides shuffle on a uniform key,
  * AQE handles hot buckets.
  *
  * `width` trades replication for bucket selectivity: width ≈ the median
  * range span keeps the explode factor ~2 while a bucket co-locates only
  * a handful of candidate ranges.
  *
  * Overlapping ranges produce one output row per containing range
  * (standard lookup-join semantics); facts in no range are dropped
  * (inner) or kept with NULLs (`"left"`).
  */
object IntervalJoin {

  def lookupJoin(
      facts: DataFrame,
      valueCol: Column,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      width: Long,
      joinType: String = "inner"): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner or left, got $joinType")
    val w = lit(width.toDouble)
    // continuous-safe bucket span: first bucket = floor(lo/w); last =
    // ceil(hi/w) − 1, which lands one bucket earlier exactly when the
    // EXCLUSIVE hi sits on a bucket boundary (no value of the range
    // reaches that bucket) — correct for double bounds where "hi − 1"
    // is not
    val burst = ranges
      .where(col(hiCol) > col(loCol))
      .withColumn("_bucket",
        explode(sequence(
          floor(col(loCol).cast("double") / w).cast(LongType),
          (ceil(col(hiCol).cast("double") / w) - 1).cast(LongType))))
    val probed = facts.withColumn("_fbucket",
      floor(valueCol.cast("double") / w).cast(LongType))
    // a fact meets a containing range at exactly ONE bucket (its own), so
    // the burst never duplicates matches; putting the bounds test in the
    // JOIN condition (not a post-filter) keeps left-join semantics exact —
    // facts in no range survive as one NULL-filled row. Spark extracts
    // the bucket equality as the hash-join key and evaluates the bounds
    // residually.
    val contained = valueCol >= col(loCol) && valueCol < col(hiCol)
    probed.join(burst,
        probed("_fbucket") === burst("_bucket") && contained, joinType)
      .drop("_fbucket", "_bucket")
  }
}
