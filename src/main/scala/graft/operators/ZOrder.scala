package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton-curve) clustering: rewrite a table so rows close in a
  * 2-D key space land in the same files, making multi-dimensional box
  * queries prune at the FILE level instead of scanning everything.
  *
  * This is the data-layout half of the reference's MergeTree `ORDER BY`
  * story (/root/reference/schema.sql:20-23 orders log parts by
  * (cluster, namespace, app, timestamp) so one-dimensional scans prune;
  * cf. ClickHouse docs' mortonEncode key and Delta OPTIMIZE ZORDER): a
  * single-column sort key prunes only its leading dimension, while the
  * interleaved z-value gives every dimension locality at once — a
  * box covering p% of each of two dimensions touches O(p²) of the
  * curve's cells, not O(p) of a sorted table or O(1) of nothing.
  *
  * Everything here is pure integer/double Column arithmetic (shifts,
  * masks, one floor) — whole-stage codegen'd, and exactly mirrorable in
  * the DuckDB oracle, so the clustered layout is hash-verified end to
  * end, not just eyeballed.
  *
  * Scale shape: one narrow pass computes z-values, one hash exchange on
  * the bucket id routes rows (64 buckets by default — at a real 100 TB
  * table you'd raise [[ZOrder.DefaultBucketBits]] so each bucket is a
  * few GB), and each task sorts its own bucket before writing — the
  * standard repartition+sortWithin write pattern with no driver state.
  * min/max of each dimension come from one scalar aggregate (two longs a
  * side), the same statistics a maintenance job would keep incrementally.
  */
object ZOrder {

  /** 2^6 = 64 z-range buckets = an 8×8 grid over the two dimensions
    * (the top 6 interleaved bits are 3 high bits of x + 3 of y).
    */
  val DefaultBucketBits: Int = 6

  /** Spreads the low 16 bits of `c` to the even bit positions (the
    * classic mask-shift Morton spread: 0xFFFF → 0x55555555 in four
    * doubling steps).
    */
  def spread16(c: Column): Column = {
    val m0 = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value of two 16-bit dimensions: x on even bits, y on odd. */
  def zValue(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Scales `v` into [0, 65535] given inclusive [min, max] bounds, as
    * `floor((v - min) * 65535.0 / (max - min))` — the exact expression
    * (IEEE double, same evaluation order) the oracle states in SQL.
    */
  def scale16(v: Column, min: Column, max: Column): Column =
    floor(((v - min).cast(DoubleType) * lit(65535.0)) /
      (max - min).cast(DoubleType)).cast(LongType)

  /** z >> (32 - bucketBits): the top interleaved bits = the grid cell. */
  def zBucket(z: Column, bucketBits: Int = DefaultBucketBits): Column =
    shiftright(z, 32 - bucketBits)

  /** Rewrites `df` clustered by the z-order of two long-valued dimension
    * columns: one exchange on the bucket id, a per-task sort on the full
    * z-value (so parquet row groups inside each file carry tight min/max
    * spans of BOTH dimensions), and a `zbucket=`-partitioned write.
    * Returns the (xmin, xmax, ymin, ymax) bounds used, so callers can
    * reproduce the bucket arithmetic (the oracle re-derives the same
    * bounds with a min/max CTE).
    */
  def cluster(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outDir: String,
      bucketBits: Int = DefaultBucketBits): (Long, Long, Long, Long) = {
    val b = df.agg(
      min(col(xCol)).cast(LongType), max(col(xCol)).cast(LongType),
      min(col(yCol)).cast(LongType), max(col(yCol)).cast(LongType)).head()
    require(!b.anyNull,
      s"z-order needs rows with non-null $xCol/$yCol, got none")
    val (xmin, xmax, ymin, ymax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    require(xmax > xmin && ymax > ymin,
      s"z-order needs spread in both dimensions, got [$xmin,$xmax]×[$ymin,$ymax]")
    val z = zValue(
      scale16(col(xCol), lit(xmin), lit(xmax)),
      scale16(col(yCol), lit(ymin), lit(ymax)))
    df.withColumn("zbucket", zBucket(z, bucketBits))
      .withColumn("_z", z)
      .repartition(col("zbucket"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").partitionBy("zbucket").parquet(outDir)
    (xmin, xmax, ymin, ymax)
  }
}
