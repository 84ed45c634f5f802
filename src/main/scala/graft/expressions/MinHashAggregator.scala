package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** MinHash *union* aggregate: folds the shingle sets of many rows into one
  * k-wide signature — the sketch of the UNION of the sets (MinHash's
  * defining property: sig(A ∪ B) = elementwise-min(sig(A), sig(B))).
  *
  * This is the custom aggregate the reference surface has no analogue for
  * (SURVEY §2.11): it lets a 100 TB corpus be sketched per GROUP (per
  * source, per day, per cluster) in one partial-aggregated pass — partial
  * signatures combine associatively on the map side, so the shuffle carries
  * k longs per group, never the shingle sets. Cross-group similarity is
  * then estimated from signature agreement without touching row data again.
  */
class MinHashUnionAggregator(k: Int)
    extends Aggregator[Seq[String], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[String]): Array[Long] = {
    if (shingles != null) {
      // shingles OUTER, seeds inner: each shingle is converted to
      // UTF8String exactly once instead of once per seed (k× fewer
      // allocations on the aggregate's hot path)
      val it = shingles.iterator
      while (it.hasNext) {
        val s = it.next()
        if (s != null) {
          val u = UTF8String.fromString(s)
          var i = 0
          while (i < k) {
            val h = XxHash64Function.hash(u, StringType, i.toLong)
            if (h < buf(i)) buf(i) = h
            i += 1
          }
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Column-level aggregate: `minhashUnion(shinglesCol, k)`. The hash
    * family (xxhash64 seeded 0..k-1) matches [[MinHashSignature]], so
    * per-row signatures and group signatures interoperate.
    */
  def minhashUnion(shingles: Column, k: Int): Column = {
    val fn = udaf(new MinHashUnionAggregator(k))
    fn(shingles)
  }
}
