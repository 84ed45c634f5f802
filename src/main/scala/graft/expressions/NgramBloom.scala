package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, lit, udaf}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.util.sketch.BloomFilter

/** Byte-level n-gram hashing shared by the index-build aggregate (executor
  * side) and the needle probe (driver side). Grams are windows over the
  * UTF-8 BYTES, not chars: a substring match at the string level implies
  * the needle's byte sequence appears contiguously in the line's bytes, so
  * every byte n-gram of the needle is a byte n-gram of the line — the
  * soundness property the pruning in [[graft.model.NgramIndex]] rests on.
  * (Same framing as ClickHouse's `ngrambf_v1` skip index, the MergeTree
  * feature this family re-expresses; cf. /root/reference/schema.sql:15-19
  * for the MergeTree table the reference stores logs in.)
  */
object NgramHash {
  /** Same seed as [[BloomContainsString]] so all graft blooms share one
    * hash convention.
    */
  val Seed = 42L

  def gramHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    if (bytes == null || bytes.length < n) return Array.emptyLongArray
    val out = new Array[Long](bytes.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, Seed)
      i += 1
    }
    out
  }

  /** Needle-side: DISTINCT gram hashes (the probe loops these against
    * every index row, so dedup is worth it; the build side deliberately
    * doesn't bother — `putLong` is idempotent and cheaper than a set).
    */
  def needleHashes(needle: String, n: Int): Array[Long] =
    gramHashes(needle.getBytes(java.nio.charset.StandardCharsets.UTF_8), n).distinct
}

/** Folds the byte n-grams of many log lines into ONE bloom filter — the
  * per-file gram set of ClickHouse's `ngrambf_v1` skip index, built as a
  * regular partial-combined Spark aggregate: each scan task grams its own
  * rows locally and the shuffle carries one compact bloom per (task, file)
  * group, never row data. Buffers merge associatively (`mergeInPlace` is a
  * bit-or), so the aggregate stays correct when one parquet file is read
  * by several split tasks.
  */
class NgramBloomAggregator(n: Int, expectedNdv: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedNdv, fpp)

  override def reduce(bf: BloomFilter, line: String): BloomFilter = {
    if (line != null) {
      val b = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val last = b.length - n
      while (i <= last) {
        bf.putLong(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + i, n, NgramHash.Seed))
        i += 1
      }
    }
    bf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = a.mergeInPlace(b)

  override def finish(bf: BloomFilter): Array[Byte] = SketchExprs.serialize(bf)

  // java serialization: BloomFilterImpl implements Serializable natively;
  // the buffer only crosses the wire at the partial->final shuffle
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization(classOf[BloomFilter])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object NgramBloomAgg {
  def ngramBloom(line: Column, n: Int, expectedNdv: Long, fpp: Double): Column = {
    val fn = udaf(new NgramBloomAggregator(n, expectedNdv, fpp))
    fn(line)
  }
}

/** graft_bloom_contains_all(bloom BINARY, hashes ARRAY<BIGINT>) → BOOLEAN:
  * does the serialized bloom possibly contain EVERY hash? The pruning
  * probe of [[graft.model.NgramIndex]]: the bloom side is the PER-ROW
  * value (one index row per data file) and the hash side is the constant
  * needle gram set — the mirror image of [[BloomContainsString]], whose
  * bloom is the constant. CodegenFallback is deliberate: this scans the
  * INDEX (O(files) rows), never data, so the per-row deserialize + loop is
  * off the hot path by construction.
  */
case class BloomMightContainAll(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_bloom_contains_all"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(LongType))
  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloomAny: Any, hashesAny: Any): Any = {
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomAny.asInstanceOf[Array[Byte]]))
    val hs = hashesAny.asInstanceOf[ArrayData]
    var i = 0
    while (i < hs.numElements()) {
      if (!bf.mightContainLong(hs.getLong(i))) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramBloomExprs {
  def bloomContainsAll(bloom: Column, hashes: Array[Long]): Column =
    call_function("graft_bloom_contains_all", bloom, lit(hashes))
}
