package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector column functions over `ARRAY<FLOAT>` embedding columns.
  * All math is done in double after an explicit element cast so results are
  * bit-identical to the DuckDB oracle (which also computes in double when
  * the SQL casts the same way). Pure built-in higher-order functions —
  * codegen-friendly, no UDF.
  */
object VectorFunctions {

  /** Elementwise double cast. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Dot product of two equal-length vectors (sequential left-to-right sum,
    * the same association DuckDB's list_sum uses).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine of pre-normalized vectors (cheaper at scale: normalize once at
    * write, then cosine == dot).
    */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x => x.cast(DoubleType) / n)
  }

  /** Random-hyperplane (SimHash) sketch of a vector: `bits` sign bits of
    * dot products with deterministic pseudo-random hyperplanes, packed into
    * a long. Cosine-similar vectors collide with probability
    * 1 - theta/pi per bit — the LSH primitive for ANN bucketing.
    *
    * Hyperplane component j of plane p is a deterministic hash-derived
    * value in [-1, 1): hash(p, j) scaled — reproducible across runs with no
    * stored model.
    */
  def hyperplaneSketch(v: Column, bits: Int, seed: Int = 42): Column =
    call_function("graft_hyperplane", toDouble(v), lit(bits), lit(seed))

  /** Hamming distance between two packed-long sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
