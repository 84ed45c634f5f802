package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the hot tokenize/shingle path.
  *
  * The Column-level formulation
  * `transform(sequence(1, size(toks)-n+1), i -> concat_ws(' ', slice(toks, i, n)))`
  * is quadratic when interpreted: higher-order functions are CodegenFallback
  * and the `toks` subexpression (split+filter over the whole text) re-evals
  * on every window position. These fuse tokenize + shingle into one pass.
  */

/** graft_tokens(text) → ARRAY<STRING>: lowercase, split on whitespace,
  * drop empties. Semantics identical to
  * `filter(split(lower(text), "\\s+"), t -> t != '')`.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_tokens"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(textAny: Any): Any =
    Tokenize.tokenize(textAny.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  /** Whitespace split semantics matching Java regex `\s` (the Column
    * formulation splits on `\s+`): space, tab, newline, CR, FF, VT.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
  def tokenize(text: UTF8String): GenericArrayData = {
    // Locale.ROOT: default-locale toLowerCase diverges from DuckDB lower()
    // under e.g. tr-TR ("I" → dotless "ı"), breaking oracle parity and the
    // documented lower()-equivalence of graft_tokens
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) out += UTF8String.fromString(s.substring(start, i))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** graft_shingles(text, n) → ARRAY<STRING>: word n-gram shingles over the
  * [[Tokenize]] token stream, space-joined; texts shorter than n tokens
  * yield one shingle of all tokens. One pass, no re-tokenization.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_shingles"
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val toks = Tokenize.tokenize(textAny.asInstanceOf[UTF8String])
    val m = toks.numElements()
    if (m == 0) {
      // empty/whitespace-only text has NO shingles: the old single-[""]
      // result gave every pair of empty docs Jaccard 1.0, while the DuckDB
      // oracles (which drop empty tokens) emit no pair — latent parity break
      new GenericArrayData(Array.empty[Any])
    } else if (m < n) {
      val sb = new StringBuilder
      var i = 0
      while (i < m) {
        if (i > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString); i += 1
      }
      new GenericArrayData(Array[Any](UTF8String.fromString(sb.toString)))
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_hyperplane(vec ARRAY<DOUBLE>, bits INT, seed INT) → BIGINT:
  * random-hyperplane (SimHash) sketch — sign bits of dot products with
  * `bits` deterministic pseudo-random hyperplanes packed into a long.
  * Plane component (p, j) = xxhash64 of the packed (seed, p, j) triple
  * scaled to [-1, 1) — no stored model, reproducible across runs, engines,
  * and Scala versions (not tied to Scala hash internals).
  */
case class HyperplaneSketch(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_hyperplane"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = LongType

  @transient private var planes: Array[Array[Double]] = _

  override def nullSafeEval(vecAny: Any, bitsAny: Any, seedAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val seed = seedAny.asInstanceOf[Int]
    // bits > 64 would wrap `1L << p` mod 64 and silently overwrite earlier
    // sketch bits — the same guard class SimHashWide carries for words
    require(bits >= 1 && bits <= 64,
      s"graft_hyperplane bits must be in [1, 64], got $bits")
    val dim = vec.numElements()
    if (planes == null || planes.length != bits || (planes.length > 0 && planes(0).length < dim)) {
      planes = Array.tabulate(bits, dim) { (p, j) =>
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong((seed.toLong << 40) | (p.toLong << 20) | j.toLong, 42L)
        (h >> 11).toDouble / (1L << 52).toDouble // 52 mantissa-ish bits → [-1, 1)
      }
    }
    var sketch = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var j = 0
      val plane = planes(p)
      while (j < dim) { dot += vec.getDouble(j) * plane(j); j += 1 }
      if (dot >= 0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** graft_remove_at(tokens ARRAY<STRING>, positions ARRAY<INT>) →
  * ARRAY<STRING>: drop the tokens at the given SORTED ASCENDING 1-based
  * positions, one two-pointer merge pass — O(tokens + positions).
  *
  * Exists for [[graft.operators.Dedup.removeDuplicateSpans]]: the
  * higher-order `filter(t, (w, i) => !array_contains(covered, i+1))`
  * formulation rescans the covered array per token — O(T·C) on exactly
  * the documents span removal targets (heavily duplicated ones, where C
  * approaches T). Fused-eval like the other per-row array producers here
  * (array-of-string output; the loop body, not expression dispatch,
  * dominates).
  */
case class RemoveAtPositions(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_remove_at"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(toksAny: Any, posAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val pos = posAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = pos.numElements()
    val out = new Array[Any](n)
    var i = 0; var p = 0; var o = 0
    while (i < n) {
      while (p < m && pos.getInt(p) < i + 1) p += 1
      if (p < m && pos.getInt(p) == i + 1) p += 1 // covered → drop
      else { out(o) = toks.get(i, StringType); o += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], o))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
