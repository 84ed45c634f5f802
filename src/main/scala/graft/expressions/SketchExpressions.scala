package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the dedup operators.
  *
  * The naive composition (`transform` × `array_min` × `xxhash64` higher-order
  * functions) evaluates interpreted, walking an expression tree per shingle
  * per hash — ~100× slower than a fused loop. These expressions do all
  * hashing for a row in one `eval` call with primitive loops. (They are
  * CodegenFallback — one virtual call per ROW is negligible; the win is not
  * interpreting per ELEMENT.)
  */

/** graft_minhash(shingles ARRAY<STRING>, k INT) → ARRAY<BIGINT>:
  * k-permutation MinHash signature; family member i is xxhash64 with seed i.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_minhash"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(shinglesAny: Any, kAny: Any): Any = {
    val shingles = shinglesAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    // same guard rationale as SimHashWide's words bound: k <= 0 would
    // throw NegativeArraySizeException (or silently emit an empty
    // signature) per row inside the task
    require(k >= 1 && k <= 65536, s"graft_minhash k must be in [1, 65536], got $k")
    val n = shingles.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val s = shingles.getUTF8String(j)
        if (s != null) {
          val h = XxHash64Function.hash(s, StringType, i.toLong)
          if (h < best) best = h
        }
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_simhash(tokens ARRAY<STRING>) → BIGINT: 64-bit SimHash — per bit,
  * sign of the sum of ±1 votes from each token's xxhash64 bit.
  */
case class SimHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_simhash"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(tokensAny: Any): Any = {
    val tokens = tokensAny.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        val h = XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_simhash_wide(tokens ARRAY<STRING>, words INT) → ARRAY<BIGINT>:
  * a words×64-bit SimHash; word w votes with xxhash64 seed 42+w, so word 0
  * equals [[SimHash]]. Wider fingerprints are what keep banded LSH
  * selective at larger Hamming radii: with nBands = maxHamming+1 disjoint
  * chunks, chunk width is 64·words/(maxHamming+1) bits and the expected
  * band-collision rate falls ~2^64/words per added word. Radius 12 over 64
  * bits needs ~5-bit chunks (1/32 of all pairs collide per band); over 128
  * bits it gets ~10-bit chunks (1/1024).
  */
case class SimHashWide(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "graft_simhash_wide"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tokensAny: Any, wordsAny: Any): Any = {
    val tokens = tokensAny.asInstanceOf[ArrayData]
    val words = wordsAny.asInstanceOf[Int]
    // guard SQL callers: registered as graft_simhash_wide, so words is not
    // validated at analysis time — a negative value would otherwise throw
    // NegativeArraySizeException per row, and 0 a silently-empty fingerprint
    if (words < 1 || words > 16) {
      throw new IllegalArgumentException(
        s"graft_simhash_wide: words must be in [1, 16], got $words")
    }
    val counters = new Array[Int](words * 64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        var w = 0
        while (w < words) {
          val h = XxHash64Function.hash(t, StringType, 42L + w)
          val off = w * 64
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counters(off + b) += 1
            else counters(off + b) -= 1
            b += 1
          }
          w += 1
        }
      }
      j += 1
    }
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (counters(w * 64 + b) > 0) fp |= (1L << b)
        b += 1
      }
      out(w) = fp
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_bloom_contains(bloom BINARY, value STRING) → BOOLEAN: membership
  * probe of a serialized `org.apache.spark.util.sketch.BloomFilter` built
  * over `xxhash64(value)` longs (seed 42 — the SQL `xxhash64` default, so
  * the build side is plain `df.select(xxhash64(col))​.stat.bloomFilter`).
  *
  * The probe is scan-hot (it guards every corpus shingle in
  * [[graft.operators.TrainPipeline.decontaminateBloom]]), so unlike the
  * per-row sketch loops above this expression implements `doGenCode`: the
  * generated code is one hash + one bit-test through a referenced
  * deserialized filter — no per-row allocation, no interpreted tree. The
  * bloom bytes must be FOLDABLE (a literal/broadcast value): the filter is
  * deserialized once per task via the transient lazy, not per row.
  */
case class BloomContainsString(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_bloom_contains"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!left.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains needs a constant bloom-filter argument")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** Called from both interpreted eval and generated code. */
  def contains(v: UTF8String): Boolean =
    bloom.mightContainLong(XxHash64Function.hash(v, StringType, 42L))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (bloom == null) return null
    val v = right.eval(input)
    if (v == null) null else contains(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // the bloom side is foldable, so a NULL filter is known HERE — emit
    // the constant-null expression instead of code that would NPE in
    // contains() (eval() returns null for this case; codegen must agree)
    if (bloom == null) {
      return ev.copy(
        code = code"""
          boolean ${ev.isNull} = true;
          boolean ${ev.value} = false;
        """)
    }
    val ref = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomContainsString].getName)
    val childGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.contains(${childGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchExprs {
  def register(spark: SparkSession): Unit = GraftFunctions.registerAll(spark)

  def minhash(shingles: Column, k: Int): Column =
    call_function("graft_minhash", shingles,
      org.apache.spark.sql.functions.lit(k))

  def simhash(tokens: Column): Column = call_function("graft_simhash", tokens)

  def simhashWide(tokens: Column, words: Int): Column =
    call_function("graft_simhash_wide", tokens,
      org.apache.spark.sql.functions.lit(words))

  /** Serialize a built BloomFilter for use as the literal bloom argument. */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def bloomContains(bloomBytes: Array[Byte], value: Column): Column =
    call_function("graft_bloom_contains",
      org.apache.spark.sql.functions.lit(bloomBytes), value)
}
