package graft.expressions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Fluent Bit wire format the reference plugin actually receives: a
  * msgpack chunk holding a concatenation of `[timestamp, record-map]`
  * events (/root/reference/main.go:238-244 — `output.NewDecoder` +
  * `GetRecord` loop over the raw C buffer). This module decodes that wire
  * shape natively so the engine can ingest Fluent Bit's forward-protocol
  * payloads, not just pre-converted JSON lines.
  *
  * Timestamp semantics mirror `getTimestamp` (main.go:85-103):
  *  - Fluent Bit EventTime ext (type 0, 8 bytes big-endian: uint32
  *    seconds + uint32 nanoseconds);
  *  - any msgpack integer → epoch seconds;
  *  - float → epoch seconds with fraction;
  *  - v2.1 metadata form `[[EventTime, metadata], record]` → recurse into
  *    element 0 of the array;
  *  - anything else → null (the caller supplies the fallback, as
  *    [[graft.operators.Ingest.coerceTimestamp]] does — the reference uses
  *    wall-clock `time.Now()`, which a deterministic engine cannot).
  *
  * The record map is re-emitted as one canonical JSON string per event so
  * the whole existing ingest path (graft_ingest: flatten → type dispatch →
  * route → force rewrites) applies unchanged — one decode surface, one
  * record dataflow. Msgpack is an open spec (msgpack.org); the decoder
  * below implements it directly, no third-party codec.
  */
object MsgpackWire {

  /** A decoded wire value. Maps preserve insertion order (flatten output
    * order follows it, like Go's map-iteration-free flatten via sorted
    * JSON emission downstream).
    */
  private final class Cursor(val bytes: Array[Byte]) {
    var pos: Int = 0
    def hasNext: Boolean = pos < bytes.length
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def i8(): Int = { val b = bytes(pos).toInt; pos += 1; b }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xffffffffL
    def i64(): Long = (u32() << 32) | u32()
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length)
        throw new IllegalArgumentException(s"truncated msgpack: need $n bytes at $pos")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
  }

  /** Fluent Bit EventTime payload (ext type 0): seconds + nanoseconds. */
  final case class EventTime(sec: Long, nsec: Long)
  /** Any other ext type — carried opaquely. */
  final case class Ext(extType: Int, data: Array[Byte])
  /** Decoded array / map wrappers: distinct types (erasure would make two
    * bare Vectors indistinguishable in the JSON emitter's match).
    */
  final case class MsgArr(items: Vector[Any])
  final case class MsgMap(entries: Vector[(Any, Any)])

  /** Nesting cap for untrusted chunks: decode is recursive, and without a
    * bound a chunk of a few KB of repeated array-headers overflows the
    * stack — a StackOverflowError is an Error, NOT caught by the
    * chunk-level Exception handler, so it would kill the executor task
    * instead of tripping the keep-prefix semantics. 128 is far beyond any
    * real Fluent Bit record (their nesting is label-map deep, ~4).
    */
  private val MaxDepth = 128

  /** Decode one msgpack value at the cursor. Throws on malformed input —
    * the chunk decoder turns that into the reference's whole-chunk `break`.
    */
  private def decodeValue(c: Cursor, depth: Int = 0): Any = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"msgpack nesting exceeds $MaxDepth")
    val b = c.u8()
    b match {
      case x if x <= 0x7f => x.toLong                       // positive fixint
      case x if x >= 0xe0 => (x - 0x100).toLong             // negative fixint
      case x if (x & 0xf0) == 0x80 => decodeMap(c, x & 0x0f, depth)
      case x if (x & 0xf0) == 0x90 => decodeArray(c, x & 0x0f, depth)
      case x if (x & 0xe0) == 0xa0 => utf8(c.take(x & 0x1f))
      case 0xc0 => null
      case 0xc2 => java.lang.Boolean.FALSE
      case 0xc3 => java.lang.Boolean.TRUE
      case 0xc4 => c.take(c.u8())                           // bin8
      case 0xc5 => c.take(c.u16())                          // bin16
      case 0xc6 => c.take(intLen(c.u32()))                  // bin32
      case 0xc7 => ext(c, c.u8())                           // ext8
      case 0xc8 => ext(c, c.u16())                          // ext16
      case 0xc9 => ext(c, intLen(c.u32()))                  // ext32
      case 0xca => java.lang.Float.intBitsToFloat(c.u32().toInt).toDouble
      case 0xcb => java.lang.Double.longBitsToDouble(c.i64())
      case 0xcc => c.u8().toLong
      case 0xcd => c.u16().toLong
      case 0xce => c.u32()
      case 0xcf => c.i64()                                  // uint64 (wraps >2^63 like Go→float64 loses it anyway)
      case 0xd0 => c.i8().toLong
      case 0xd1 => c.u16().toShort.toLong
      case 0xd2 => c.u32().toInt.toLong
      case 0xd3 => c.i64()
      case 0xd4 => ext(c, 1)
      case 0xd5 => ext(c, 2)
      case 0xd6 => ext(c, 4)
      case 0xd7 => ext(c, 8)                                // fixext8: Fluent Bit EventTime lives here
      case 0xd8 => ext(c, 16)
      case 0xd9 => utf8(c.take(c.u8()))
      case 0xda => utf8(c.take(c.u16()))
      case 0xdb => utf8(c.take(intLen(c.u32())))
      case 0xdc => decodeArray(c, c.u16(), depth)
      case 0xdd => decodeArray(c, intLen(c.u32()), depth)
      case 0xde => decodeMap(c, c.u16(), depth)
      case 0xdf => decodeMap(c, intLen(c.u32()), depth)
      case other => throw new IllegalArgumentException(f"unknown msgpack tag 0x$other%02x")
    }
  }

  private def intLen(n: Long): Int = {
    if (n > Int.MaxValue) throw new IllegalArgumentException(s"msgpack length $n too large")
    n.toInt
  }

  private def utf8(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  private def ext(c: Cursor, len: Int): Any = {
    val t = c.i8()
    val data = c.take(len)
    if (t == 0 && len == 8) {
      val cc = new Cursor(data)
      EventTime(cc.u32(), cc.u32())
    } else Ext(t, data)
  }

  private def decodeArray(c: Cursor, n: Int, depth: Int): MsgArr =
    MsgArr(Vector.fill(n)(decodeValue(c, depth + 1)))

  private def decodeMap(c: Cursor, n: Int, depth: Int): MsgMap =
    MsgMap(Vector.fill(n)((decodeValue(c, depth + 1), decodeValue(c, depth + 1))))

  /** Wire timestamp → epoch microseconds, main.go:85-103 semantics;
    * null for shapes the reference punts to wall-clock on.
    */
  def toMicros(ts: Any): java.lang.Long = ts match {
    case EventTime(sec, nsec) => sec * 1000000L + nsec / 1000L
    case l: Long => l * 1000000L
    case d: Double => math.round(d * 1e6)
    case MsgArr(items) if items.nonEmpty => toMicros(items.head)  // v2.1 [[ts, meta], msg]
    case _ => null
  }

  /** Canonical JSON for a decoded record value. Key order is wire order;
    * binary values decode as UTF-8 strings (main.go:271-274 `string(t)`);
    * non-string scalar map keys are stringified (JSON requires string
    * keys; the reference's flatten does the same via fmt).
    */
  def toJson(v: Any, sb: java.lang.StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: java.lang.Boolean => sb.append(b.toString)
    case l: Long => sb.append(l)
    case d: Double =>
      if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(d.toString)
    case s: String => appendJsonString(s, sb)
    case b: Array[Byte] => appendJsonString(utf8(b), sb)
    case EventTime(sec, nsec) => sb.append(sec).append('.').append(f"$nsec%09d")
    case Ext(_, data) => appendJsonString(utf8(data), sb)
    case MsgArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { e =>
        if (!first) sb.append(','); first = false
        toJson(e, sb)
      }
      sb.append(']')
    case MsgMap(entries) =>
      sb.append('{')
      var first = true
      entries.foreach { case (k, value) =>
        if (!first) sb.append(','); first = false
        k match {
          case s: String => appendJsonString(s, sb)
          case other => appendJsonString(String.valueOf(other), sb)
        }
        sb.append(':')
        toJson(value, sb)
      }
      sb.append('}')
    case other => appendJsonString(String.valueOf(other), sb)
  }

  private def appendJsonString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u$c%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    ()
  }

  /** Decode a whole chunk: a raw concatenation of `[ts, record]` events.
    * A malformed event stops the WHOLE chunk and returns the events
    * decoded so far — the reference `break`s its GetRecord loop the same
    * way (main.go:242-254), leaving Fluent Bit's retry to redeliver.
    */
  def decodeChunk(bytes: Array[Byte]): Vector[(java.lang.Long, String)] = {
    val c = new Cursor(bytes)
    val out = Vector.newBuilder[(java.lang.Long, String)]
    try {
      while (c.hasNext) {
        decodeValue(c) match {
          case MsgArr(event) if event.length == 2 =>
            val micros = toMicros(event(0))
            val sb = new java.lang.StringBuilder
            toJson(event(1), sb)
            out += ((micros, sb.toString))
          case _ =>
            throw new IllegalArgumentException("event is not a [ts, record] pair")
        }
      }
    } catch { case _: Exception => () } // truncated/garbled tail: keep decoded prefix
    out.result()
  }

  // ---- minimal encoder (tests, fixtures, and the wire-format oracle) ----

  /** Encode a value as msgpack. Supports the subset Fluent Bit emits:
    * null, Boolean, Long/Int, Double, String, Array[Byte], Seq (array),
    * Map (insertion-ordered Maps keep wire order), [[EventTime]] (fixext8
    * type 0). Deterministic canonical form: always the SMALLEST format that
    * fits the length (fixstr→str8→str16→str32, bin8→bin16→bin32,
    * fixarray→array16→array32, fixmap→map16→map32), so any payload up to
    * the msgpack 32-bit limits round-trips — the old single-length-byte
    * str8/bin8 emission silently corrupted values ≥ 256 bytes.
    */
  def encode(v: Any, out: java.io.ByteArrayOutputStream): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => encode(i.toLong, out)
    case l: Long =>
      if (l >= 0 && l <= 0x7f) out.write(l.toInt)
      else if (l < 0 && l >= -32) out.write((l & 0xff).toInt)
      else { out.write(0xd3); writeLong(l, out) }
    case d: Double =>
      out.write(0xcb); writeLong(java.lang.Double.doubleToLongBits(d), out)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xff) { out.write(0xd9); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xda); writeShort(b.length, out) }
      else { out.write(0xdb); writeInt(b.length, out) }
      out.write(b, 0, b.length)
    case b: Array[Byte] =>
      if (b.length <= 0xff) { out.write(0xc4); out.write(b.length) }
      else if (b.length <= 0xffff) { out.write(0xc5); writeShort(b.length, out) }
      else { out.write(0xc6); writeInt(b.length, out) }
      out.write(b, 0, b.length)
    case EventTime(sec, nsec) =>
      out.write(0xd7); out.write(0)
      writeInt(sec.toInt, out); writeInt(nsec.toInt, out)
    case m: scala.collection.Map[_, _] =>
      if (m.size <= 15) out.write(0x80 | m.size)
      else if (m.size <= 0xffff) { out.write(0xde); writeShort(m.size, out) }
      else { out.write(0xdf); writeInt(m.size, out) }
      m.foreach { case (k, value) => encode(k, out); encode(value, out) }
    case seq: Seq[_] =>
      if (seq.length <= 15) out.write(0x90 | seq.length)
      else if (seq.length <= 0xffff) { out.write(0xdc); writeShort(seq.length, out) }
      else { out.write(0xdd); writeInt(seq.length, out) }
      seq.foreach(encode(_, out))
    case other =>
      throw new IllegalArgumentException(s"cannot encode ${other.getClass}")
  }

  private def writeShort(i: Int, out: java.io.ByteArrayOutputStream): Unit = {
    out.write((i >> 8) & 0xff); out.write(i & 0xff)
  }

  private def writeInt(i: Int, out: java.io.ByteArrayOutputStream): Unit = {
    out.write((i >> 24) & 0xff); out.write((i >> 16) & 0xff)
    out.write((i >> 8) & 0xff); out.write(i & 0xff)
  }

  private def writeLong(l: Long, out: java.io.ByteArrayOutputStream): Unit = {
    writeInt((l >> 32).toInt, out); writeInt(l.toInt, out)
  }

  /** Encode a chunk of `[ts, record]` events (test/fixture helper). */
  def encodeChunk(events: Seq[(Any, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    events.foreach { case (ts, record) => encode(Seq(ts, record), out) }
    out.toByteArray
  }
}

/** graft_fb_records(chunk BINARY) → ARRAY<STRUCT<ts TIMESTAMP, record
  * STRING>>: the Fluent Bit chunk decode as a native expression.
  * `explode(graft_fb_records(chunk))` then `graft_ingest(record)` is the
  * full reference dataflow from wire bytes to log rows. Scale: the decode
  * is a single pass over each chunk's bytes inside the scan stage — no
  * shuffle, chunks parallelize by file/row like any other source column.
  */
case class FbRecords(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_fb_records"
  override def nullable: Boolean = true

  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("ts", TimestampType),
    StructField("record", StringType))), containsNull = false)

  override def nullSafeEval(chunkAny: Any): Any = {
    val events = MsgpackWire.decodeChunk(chunkAny.asInstanceOf[Array[Byte]])
    new GenericArrayData(events.map { case (micros, json) =>
      InternalRow(micros, UTF8String.fromString(json))
    }.toArray[Any])
  }

  /** Same codegen posture as [[JsonIngest]]: a plain method call keeps the
    * stage inside whole-stage codegen instead of CodegenFallback'ing the
    * surrounding operators.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fbRecords", this, classOf[FbRecords].getName)
    nullSafeCodeGen(ctx, ev, chunk => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($chunk);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
