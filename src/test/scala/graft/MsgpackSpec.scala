package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.expressions.MsgpackWire
import graft.expressions.MsgpackWire.EventTime
import graft.model.LogSchema
import graft.streaming.IngestStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.collection.immutable.ListMap

/** The Fluent Bit msgpack wire path: encoder canonical-format boundaries,
  * decoder round-trips for every timestamp shape the reference handles
  * (/root/reference/main.go:85-103), whole-chunk break-on-malformed
  * semantics (main.go:242-254), and the end-to-end dataflow
  * `chunk bytes → graft_fb_records → graft_ingest → log rows`.
  */
class MsgpackSpec extends SparkTestBase {

  private def roundTripRecord(record: Any): String = {
    val chunk = MsgpackWire.encodeChunk(Seq((100L, record)))
    val events = MsgpackWire.decodeChunk(chunk)
    assert(events.length == 1)
    events.head._2
  }

  // ---- encoder format-width boundaries (the round-4 corruption bug) ----

  test("strings round-trip across fixstr/str8/str16/str32 boundaries") {
    for (n <- Seq(0, 1, 31, 32, 255, 256, 65535, 65536)) {
      val s = "x" * n
      val json = roundTripRecord(ListMap("k" -> s))
      assert(json == s"""{"k":"$s"}""", s"string of length $n corrupted")
    }
  }

  test("binary values round-trip across bin8/bin16/bin32 boundaries (UTF-8 rendering)") {
    for (n <- Seq(1, 255, 256, 65535, 65536)) {
      val b = Array.fill[Byte](n)('b'.toByte)
      val json = roundTripRecord(ListMap("k" -> b))
      // main.go:271-274: []byte renders as string(t)
      assert(json == s"""{"k":"${"b" * n}"}""", s"bin of length $n corrupted")
    }
  }

  test("arrays and maps round-trip across fix/16-bit boundaries") {
    for (n <- Seq(15, 16, 300)) {
      val json = roundTripRecord(ListMap("a" -> (0 until n).map(_.toLong)))
      assert(json == s"""{"a":[${(0 until n).mkString(",")}]}""",
        s"array of length $n corrupted")
    }
    for (n <- Seq(15, 16, 300)) {
      val m = ListMap((0 until n).map(i => f"k$i%04d" -> i.toLong): _*)
      val json = roundTripRecord(m)
      val expect = (0 until n).map(i => f""""k$i%04d":$i""").mkString("{", ",", "}")
      assert(json == expect, s"map of size $n corrupted")
    }
  }

  test("golden wire bytes: EventTime ext layout matches the Fluent Bit spec byte-for-byte") {
    // fixext8 type 0x00 = 0xd7 0x00 + uint32 BE seconds + uint32 BE nanos,
    // inside a [ts, record] fixarray — HAND-WRITTEN, not derived from the
    // encoder, so a layout bug symmetric between encodeChunk and the
    // decoder (swapped sec/nsec, wrong endianness, wrong ext type) cannot
    // hide behind round-trip identity
    val expected = Array(
      0x92,                   // fixarray(2)
      0xd7, 0x00,             // fixext8, type 0 (Fluent Bit EventTime)
      0x69, 0x4e, 0xb4, 0x00, // seconds  = 0x694eb400, big-endian
      0x07, 0x5b, 0xcd, 0x15, // nanos    = 123456789,  big-endian
      0x81, 0xa1, 'k'.toInt, 0xa1, 'v'.toInt // {"k":"v"}
    ).map(_.toByte)
    val got = MsgpackWire.encodeChunk(Seq(
      (EventTime(0x694eb400L, 123456789L), ListMap("k" -> "v"))))
    assert(got.toSeq == expected.toSeq, "encoder must emit the spec layout")
    val events = MsgpackWire.decodeChunk(expected)
    assert(events.head._1 == 0x694eb400L * 1000000L + 123456L)
    assert(events.head._2 == """{"k":"v"}""")
  }

  // ---- timestamp shapes, main.go:85-103 ----

  test("EventTime ext (fixext8 type 0) decodes to micros") {
    val chunk = MsgpackWire.encodeChunk(Seq(
      (EventTime(1767225600L, 123456789L), ListMap("m" -> "a"))))
    val events = MsgpackWire.decodeChunk(chunk)
    assert(events.head._1 == 1767225600L * 1000000L + 123456L)
  }

  test("integer and float timestamps decode as epoch seconds") {
    val chunk = MsgpackWire.encodeChunk(Seq(
      (1767225600L, ListMap("m" -> "int")),
      (1767225600.25, ListMap("m" -> "float")),
      (100L, ListMap("m" -> "fixint"))))
    val ts = MsgpackWire.decodeChunk(chunk).map(_._1)
    assert(ts == Vector(1767225600000000L, 1767225600250000L, 100000000L))
  }

  test("v2.1 nested [[ts, metadata], record] recurses into element 0") {
    val chunk = MsgpackWire.encodeChunk(Seq(
      (Seq(EventTime(1767225600L, 0L), ListMap("meta" -> "m")),
        ListMap("m" -> "nested"))))
    val events = MsgpackWire.decodeChunk(chunk)
    assert(events.head._1 == 1767225600000000L)
    assert(events.head._2 == """{"m":"nested"}""")
  }

  test("undecodable timestamp shape yields null micros (caller supplies fallback)") {
    val chunk = MsgpackWire.encodeChunk(Seq(("not-a-ts", ListMap("m" -> "x"))))
    assert(MsgpackWire.decodeChunk(chunk).head._1 == null)
  }

  // ---- record value shapes ----

  test("negative fixint, doubles, bools, null elision-ready nulls render to JSON") {
    val json = roundTripRecord(ListMap(
      "neg" -> -5L, "big_neg" -> -1000L, "d" -> 2.5, "t" -> true, "z" -> null))
    assert(json == """{"neg":-5,"big_neg":-1000,"d":2.5,"t":true,"z":null}""")
  }

  test("non-string map keys are stringified (JSON requires string keys)") {
    assert(roundTripRecord(ListMap(7L -> "a", "s" -> 1L)) == """{"7":"a","s":1}""")
  }

  test("nested maps and arrays preserve wire order") {
    val json = roundTripRecord(ListMap(
      "kubernetes" -> ListMap("namespace_name" -> "ns1", "labels" -> ListMap("app" -> "a1")),
      "arr" -> Seq(1L, "two", 3.5)))
    assert(json ==
      """{"kubernetes":{"namespace_name":"ns1","labels":{"app":"a1"}},"arr":[1,"two",3.5]}""")
  }

  test("decoder handles uint8/16/32 and float32 wire tags") {
    // hand-built bytes: the canonical encoder never emits these widths
    val out = new java.io.ByteArrayOutputStream
    out.write(0x92)             // [ts, record]
    out.write(0xce)             // uint32 ts
    out.write(0x69); out.write(0x4e); out.write(0xb4); out.write(0x00) // 1767225344
    out.write(0x81)             // fixmap(1)
    out.write(0xa1); out.write('v')
    out.write(0xca)             // float32 1.5
    val bits = java.lang.Float.floatToIntBits(1.5f)
    out.write((bits >> 24) & 0xff); out.write((bits >> 16) & 0xff)
    out.write((bits >> 8) & 0xff); out.write(bits & 0xff)
    // uint8 / uint16 timestamps on two more events
    out.write(0x92); out.write(0xcc); out.write(0xfe)          // uint8 254
    out.write(0x81); out.write(0xa1); out.write('v'); out.write(0x01)
    out.write(0x92); out.write(0xcd); out.write(0x01); out.write(0x00) // uint16 256
    out.write(0x81); out.write(0xa1); out.write('v'); out.write(0x02)
    val events = MsgpackWire.decodeChunk(out.toByteArray)
    assert(events.map(_._1) == Vector(
      0x694eb400L * 1000000L, 254000000L, 256000000L))
    assert(events.head._2 == """{"v":1.5}""")
  }

  // ---- whole-chunk break semantics, main.go:242-254 ----

  test("truncated chunk keeps the decoded prefix") {
    val full = MsgpackWire.encodeChunk(Seq(
      (1L, ListMap("m" -> "first-event-payload")),
      (2L, ListMap("m" -> "second-event-payload")),
      (3L, ListMap("m" -> "third-event-payload"))))
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 4)
    val events = MsgpackWire.decodeChunk(cut)
    assert(events.map(_._2) == Vector(
      """{"m":"first-event-payload"}""", """{"m":"second-event-payload"}"""))
  }

  test("garbled tag or non-pair event stops the chunk, keeping the prefix") {
    val good = MsgpackWire.encodeChunk(Seq((1L, ListMap("m" -> "ok"))))
    val withBadTag = good ++ Array(0xc1.toByte) // 0xc1 is never used in msgpack
    assert(MsgpackWire.decodeChunk(withBadTag).map(_._2) == Vector("""{"m":"ok"}"""))

    val bare = new java.io.ByteArrayOutputStream
    MsgpackWire.encode(ListMap("not" -> "a-pair"), bare) // map, not [ts, record]
    val withBadEvent = good ++ bare.toByteArray ++ good
    // the reference breaks the WHOLE chunk on the first bad event — the
    // trailing good event is dropped with it
    assert(MsgpackWire.decodeChunk(withBadEvent).map(_._2) == Vector("""{"m":"ok"}"""))
  }

  test("empty chunk decodes to no events") {
    assert(MsgpackWire.decodeChunk(Array.empty[Byte]).isEmpty)
  }

  test("deep-nesting attack cannot overflow the stack — depth cap trips the keep-prefix path") {
    // [ts, [[[[...]]]]]: a few KB of fixarray-1 headers would recurse past
    // the JVM stack without the depth cap; StackOverflowError is an Error,
    // so it would kill the task instead of breaking the chunk
    val good = MsgpackWire.encodeChunk(Seq((1L, ListMap("m" -> "ok"))))
    val attack = new java.io.ByteArrayOutputStream
    attack.write(good, 0, good.length)
    attack.write(0x92); attack.write(0x01)   // [ts, ...
    (1 to 50000).foreach(_ => attack.write(0x91)) // nested fixarray-1 ...
    attack.write(0xc0)
    val events = MsgpackWire.decodeChunk(attack.toByteArray)
    assert(events.map(_._2) == Vector("""{"m":"ok"}"""))
  }

  test("fuzz: random garbage never throws and never hangs") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { i =>
      val bytes = Array.fill[Byte](rnd.nextInt(2048))(rnd.nextInt(256).toByte)
      val out = MsgpackWire.decodeChunk(bytes) // must return, never throw
      assert(out != null, s"fuzz case $i")
    }
    // garbage appended to a valid event keeps the valid prefix
    val good = MsgpackWire.encodeChunk(Seq((7L, ListMap("k" -> "v"))))
    (1 to 100).foreach { i =>
      val tail = Array.fill[Byte](rnd.nextInt(64) + 1)(rnd.nextInt(256).toByte)
      val out = MsgpackWire.decodeChunk(good ++ tail)
      assert(out.nonEmpty && out.head._2 == """{"k":"v"}""", s"prefix case $i")
    }
  }

  test("property: random value trees round-trip encode→decode→JSON") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val safeString = Gen.alphaNumStr.map(_.take(40))
    def treeGen(depth: Int): Gen[Any] =
      if (depth == 0)
        Gen.oneOf(Gen.long, Gen.chooseNum(-1e9, 1e9), Gen.oneOf(true, false),
          Gen.const(null), safeString)
      else Gen.frequency(
        5 -> treeGen(0),
        2 -> Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, treeGen(depth - 1))),
        2 -> Gen.choose(0, 6).flatMap(n =>
          Gen.listOfN(n, Gen.zip(safeString, treeGen(depth - 1)))
            .map(kvs => ListMap(kvs.distinctBy(_._1): _*))))
    // independent expected-JSON builder over the GENERATED tree (safe
    // alphabet, so no escaping concerns here — escapes are covered by the
    // explicit tests above)
    def js(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case l: Long => l.toString
      case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
      case s: String => "\"" + s + "\""
      case xs: List[_] => xs.map(js).mkString("[", ",", "]")
      case m: ListMap[_, _] =>
        m.map { case (k, x) => "\"" + k + "\":" + js(x) }.mkString("{", ",", "}")
    }
    val prop = Prop.forAll(Gen.listOfN(3, treeGen(3))) { records =>
      val chunk = MsgpackWire.encodeChunk(records.map(r => (1L, r)))
      val decoded = MsgpackWire.decodeChunk(chunk)
      decoded.length == records.length &&
        decoded.map(_._2) == records.map(js).toVector &&
        decoded.forall(_._1 == 1000000L)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- end-to-end: wire bytes → graft_fb_records → graft_ingest ----

  test("chunk bytes flow through graft_fb_records and graft_ingest to log rows") {
    import spark.implicits._
    val chunk = MsgpackWire.encodeChunk(Seq(
      (EventTime(1767225600L, 500000000L), ListMap(
        "cluster" -> "c1",
        "kubernetes" -> ListMap(
          "namespace_name" -> "ns1", "pod_name" -> "pod-0",
          "container_name" -> "main", "host" -> "h1",
          "labels" -> ListMap("app" -> "app1")),
        "log" -> "hello wire",
        "content" -> ListMap("level" -> "info", "n" -> 42L))),
      ("bogus-ts", ListMap("log" -> "fallback row"))))
    val fallback = Timestamp.valueOf("2026-02-01 00:00:00")
    val rows = IngestStream.ingestedFromChunks(
        Seq(chunk).toDF("content"), fallbackTs = Some(fallback))
      .orderBy("log").collect()
    assert(rows.length == 2)
    val wire = rows(1) // "hello wire" sorts after "fallback row"
    assert(wire.getAs[Timestamp]("timestamp") ==
      Timestamp.from(java.time.Instant.ofEpochSecond(1767225600L, 500000000L)))
    assert(wire.getAs[String]("cluster") == "c1")
    assert(wire.getAs[String]("namespace") == "ns1")
    assert(wire.getAs[String]("app") == "app1")
    assert(wire.getAs[String]("log") == "hello wire")
    assert(wire.getAs[Map[String, String]]("fields_string")("content_level") == "info")
    assert(wire.getAs[Map[String, Double]]("fields_number")("content_n") == 42.0)
    assert(rows(0).getAs[Timestamp]("timestamp") == fallback)
  }

  private def chunkFor(day: Int, n: Int): Array[Byte] =
    MsgpackWire.encodeChunk((0 until n).map { i =>
      val sec = Timestamp.valueOf(f"2026-01-$day%02d 08:00:00").getTime / 1000
      (EventTime(sec + i, 0L), ListMap(
        "kubernetes" -> ListMap("namespace_name" -> s"ns${i % 2}"),
        "log" -> s"day$day line $i", "n" -> i.toLong))
    })

  test("streaming: chunk files → decode → ingest → date-partitioned parquet") {
    val in = tmp("graft-fb-in")
    val out = tmp("graft-fb-out")
    val ckpt = tmp("graft-fb-ckpt")
    Files.write(Paths.get(in, "chunk1.msgpack"), chunkFor(10, 30))
    Files.write(Paths.get(in, "chunk2.msgpack"), chunkFor(11, 20))
    val q = IngestStream.startFromChunks(spark, in, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    q.processAllAvailable()
    q.stop()
    val logs = LogSchema.readLogs(spark, out)
    assert(logs.count() == 50)
    val dates = logs.select("date").distinct().collect().map(_.get(0).toString).sorted
    assert(dates.toSeq == Seq("2026-01-10", "2026-01-11"))
    assert(logs.where(col("namespace") === "ns1").count() == 25)
    assert(logs.where(col("log") === "day10 line 7")
      .select(try_element_at(col("fields_number"), lit("n")))
      .collect()(0).getDouble(0) == 7.0)
  }

  test("streaming restart: wire query killed mid-stream resumes from checkpoint with no loss and no duplication") {
    val in = tmp("graft-fb-restart-in")
    val out = tmp("graft-fb-restart-out")
    val ckpt = tmp("graft-fb-restart-ckpt")
    // four chunk files, 15 rows each, every log line globally unique so
    // duplication is detectable per-row, not just by count
    (10 to 13).foreach(d =>
      Files.write(Paths.get(in, s"chunk$d.msgpack"), chunkFor(d, 15)))

    // Phase 1 — guarantee the kill lands MID-STREAM deterministically:
    // one file per micro-batch and a trigger interval far beyond the test,
    // so exactly the first batch (15 rows) commits before stop() and three
    // chunks remain unread. (A ProcessingTime(0) race could drain all four
    // before stop on a fast host, making "mid-stream" flaky.)
    val q1 = IngestStream.sinkPartitionedParquet(
      IngestStream.ingestedFromChunks(
        IngestStream.readFbChunks(spark, in, maxFilesPerTrigger = Some(1))),
      out, ckpt, trigger = Trigger.ProcessingTime("10 minutes")).start()
    eventually(timeoutMs = 60000) {
      q1.recentProgress.exists(_.numInputRows > 0)
    }
    q1.stop()
    assert(LogSchema.readLogs(spark, out).count() == 15,
      "exactly the first one-file batch must be committed before the kill")

    // harshest restart window: the sink committed batch 0 and wrote its
    // marker, but the CHECKPOINT commit is gone (crash between sink and
    // checkpoint) — the source will replay batch 0's file on restart and
    // the marker must skip it (SURVEY §3.2's upgrade over main.go:364's
    // at-least-once chunk retry)
    new java.io.File(ckpt, "commits/0").delete()
    new java.io.File(ckpt, "commits/.0.crc").delete()

    // Phase 2 — resume from the same checkpoint, drain everything
    val q2 = IngestStream.startFromChunks(spark, in, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    q2.processAllAvailable()
    q2.stop()
    val logs = LogSchema.readLogs(spark, out)
    assert(logs.count() == 60, "no loss: every chunk row lands exactly once")
    assert(logs.select("log").distinct().count() == 60,
      "no duplication: the replayed batch must be marker-skipped")
  }
}
