package graft

import java.nio.file.{Files, Paths}
import graft.operators.{Ingest, IngestConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest throughput measurement: N klogs-shaped JSON records through the
  * full flatten/dispatch/route projection into partitioned parquet.
  * Reference duty: 10 000 rows per 60 s flush on a 0.1-CPU budget
  * (/root/reference/main.go:37-38, cluster/fluent-bit.yaml:162-165).
  */
object ProbeIngestThroughput {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val in = Files.createTempDirectory("thr-in").toString
    val lines = (0 until n).iterator.map { i =>
      s"""{"ts":"2026-01-${10 + i % 3}T08:00:00Z","cluster":"c1","kubernetes":{"namespace_name":"ns${i % 5}","pod_name":"pod-${i % 100}","container_name":"main","host":"h${i % 10}","labels":{"app":"app${i % 7}"}},"log":"GET /api/v1/resource/${i} 200","content":{"level":"info","duration":${i % 500}.5,"code":${200 + i % 4},"path":"/api/v1/resource/${i}"}}"""
    }
    val w = Files.newBufferedWriter(Paths.get(in, "data.json"))
    lines.foreach { l => w.write(l); w.newLine() }
    w.close()

    val out = Files.createTempDirectory("thr-out").toString
    // warm up codegen on a slice
    Ingest.ingestJson(spark.read.text(in).limit(1000), col("value"),
      Ingest.coerceTimestamp(get_json_object(col("value"), "$.ts"))).count()

    val t0 = System.nanoTime()
    val ingested = Ingest.ingestJson(spark.read.text(in), col("value"),
      Ingest.coerceTimestamp(get_json_object(col("value"), "$.ts")))
    graft.model.LogSchema.writePartitioned(ingested, out)
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(out).count()
    println(f"[ingest] $rows rows in $secs%.1fs = ${rows / secs}%.0f rows/s (8 cores, incl. partitioned parquet write)")

    // ---- msgpack wire path: the same records as Fluent Bit chunks ----
    import graft.expressions.MsgpackWire
    import scala.collection.immutable.ListMap
    val chunkDir = Files.createTempDirectory("thr-fb-in").toString
    val perChunk = 2000
    (0 until n by perChunk).foreach { start =>
      val events = (start until math.min(start + perChunk, n)).map { i =>
        val day = 10 + i % 3
        val sec = java.time.Instant.parse(f"2026-01-$day%02dT08:00:00Z").getEpochSecond
        (MsgpackWire.EventTime(sec, 0L), ListMap(
          "cluster" -> "c1",
          "kubernetes" -> ListMap(
            "namespace_name" -> s"ns${i % 5}", "pod_name" -> s"pod-${i % 100}",
            "container_name" -> "main", "host" -> s"h${i % 10}",
            "labels" -> ListMap("app" -> s"app${i % 7}")),
          "log" -> s"GET /api/v1/resource/$i 200",
          "content" -> ListMap("level" -> "info", "duration" -> (i % 500 + 0.5),
            "code" -> (200L + i % 4), "path" -> s"/api/v1/resource/$i"))): (Any, Any)
      }
      Files.write(Paths.get(chunkDir, f"chunk$start%08d.msgpack"),
        MsgpackWire.encodeChunk(events))
    }
    val outFb = Files.createTempDirectory("thr-fb-out").toString
    val t1 = System.nanoTime()
    val fromWire = graft.streaming.IngestStream.ingestedFromChunks(
      spark.read.format("binaryFile").load(chunkDir))
    graft.model.LogSchema.writePartitioned(fromWire, outFb)
    val secsFb = (System.nanoTime() - t1) / 1e9
    val rowsFb = spark.read.parquet(outFb).count()
    println(f"[wire]   $rowsFb rows in $secsFb%.1fs = ${rowsFb / secsFb}%.0f rows/s (8 cores, msgpack chunk decode + ingest + partitioned write)")
    spark.stop()
  }
}
