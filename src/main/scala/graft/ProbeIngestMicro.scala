package graft

import graft.operators.{Ingest, IngestConfig}

/** Dev probe: driver-side microbenchmark of the ingest per-record path —
  * where do the ~100+ µs/row of the JSON queries' task time actually go?
  * No Spark session; pure JVM.
  */
object ProbeIngestMicro {
  def main(args: Array[String]): Unit = {
    val json =
      """{"cluster":"c1","kubernetes":{"namespace_name":"checkout",
        |"pod_name":"checkout-6d8f","container_name":"app",
        |"host":"node-3","labels":{"app":"checkout","k8s-app":"legacy"}},
        |"log":"GET /api/cart 200 12ms","event_id":12345,
        |"metric":{"v":42.5},"tag":{"t":"purchase"}}""".stripMargin.replace("\n", "")
    val cfg = IngestConfig()
    val cfgF = IngestConfig(forceNumberFields = Seq("metric.v"), forceUnderscores = true)
    val n = 200000
    def bench(label: String)(body: => Unit): Unit = {
      (1 to 50000).foreach(_ => body)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[micro] $label%-34s ${us}%8.2f us/row")
    }
    bench("processRecord plain")(Ingest.processRecord(json, cfg))
    bench("processRecord forced")(Ingest.processRecord(json, cfgF))
    val rec = Ingest.processRecord(json, cfg)
    bench("toInternalRow")(graft.expressions.JsonIngest.toInternalRow(rec))
    // parse alone
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    bench("jackson readTree")(mapper.readTree(json))
  }
}
