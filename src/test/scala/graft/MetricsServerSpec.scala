package graft

import graft.streaming.{MetricsServer, StreamMetrics}
import org.scalatest.funsuite.AnyFunSuite

/** The /health + /metrics HTTP surface
  * (/root/reference/pkg/instrument/metrics/metrics.go:50-65).
  */
class MetricsServerSpec extends AnyFunSuite {

  test("/health answers OK; /metrics serves Prometheus exposition of the counters") {
    val m = new StreamMetrics
    m.inputRecordsTotal.set(42)
    m.batchesTotal.set(3)
    val srv = new MetricsServer(m, port = 0) // ephemeral port
    val port = srv.start()
    def get(path: String): String = {
      val in = new java.net.URL(s"http://127.0.0.1:$port$path").openStream()
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    try {
      assert(get("/health") == "OK")
      val body = get("/metrics")
      assert(body.contains("# TYPE graft_input_records_total counter"))
      assert(body.contains("graft_input_records_total 42.0"))
      assert(body.contains("# TYPE graft_batch_size gauge"))
      assert(body.contains("graft_batches_total 3.0"))
    } finally srv.stop()
  }
}
