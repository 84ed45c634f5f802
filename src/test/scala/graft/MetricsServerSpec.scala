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
      assert(body.contains("# TYPE graft_batch_size summary"))
      assert(body.contains("graft_batches_total 3.0"))
      // build metadata rides the scrape (version.go:51-57 / main.go:125
      // parity): the info gauge carries the injected fields, none "unknown"
      assert(body.contains("# TYPE graft_build_info gauge"))
      val info = body.linesIterator.find(_.startsWith("graft_build_info{"))
        .getOrElse(fail(s"no graft_build_info sample in:\n$body"))
      assert(info.endsWith("} 1"))
      assert(info.contains(s"""version="${BuildInfo.version}""""), info)
      assert(info.contains(s"""revision="${BuildInfo.revision}""""), info)
      assert(info.contains(s"""branch="${BuildInfo.branch}""""), info)
      assert(BuildInfo.version.nonEmpty && BuildInfo.version != "unknown")
      assert(BuildInfo.revision.nonEmpty && BuildInfo.revision != "unknown")
      assert(BuildInfo.buildDate.nonEmpty && BuildInfo.buildDate != "unknown")
      assert(BuildInfo.describe.contains(s"version ${BuildInfo.version}"))
    } finally srv.stop()
  }

  test("summaries expose the reference's quantile objectives with sum and count") {
    val m = new StreamMetrics
    (1 to 100).foreach(i => m.batchSizeWindow.observe(i.toDouble))
    val srv = new MetricsServer(m, port = 0)
    val port = srv.start()
    def get(path: String): String = {
      val in = new java.net.URL(s"http://127.0.0.1:$port$path").openStream()
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    try {
      val body = get("/metrics")
      // nearest-rank over 1..100: p50=50, p90=90, p95=95, p99=99
      assert(body.contains("graft_batch_size{quantile=\"0.5\"} 50.0"), body)
      assert(body.contains("graft_batch_size{quantile=\"0.99\"} 99.0"), body)
      assert(body.contains("graft_batch_size_sum 5050.0"))
      assert(body.contains("graft_batch_size_count 100"))
      // flush summary present even when empty: NaN quantiles (client_golang
      // convention — "no data yet" must not read as "p99 = 0s")
      assert(body.contains("# TYPE graft_flush_time_seconds summary"))
      assert(body.contains("graft_flush_time_seconds{quantile=\"0.99\"} NaN"), body)
      assert(body.contains("graft_flush_time_seconds_count 0"))
    } finally srv.stop()
  }

  test("quantile window: ring bounded at capacity, quantiles track the retained tail") {
    val w = new StreamMetrics.QuantileWindow(8)
    (1 to 100).foreach(i => w.observe(i.toDouble))
    assert(w.count == 100 && w.sum == 5050.0)
    // only 93..100 retained
    assert(w.quantile(0.5) == 96.0)
    assert(w.quantile(0.99) == 100.0)
  }

  test("quantile window: empty reads NaN; zero capacity rejected at construction") {
    val w = new StreamMetrics.QuantileWindow(4)
    assert(w.quantile(0.5).isNaN)
    intercept[IllegalArgumentException](new StreamMetrics.QuantileWindow(0))
  }
}
