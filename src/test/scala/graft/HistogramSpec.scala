package graft

import graft.operators.Histogram
import org.apache.spark.sql.functions._

class HistogramSpec extends SparkTestBase {
  import spark.implicits._

  test("histogramQuantile: hand-computed interpolation, per-group, q=1 lands in the last bucket") {
    // group g: bins 0,1,2 with counts 10,30,10 over width 10
    //   p50: rank 25 → bucket 1 (cum 40), est = 10 + 10·(25−10)/30 = 15
    //   p90: rank 45 → bucket 2 (cum 50), est = 20 + 10·(45−40)/10 = 25
    //   q=1: rank 50 → last bucket, est = 20 + 10·(50−40)/10 = 30 (its hi)
    // group h: a single bucket — every q interpolates inside it
    val buckets = Seq(
      ("g", 0, 10L), ("g", 1, 30L), ("g", 2, 10L),
      ("h", 5, 4L)).toDF("grp", "bin", "cnt")
    val out = Histogram.histogramQuantile(buckets, Seq("grp"), "bin", "cnt",
        width = 10.0, qs = Seq(0.5, 0.9, 1.0))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("g", 0.5)) == 15.0)
    assert(out(("g", 0.9)) == 25.0)
    assert(out(("g", 1.0)) == 30.0)
    assert(out(("h", 0.5)) == 55.0) // 50 + 10·(2−0)/4
    assert(out(("h", 1.0)) == 60.0)
  }
}
