package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Volume anomaly + spike attribution on planted series. */
class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hour: Int, i: Int): Timestamp =
    Timestamp.from(Timestamp.valueOf("2024-03-01 00:00:00")
      .toInstant.plusSeconds(hour * 3600L + i * 7L))

  // "steady": 10 events/hour for 40 hours; "spiky": same, except hour 30
  // carries 100 events
  private lazy val events = {
    val steady = for (h <- 0 until 40; i <- 0 until 10)
      yield (ts(h, i), "steady")
    val spiky = for (h <- 0 until 40; i <- 0 until (if (h == 30) 100 else 10))
      yield (ts(h, i), "spiky")
    (steady ++ spiky).toDF("ts", "kind")
  }

  test("volumeAnomalies flags exactly the planted spike hour, with a full trailing baseline") {
    val out = Anomaly.volumeAnomalies(events, col("ts"), Seq("kind"),
        bucket = "hour", lookback = 24, minSigma = 3.0)
      .collect()
    // head of each series (first 24 buckets) must be dropped: 2×16 rows
    assert(out.length == 2 * 16)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("cnt"))).toSet
    assert(flagged == Set(("spiky", 100L)))
    // a constant series after the spike window passes has sd from a
    // baseline containing the spike — large sd, no flag; and the steady
    // series is all-zero variance → excluded rows never divide by zero
    assert(out.forall(r => r.getAs[Double]("sd") > 0))
  }

  test("contributors ranks the spiking kind first with positive delta_share and lift > 1") {
    val out = Anomaly.contributors(events, col("ts"), Seq("kind"),
        spikeFrom = lit("2024-03-02 06:00:00").cast("timestamp"),
        spikeTo = lit("2024-03-02 07:00:00").cast("timestamp"),
        baseFrom = lit("2024-03-01 00:00:00").cast("timestamp"),
        baseTo = lit("2024-03-02 06:00:00").cast("timestamp"))
      .orderBy(desc("delta_share")).collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getAs[String]("kind") == "spiky")
    assert(top.getAs[Long]("cnt_spike") == 100L)
    assert(top.getAs[Double]("delta_share") > 0)
    assert(top.getAs[Double]("lift") > 1.0)
    // shares sum to 1 within each window
    assert(math.abs(out.map(_.getAs[Double]("share_spike")).sum - 1.0) < 1e-6)
    assert(math.abs(out.map(_.getAs[Double]("share_base")).sum - 1.0) < 1e-6)
  }

  test("entropy: uniform mix → norm 1, single value → 0, skew in between") {
    val df = Seq(
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),   // uniform over 4
      ("s", "a"), ("s", "a"), ("s", "a"), ("s", "b"),   // skewed
      ("one", "a"), ("one", "a"))                        // single value
      .toDF("g", "v")
    val out = Anomaly.entropy(df, Seq("g"), col("v"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy"), r.getAs[Double]("entropy_norm"))).toMap
    assert(out("u") == (4L, 4L, 1.3863, 1.0))           // ln 4
    assert(out("one") == (2L, 1L, -0.0, 0.0))
    val (_, _, hs, ns) = out("s")
    assert(hs > 0 && ns > 0 && ns < 1.0)
  }

  test("a dim absent from the baseline gets NULL lift, not a division blowup") {
    val ev = Seq(
      (Timestamp.valueOf("2024-03-01 00:00:00"), "old"),
      (Timestamp.valueOf("2024-03-03 00:00:00"), "old"),
      (Timestamp.valueOf("2024-03-03 00:00:00"), "brandnew"))
      .toDF("ts", "kind")
    val out = Anomaly.contributors(ev, col("ts"), Seq("kind"),
        spikeFrom = lit("2024-03-02 00:00:00").cast("timestamp"),
        spikeTo = lit("2024-03-04 00:00:00").cast("timestamp"),
        baseFrom = lit("2024-03-01 00:00:00").cast("timestamp"),
        baseTo = lit("2024-03-02 00:00:00").cast("timestamp"))
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(out("brandnew").isNullAt(out("brandnew").fieldIndex("lift")))
    assert(!out("old").isNullAt(out("old").fieldIndex("lift")))
  }
}
