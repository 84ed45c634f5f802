package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: the per-action latency floor of tiny warm jobs under the
  * bench session shape — 0-exchange, 1-exchange and 2-exchange plans,
  * with AQE on vs off. Separates "Spark job overhead" from "AQE stage
  * materialization overhead" so loop optimizations target the right one.
  */
object ProbeJobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time(label: String)(body: => Unit): Unit = {
      (1 to 20).foreach(_ => body) // warm
      val n = 100
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      val dt = (System.nanoTime() - t0) / 1e6 / n
      println(f"[floor] $label%-46s ${dt}%7.2f ms")
    }

    val base = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
    Seq(true, false).foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      time(s"aqe=$aqe 0-exchange (filter+count)") {
        base.where(col("k") > 2).count(); ()
      }
      time(s"aqe=$aqe 1-exchange (groupBy+count)") {
        base.groupBy("k").agg(sum("id")).count(); ()
      }
      time(s"aqe=$aqe 2-exchange (groupBy+orderBy)") {
        base.groupBy("k").agg(sum("id").as("s")).orderBy("s").count(); ()
      }
      time(s"aqe=$aqe 3-exchange (join+groupBy+orderBy)") {
        base.join(base.groupBy("k").agg(sum("id").as("s")), "k")
          .groupBy("s").agg(count(lit(1)).as("c")).orderBy("c").count(); ()
      }
    }
    spark.stop()
  }
}
