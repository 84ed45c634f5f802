package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 scratch probe: what does filter_range_zonemap's pruning decide, and
  * which jobs/stages does each build+execute of the query cost? Also traces
  * maintenance_zorder's scan shape. Usage: ProbeZonemapR15 [sfDir]
  */
object ProbeZonemapR15 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println(s"[job] ${j.jobId} desc=${Option(j.properties.getProperty("spark.job.description")).getOrElse("-")}")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        println(f"[stage] tasks=${s.stageInfo.numTasks}%4d ${s.stageInfo.name.take(90)}")
    })
    val (zdir, (umin, umax, _, _)) = Queries.Fixtures.zorderedIndexedEventsDir(spark, dir)
    println(s"[zdir] $zdir files=${spark.read.parquet(zdir).inputFiles.length}")
    println(s"[idx] files=${spark.read.parquet(zdir + "/_graft_zonemap_index").inputFiles.length}")
    val ulo = umin + (umax - umin) * 3 / 10
    val uhi = umin + (umax - umin) * 4 / 10
    for (round <- 1 to 3) {
      spark.sparkContext.setJobDescription(s"round$round: rangeScans build")
      val t0 = System.nanoTime()
      val Seq(clean, poisoned) = graft.model.ZoneMapIndex.rangeScans(
        spark, zdir, Seq(("user_id", ulo.toDouble, uhi.toDouble),
          ("metric", ulo.toDouble, uhi.toDouble)))
      val t1 = System.nanoTime()
      println(f"[round$round] build=${(t1 - t0) / 1e9}%.3fs cleanFiles=${clean.inputFiles.length} poisonedFiles=${poisoned.inputFiles.length}")
      spark.sparkContext.setJobDescription(s"round$round: execute")
      val r = clean.agg(count(lit(1)).as("n"), sum(col("event_id")).as("c"))
        .crossJoin(poisoned.agg(count(lit(1)).as("n2"), sum(col("event_id")).as("c2")))
        .collect()
      val t2 = System.nanoTime()
      println(f"[round$round] exec=${(t2 - t1) / 1e9}%.3fs row=${r.head}")
    }
    spark.stop()
  }
}
