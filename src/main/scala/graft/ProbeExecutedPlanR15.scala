package graft

import org.apache.spark.sql.SparkSession

/** r15 scratch: print the POST-EXECUTION (AQE-final) plan of named queries —
  * shows ReusedExchange / AQEShuffleRead decisions that the static explain
  * hides. Usage: ProbeExecutedPlanR15 <sfDir> <name> [name ...]
  */
object ProbeExecutedPlanR15 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try Queries.warmFixtures(spark, dir) catch { case _: Throwable => }
    names.foreach { n =>
      val df = Queries.registry(n).build(spark, dir)
      df.collect() // materialize THIS QueryExecution so AQE finalizes it
      println(s"==== $n (final plan) ====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
