package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does Spark 4.1's built-in InjectRuntimeFilter cover the
  * lineitem⋈filtered-part shape when the join shuffles (broadcast off)?
  * Answers where the explicit [[graft.operators.BloomJoin]] is genuinely
  * needed vs where the optimizer already injects the same bloom.
  * Dev harness; conclusions recorded in BloomJoin's scaladoc and
  * ARCHITECTURE.md.
  */
object ProbeRuntimeFilter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shape(tag: String): Unit = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val p = spark.read.parquet(s"$dir/part.parquet").where(col("p_size") <= 2)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      val opt = j.queryExecution.optimizedPlan.toString
      val injected = opt.contains("bloom_filter") || opt.contains("might_contain")
      println(s"[probe] $tag injected=$injected")
      if (args.contains("-v")) println(opt)
    }

    println("[probe] runtimeFilter.enabled default = " +
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    shape("defaults(broadcast-on)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    shape("broadcast-off")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    shape("broadcast-off,appSideThreshold=0")
    spark.stop()
  }
}
