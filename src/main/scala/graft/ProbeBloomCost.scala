package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: decontaminate vs decontaminateBloom steady-state cost. */
object ProbeBloomCost {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("decontaminate", "decontaminate_bloom");
         rep <- 1 to 3) {
      val t0 = System.nanoTime()
      Queries.registry(name).build(spark, dir).count()
      println(f"$name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
