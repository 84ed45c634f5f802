package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: physical plans of the round-6 additions. */
object ProbeExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("dedup_exact_substring", "dedup_semantic", "embedding_quantize")) {
      println(s"==== $name ====")
      println(Queries.registry(name).build(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString.take(4500))
    }
    spark.stop()
  }
}
