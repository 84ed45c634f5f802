package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: where knn_join spends its time. */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val df = Queries.registry("knn_join").build(spark, dir)
    df.count() // warm fixture
    println(df.queryExecution.executedPlan.toString.take(7000))
    // stage timing: score-only (no window) vs full
    import org.apache.spark.sql.functions._
    val idx = Queries.Fixtures.ivfIndex(spark, dir)
    val t0 = System.nanoTime()
    val scored = graft.operators.Similarity.knnJoinWithIndex(idx,
      sources.Tables.read(spark, dir, "embeddings"), "vec_id", "embedding",
      k = 3, nprobe = 16, excludeSelf = true)
    println(s"full: ${scored.count()} rows in ${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
