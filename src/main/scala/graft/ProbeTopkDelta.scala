package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose the registry sim_search_topk time into
  * bruteTopK-proper vs the registry wrapper (fresh scan + orderBy).
  */
object ProbeTopkDelta {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }

    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def brute = graft.operators.Similarity.bruteTopK(
      emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)

    time("registry sim_search_topk") {
      Queries.registry("sim_search_topk").build(spark, dir).count(); ()
    }
    time("bruteTopK + orderBy")(brute.orderBy("qid", "rank").count())
    time("bruteTopK no orderBy")(brute.count())

    println("--- plan with orderBy under count ---")
    val counted = brute.orderBy("qid", "rank")
      .groupBy().count()
    println(counted.queryExecution.optimizedPlan.toString.take(2000))
    spark.stop()
  }
}
