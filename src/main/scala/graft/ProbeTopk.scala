package graft

import graft.expressions.VectorExprs
import graft.functions.Rounding
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: where does sim_search_topk's time go — the partition-count
  * gate, the spread shuffle, or the scoring itself?
  */
object ProbeTopk {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExprs.register(spark)
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }

    time("gate(.rdd.getNumPartitions)") {
      val n = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
        .rdd.getNumPartitions
      println(s"  partitions=$n")
    }

    for (name <- Seq("sim_search_topk", "sim_search_lsh", "sim_search_ivf",
        "dedup_cluster", "decontaminate", "repetition_score")) {
      Queries.warmFixtures(spark, dir)
      time(name) { Queries.registry(name).build(spark, dir).count(); () }
    }

    def run(c: org.apache.spark.sql.DataFrame): Unit = {
      val q = broadcast(emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      val scored = c.join(q, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          Rounding.r4(VectorExprs.cosine(col("qv"), col("nv"))).as("cosine"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5).select("qid", "rank", "nid", "cosine").count()
      ()
    }
    def sel = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    time("old-shape: hash-spread + per-pair cosine")(run(sel.repartition(32, col("nid"))))
    time("new bruteTopK (gate + norm precompute)") {
      graft.operators.Similarity.bruteTopK(
        emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5).count()
      ()
    }
    spark.stop()
  }
}
