package graft

import org.apache.spark.sql.SparkSession

/** Timing + plan inspection for the embedding-cosine pair query (scratch). */
object ProbeCosine {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val df = Queries.registry("dedup_embedding_cosine").build(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[cos] count=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"[cos] warm count=$n2 in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
