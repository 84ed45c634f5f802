package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for representative queries (plan audit). */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "filter_map_number_cmp", "agg_group_metadata", "join_broadcast",
      "join_shuffle_hash", "win_topk_per_group", "dedup_minhash",
      "sim_search_topk", "text_analyze")
    names.foreach { n =>
      println(s"\n===== $n =====")
      Queries.registry(n).build(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
