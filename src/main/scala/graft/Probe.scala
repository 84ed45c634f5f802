package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive iteration; not part of the contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("agg_count", "agg_group_metadata", "fn_math", "agg_count",
        "agg_group_metadata", "fn_math")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = Queries.registry(n).build(spark, dir).count()
      println(f"[probe] $n count=$cnt in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
