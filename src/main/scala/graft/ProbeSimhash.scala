package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Break down wide-simhash near-dup cost: sketch vs banded join+verify. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = sources.Tables.read(spark, dir, "documents")
    graft.expressions.GraftFunctions.registerAll(spark)

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[simhash] $label pass$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    time("tokens-only") {
      docs.select(size(TF.tokens(col("text"))).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("sketch-wide2") {
      docs.select(graft.expressions.SketchExprs.simhashWide(
        TF.tokens(col("text")), 2).as("fp")).count()
    }
    time("pairs-h12-w2") {
      operators.Dedup.simhashPairsWide(docs, "doc_id", "text", 12, 2).count()
    }
    time("pairs-h12-w3") {
      operators.Dedup.simhashPairsWide(docs, "doc_id", "text", 12, 3).count()
    }
    spark.stop()
  }
}
