package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeHint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(100).withColumn("d", col("id") % 3)
    println(df.hint("rebalance", col("d")).queryExecution.optimizedPlan)
    println("---")
    val out = java.nio.file.Files.createTempDirectory("hinttest").toString
    df.hint("rebalance", col("d")).sortWithinPartitions("d")
      .write.mode("overwrite").partitionBy("d").parquet(out)
    val files = new java.io.File(out).listFiles.filter(_.getName.startsWith("d="))
      .map(d => d.getName -> d.listFiles.count(_.getName.endsWith(".parquet")))
    println(files.mkString(" "))
  }
}
