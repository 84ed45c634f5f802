package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for the stored binary-media corpus
  * ([[graft.sources.MediaTable]]) into an EXISTING testdata dir:
  * `MediaGen <documentsParquet> <mediaOut>` — what [[ScaleGen]] now does
  * inline for fresh scale dirs, runnable standalone for dirs generated
  * before the media table existed.
  */
object MediaGen {
  def main(args: Array[String]): Unit = {
    val docs = args(0)
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.MediaTable.write(spark.read.parquet(docs), out)
    val n = spark.read.parquet(out).count()
    System.err.println(s"[mediagen] $out: $n rows")
    spark.stop()
  }
}
