package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: fixed cost of `spark.read.parquet` plan construction
  * (file listing + footer schema inference) per registry-query build —
  * is a session-scoped reader cache worth having?
  */
object ProbeReadOverhead {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm JVM + FS caches
    graft.sources.Tables.names.foreach(n =>
      graft.sources.Tables.read(spark, dir, n).schema)
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 100) {
        graft.sources.Tables.read(spark, dir, "lineitem").schema
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rep$rep: 100 fresh reads of lineitem: $dt%.3fs (${dt * 10}%.1f ms each)")
    }
    spark.stop()
  }
}
