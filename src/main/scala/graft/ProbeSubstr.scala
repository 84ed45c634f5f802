package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: warm timings of the round-6 §2.10 additions. */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.01")
    for (name <- Seq("dedup_exact_substring", "dedup_semantic", "embedding_quantize");
         i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Queries.registry(name).build(spark, dir).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
