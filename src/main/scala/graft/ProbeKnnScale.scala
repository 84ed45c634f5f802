package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: the REGISTRY knn_join query (bounded 2000-qid exact form) at
  * an arbitrary SF dir under bench-like settings — times the cell-join
  * salting fix against the recorded sf10 bench number.
  */
object ProbeKnnScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    Queries.Fixtures.ivfIndex(spark, dir).bucketed.count() // warm fixture
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Queries.registry("knn_join").build(spark, dir).count()
      println(f"pass $pass: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
