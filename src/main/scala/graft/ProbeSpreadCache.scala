package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: does the bruteTopK spread-gate verdict cache HIT across
  * registry rebuilds (the bench's interleaved-pass pattern)? Prints the
  * cache size after each build — a size that keeps growing for the same
  * (session, source) means the canonicalized-plan key is not stable and
  * every invocation still pays the probe.
  */
object ProbeSpreadCache {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fld = graft.operators.Similarity.getClass.getDeclaredFields
      .find(_.getName.contains("spreadVerdicts")).get
    fld.setAccessible(true)
    val m = fld.get(graft.operators.Similarity).asInstanceOf[java.util.Map[_, _]]
    def build(dir: String): Unit = {
      val t0 = System.nanoTime()
      Queries.registry("sim_search_topk").build(spark, dir).count()
      println(f"[spreadcache] $dir build+count ${(System.nanoTime() - t0) / 1e9}%.3fs cacheSize=${m.size}")
    }
    build("/root/testdata/sf0.001") // the bench's warmup-pass analogue
    build("/root/testdata/sf0.1")
    build("/root/testdata/sf0.1")
    build("/root/testdata/sf0.1")
    spark.stop()
  }
}
