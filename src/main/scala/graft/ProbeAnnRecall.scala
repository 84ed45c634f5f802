package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measure the ANN rows' recall MARGIN over their certified floors (the
  * cert rows emit only the boolean): knn_join_ann (isotropic corpus,
  * floor 0.3) and knn_join_ann_clustered (planted-cluster corpus, floor
  * 0.9), both over the full 128-query md5-sampled batch. Usage:
  * `ProbeAnnRecall <sfDir>`.
  */
object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def recall(truth: org.apache.spark.sql.DataFrame,
        topk: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val nBrute = truth.count()
      val nHit = truth.join(topk.select("qid", "nid"), Seq("qid", "nid"),
        "left_semi").count()
      (nHit, nBrute, nHit.toDouble / nBrute)
    }

    val iso = Queries.Fixtures.ivfIndexScaled(spark, sfDir)
    val (h1, b1, r1) = recall(
      Queries.Fixtures.knnBruteTruth(spark, sfDir),
      Similarity.knnJoinWithIndex(iso,
        Queries.Fixtures.knnQueryBatch(spark, sfDir),
        "vec_id", "embedding", k = 5,
        nprobe = math.max(4, iso.numCells / 8), excludeSelf = true))
    println(f"[ann-recall] knn_join_ann           cells=${iso.numCells}%5d " +
      f"nprobe=${math.max(4, iso.numCells / 8)}%4d hit=$h1%5d/$b1%5d " +
      f"recall=$r1%.3f (floor 0.3)")

    val cl = Queries.Fixtures.ivfIndexClustered(spark, sfDir)
    val (h2, b2, r2) = recall(
      Queries.Fixtures.knnClusteredBruteTruth(spark, sfDir),
      Similarity.knnJoinWithIndex(cl,
        Queries.Fixtures.knnClusteredQueryBatch(spark, sfDir),
        "vec_id", "embedding", k = 5,
        nprobe = math.max(2, cl.numCells / 64), excludeSelf = true))
    println(f"[ann-recall] knn_join_ann_clustered cells=${cl.numCells}%5d " +
      f"nprobe=${math.max(2, cl.numCells / 64)}%4d hit=$h2%5d/$b2%5d " +
      f"recall=$r2%.3f (floor 0.9)")
    spark.stop()
  }
}
