package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Scratch main: measure holdout metrics for the quality classifier under
  * different feature/label settings; not part of the contract.
  */
object ProbeQuality {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = Queries.Fixtures.topicDocs(spark, dir)
    docs.select("doc_id", "label", "noisy_label", "text").show(4, 120)
    val train = docs.where(col("doc_id") % 5 =!= 0)
      .withColumn("label", col("noisy_label"))
    val test = docs.where(col("doc_id") % 5 === 0)
    docs.select(col("doc_id"), col("label"),
      substring(col("text"), -40, 40).as("tail")).show(8, false)
    for ((nf, iter, reg) <- Seq((1 << 15, 30, 1e-4), (1 << 12, 100, 0.0))) {
      val m = QualityClassifier.train(train, "text", "label",
        numFeatures = nf, maxIter = iter, regParam = reg)
      val tr = QualityClassifier.evaluate(m, train, "label").head()
      val te = QualityClassifier.evaluate(m, test, "label").head()
      println(f"[probe] nf=$nf iter=$iter reg=$reg " +
        f"trainAcc=${tr.getDouble(1)}%.3f testAcc=${te.getDouble(1)}%.3f " +
        f"pos=${te.getDouble(2)}%.3f neg=${te.getDouble(3)}%.3f")
      QualityClassifier.score(m, test).select("doc_id", "label",
        "quality_prob", "quality_pred").show(8, false)
    }
    spark.stop()
  }
}
