package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkTestBase {

  private def planted(n: Int, noisePct: Int = 0) = {
    import spark.implicits._
    // two topic vocabularies over a shared filler pool; label follows the
    // vocabulary, an optional md5-deterministic slice of labels is flipped
    val good = Array("alpine", "meadow", "glacier")
    val bad = Array("rust", "sludge", "gravel")
    (0 until n).map { i =>
      val topic = if (i % 2 == 0) good else bad
      val w1 = topic(i % 3); val w2 = topic((i / 3) % 3)
      val filler = s"common word${i % 7} tail${i % 11}"
      (i.toLong, s"$filler $w1 $w2", if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("id", "text", "label")
      .withColumn("noisy_label",
        when(graft.operators.TrainPipeline.hashBucket(col("id")) < noisePct,
          lit(1.0) - col("label")).otherwise(col("label")))
  }

  test("learns a planted vocabulary signal and generalizes to a held-out split") {
    val df = planted(300)
    val model = QualityClassifier.train(
      df.where(col("id") % 5 =!= 0), "text", "label")
    val ev = QualityClassifier.evaluate(
      model, df.where(col("id") % 5 === 0), "label").head()
    assert(ev.getLong(0) == 60)
    assert(ev.getDouble(1) >= 0.95, s"holdout accuracy ${ev.getDouble(1)}")
    assert(ev.getDouble(2) > ev.getDouble(3) + 0.3,
      s"probability separation ${ev.getDouble(2)} vs ${ev.getDouble(3)}")
  }

  test("tolerates 10% label noise in training; holdout judged on true labels") {
    val df = planted(300, noisePct = 10)
    val model = QualityClassifier.train(
      df.where(col("id") % 5 =!= 0), "text", "noisy_label")
    val ev = QualityClassifier.evaluate(
      model, df.where(col("id") % 5 === 0), "label").head()
    assert(ev.getDouble(1) >= 0.9,
      s"noisy-label holdout accuracy ${ev.getDouble(1)}")
  }

  test("score passes input columns through and filterByQuality keeps only confident rows") {
    val df = planted(100)
    val model = QualityClassifier.train(df, "text", "label")
    val scored = QualityClassifier.score(model, df)
    assert(scored.columns.toSet ==
      Set("id", "text", "label", "noisy_label", "quality_prob", "quality_pred"))
    val kept = QualityClassifier.filterByQuality(model, df, 0.5)
    // on cleanly separable data, the >= 0.5 filter is the positive class
    assert(kept.count() == df.where(col("label") === 1.0).count())
    assert(kept.select(min("quality_prob")).head().getDouble(0) >= 0.5)
  }

  test("scoring plan is narrow: no shuffle exchange") {
    val df = planted(100)
    val model = QualityClassifier.train(df, "text", "label")
    val plan = QualityClassifier.score(model, df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("training respects the trainRows sample bound") {
    val df = planted(400)
    // bound below the input size — the fit must still produce a working
    // model from the deterministic sample
    val model = QualityClassifier.train(df, "text", "label",
      trainRows = 200)
    val ev = QualityClassifier.evaluate(model, df, "label").head()
    assert(ev.getDouble(1) >= 0.9, s"sampled-fit accuracy ${ev.getDouble(1)}")
  }
}
