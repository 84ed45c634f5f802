package graft.operators

import graft.functions.{Rounding, TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text analytics (SURVEY §2.10 text_analyze): term
  * frequencies, document frequencies, tf-idf.
  *
  * Scale shape: tokenization is a narrow generate stage; tf and df are
  * partial-aggregated before their shuffles; the document count joins in
  * as a broadcast single-row frame (no driver-side collect in the plan).
  */
object TextAnalysis {

  /** (doc, term, tf, tfidf) with tfidf = tf * ln(N / df). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expressions.GraftFunctions.registerAll(docs.sparkSession)
    val toks = docs.select(col(idCol).as("doc"),
      explode(TF.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("term").agg(countDistinct(col("doc")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc"), col("term"), col("tf"),
        Rounding.r4(col("tf") * log(col("n").cast("double") / col("df")))
          .as("tfidf"))
  }

  /** Per-term corpus statistics: df, total tf, mean tf per doc. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expressions.GraftFunctions.registerAll(docs.sparkSession)
    val toks = docs.select(col(idCol).as("doc"),
      explode(TF.tokens(col(textCol))).as("term"))
    toks.groupBy("term").agg(
      countDistinct(col("doc")).as("df"),
      count(lit(1)).as("total_tf"))
  }
}
