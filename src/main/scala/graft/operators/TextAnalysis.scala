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

  /** Repetition quality signals per document (the Gopher-rules family):
    * `word_rep` = 1 − distinct/total words (how much of the doc is
    * repeated vocabulary) and `top2` = the most frequent word 2-gram's
    * share of all 2-grams (boilerplate/template detector). Docs with
    * fewer than 2 tokens are dropped (no 2-grams to measure).
    *
    * Scale shape: `word_rep` is a pure narrow column expression; `top2`
    * is two map-side-combined aggregations ((doc, gram) count, then
    * max/sum per doc) — exploded rows carry (id, gram) only.
    */
  def repetitionScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expressions.GraftFunctions.registerAll(docs.sparkSession)
    val toks = TF.tokens(col(textCol))
    val words = docs
      .where(size(toks) >= 2)
      .select(col(idCol).as("doc"),
        Rounding.r4(lit(1.0) -
          size(array_distinct(toks)).cast("double") / size(toks)).as("word_rep"))
    val grams = docs.where(size(toks) >= 2)
      .select(col(idCol).as("doc"), explode(TF.shingles(col(textCol), 2)).as("g"))
    val top = grams.groupBy("doc", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc")
      .agg(Rounding.r4(max(col("c")).cast("double") / sum(col("c"))).as("top2"))
    words.join(top, "doc")
  }
}
