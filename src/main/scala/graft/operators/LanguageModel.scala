package graft.operators

import graft.functions.{Rounding, TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed n-gram language model with stupid-backoff scoring — the
  * CCNet-style perplexity quality filter (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * train token bigram/unigram counts over a reference corpus, then score
  * each candidate document by its perplexity under the model. Low
  * perplexity ≈ looks like the reference corpus; high perplexity ≈ junk,
  * boilerplate, or out-of-domain text. This is the third leg of the
  * quality stack next to [[TextAnalysis.repetitionScore]] (word-level
  * repetition) and [[TextAnalysis.compressionRatio]] (byte-level density):
  * unlike those, it is RELATIVE to a trusted corpus, which is what lets
  * it rank "fluent but off-topic" against "in-domain".
  *
  * Model: stupid backoff (Brants et al., "Large Language Models in
  * Machine Translation") rather than Kneser-Ney — no discount fitting, a
  * pure count ratio, which is exactly what stays cheap and deterministic
  * distributed:
  *
  *   score(w2 | w1) = c(w1 w2) / c(w1)            if c(w1 w2) > 0
  *                  = 0.4 · c(w2) / N             otherwise
  *                    (c(w2) := 0.5 for OOV w2 — an unseen-word floor)
  *
  * Per-document perplexity = exp(−mean(ln score)) over the document's
  * bigrams; documents with fewer than 2 tokens have no bigrams and are
  * dropped.
  *
  * Scale shape (the 100 TB design):
  *  - TRAINING is two map-side-combined count aggregations (unigrams,
  *    bigrams) — each one scalars-only shuffle whose output is the MODEL,
  *    bounded by vocabulary (unigrams) and observed-bigram count, both
  *    ≪ corpus size. The total-token count rides the unigram table
  *    (sum of c), so no extra corpus pass and no driver-side collect.
  *  - SCORING is a narrow bigram explode joined against the model tables.
  *    The model side of each join is vocabulary-bounded, so AQE broadcasts
  *    it for real-world vocabularies (≤ a few hundred MB); a web-scale
  *    bigram table falls back to a shuffle join on the gram key, which is
  *    uniformly distributed (word frequencies skew, but the JOIN key
  *    carries the exploded corpus side — salting is never needed because
  *    the hot keys are on the small, replicable model side).
  *  - The per-document reduction is one map-side-combined avg.
  *
  * In production the model tables are written once (parquet) and reused
  * across scoring runs — [[train]] returns plain DataFrames precisely so
  * they can be persisted and reloaded like any other table.
  */
object LanguageModel {

  /** A trained bigram LM: `unigrams(w, c)`, `bigrams(w1, w2, c)`, and
    * `total(n)` — a single-row frame carrying N so scoring plans stay
    * collect-free (it joins in as a broadcast).
    */
  final case class NgramLm(unigrams: DataFrame, bigrams: DataFrame, total: DataFrame)

  /** Train bigram + unigram counts over `docs(textCol)`. */
  def train(docs: DataFrame, textCol: String): NgramLm = {
    graft.expressions.GraftFunctions.registerAll(docs.sparkSession)
    val unigrams = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // shingles() gives short docs a whole-text shingle so dedup never
    // drops them — here that would fabricate a unigram "bigram", so
    // sub-2-token docs are excluded before the explode
    val bigrams = docs
      .where(size(TF.tokens(col(textCol))) >= 2)
      .select(explode(TF.shingles(col(textCol), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val total = unigrams.agg(sum(col("c")).as("n"))
    NgramLm(unigrams, bigrams, total)
  }

  /** Score `docs` under `lm`: one row per document with at least one
    * bigram — `(doc, n_big, ppl)` where `ppl` is rounded to 4 decimals.
    */
  def perplexity(lm: NgramLm, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.expressions.GraftFunctions.registerAll(docs.sparkSession)
    val bi = docs
      .where(size(TF.tokens(col(textCol))) >= 2)
      .select(col(idCol).as("doc"), explode(TF.shingles(col(textCol), 2)).as("g"))
      .select(col("doc"),
        substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
    val u1 = lm.unigrams.select(col("w").as("w1"), col("c").as("c1"))
    val u2 = lm.unigrams.select(col("w").as("w2"), col("c").as("c2"))
    // unigram table = the vocabulary — broadcastable at any corpus scale
    // (tens of millions of rows at web scale, still executor-resident);
    // the BIGRAM join is left to the planner: its table can be orders of
    // magnitude larger, so AQE picks broadcast vs shuffle from real sizes
    val scored = bi
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(broadcast(u1), Seq("w1"), "left")
      .join(broadcast(u2), Seq("w2"), "left")
      .crossJoin(broadcast(lm.total))
      .select(col("doc"),
        when(col("c").isNotNull, log(col("c").cast(DoubleType) / col("c1")))
          .otherwise(log(lit(0.4) * coalesce(col("c2"), lit(0.5)).cast(DoubleType)
            / col("n")))
          .as("logp"))
    scored.groupBy("doc").agg(
      count(lit(1)).as("n_big"),
      Rounding.r4(exp(-avg(col("logp")))).as("ppl"))
  }

  /** Train-on-A, score-B in one call (the registry/demo entry point). */
  def perplexityAgainst(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    perplexity(train(trainDocs, textCol), scoreDocs, idCol, textCol)
}
