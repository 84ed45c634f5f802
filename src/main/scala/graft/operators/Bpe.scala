package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization, learned from the corpus — the real
  * subword tokenizer a training-data pipeline runs for faithful token
  * counting and sequence packing (the whitespace/regex counters in
  * [[graft.functions.TextFunctions]] are the cheap pre-pass; BPE is what
  * the model's own tokenizer family actually does).
  *
  * Training (Sennrich et al. 2016 shape) is DISTRIBUTED over the
  * word-frequency table, never the corpus: one corpus-sized shuffle builds
  * `(word, freq)` — vocabulary-sized, orders of magnitude smaller than the
  * corpus and the only step that scales with data volume. Each of the
  * `numMerges` rounds then counts adjacent symbol pairs over that table
  * (freq-weighted, partial-aggregated), takes the best pair, and rewrites
  * the vocabulary — small jobs whose cost tracks vocabulary, not corpus.
  * Ties on pair count break lexicographically so training is deterministic
  * across partitionings and cluster sizes.
  *
  * Encoding is embarrassingly parallel: the merge list (a few hundred
  * entries) broadcasts as a rank map and each word greedily merges its
  * lowest-rank adjacent pair until none applies — `mapPartitions`, no
  * shuffle, the same apply loop every BPE implementation runs.
  *
  * At 100 TB: train on a sampled/frequency-capped vocabulary (pass
  * `maxVocab`), persist `merges`, and ship them to every encode job — the
  * index-build/probe split the IVF family uses.
  */
object Bpe {

  /** End-of-word sentinel: keeps merges from crossing word boundaries and
    * lets decode restore spacing. A Unicode non-character, so it cannot
    * collide with corpus text.
    */
  val EndOfWord = "￿"

  final case class Merge(left: String, right: String) {
    def token: String = left + right
  }

  private[graft] def wordSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** The freq-weighted word table — training's only corpus-sized pass.
    * `maxVocab` keeps the most frequent word forms (ties by word) — the
    * standard scale knob: pair statistics of a web-scale corpus are
    * dominated by its frequent words, and the tail contributes noise at
    * quadratic vocabulary cost.
    */
  def wordFrequencies(
      docs: DataFrame,
      textCol: String,
      maxVocab: Int = 100000): DataFrame = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words.orderBy(col("freq").desc, col("word")).limit(maxVocab)
  }

  /** Learn `numMerges` merges from the corpus. Returns them in priority
    * order (rank = position). The vocabulary table is localCheckpointed
    * every few rounds: each round's rewrite extends the plan, and an
    * unbounded lineage makes round k cost O(k) to recompute.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 100000): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordFrequencies(docs, textCol, maxVocab)
      .as[(String, Long)]
      .map { case (w, f) => (wordSymbols(w), f) }
      .toDF("syms", "freq")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < numMerges) {
      // adjacent-pair counts, freq-weighted; partial-aggregated shuffle
      // over at most |vocab| × avg-word-length rows
      val pairs = vocab.select(col("freq"),
          explode(expr(
            "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s as l, syms[i + 1] as r))"))
            .as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("n"))
      // deterministic best pair: max count, ties lexicographic
      val top = pairs.orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < 2) round = numMerges // converged
      else {
        val m = Merge(top.head.getString(0), top.head.getString(1))
        merges += m
        val mergeOne = udf { syms: Seq[String] =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
              out += m.token; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }
        vocab = vocab.select(mergeOne(col("syms")).as("syms"), col("freq"))
        if ((merges.size % 8) == 0) vocab = vocab.localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Encode each word of `syms` by greedy lowest-rank merging — the
    * canonical BPE apply loop, shared by [[encode]] and the tests'
    * reference path.
    */
  private[graft] def applyMerges(
      word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) done = true
      else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)
    }
    syms
  }

  /** Tokenize `textCol` with a learned merge list: per doc, the subword
    * tokens (end-of-word sentinels stripped) and their count. Narrow —
    * the rank map rides the closure to every task; no shuffle.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => (m.left, m.right) -> i }.toMap
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("").toLowerCase
            .split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(w => applyMerges(w, rank))
            .map(_.replace(EndOfWord, ""))
            .filter(_.nonEmpty)
            .toSeq
          (id, toks, toks.length.toLong)
        }
      }
      .toDF("doc", "tokens", "n_tokens")
  }
}
