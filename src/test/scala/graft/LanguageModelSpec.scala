package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._

/** Stupid-backoff bigram LM: the count tables and the perplexity math are
  * checked against hand-computed values (independent driver-side
  * arithmetic, not the operator's own expressions).
  */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val trainDocs = Seq(
    (1L, "a b a b"),
    (2L, "a c")).toDF("doc_id", "text")

  test("train: unigram/bigram counts and total match hand counts") {
    val lm = LanguageModel.train(trainDocs, "text")
    val u = lm.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val b = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(b == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))
    assert(lm.total.collect().head.getLong(0) == 6L)
  }

  test("perplexity: seen-bigram ratios, unseen-bigram backoff, and the OOV floor all land on the hand-computed value") {
    val lm = LanguageModel.train(trainDocs, "text")
    // "a b a d c": (a,b) and (b,a) seen; (a,d) backs off to the OOV floor
    // (d untrained → pseudo-count 0.5); (d,c) backs off to c's count
    val score = Seq((10L, "a b a d c"), (11L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(lm, score, "doc_id", "text").collect()
    assert(out.length == 1, "single-token docs have no bigrams and drop")
    val row = out.head
    assert(row.getLong(0) == 10L && row.getLong(1) == 4L)
    val logps = Seq(
      math.log(2.0 / 3.0),            // (a,b)
      math.log(1.0 / 2.0),            // (b,a)
      math.log(0.4 * 0.5 / 6.0),      // (a,d) OOV floor
      math.log(0.4 * 1.0 / 6.0))      // (d,c) backoff on c(c)=1
    // graft_round's half-away-from-zero formula, mirrored exactly
    val expected =
      math.floor(math.exp(-logps.sum / logps.size) * 1e4 + 0.5) / 1e4
    assert(row.getDouble(2) == expected, s"got ${row.getDouble(2)}")
  }

  test("a doc made of trained text scores far lower perplexity than shuffled junk") {
    val lm = LanguageModel.train(trainDocs, "text")
    val score = Seq(
      (1L, "a b a b a c"),       // in-domain
      (2L, "q r s t u v")).toDF("doc_id", "text") // all-OOV
    val ppl = LanguageModel.perplexity(lm, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) * 5 < ppl(2L),
      s"in-domain ${ppl(1L)} should beat OOV junk ${ppl(2L)} by far")
  }
}
