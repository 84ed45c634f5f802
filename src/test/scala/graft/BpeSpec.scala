package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Learned BPE tokenization: distributed training parity with an
  * in-memory reference implementation, encode reconstruction, merge
  * effectiveness, and determinism (including the lexicographic tie-break).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference trainer over a word-frequency map — the
    * textbook algorithm with the SAME tie rule (max count, then
    * lexicographic (left, right)), kept deliberately independent of the
    * distributed implementation.
    */
  private def refTrain(
      freq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (Bpe.wordSymbols(w), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && out.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          out += ((l, r))
          vocab = vocab.map { case (syms, f) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.toVector, f)
          }
        case _ => continue = false
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest newest widest widest"),
    (4L, "the newest widest lowest the the"))

  test("distributed training matches the reference implementation merge for merge") {
    val docs = corpus.toDF("doc_id", "text")
    val freq = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refTrain(freq, 12)
    val got = Bpe.train(docs, "text", numMerges = 12)
      .map(m => (m.left, m.right))
    assert(got == expected,
      s"distributed merges must replay the textbook algorithm\n got=$got\n exp=$expected")
    assert(got.size > 4, "the fixture corpus must actually produce merges")
    // determinism across runs (same tie-breaks, any partitioning)
    assert(Bpe.train(docs, "text", numMerges = 12)
      .map(m => (m.left, m.right)) == expected)
  }

  test("encode reconstructs the text, compresses the token stream, and is " +
      "consistent with the greedy reference apply") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 12)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
    val byId = corpus.toMap
    enc.foreach { case (id, toks, n) =>
      assert(n == toks.length)
      // concatenating subwords restores the word stream (spaces dropped)
      assert(toks.mkString == byId(id).toLowerCase.split("\\s+").mkString,
        s"doc $id must reconstruct")
      // learned merges must beat character-level tokenization
      val chars = byId(id).replaceAll("\\s+", "").length
      assert(n < chars, s"doc $id: $n tokens vs $chars chars")
    }
    // trained tokens cover trained words whole: 'low' appears 5 times as a
    // full word, so it must end up a single token
    val rank = merges.zipWithIndex
      .map { case (m, i) => (m.left, m.right) -> i }.toMap
    assert(Bpe.applyMerges("low", rank).mkString.replace(Bpe.EndOfWord, "") == "low")
  }

  test("empty and null text encode to zero tokens; maxVocab caps the word table") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "a b a"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(enc.toSeq.take(2) == Seq((1L, 0L), (2L, 0L)))
    assert(Bpe.wordFrequencies(
      Seq.tabulate(50)(i => (i.toLong, s"w$i w$i common")).toDF("id", "text"),
      "text", maxVocab = 10).count() == 10)
  }
}
