package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Near-duplicate detection with planted duplicates: each family must find
  * the planted pair and not drown in false positives.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  // 40 distinct-ish docs + one near-dup pair (ids 100/101) + one exact dup
  // pair (ids 200/201)
  private lazy val docs = {
    // disjoint per-doc vocabularies → cross-doc jaccard is exactly 0
    val base = (0 until 40).map { i =>
      val words = (0 until 30).map(j => s"w${i * 100 + j}")
      (i.toLong, words.mkString(" "))
    }
    val near = {
      val words = (0 until 30).map(j => s"n$j")
      Seq((100L, words.mkString(" ")),
        (101L, (words.dropRight(1) :+ "CHANGED").mkString(" ")))
    }
    val exact = {
      val text = (0 until 30).map(j => s"e$j").mkString(" ")
      Seq((200L, text), (201L, text))
    }
    (base ++ near ++ exact).toDF("doc_id", "text")
  }

  test("exact dedup keeps the minimum id per text group") {
    val out = Dedup.exact(
      docs.withColumn("text_md5", md5(col("text"))).select("text_md5", "doc_id"),
      Seq("text_md5"), "doc_id")
    assert(out.count() == 43) // 44 docs, one exact collision
    val survivors = out.where(col("n_copies") === 2).collect()
    assert(survivors.length == 1 && survivors(0).getAs[Long]("doc_id") == 200L)
  }

  test("minhash LSH finds the planted near-dup and the exact dup") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 2, bands = 16, rowsPerBand = 2, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)))
    assert(pairs.contains((200L, 201L)))
    assert(pairs.size <= 4) // no false-positive explosion
  }

  test("simhash: near-dup pair is closer than any unrelated pair; exact dup at distance 0") {
    // NB on 30-token docs a single-token edit flips ~10-18 of 64 bits (vote
    // margins are ±sqrt(30)); simhash's sweet spot is long docs. Assert the
    // ordering property rather than an absolute radius.
    val fps = docs.select(col("doc_id"),
        graft.expressions.SketchExprs.simhash(
          graft.functions.TextFunctions.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(ham(200L, 201L) == 0)
    val nearDist = ham(100L, 101L)
    val unrelated = for (i <- 0L until 40L; j <- (i + 1) until 40L) yield ham(i, j)
    assert(nearDist < unrelated.min,
      s"near pair at $nearDist not closer than unrelated min ${unrelated.min}")
    // banding catches the exact dup at radius 0
    val exactPair = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPair.contains((200L, 201L)))
  }

  test("simhash banding guarantees recall up to maxHamming: planted pairs at Hamming 1-12 all surface") {
    // plant pairs (base, base^flipped) at every Hamming distance 1..12,
    // spreading the flipped bits across the whole 64-bit word — the exact
    // pattern a fixed 4×16-bit banding dropped for distances ≥ 4
    val rnd = new scala.util.Random(7)
    val rows = (1 to 12).flatMap { d =>
      val base = rnd.nextLong()
      val flipped = rnd.shuffle((0 until 64).toList).take(d)
        .foldLeft(base)((v, b) => v ^ (1L << b))
      Seq((d * 10L, base), (d * 10L + 1, flipped))
    }
    val fps = rows.toDF("id", "fp")
    val found = Dedup.simhashPairsFromFingerprints(fps, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 12).foreach { d =>
      assert(found.contains((d * 10L, d * 10L + 1)),
        s"planted pair at Hamming $d not found")
    }
    // precision: verification keeps only pairs actually within the radius
    val dist = rows.toMap
    found.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(dist(a) ^ dist(b)) <= 12)
    }
  }

  test("wide simhash banding: planted 128-bit pairs at Hamming 1-12 all surface") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 12).flatMap { d =>
      val base = Array(rnd.nextLong(), rnd.nextLong())
      val flipped = base.clone()
      rnd.shuffle((0 until 128).toList).take(d)
        .foreach(b => flipped(b / 64) ^= (1L << (b % 64)))
      Seq((d * 10L, base.toSeq), (d * 10L + 1, flipped.toSeq))
    }
    val fps = rows.toDF("id", "fp")
    val found = Dedup.simhashPairsFromWideFingerprints(fps, maxHamming = 12, words = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 12).foreach { d =>
      assert(found.contains((d * 10L, d * 10L + 1)),
        s"planted wide pair at Hamming $d not found")
    }
    val byId = rows.toMap
    found.foreach { case (a, b) =>
      val ham = byId(a).zip(byId(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham <= 12)
    }
  }

  test("wide simhash agrees with 64-bit simhash on word 0; near pair stays closer than unrelated") {
    val wide = docs.select(col("doc_id"),
        graft.expressions.SketchExprs.simhashWide(
          graft.functions.TextFunctions.tokens(col("text")), 2).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val narrow = docs.select(col("doc_id"),
        graft.expressions.SketchExprs.simhash(
          graft.functions.TextFunctions.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    wide.foreach { case (id, fp) => assert(fp.length == 2 && fp.head == narrow(id)) }
    def ham(a: Long, b: Long) =
      wide(a).zip(wide(b)).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham(200L, 201L) == 0)
    val nearDist = ham(100L, 101L)
    val unrelatedMin =
      (for (i <- 0L until 40L; j <- (i + 1) until 40L) yield ham(i, j)).min
    assert(nearDist < unrelatedMin)
  }

  test("ngram jaccard: exact dup scores 1.0, near-dup high, unrelated low") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.5, maxId = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((200L, 201L)) == 1.0)
    assert(out((100L, 101L)) > 0.85)
    assert(out.size == 2)
  }

  test("embedding cosine: LSH candidate pairs are a subset-with-high-recall of exact pairs") {
    val emb = sf() + "/embeddings.parquet"
    val vecs = spark.read.parquet(emb)
    val exact = Dedup.embeddingCosinePairsExact(vecs, "vec_id", "embedding", 0.4,
        maxId = Long.MaxValue) // sf0.01 fixture: the bound must NOT bite here
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", 0.4,
      sketchBits = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification step guarantees precision
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH recall $recall too low (${lsh.size}/${exact.size})")
    }
  }

  test("embedding cosine exact: the maxId bound is enforced in code, not by caller discipline") {
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
    val bounded = Dedup.embeddingCosinePairsExact(
        vecs, "vec_id", "embedding", threshold = -1.0, maxId = 20)
      .collect()
    assert(bounded.nonEmpty)
    // threshold -1 admits every scored pair, so any id >= maxId surviving
    // would prove the bound is advisory
    assert(bounded.forall(r => r.getLong(0) < 20 && r.getLong(1) < 20),
      "ids at or above maxId must never enter the pair scan")
    assert(bounded.length == 20 * 19 / 2, "all pairs under the bound score")
  }

  test("wideChunkLayout: chunks disjoint, tile every used word, widths balanced — exhaustive over the full domain") {
    // the pigeonhole recall guarantee rests entirely on these invariants;
    // the domain is small enough to check EVERY (words, maxHamming) pair
    for (words <- 1 to 4; maxHamming <- 0 until 64 * words) {
      val layout = Dedup.wideChunkLayout(maxHamming, words)
      val label = s"words=$words maxHamming=$maxHamming"
      assert(layout.size == maxHamming + 1, s"$label: band count")
      layout.groupBy(_._1).foreach { case (w, chunks) =>
        assert(w >= 0 && w < words, s"$label: word index $w")
        val sorted = chunks.map(c => (c._2, c._3)).sortBy(_._1)
        assert(sorted.forall(c => c._2 >= 1), s"$label word $w: zero-width chunk")
        // disjoint AND covering: consecutive chunks abut, span is [0, 64)
        assert(sorted.head._1 == 0, s"$label word $w: first chunk not at bit 0")
        sorted.sliding(2).foreach {
          case Seq((o1, w1), (o2, _)) =>
            assert(o1 + w1 == o2, s"$label word $w: gap/overlap at bit $o2")
          case _ => ()
        }
        val last = sorted.last
        assert(last._1 + last._2 == 64, s"$label word $w: tiling must end at 64")
        val widths = sorted.map(_._2)
        assert(widths.max - widths.min <= 1, s"$label word $w: widths $widths unbalanced")
      }
      // chunk counts across words also balanced (within one)
      val counts = (0 until words).map(w => layout.count(_._1 == w))
      assert(counts.max - counts.min <= 1, s"$label: per-word band counts $counts")
    }
  }

  test("exact substring: planted shared 8-token run counted on both docs; unique and short docs report zero") {
    // docs 1 and 2 share a 10-token run (3 interior 8-windows); the run
    // sits at opposite ends so boundary-crossing windows differ; doc 3 is
    // fully unique; doc 4 is shorter than the window
    val shared = (0 until 10).map(j => s"s$j").mkString(" ")
    val d = Seq(
      (1L, shared + " " + (0 until 20).map(j => s"a$j").mkString(" ")),
      (2L, (0 until 20).map(j => s"b$j").mkString(" ") + " " + shared),
      (3L, (0 until 30).map(j => s"c$j").mkString(" ")),
      (4L, "tiny doc under the window")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringStats(d, "doc_id", "text", k = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // 30-token docs → 23 windows; the shared run contributes exactly the
    // 3 windows fully inside it; frac = round(3/23, 4)
    assert(out(1L) == ((23L, 3L, 0.1304)))
    assert(out(2L) == ((23L, 3L, 0.1304)))
    assert(out(3L) == ((23L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("semDedupFromCells matches the brute-force per-cell lower-id rule; cross-cell pairs out of scope") {
    val rows = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(1f, 0f), 0),    // same cell, cosine 1 to lower id 1 → dup
      (3L, Array(0f, 1f), 0),    // orthogonal → kept
      (4L, Array(1f, 0.01f), 1)  // near-dup of 1 but another cell → kept
    ).toDF("nid", "nv", "cell")
    val out = Dedup.semDedupFromCells(rows, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("semDedup e2e: planted near-identical vectors are flagged and the lowest id survives") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    // three jittered copies of one vector — kmeans co-locates them, the
    // exemplar rule keeps exactly the lowest id
    val v = Array.fill(8)(rnd.nextGaussian().toFloat)
    val planted = Seq(100L, 101L, 102L).map(id =>
      (id, v.map(x => x + (id - 100) * 1e-4f)))
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.99,
        numCells = 4, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size == 43)
    assert(!out(100L) && out(101L) && out(102L))
    // random 8-dim gaussians virtually never hit cosine 0.99 — a dup count
    // beyond the planted pair would mean the rule leaks
    assert(out.values.count(identity) <= 3)
  }

  test("span removal: later copies of a shared 8-token run are cut, first occurrence and unique text survive") {
    val run = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"$run x1 x2"),      // first occurrence — survives whole
      (2L, s"y1 y2 $run"),      // later copy — run removed, own prefix kept
      (3L, s"$run x1 x2"),      // verbatim dup of doc 1 — empties
      (4L, "p q")               // shorter than k — untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, 0L, s"$run x1 x2")))
    assert(out(2L) == ((10L, 8L, "y1 y2")))
    assert(out(3L) == ((10L, 10L, "")))
    assert(out(4L) == ((2L, 0L, "p q")))
  }

  test("span removal: overlapping duplicated windows merge into one covered span") {
    // doc 2 repeats a 10-token run of doc 1: its three 8-windows overlap;
    // the union must remove exactly the 10 duplicated tokens, once
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, s"$run tail1"),
      (2L, s"head1 $run")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, s"$run tail1")))
    assert(out(2L) == ((10L, "head1")))
  }

  test("span removal parity with an independent brute-force oracle on random small-vocab corpora") {
    // small vocabulary + short docs → dense window collisions; the brute
    // oracle replays keep-first/cover/reassemble with naive driver code
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'l').map(_.toString)
    val k = 5
    (0 until 3).foreach { round =>
      val corpus = (0 until 30).map { i =>
        val len = rnd.nextInt(41)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val toks = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector }.toMap
      val occ = scala.collection.mutable.LinkedHashMap
        .empty[String, List[(Long, Int)]]
      for ((id, t) <- toks.toSeq.sortBy(_._1); i <- 0 to t.length - k
           if t.length >= k) {
        val w = t.slice(i, i + k).mkString(" ")
        occ(w) = occ.getOrElse(w, Nil) :+ ((id, i))
      }
      val covered = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[Int]]
      for ((_, os) <- occ; (id, p) <- os.sortBy(identity).drop(1);
           j <- p until p + k)
        covered.getOrElseUpdate(id, scala.collection.mutable.Set.empty) += j
      val expected = corpus.map { case (id, _) =>
        val t = toks(id)
        val cov = covered.getOrElse(id, scala.collection.mutable.Set.empty)
        id -> ((t.length.toLong, cov.size.toLong,
          t.zipWithIndex.collect { case (w, i) if !cov(i) => w }.mkString(" ")))
      }.toMap
      val out = Dedup.removeDuplicateSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(out == expected, s"round $round diverged from the brute oracle")
    }
  }

  test("segment dedup: first occurrence survives, repeats drop, docs reassemble in order") {
    // 4-token segments; doc 1 repeats its own first segment, doc 2 copies
    // doc 1's first segment and brings one unique segment of its own,
    // doc 3 is entirely a copy of earlier segments
    val df = Seq(
      (1L, "a b c d e f g h a b c d"),
      (2L, "a b c d x y z w"),
      (3L, "a b c d a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(df, "doc_id", "text", segTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "a b c d e f g h"))) // own repeat dropped
    assert(out(2L) == ((2L, 1L, "x y z w")))         // cross-doc repeat dropped
    assert(out(3L) == ((2L, 0L, "")))                // nothing left
  }

  test("segment dedup: an all-unique corpus passes through unchanged (token-normalized identity)") {
    // the shared DedupSpec corpus has disjoint per-doc vocabularies except
    // the planted pairs — restricting to the 40 base docs, every segment
    // is unique, so dedup must reassemble each doc to its exact token join
    val base = docs.where(col("doc_id") < 40L)
    val out = Dedup.dedupSegments(base, "doc_id", "text", segTokens = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val expected = base.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").mkString(" ")).toMap
    assert(out.size == 40)
    expected.foreach { case (id, text) =>
      val (nSeg, nKept, dedup) = out(id)
      assert(nSeg == nKept, s"doc $id lost segments")
      assert(dedup == text, s"doc $id text changed")
    }
  }

  test("segment dedup: a short trailing segment is its own unit and docs shorter than one segment still dedup") {
    val df = Seq(
      (1L, "p q r s t u"), // segments: "p q r s", "t u"
      (2L, "t u"),         // equals doc 1's trailing segment → dropped
      (3L, "t u v")        // distinct 3-token segment → kept whole
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(df, "doc_id", "text", segTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "p q r s t u")))
    assert(out(2L) == ((1L, 0L, "")))
    assert(out(3L) == ((1L, 1L, "t u v")))
  }
}
