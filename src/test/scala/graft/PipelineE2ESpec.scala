package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, TrainPipeline}
import org.apache.spark.sql.functions._

/** The full training-data flow COMPOSED — dedup → quality filter → chunk →
  * pack → shard — on the shared documents table, asserting the cross-stage
  * invariants a real pipeline depends on (each stage is oracle-checked
  * individually in the registry; this proves they fit together).
  */
class PipelineE2ESpec extends SparkTestBase {

  test("documents: dedup → quality gate → token chunks → packed bins → deterministic shards") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val n0 = docs.count()

    // 1. exact dedup on text (min-id survivor)
    val exactSurvivors = Dedup.exact(
      docs.withColumn("text_md5", md5(col("text")))
        .select("text_md5", "doc_id"),
      Seq("text_md5"), "doc_id")
      .select("doc_id")
    val exact = docs.join(exactSurvivors, "doc_id")

    // 2. near-dedup: minhash pairs → every id_b (greater id) drops
    val pairs = Dedup.minhashPairs(exact, "doc_id", "text",
      shingleN = 2, bands = 8, rowsPerBand = 4, jaccardThreshold = 0.6)
    val deduped = exact.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= n0)

    // no surviving pair: re-running pair generation on the survivors at
    // the same threshold finds nothing (keep-first collapsed every pair)
    assert(Dedup.minhashPairs(deduped, "doc_id", "text",
      shingleN = 2, bands = 8, rowsPerBand = 4,
      jaccardThreshold = 0.6).count() == 0)

    // 3. quality gate keeps a sane middle of the corpus
    val scored = deduped.withColumn("score", TF.qualityScore(col("text")))
    val kept = scored.where(col("score") >= 0.3)
    val nKept = kept.count()
    assert(nKept > nDeduped / 4, s"quality gate too aggressive: $nKept/$nDeduped")

    // 4. token chunks cover every kept doc; no chunk exceeds the window
    val chunks = TrainPipeline.chunkTokens(kept, "doc_id", "text",
      sizeTokens = 64, strideTokens = 64)
    assert(chunks.select("doc_id").distinct().count() == nKept)
    assert(chunks.where(col("n_tokens") > 64).count() == 0)
    // stride == size → token partition: per-doc token sums match the source
    val chunkTok = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("t")).withColumnRenamed("doc_id", "cid")
    val srcTok = kept.select(col("doc_id").as("cid"),
      size(TF.tokens(col("text"))).cast("long").as("t0"))
    assert(chunkTok.join(srcTok, "cid")
      .where(col("t") =!= col("t0")).count() == 0)

    // 5. pack chunks into token-budget bins per language
    val withLang = chunks
      .join(kept.select("doc_id", "lang"), "doc_id")
      .withColumn("chunk_id",
        col("doc_id") * 1000 + col("chunk_idx"))
    val packed = TrainPipeline.packGreedy(withLang, "lang", "chunk_id",
      "n_tokens", budget = 256)
    // every chunk lands in exactly one bin; no bin overflows the budget
    assert(packed.count() == withLang.count())
    val overfull = packed.groupBy("grp", "bin").agg(sum("w").as("fill"))
      .where(col("fill") > 256)
      // a single chunk larger than the budget legitimately overflows its
      // own bin; chunk windows are 64 tokens so that cannot happen here
      .count()
    assert(overfull == 0)

    // 6. deterministic shard assignment of the packed bins
    val bins = packed.select(concat_ws("#", col("grp"), col("bin")).as("bin_key"))
      .distinct()
    val sharded = TrainPipeline.shuffleShards(bins, "bin_key",
      numShards = 8, salt = "e2e")
    assert(sharded.count() == bins.count())
    val again = TrainPipeline.shuffleShards(bins, "bin_key",
      numShards = 8, salt = "e2e")
    assert(sharded.collect().toSet == again.collect().toSet,
      "shard assignment must be reproducible")
  }
}
