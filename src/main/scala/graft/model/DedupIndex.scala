package graft.model

import graft.expressions.SketchExprs
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted MinHash-LSH dedup index: the production loop behind
  * [[graft.operators.Dedup.minhashPairs]] at corpus scale.
  *
  * A 100 TB deduped corpus is not re-shingled every time a day of new data
  * arrives. The pipeline sketches the corpus ONCE (`build`), keeps only the
  * compact derived tables, and each increment then (1) sketches just the new
  * docs, (2) probes the persisted band table for collisions, (3) verifies
  * exact Jaccard against the persisted shingle-hash sets, and (4) appends
  * its own sketch rows so the next increment sees it (`append`). The raw
  * corpus text is never touched again.
  *
  * Index layout (all parquet):
  * {{{
  *   <dir>/params      one row: shingle_n, bands, rows_per_band
  *   <dir>/bands       (band INT, bandhash LONG, id LONG)   ~20 B/row
  *   <dir>/sketches    (id LONG, shash ARRAY<LONG>)          hashed shingles
  * }}}
  * `bands` is what candidate probes join against; `sketches` is the exact-
  * verification side. Both are ids+longs only — at 100 TB of text the pair
  * is orders of magnitude smaller than the corpus (a ~1 KB doc contributes
  * ~64 band bytes + 8 bytes per distinct shingle).
  *
  * Equivalence contract: build∘append and incremental probing commute with
  * from-scratch indexing — `incrementalPairs(new, idx(corpus))` equals
  * `allPairs(idx(corpus ∪ new))` restricted to pairs touching a new id,
  * exactly (same hash families, same verification arithmetic). The
  * `dedup_incremental` oracle certifies this set equality per run.
  *
  * Verification uses xxhash64'd shingles rather than shingle strings:
  * Jaccard over distinct 64-bit hashes equals Jaccard over distinct
  * shingles up to hash collisions, and both sides of every comparison this
  * index performs use the same hashed representation, so results are
  * deterministic regardless.
  */
object DedupIndex {

  /** Sketching parameters, fixed at build time and persisted: probing with
    * different parameters than the corpus was sketched with would be
    * silently wrong, so every read path recovers them from the index.
    */
  final case class Params(shingleN: Int, bands: Int, rowsPerBand: Int)

  /** Derives the band and sketch tables from one shingling pass. With
    * `persistShingles` the shared shingle stage is cached so a caller that
    * runs MULTIPLE actions over the pair (build's two writes, append's
    * count+writes) re-shingles the text once, not per action; the returned
    * thunk unpersists it and must be called after the last action.
    * Callers that fold both frames into a single lazy plan (e.g.
    * [[incrementalPairs]], whose result outlives the call) pass false.
    */
  private def sketch(
      docs: DataFrame, idCol: String, textCol: String, p: Params,
      persistShingles: Boolean = false)
    : (DataFrame, DataFrame, () => Unit) = {
    SketchExprs.register(docs.sparkSession)
    val numHashes = p.bands * p.rowsPerBand
    val withSh0 = docs.select(
      col(idCol).cast(LongType).as("id"),
      array_distinct(TF.shingles(col(textCol), p.shingleN)).as("sh"))
    val withSh = if (persistShingles) withSh0.persist() else withSh0
    // identical band arithmetic to Dedup.minhashPairs: slice the signature
    // into `bands` runs of `rowsPerBand`, hash each run seeded by its index
    val bandRows = withSh
      .withColumn("sig", SketchExprs.minhash(col("sh"), numHashes))
      .select(
        col("id"),
        posexplode(transform(sequence(lit(0), lit(p.bands - 1)),
          b => xxhash64(array_join(transform(
            slice(col("sig"), b * p.rowsPerBand + 1, lit(p.rowsPerBand)),
            v => v.cast(StringType)), ","), b)))
          .as(Seq("band", "bandhash")))
      .select(col("band").cast(IntegerType), col("bandhash"), col("id"))
    val sketchRows = withSh.select(
      col("id"),
      array_distinct(transform(col("sh"), s => xxhash64(s))).as("shash"))
    (bandRows, sketchRows,
      () => if (persistShingles) { withSh.unpersist(); () })
  }

  /** Sketch `docs` and write a fresh index at `dir` (overwrites). One pass
    * over the text; the shingle/signature stage is computed once and feeds
    * both derived tables.
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      params: Params = Params(shingleN = 3, bands = 16, rowsPerBand = 4))
    : Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (bandRows, sketchRows, done) =
      sketch(docs, idCol, textCol, params, persistShingles = true)
    try {
      Seq((params.shingleN, params.bands, params.rowsPerBand))
        .toDF("shingle_n", "bands", "rows_per_band")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
      bandRows.write.mode("overwrite").parquet(s"$dir/bands")
      sketchRows.write.mode("overwrite").parquet(s"$dir/sketches")
    } finally done()
  }

  def readParams(spark: SparkSession, dir: String): Params = {
    val r = spark.read.parquet(s"$dir/params").head()
    Params(r.getAs[Int]("shingle_n"), r.getAs[Int]("bands"),
      r.getAs[Int]("rows_per_band"))
  }

  /** Reads a table dir, first completing an interrupted [[vacuum]] swap:
    * the staged dir is complete the instant it exists, so table-missing +
    * staged-present can only mean the crash fell between vacuum's two
    * renames — promote the staged dir and read it.
    */
  private def tableOf(spark: SparkSession, dir: String, table: String)
    : DataFrame = {
    val dst = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(s"$dir/.$table.vacuum")
    if (!fs.exists(dst) && fs.exists(staged))
      require(fs.rename(staged, dst), s"vacuum recovery failed for $table")
    spark.read.parquet(dst.toString)
  }
  private def bandsOf(spark: SparkSession, dir: String): DataFrame =
    tableOf(spark, dir, "bands")
  private def sketchesOf(spark: SparkSession, dir: String): DataFrame =
    tableOf(spark, dir, "sketches")

  /** Append `newDocs`' sketch rows to the index, using the PERSISTED
    * parameters. Ids already present are skipped (idempotent re-append of
    * a replayed batch): the overlap probe is a narrow scan of the compact
    * sketch-id column against the broadcast new-id set — its result is
    * bounded by the increment size, never the corpus. Returns the number
    * of docs actually appended.
    */
  def append(
      newDocs: DataFrame, idCol: String, textCol: String, dir: String): Long = {
    val spark = newDocs.sparkSession
    val p = readParams(spark, dir)
    val newIds = newDocs.select(col(idCol).cast(LongType).as("id")).distinct()
    // ids already indexed, bounded by the increment (left_semi against the
    // broadcast new-id set). Dropped via a broadcast left_anti — never
    // collected to the driver: a largely-replayed increment would inline an
    // increment-sized isin literal into the plan otherwise
    val already = sketchesOf(spark, dir).select("id")
      .join(broadcast(newIds), Seq("id"), "left_semi")
      .select(col("id").as("_graft_indexed_id"))
    val fresh = newDocs.join(broadcast(already),
      col(idCol).cast(LongType) === col("_graft_indexed_id"), "left_anti")
    val (bandRows, sketchRows, done) =
      sketch(fresh, idCol, textCol, p, persistShingles = true)
    try {
      val n = sketchRows.count()
      if (n > 0) {
        bandRows.write.mode("append").parquet(s"$dir/bands")
        sketchRows.write.mode("append").parquet(s"$dir/sketches")
      }
      n
    } finally done()
  }

  /** Exact-Jaccard verification of candidate pairs against the sketch
    * table. With `broadcastCandidates` the candidate-derived side is
    * broadcast into BOTH lookups, so the (corpus-sized) sketch table is
    * never shuffled — the broadcast payload is bounded by the candidate
    * count times one shingle-hash set, i.e. by the increment, not the
    * corpus.
    */
  private def verifyPairs(
      candidates: DataFrame, sketches: DataFrame, threshold: Double,
      broadcastCandidates: Boolean = false): DataFrame = {
    val bc: DataFrame => DataFrame =
      if (broadcastCandidates) broadcast else identity
    bc(bc(candidates)
      .join(sketches.select(col("id").as("id_a"), col("shash").as("sh_a")),
        "id_a"))
      .join(sketches.select(col("id").as("id_b"), col("shash").as("sh_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** All near-dup pairs among the indexed docs — `minhashPairs` semantics
    * replayed off the persisted tables (the from-scratch side of the
    * incremental equivalence, and the backfill path after a bulk `build`).
    * Same shuffle discipline as the live operator: the band self-join is
    * forced shuffle-merge (the build side is the whole corpus — a
    * stats-based broadcast pick could not survive scale).
    */
  def allPairs(
      spark: SparkSession, dir: String, jaccardThreshold: Double): DataFrame = {
    val banded = bandsOf(spark, dir)
    val candidates = banded.as("l").hint("shuffle_merge")
      .join(banded.as("r").hint("shuffle_merge"), Seq("band", "bandhash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
    verifyPairs(candidates, sketchesOf(spark, dir), jaccardThreshold)
  }

  /** Drop index rows for ids no longer in the corpus and compact the
    * append-accumulated small files — the post-retention hygiene step.
    * Until vacuum runs, probes can still report pairs against deleted
    * docs (the index is the only place they survive); run it after every
    * retention/compaction pass, like [[NgramIndex.vacuum]].
    *
    * Each table is rewritten STAGE-THEN-SWAP, sized back to
    * `targetBytes` files, with the old dir renamed ASIDE (dst → .old,
    * staged → dst, drop .old) so a crash at any instant leaves the table
    * readable: before the first rename dst is untouched; between the two
    * renames the staged dir is already complete and the read path
    * promotes it ([[tableOf]]); after the second only a stale .old
    * lingers, cleared by the next vacuum. A crash between the two TABLE
    * rewrites is also safe: a dead id missing from EITHER table is inert
    * (bands without a sketch row produce candidates the verification join
    * drops; sketches without band rows are never probed), so partial
    * vacuum only under-deletes. Returns the number of ids dropped.
    */
  def vacuum(
      spark: SparkSession,
      dir: String,
      liveIds: DataFrame,
      idCol: String,
      targetBytes: Long = 128L << 20): Long = {
    val live = liveIds.select(col(idCol).cast(LongType).as("id")).distinct()
    val dead = sketchesOf(spark, dir).select("id")
      .join(live, Seq("id"), "left_anti").count()
    val conf = spark.sparkContext.hadoopConfiguration
    def rewrite(table: String, df: DataFrame): Unit = {
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$table")
      val fs = dst.getFileSystem(conf)
      val bytes = fs.getContentSummary(dst).getLength
      val parts = math.max(1L, bytes / targetBytes).toInt
      val staged = new org.apache.hadoop.fs.Path(s"$dir/.$table.vacuum")
      val old = new org.apache.hadoop.fs.Path(s"$dir/.$table.old")
      df.join(live, Seq("id"), "left_semi")
        .coalesce(parts).write.mode("overwrite").parquet(staged.toString)
      fs.delete(old, true)
      require(fs.rename(dst, old), s"vacuum swap (aside) failed for $table")
      require(fs.rename(staged, dst),
        s"vacuum swap (promote) failed for $table")
      fs.delete(old, true)
      ()
    }
    rewrite("bands", bandsOf(spark, dir))
    rewrite("sketches", sketchesOf(spark, dir))
    dead
  }

  /** Near-dup pairs between `newDocs` and the indexed corpus, plus pairs
    * within `newDocs` itself — the per-increment dedup step. Does NOT
    * modify the index; call [[append]] with the surviving docs afterwards.
    *
    * Scale shape when `broadcastNew` (the normal case — a day's increment
    * against years of corpus): the new side's band rows are broadcast, so
    * the corpus band table is scanned narrowly (no corpus-side shuffle at
    * all); verification joins the broadcast candidate set against the
    * sketch table the same way. Every shuffled row is a scalar pair. For
    * an increment too large to broadcast, pass `broadcastNew = false` and
    * the probe degrades gracefully to the hash-partitioned equi-join.
    */
  def incrementalPairs(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      jaccardThreshold: Double,
      broadcastNew: Boolean = true): DataFrame = {
    val spark = newDocs.sparkSession
    val p = readParams(spark, dir)
    val (newBands, newSketches, _) = sketch(newDocs, idCol, textCol, p)
    val probe = if (broadcastNew) broadcast(newBands) else newBands
    // new × corpus: corpus side stays in place, new side ships to it
    val nc = bandsOf(spark, dir)
      .join(probe.withColumnRenamed("id", "new_id"), Seq("band", "bandhash"))
      .where(col("id") =!= col("new_id"))
      .select(least(col("id"), col("new_id")).as("id_a"),
        greatest(col("id"), col("new_id")).as("id_b"))
    // new × new: the increment against itself (tiny)
    val nn = newBands.as("l")
      .join(newBands.as("r"), Seq("band", "bandhash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .where(col("id_a") < col("id_b"))
    val candidates = nc.union(nn).distinct()
    val sketches = sketchesOf(spark, dir).unionByName(newSketches)
    verifyPairs(candidates, sketches, jaccardThreshold,
      broadcastCandidates = broadcastNew)
  }
}
