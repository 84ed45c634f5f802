package graft.operators

import graft.expressions.VectorExprs
import graft.functions.{Rounding, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths:
  *  - [[ivfTopK]]: inverted-file (IVF) bucketing — KMeans centroids
  *    partition the corpus; each query probes only its `nprobe` nearest
  *    cells. The classic recall/cost dial for billion-vector corpora.
  *  - [[bruteTopK]]: exact cosine top-k, query set broadcast against the
  *    corpus scan — the correctness baseline. One scan, no corpus shuffle;
  *    at 100 TB the corpus side stays partition-local and the per-partition
  *    top-k is reduced via the ranking window on (query, cosine).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — queries only score
  *    corpus vectors whose sketch collides on at least one band, cutting the
  *    scored set by orders of magnitude at the cost of recall.
  */
object Similarity {

  /** Should this corpus projection be hash-spread to the session's
    * parallelism before scoring? The tiered gate, its verdict cache, and
    * the 100 TB exit live in [[Spread.needsSpread]] (shared with the
    * ingest/text operators); the decision logic is documented at the call
    * site in [[bruteTopK]].
    */
  private def needsSpread(
      spark: SparkSession, sel: DataFrame, parallelism: Int): Boolean =
    Spread.needsSpread(spark, sel, parallelism)

  /** Exact top-k cosine neighbors for each query vector. `queries` is
    * expected to be small (it is broadcast); ties break on neighbor id for
    * determinism.
    *
    * Scale note: the `row_number() ≤ k` pattern triggers Catalyst's
    * rank-limit pushdown — the physical plan carries a PARTIAL
    * `WindowGroupLimit` before the exchange, so each scan partition emits at
    * most k rows per query and the per-qid reducer receives ≤ k × partitions
    * rows, never the full scored corpus (asserted in ExpressionsSpec).
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    VectorExprs.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", VectorExprs.norm(col("qv"))))
    val sel = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    // The corpus is NEVER shuffled at scale: a 100 TB scan already has
    // thousands of splits, so scoring runs where the vectors sit. Only a
    // genuinely under-split source (a single local file — the test/bench
    // case) gets spread to the session's parallelism. The gate is tiered
    // by cost:
    //  1. a corpus whose plan already contains a shuffle-inducing operator
    //     is NEVER probed or spread — its partitioning is the shuffle's
    //     (≥ spark.sql.shuffle.partitions), and probing `.rdd` under AQE
    //     would MATERIALIZE those shuffle stages just to read a count,
    //     running the corpus pipeline twice;
    //  2. `inputFiles` (logical-plan file listing only) proves a many-file
    //     scan parallel without planning anything;
    //  3. only a FEW-file narrow scan pays the `.rdd` planning pass (no
    //     jobs run for a shuffle-free plan), which also sees block-level
    //     splitting of large files.
    // The verdict is cached per (session, canonicalized plan) — see
    // [[needsSpread]] — so repeated calls over the same corpus skip the
    // probe entirely.
    // Spread is hash-on-id, NOT round-robin: RoundRobinPartitioning
    // locally sorts every row before the exchange (retry determinism),
    // which on embedding vectors costs more than the scoring it enables.
    val parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    val c =
      if (needsSpread(corpus.sparkSession, sel, parallelism))
        sel.repartition(parallelism, col("nid"))
      else sel
    // norms once per vector (map-side, below the join), one dot per pair —
    // bit-identical to cosine per the cosineFromNorms contract
    val scored = c.withColumn("nn", VectorExprs.norm(col("nv")))
      .join(q, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.cosineFromNorms(
          col("qv"), col("nv"), col("qn"), col("nn"))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** LSH-bucketed approximate top-k: sketch both sides, join on band
    * chunks, score only colliding candidates. Recall grows with `bands`
    * (multi-probe); all joins are hash equi-joins on (band, chunk).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      sketchBits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bands >= 1 && sketchBits >= bands && sketchBits % bands == 0,
      s"sketchBits must be a positive multiple of bands, got $sketchBits/$bands" +
        " (a remainder would silently ignore the top sketch bits)")
    val bitsPerBand = sketchBits / bands
    val mask = (1L << bitsPerBand) - 1
    // norm computed once per vector BEFORE the band explode (the exploded
    // copies share the scalar), so collision scoring pays one dot, not the
    // three norm/dot passes of full cosine per colliding pair
    def banded(df: DataFrame, id: String, v: String, n: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          VectorExprs.norm(col(vecCol)).as(n),
          VF.hyperplaneSketch(col(vecCol), sketchBits).as("sk"))
        .select(col(id), col(v), col(n),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => call_function("shiftright", col("sk"), b * bitsPerBand).bitwiseAND(mask)))
            .as(Seq("band", "chunk")))
    VectorExprs.register(corpus.sparkSession)
    val q = broadcast(banded(queries, "qid", "qv", "qn"))
    val c = banded(corpus, "nid", "nv", "nn")
    // Score at collision time, while both vectors are still partition-local
    // (queries broadcast, corpus never moved) — then dedupe band collisions
    // on SCALARS: the one shuffle carries (qid, nid, cosine) rows, never the
    // vectors. A pair colliding on b bands pays ≤ b cosine evaluations, but
    // map-side partial aggregation collapses them before the exchange —
    // at 100 TB recomputing a dot product beats shuffling two embeddings.
    val collided = q.join(c, Seq("band", "chunk"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.cosineFromNorms(
          col("qv"), col("nv"), col("qn"), col("nn"))).as("cosine"))
    val scored = collided.groupBy("qid", "nid").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** A prebuilt IVF index: the (tiny) centroid set plus the corpus bucketed
    * by its nearest cell. Building is the expensive, AMORTIZABLE step —
    * production deployments build once, persist via [[IvfIndex.save]], and
    * serve many query batches against [[IvfIndex.load]]; [[ivfQuery]]
    * touches only `nprobe` cells per query.
    */
  final case class IvfIndex(
      centroids: DataFrame, bucketed: DataFrame, numCells: Int)

  object IvfIndex {
    /** Persist the index: centroids as one small parquet, the bucketed
      * corpus PARTITIONED BY CELL — the physical layout the build-time
      * scaladoc promises. With per-cell directories, a loaded index's
      * probe join qualifies for dynamic partition pruning: each query
      * batch reads only its probed cells' files, which is the entire point
      * of IVF at 100 TB (nprobe/numCells of the corpus per batch instead
      * of a full scan).
      */
    def save(index: IvfIndex, path: String): Unit = {
      index.centroids.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/centroids")
      index.bucketed.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/bucketed")
    }

    /** Load a persisted index. `numCells` is recovered from the centroid
      * table (its row count IS the cell count).
      */
    def load(spark: SparkSession, path: String): IvfIndex = {
      val centroids = spark.read.parquet(s"$path/centroids")
      val bucketed = spark.read.parquet(s"$path/bucketed")
      IvfIndex(centroids, bucketed, centroids.count().toInt)
    }
  }

  /** Build an IVF index over the corpus.
    *
    * The KMeans fit runs on a bounded SAMPLE (≤ `trainRows` vectors):
    * KMeans is iterative — every iteration is a full pass over its input,
    * so fitting the raw corpus would scan 100 TB per iteration. Centroid
    * quality converges long before millions of training points; assignment
    * of the full corpus stays a single narrow `transform` pass (at scale,
    * write `bucketed` partitioned by cell so queries prune to their probed
    * cells' files).
    */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 16,
      seed: Long = 42L,
      trainRows: Long = 100000L): IvfIndex = {
    VectorExprs.register(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("fv", array_to_vector(col("nv").cast("array<double>")))
    // count() is footer-metadata cheap on parquet; it bounds the sampling
    // fraction so the iterative fit input never exceeds trainRows
    val n = featured.count()
    val trainSet =
      if (n <= trainRows) featured
      else featured.sample(withReplacement = false,
        trainRows.toDouble / n, seed)
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(trainSet)
    val bucketed = model.transform(featured).select("nid", "nv", "cell")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
    IvfIndex(centroids, bucketed, numCells)
  }

  /** Answer a query batch against a prebuilt index: pick each query's
    * `nprobe` nearest cells via the broadcast centroid set, score only
    * those cells' vectors, rank top-k.
    */
  def ivfQuery(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    VectorExprs.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", VectorExprs.norm(col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("dist",
        -VectorExprs.dot(col("qv"), col("centroid")) * lit(2.0) +
          VectorExprs.dot(col("centroid"), col("centroid")))
      .withColumn("prank", row_number().over(w))
      .where(col("prank") <= nprobe)
      .select("qid", "qv", "qn", "cell")

    // corpus-side norms once per bucketed vector, below the probe join —
    // each probed cell's vectors pay one dot per query, not a full cosine
    val scored = probes
      .join(index.bucketed.withColumn("nn", VectorExprs.norm(col("nv"))), "cell")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.cosineFromNorms(
          col("qv"), col("nv"), col("qn"), col("nn"))).as("cosine"))
    val rw = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** IVF (inverted-file) approximate top-k: [[buildIvfIndex]] +
    * [[ivfQuery]] in one call, for one-shot use; amortize the build via the
    * two-step API when serving repeated query batches.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 3,
      seed: Long = 42L,
      trainRows: Long = 100000L): DataFrame =
    ivfQuery(
      buildIvfIndex(corpus, idCol, vecCol, numCells, seed, trainRows),
      queries, idCol, vecCol, k, nprobe)

  /** Distributed k-NN JOIN: every row of `left` gets its `k` nearest rows
    * of `right` by cosine. This is the both-sides-large shape
    * ([[bruteTopK]]/[[ivfQuery]] assume a small query batch): neither side
    * is broadcast or cross-joined. Both sides route through a shared IVF
    * cell assignment —
    *
    *  - the `right` side is bucketed once by [[buildIvfIndex]] (sampled
    *    KMeans fit, narrow full-corpus assignment);
    *  - the `left` side picks its `nprobe` nearest cells as a NARROW
    *    per-row projection: the centroid table is tiny (`numCells` rows),
    *    so it rides along as a LITERAL array and cell selection is
    *    `array_sort` + `slice` + `explode` — no crossJoin, and crucially no
    *    per-qid ranking window, which for a large left side would be a
    *    full extra shuffle ([[ivfQuery]] affords that window only because
    *    its query batch is small);
    *  - the only wide operations are the equi-join on `cell` and the final
    *    top-k window on `qid` (which Catalyst executes with a partial
    *    WindowGroupLimit, so each map task emits ≤ k rows per qid).
    *
    * `nprobe = numCells` degenerates to the exact join through the same
    * distributed plumbing (this is how the oracle checks it); smaller
    * `nprobe` is the recall/cost dial. At scale, size `numCells` ~
    * sqrt(|right|) (e.g. 32k cells for 1 B vectors): the cell-join key
    * cardinality grows with the data, so the join parallelizes, and AQE's
    * skew splitting handles hot cells.
    *
    * `excludeSelf` drops `qid == nid` matches for self-join dedup/retrieval
    * over one table (ids must then be from the same id space).
    */
  def knnJoin(
      left: DataFrame,
      right: DataFrame,
      leftIdCol: String,
      leftVecCol: String,
      rightIdCol: String,
      rightVecCol: String,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 3,
      excludeSelf: Boolean = false,
      seed: Long = 42L,
      trainRows: Long = 100000L): DataFrame =
    knnJoinWithIndex(
      buildIvfIndex(right, rightIdCol, rightVecCol, numCells, seed, trainRows),
      left, leftIdCol, leftVecCol, k, nprobe, excludeSelf)

  /** [[knnJoin]] against a prebuilt/persisted [[IvfIndex]] over the right
    * side (amortize the build across many left-side batches).
    */
  def knnJoinWithIndex(
      index: IvfIndex,
      left: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      excludeSelf: Boolean = false): DataFrame = {
    VectorExprs.register(left.sparkSession)
    // pre-cast both vector columns to array<double> ONCE PER ROW: the
    // pair-level dot below otherwise re-casts (allocating) per candidate
    // PAIR — measured 3× on the exact self-join shape (same rule as
    // bruteTopK's pre-cast)
    val spark = left.sparkSession
    val sel = left.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", VectorExprs.norm(col("qv")))
    // the cell join's output (and the partial top-k sort above it) inherit
    // the LEFT side's partitioning — an under-split local scan would build
    // every candidate pair in one task. Same tiered gate as bruteTopK:
    // spread only when the scan is genuinely under-split (never fires on a
    // well-split table at scale, where the spread would be a full extra
    // shuffle of left × nprobe vector rows).
    val parallelism = spark.sparkContext.defaultParallelism
    val spread =
      if (needsSpread(spark, sel, parallelism)) sel.repartition(parallelism)
      else sel
    val probed = probeCellsNarrow(spread, index.centroids, nprobe)
    val bucketed = index.bucketed
      .withColumn("nv", col("nv").cast("array<double>"))
      .withColumn("nn", VectorExprs.norm(col("nv")))
    // SALT the cell join: the join key has only numCells distinct values,
    // so with few cells (an oracle-exact all-cells probe, or any index
    // built when the corpus was small) the pair build and the partial
    // top-k sort above it run on ≤ numCells tasks no matter how many
    // cores exist — measured 2.8× super-linear at the 100× soak (413 s,
    // 16 tasks on 32 cores, ~25M-row sorts per task). Splitting each
    // cell's CORPUS rows across ceil(4·parallelism/numCells) salt lanes
    // (probe side replicated per lane — it is queries × nprobe rows,
    // orders of magnitude smaller than the corpus) forms every pair
    // exactly once while saturating the cluster and shrinking each
    // task's sort. No-op when the index already has ≥ 4× cells per core.
    // numCells comes from the index record — both build and load populate
    // it — so sizing the salt costs no count() job (measured r14: the
    // recount was one driver-synced job on EVERY knn invocation).
    val numCells = math.max(1, index.numCells)
    val saltN = math.max(1,
      math.ceil(4.0 * parallelism / numCells.toDouble).toInt)
    val (probeSide, corpusSide) =
      if (saltN == 1) (probed, bucketed)
      else (
        probed.withColumn("_salt",
          explode(sequence(lit(0), lit(saltN - 1)))),
        bucketed.withColumn("_salt",
          pmod(xxhash64(col("nid")), lit(saltN.toLong)).cast("int")))
    val joinKeys = if (saltN == 1) Seq("cell") else Seq("cell", "_salt")
    val scored = probeSide.join(corpusSide, joinKeys)
      .drop("_salt")
    val filtered =
      if (excludeSelf) scored.where(col("qid") =!= col("nid")) else scored
    // the rank-filter below triggers Catalyst's InferWindowGroupLimit:
    // a PARTIAL WindowGroupLimit cuts every salt lane's task output to
    // ≤ k rows per qid BEFORE the qid exchange (plan-pinned in
    // PlanAuditSpec), so the shuffle carries O(queries·k·lanes) rows —
    // the per-lane partial top-k, without hand-rolling one
    val rw = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    filtered
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.cosineFromNorms(
          col("qv"), col("nv"), col("qn"), col("nn"))).as("cosine"))
      .withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** Above this many cells the literal-centroid probe stops riding the
    * plan as an expression tree and switches to the broadcast array-column
    * form — ~4k cells ≈ 2 MB of plan literals is fine, the 32k cells a
    * 1 B-row corpus wants (≈16 MB in ONE expression) is not. The spec
    * asserts result identity across the gate.
    */
  private[graft] val ProbeLiteralMaxCells = 4096

  /** Each row's `nprobe` nearest IVF cells, as a NARROW projection over a
    * frame carrying a `qv` vector column: no crossJoin row blow-up and no
    * per-row ranking window — cell selection is `array_sort` + `slice` +
    * `explode` over per-cell (dist, cell) structs. Distance uses
    * ivfQuery's formula (−2·q·c + c·c, squared-L2 with the constant |q|²
    * dropped). Ties break on cell id, matching ivfQuery's Window
    * orderBy(dist, cell). Output = input columns plus `cell`, one row per
    * (input row, probed cell).
    *
    * Two result-identical physical forms behind a size gate
    * (`maxLiteralCells`, default [[ProbeLiteralMaxCells]]):
    *
    *  - `numCells ≤ gate`: the centroid table rides the plan as
    *    LITERALS (one struct per cell) — codegen-friendly, zero joins;
    *  - past the gate: the centroids are aggregated into a SINGLE
    *    cell-sorted array row and attached via a broadcast cross join, so
    *    the 16 MB of a 32k-cell table is DATA in one broadcast row, not
    *    plan text — per-row compute is the same numCells dot products,
    *    evaluated by `transform` over the array column. Both fold c·c
    *    left-to-right over the same doubles, so distances (and therefore
    *    probe sets) are bitwise identical across the gate.
    */
  private def probeCellsNarrow(
      withQv: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame =
    probeCells(withQv, centroids, nprobe, ProbeLiteralMaxCells)

  private[graft] def probeCells(
      withQv: DataFrame, centroids: DataFrame, nprobe: Int,
      maxLiteralCells: Int): DataFrame = {
    val keep = withQv.columns.map(col)
    val centsTyped = centroids
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
    // ONE driver action sizes AND fetches: limit(gate+1).collect() returns
    // the complete centroid set whenever it is at or under the gate (limit
    // only truncates past it), so the literal path needs no separate
    // count() job — measured r14, the count was a driver-synced job on
    // every IVF probe. Exactly gate+1 rows back ⇒ over the gate ⇒ the
    // broadcast-join form (which never needs the exact count).
    val headRows = centsTyped
      .limit(math.min(maxLiteralCells.toLong + 1L, Int.MaxValue.toLong).toInt)
      .collect()
    if (headRows.length <= maxLiteralCells) {
      val numCells = headRows.length
      val probeN = math.min(nprobe, numCells)
      val cents = headRows
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      val candStructs = cents.map { case (cell, c) =>
        struct(
          (VectorExprs.dot(col("qv"), lit(c)) * lit(-2.0) +
            lit(c.map(x => x * x).sum)).as("dist"),
          lit(cell).as("cell"))
      }
      withQv
        .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(keep :+
          explode(slice(array_sort(array(candStructs.toSeq: _*)), 1, probeN))
            .as("p")): _*)
        .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(
          keep :+ col("p.cell").as("cell")): _*)
    } else {
      // numCells > gate ≥ any sane nprobe here; `slice` truncates to the
      // array length anyway, so min(nprobe, numCells) needs no exact count
      val probeN = nprobe
      // c·c rides the broadcast row too (same left-to-right double fold
      // as the literal path's driver-side sum); array_sort on the
      // (cell, …) struct reproduces the literal path's sortBy(cell)
      val centsRow = broadcast(centsTyped
        .select(struct(
          col("cell"),
          col("centroid"),
          aggregate(col("centroid"), lit(0.0), (a, x) => a + x * x)
            .as("cnorm2")).as("c"))
        .agg(array_sort(collect_list(col("c"))).as("_cents")))
      withQv
        .crossJoin(centsRow)
        .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(keep :+
          explode(slice(array_sort(transform(col("_cents"), c =>
              struct(
                (VectorExprs.dot(col("qv"), c.getField("centroid")) * lit(-2.0) +
                  c.getField("cnorm2")).as("dist"),
                c.getField("cell").as("cell")))),
            1, probeN)).as("p")): _*)
        .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(
          keep :+ col("p.cell").as("cell")): _*)
    }
  }

  /** A product-quantization index (FAISS `IndexPQ` shape): per-subspace
    * KMeans codebooks plus the corpus compressed to one small code per
    * subspace. `codebooks(sub, code, centroid)` is tiny (m × codesPerSub
    * centroids); `codes(nid, codes)` carries m small ints per vector —
    * the memory story of PQ: a 64-dim float vector (256 B) becomes m = 8
    * bytes, so a 100 TB embedding corpus scans as ~3 TB of codes.
    *
    * Vectors are L2-NORMALIZED before quantization, which makes
    * ADC's squared-L2 ranking equivalent to cosine ranking (monotonic:
    * ‖q−x‖² = 2 − 2·cos on the unit sphere) — so results are comparable
    * with [[bruteTopK]]/[[lshTopK]]/[[ivfTopK]].
    *
    * For the full IVF-PQ composition, bucket `codes` by an
    * [[IvfIndex]] cell assignment and score only probed cells; the flat
    * form here is the exhaustive-but-compressed scan.
    */
  final case class PqIndex(
      codebooks: DataFrame, codes: DataFrame, m: Int, codesPerSub: Int, dim: Int)

  object PqIndex {
    /** Persist the index: tiny codebooks as one parquet, the code table
      * (the compressed corpus — the artifact whose 30×-smaller scan is
      * PQ's point) as plain parquet. Unlike [[IvfIndex.save]] there is no
      * pruning dimension to partition by: a flat ADC query reads every
      * code row by design.
      */
    def save(index: PqIndex, path: String): Unit = {
      index.codebooks.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/codebooks")
      index.codes.write.mode("overwrite").parquet(s"$path/codes")
    }

    /** Load a persisted index. Geometry is recovered from the codebook
      * table itself — build-time padding guarantees a dense `sub × code`
      * grid, so max(sub)+1 and max(code)+1 ARE m and codesPerSub.
      */
    def load(spark: SparkSession, path: String): PqIndex = {
      val codebooks = spark.read.parquet(s"$path/codebooks")
      val codes = spark.read.parquet(s"$path/codes")
      val geo = codebooks
        .agg(max(col("sub")).as("ms"), max(col("code")).as("mc"))
        .head()
      val m = geo.getInt(0) + 1
      val cps = geo.getInt(1) + 1
      val dsub = codebooks.select(size(col("centroid"))).head().getInt(0)
      PqIndex(codebooks, codes, m, cps, dsub * m)
    }
  }

  /** Build a PQ index: split each (normalized) vector into `m` contiguous
    * subspaces, fit an independent KMeans codebook of `codesPerSub`
    * centroids per subspace on a bounded sample (same rationale as
    * [[buildIvfIndex]] — the iterative fit must never pass over the full
    * corpus), then encode the corpus with `m` chained nearest-centroid
    * assignments — all narrow single-pass work.
    *
    * The one-row `head()` reads the dimensionality from the data (a
    * single-split, single-row driver action — index-build-time only,
    * never on the query path). `dim` must divide evenly by `m`.
    */
  def buildPqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      codesPerSub: Int = 16,
      seed: Long = 42L,
      trainRows: Long = 100000L): PqIndex = {
    VectorExprs.register(corpus.sparkSession)
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    val unit = normalized(corpus, idCol, vecCol, "nid", "nv")
    // count the RAW corpus (parquet-footer cheap — no filter/projection
    // in the way) to bound the sample fraction; the handful of zero-norm
    // rows normalized() drops only make the sample marginally smaller
    val (codebooks, encoded) = pqFitEncode(unit, corpus.count(), dim, m,
      codesPerSub, seed, trainRows, carry = Nil)
    PqIndex(codebooks, encoded, m, codesPerSub, dim)
  }

  /** Shared PQ trainer/encoder over an already-normalized `(nid, nv, …)`
    * frame: per-subspace sampled KMeans fits, then one narrow encode pass
    * emitting `(nid, carry…, codes)`. Factored out so [[buildPqIndex]] and
    * [[buildIvfPqIndex]] train identically (the latter carries the cell
    * assignment through the encode instead of re-joining it on id later —
    * at scale that join would be a second full shuffle of the corpus).
    */
  private def pqFitEncode(
      unit: DataFrame,
      n: Long,
      dim: Int,
      m: Int,
      codesPerSub: Int,
      seed: Long,
      trainRows: Long,
      carry: Seq[String]): (DataFrame, DataFrame) = {
    VectorExprs.register(unit.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    val withSubs = (0 until m).foldLeft(unit) { (df, s) =>
      df.withColumn(s"fv$s",
        array_to_vector(slice(col("nv"), s * dsub + 1, dsub)))
    }
    val trainSet =
      if (n <= trainRows) withSubs
      else withSubs.sample(withReplacement = false, trainRows.toDouble / n, seed)
    val models = (0 until m).map { s =>
      new KMeans().setK(codesPerSub).setSeed(seed + s)
        .setFeaturesCol(s"fv$s").setPredictionCol(s"code$s")
        .fit(trainSet)
    }
    val encoded = models
      .foldLeft(withSubs)((df, model) => model.transform(df))
      .select((col("nid") +: carry.map(col) :+
        array((0 until m).map(s => col(s"code$s")): _*).as("codes")): _*)
    val spark = unit.sparkSession
    import spark.implicits._
    val codebooks = models.zipWithIndex.flatMap { case (model, s) =>
      // KMeans may return FEWER than k centers (low-cardinality subspace /
      // tiny sample). The ADC table is indexed positionally by
      // sub*codesPerSub + code, so deficient codebooks must be padded to
      // exactly codesPerSub rows or every later subspace's lookups shift
      // (silent mis-ranking; top slots out of bounds). Padded slots repeat
      // center 0 — codes from the SAME model never reference them.
      val centers = model.clusterCenters
      val padded = centers ++ Array.fill(codesPerSub - centers.length)(centers(0))
      padded.zipWithIndex.map { case (c, code) => (s, code, c.toArray) }
    }.toDF("sub", "code", "centroid")
    (codebooks, encoded)
  }

  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as(idAs), v.as("rawv"))
      .withColumn("rn0", VectorExprs.norm(col("rawv")))
      .where(col("rn0") > 0.0)
      .select(col(idAs),
        transform(col("rawv"), x => x / col("rn0")).as(vecAs))
  }

  /** Answer a query batch by asymmetric distance computation (ADC): build
    * each query's (sub, code) → squared-subdistance lookup table against
    * the broadcast codebooks, flatten it to one array per query, then scan
    * the corpus CODES — never the vectors — summing `m` table lookups per
    * candidate.
    *
    * Scale shape: the table build touches queries × m × codesPerSub tiny
    * rows; the scan is `codes ⨯ broadcast(tables)` — a narrow pass over
    * the compressed corpus with a fully-codegen per-row score (the m-term
    * sum is unrolled into `GetArrayItem`/`ElementAt` adds, no interpreted
    * higher-order function in the hot loop), followed by the same
    * rank-limited per-query top-k window as [[bruteTopK]].
    */
  def pqQuery(
      index: PqIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    VectorExprs.register(queries.sparkSession)
    val q = normalized(queries, idCol, vecCol, "qid", "qv")
    val dtabs = adcTables(q, index.codebooks, index.m, index.codesPerSub,
      index.dim)
    val scored = index.codes.crossJoin(broadcast(dtabs))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        adcScore(index.m, index.codesPerSub).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "adist")
  }

  /** Per-query ADC lookup tables against broadcast codebooks: one flat
    * `dtab` array per qid, slot-indexed by `sub * codesPerSub + code`.
    * ‖s − c‖² = s·s − 2 s·c + c·c, all three via the codegen dot.
    */
  private def adcTables(
      q: DataFrame, codebooks: DataFrame,
      m: Int, codesPerSub: Int, dim: Int): DataFrame = {
    val dsub = dim / m
    val qtab = q.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("code"),
        (VectorExprs.dot(
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)))
          - VectorExprs.dot(
              slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
              col("centroid")) * 2.0
          + VectorExprs.dot(col("centroid"), col("centroid"))).as("d"))
    qtab.groupBy("qid").agg(
      transform(
        array_sort(collect_list(struct(
          (col("sub") * codesPerSub + col("code")).as("slot"),
          col("d").as("d")))),
        e => e.getField("d")).as("dtab"))
  }

  /** The unrolled m-term ADC sum over a `codes` array and a `dtab` lookup
    * array — plain `GetArrayItem`/`ElementAt` adds, fully codegen.
    */
  private def adcScore(m: Int, codesPerSub: Int) =
    Rounding.r4((0 until m)
      .map(s => element_at(col("dtab"),
        col("codes").getItem(s) + lit(s * codesPerSub) + 1))
      .reduce(_ + _))

  /** PQ with exact re-rank (the FAISS `IndexRefineFlat` composition): ADC
    * over the compressed codes produces a `shortlist`-sized candidate set
    * per query, then ONLY those candidates' true vectors are read back and
    * scored by exact cosine. This recovers most of the recall ADC loses to
    * quantization while keeping the corpus-wide scan on the codes.
    *
    * Scale shape: the candidate set (queries × shortlist ids) broadcasts
    * into a second pass over the vector table — the join filters to
    * candidates AT THE SCAN, so the refine stage moves only
    * |queries|·shortlist full vectors; at 100 TB with the vector table
    * partitioned/bucketed by id this is a point-lookup-shaped read, not a
    * second full scan.
    */
  def pqQueryRefined(
      index: PqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 100): DataFrame = {
    VectorExprs.register(queries.sparkSession)
    val cand = pqQuery(index, queries, idCol, vecCol, shortlist)
      .select("qid", "nid")
    refineExact(corpus, queries, cand, idCol, vecCol, k)
  }

  /** Exact cosine re-rank of a `(qid, nid)` candidate set: only the
    * candidates' true vectors are read back and scored. Both small sides
    * broadcast, so the vector table is scanned narrowly exactly once; at
    * 100 TB with the vector table bucketed by id this is a
    * point-lookup-shaped read, not a second full scan.
    */
  private def refineExact(
      corpus: DataFrame, queries: DataFrame, cand: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "qid", "qv")
    val corp = normalized(corpus, idCol, vecCol, "nid", "nv")
    // unit vectors → cosine is one dot
    val scored = corp.join(broadcast(cand), "nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.dot(col("qv"), col("nv"))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** PQ approximate top-k: [[buildPqIndex]] + [[pqQuery]] in one call;
    * amortize the build via the two-step API when serving repeated
    * batches.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      codesPerSub: Int = 16,
      seed: Long = 42L,
      trainRows: Long = 100000L): DataFrame =
    pqQuery(buildPqIndex(corpus, idCol, vecCol, m, codesPerSub, seed, trainRows),
      queries, idCol, vecCol, k)

  /** The full IVF-PQ composition (FAISS `IndexIVFPQ` shape): the corpus is
    * partitioned into IVF cells AND compressed to PQ codes, so a query
    * touches only its probed cells and scans codes, not vectors — the two
    * scale levers multiply (nprobe/numCells of the corpus × ~30× smaller
    * rows). Codes are encoded against the raw normalized vectors (FAISS's
    * `by_residual=false` mode): one shared codebook set stays exact to
    * [[pqQuery]]'s ADC semantics and keeps the encode narrow; per-cell
    * residual codebooks are a recall refinement, not a structural change.
    *
    * `codes(nid, cell, codes)` — persist partitioned by `cell`
    * ([[IvfPqIndex.save]]) and the probe join prunes to probed cells'
    * files, exactly like [[IvfIndex]].
    */
  final case class IvfPqIndex(
      centroids: DataFrame, codebooks: DataFrame, codes: DataFrame,
      numCells: Int, m: Int, codesPerSub: Int, dim: Int)

  object IvfPqIndex {
    def save(index: IvfPqIndex, path: String): Unit = {
      index.centroids.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/centroids")
      index.codebooks.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/codebooks")
      index.codes.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/codes")
      // m / codesPerSub / dim are recoverable from the codebook table; no
      // sidecar metadata file to drift
    }

    def load(spark: SparkSession, path: String): IvfPqIndex = {
      val centroids = spark.read.parquet(s"$path/centroids")
      val codebooks = spark.read.parquet(s"$path/codebooks")
      val codes = spark.read.parquet(s"$path/codes")
      val m = codebooks.agg(max("sub")).head().getInt(0) + 1
      val codesPerSub = codebooks.agg(max("code")).head().getInt(0) + 1
      val dim = codebooks.select(size(col("centroid")).as("d")).head()
        .getInt(0) * m
      IvfPqIndex(centroids, codebooks, codes,
        centroids.count().toInt, m, codesPerSub, dim)
    }
  }

  /** Build the IVF-PQ index: one normalization pass feeds both the coarse
    * (cell) quantizer and the per-subspace PQ fits; the encode carries the
    * cell assignment through, so the corpus is touched by exactly one wide
    * KMeans-assignment pipeline — no id re-join.
    */
  def buildIvfPqIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCells: Int = 16,
      m: Int = 8,
      codesPerSub: Int = 16,
      seed: Long = 42L,
      trainRows: Long = 100000L): IvfPqIndex = {
    VectorExprs.register(corpus.sparkSession)
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    val unit = normalized(corpus, idCol, vecCol, "nid", "nv")
    val ivf = buildIvfIndex(unit, "nid", "nv", numCells, seed, trainRows)
    val (codebooks, encoded) = pqFitEncode(ivf.bucketed, corpus.count(), dim,
      m, codesPerSub, seed, trainRows, carry = Seq("cell"))
    IvfPqIndex(ivf.centroids, codebooks, encoded, numCells, m, codesPerSub,
      dim)
  }

  /** Query the IVF-PQ index: per-query ADC tables against the broadcast
    * codebooks, nprobe cell selection as a narrow literal-centroid
    * projection, then an equi-join on `cell` scans ONLY probed cells'
    * codes with the unrolled codegen ADC sum; rank-limited top-k as
    * everywhere else. Ranking is by approximate distance — compose with
    * [[ivfPqQueryRefined]] for the exact re-rank.
    */
  def ivfPqQuery(
      index: IvfPqIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    VectorExprs.register(queries.sparkSession)
    val q = normalized(queries, idCol, vecCol, "qid", "qv")
    val dtabs = adcTables(q, index.codebooks, index.m, index.codesPerSub,
      index.dim)
    val probes = probeCellsNarrow(q, index.centroids, nprobe)
      .select("qid", "cell")
      .join(dtabs, "qid")
    val scored = index.codes.join(broadcast(probes), "cell")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        adcScore(index.m, index.codesPerSub).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "adist")
  }

  /** IVF-PQ with exact re-rank (`IndexIVFPQ` + `IndexRefineFlat`): the ADC
    * shortlist from the probed cells, then only those candidates' true
    * vectors re-scored exactly.
    */
  def ivfPqQueryRefined(
      index: IvfPqIndex,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 100,
      nprobe: Int = 3): DataFrame = {
    val cand = ivfPqQuery(index, queries, idCol, vecCol, shortlist, nprobe)
      .select("qid", "nid")
    refineExact(corpus, queries, cand, idCol, vecCol, k)
  }

  /** The deterministic ±1/√outDim sign matrix for [[signProject]]:
    * entry (j, k) from the md5 of `salt|j|k` (first hex nibble < '8' →
    * +1). md5 so the matrix is reproducible in ANY engine; computed ONCE
    * driver-side — rows pay only the multiply-add.
    */
  def signProjectionMatrix(
      inDim: Int, outDim: Int, salt: String): Array[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(inDim, outDim) { (j, k) =>
      val h = mdt.digest(s"$salt|$j|$k".getBytes("UTF-8"))
      // first hex char < '8' ⇔ top bit of the first byte is 0
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** Sign random projection (Achlioptas/JL): compress `inDim`-dim
    * embeddings to `outDim` dims with a deterministic ±1 matrix, scaled
    * by 1/√outDim so inner products (and cosines, after the implied
    * norms) are preserved in expectation with O(1/√outDim) distortion —
    * the memory/bandwidth lever BEFORE the ANN index (768→64 dims is a
    * 12× smaller corpus for every downstream brute/LSH/IVF/PQ stage).
    *
    * Purely narrow: the matrix rides the plan as a literal, each row is
    * an `outDim × inDim` fused multiply-add, no shuffle, no fit step, no
    * state — re-running with the same salt reproduces the projection
    * bit-for-bit on any cluster shape (the fold order is fixed
    * ascending-j, so the doubles are deterministic too).
    */
  def signProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outDim: Int,
      salt: String = ""): DataFrame = {
    val inDim = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    val m = typedLit(signProjectionMatrix(inDim, outDim, salt))
    val scale = math.sqrt(outDim.toDouble)
    val proj = transform(sequence(lit(0), lit(outDim - 1)), k =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0.0),
        (acc, j) => acc +
          element_at(col(vecCol), j + 1).cast("double") *
            element_at(element_at(m, j + 1), k + 1)) / scale)
    df.select(col(idCol), proj.as("proj"))
  }
}
