package graft.operators

import graft.expressions.VectorExprs
import graft.functions.{Rounding, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  // LRU cache of spread-gate verdicts, keyed by (session identity,
  // canonicalized corpus plan). The probe below is driver-side and
  // constant-cost, but not free — a plan walk, a file listing, possibly an
  // `.rdd` planning pass — and query registries/benches re-ask it for the
  // SAME corpus on every invocation. Canonicalized-plan equality is exactly
  // "same source, same partitioning inputs"; the session is part of the key
  // because the file-split confs (maxPartitionBytes) that shape the verdict
  // are per-session. Bounded + access-ordered: an evicted (or, with files
  // appended to a directory mid-session, stale) entry only re-runs the
  // probe / costs an unnecessary-but-correct spread.
  private val spreadVerdicts = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Int, LogicalPlan), java.lang.Boolean](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, LogicalPlan), java.lang.Boolean]): Boolean =
        size() > 256
    })

  /** Should this corpus projection be hash-spread to the session's
    * parallelism before scoring? Cached per (session, plan); the decision
    * logic itself is documented at the call site in [[bruteTopK]].
    */
  private def needsSpread(
      spark: SparkSession, sel: DataFrame, parallelism: Int): Boolean = {
    val key = (System.identityHashCode(spark),
      sel.queryExecution.optimizedPlan.canonicalized)
    val cached = spreadVerdicts.get(key)
    if (cached != null) return cached.booleanValue()
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Join, RepartitionOperation, Sort, Window => LWindow}
    val derived = sel.queryExecution.optimizedPlan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Distinct | _: Sort |
        _: LWindow | _: RepartitionOperation) => p
    }.isDefined
    val manyFiles =
      try sel.inputFiles.length >= parallelism catch { case _: Exception => true }
    val verdict =
      !derived && !manyFiles && sel.rdd.getNumPartitions < parallelism
    spreadVerdicts.put(key, java.lang.Boolean.valueOf(verdict))
    verdict
  }

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
    // centroid table → driver literal: numCells × dim doubles (a few KB).
    // Distance uses ivfQuery's formula (−2·q·c + c·c, the squared-L2 rank
    // with the constant |q|² dropped); c·c is precomputed driver-side.
    // Ties break on cell id, matching ivfQuery's Window orderBy(dist, cell).
    val cents = index.centroids
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val probeCells = math.min(nprobe, cents.length)
    val candStructs = cents.map { case (cell, c) =>
      struct(
        (VectorExprs.dot(col("qv"), lit(c)) * lit(-2.0) +
          lit(c.map(x => x * x).sum)).as("dist"),
        lit(cell).as("cell"))
    }
    val probed = left
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", VectorExprs.norm(col("qv")))
      .select(col("qid"), col("qv"), col("qn"),
        explode(slice(array_sort(array(candStructs.toSeq: _*)), 1, probeCells))
          .as("p"))
      .select(col("qid"), col("qv"), col("qn"), col("p.cell").as("cell"))
    val bucketed = index.bucketed
      .withColumn("nn", VectorExprs.norm(col("nv")))
    val scored = probed.join(bucketed, "cell")
    val filtered =
      if (excludeSelf) scored.where(col("qid") =!= col("nid")) else scored
    val rw = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    filtered
      .select(col("qid"), col("nid"),
        Rounding.r4(VectorExprs.cosineFromNorms(
          col("qv"), col("nv"), col("qn"), col("nn"))).as("cosine"))
      .withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
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
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    val unit = normalized(corpus, idCol, vecCol, "nid", "nv")
    val withSubs = (0 until m).foldLeft(unit) { (df, s) =>
      df.withColumn(s"fv$s",
        array_to_vector(slice(col("nv"), s * dsub + 1, dsub)))
    }
    // count the RAW corpus (parquet-footer cheap — no filter/projection
    // in the way) to bound the sample fraction; the handful of zero-norm
    // rows normalized() drops only make the sample marginally smaller
    val n = corpus.count()
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
      .select(col("nid"),
        array((0 until m).map(s => col(s"code$s")): _*).as("codes"))
    val spark = corpus.sparkSession
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
    PqIndex(codebooks, encoded, m, codesPerSub, dim)
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
    val dsub = index.dim / index.m
    val q = normalized(queries, idCol, vecCol, "qid", "qv")
    // ‖s − c‖² = s·s − 2 s·c + c·c, all three via the codegen dot
    val qtab = q.crossJoin(broadcast(index.codebooks))
      .select(col("qid"), col("sub"), col("code"),
        (VectorExprs.dot(
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)))
          - VectorExprs.dot(
              slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
              col("centroid")) * 2.0
          + VectorExprs.dot(col("centroid"), col("centroid"))).as("d"))
    val dtabs = qtab.groupBy("qid").agg(
      transform(
        array_sort(collect_list(struct(
          (col("sub") * index.codesPerSub + col("code")).as("slot"),
          col("d").as("d")))),
        e => e.getField("d")).as("dtab"))
    val scored = index.codes.crossJoin(broadcast(dtabs))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Rounding.r4((0 until index.m)
          .map(s => element_at(col("dtab"),
            col("codes").getItem(s) + lit(s * index.codesPerSub) + 1))
          .reduce(_ + _)).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "adist")
  }

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
    val q = normalized(queries, idCol, vecCol, "qid", "qv")
    val corp = normalized(corpus, idCol, vecCol, "nid", "nv")
    // unit vectors → cosine is one dot; both small sides broadcast so the
    // vector table is scanned narrowly exactly once
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
}
