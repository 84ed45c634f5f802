package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{GraftFunctions, NgramBloomAgg, NgramBloomExprs, NgramHash}

/** A file-skipping n-gram bloom index for substring search over `log` —
  * the Spark-lake analogue of ClickHouse's `ngrambf_v1` MergeTree skip
  * index (the upgrade klogs deployments bolt onto the reference's table,
  * /root/reference/schema.sql:15-19, when `log LIKE '%needle%'` at scale
  * starts reading every granule).
  *
  * Shape: one sidecar row per data file — `(file, n, bloom)` where the
  * bloom holds every byte n-gram of every log line in that file — stored
  * as parquet under `_graft_ngram_index/` INSIDE the table directory
  * (underscore-prefixed, so Spark's file listing never surfaces it to
  * table reads). A search hashes the needle's n-grams and keeps only the
  * files whose bloom might contain ALL of them, then re-applies the exact
  * `contains` filter — bloom false positives cost I/O, never correctness.
  *
  * Scale contract (the reason this exists):
  *   - The index build is one partial-combined aggregate keyed by
  *     `input_file_name()`: tasks gram their own rows locally and the
  *     shuffle carries one bloom per file, never row data. Incremental by
  *     construction — only files absent from the index are read.
  *   - The probe scans the INDEX (O(files) rows of ~ndv/8 bytes), with the
  *     blooms evaluated DISTRIBUTED ([[NgramBloomExprs.bloomContainsAll]]);
  *     only matching file PATHS reach the driver, and a path list is
  *     already driver-scale state (Spark's own FileIndex holds one).
  *   - Staleness is safe, not corrupting: a live file missing from the
  *     index (fresh ingest, compaction rewrite) is always scanned; an
  *     index row whose file is gone (TTL drop, compaction) is ignored.
  *     Re-running [[build]] converges the index; [[vacuum]] drops dead rows.
  */
object NgramIndex {
  val IndexDirName = "_graft_ngram_index"

  /** Index sizing, bundled so callers that thread it through (the
    * streaming sink, maintenance jobs) cannot mix one build's `n` with
    * another's bloom dimensions.
    */
  case class Config(n: Int = 4, expectedNdv: Long = 1L << 20, fpp: Double = 0.02)

  /** Pruning decision for one search: which live data files must be read,
    * and why — the shared sidecar-index decision shape
    * ([[SidecarIndex.Pruning]]).
    */
  type Pruning = SidecarIndex.Pruning
  val Pruning = SidecarIndex.Pruning

  private def indexPath(tablePath: String) =
    SidecarIndex.indexPath(tablePath, IndexDirName)

  private def norm(p: String): String = SidecarIndex.norm(p)

  private def indexExists(spark: SparkSession, tablePath: String): Boolean =
    SidecarIndex.exists(spark, tablePath, IndexDirName)

  private def readIndex(spark: SparkSession, tablePath: String): DataFrame =
    SidecarIndex.readCached(spark, tablePath, IndexDirName)

  /** Index every live data file not yet indexed; returns the newly indexed
    * files. `rebuild = true` starts from scratch (also the way to change
    * `n`/sizing, and implicitly vacuums dead rows).
    *
    * `expectedNdv` sizes each per-file bloom for the file's DISTINCT
    * n-gram count: ~0.7·ndv·|ln fpp| bits, so the 1M/2% default is
    * ~700 KB per data file — sidecar overhead well under 0.1% of a
    * target-size compacted file, the ngrambf_v1 trade.
    *
    * `partitions` scopes discovery to those `date=` partition DIRS (full
    * paths): both the live-file listing and the already-indexed probe
    * touch only the named days, so a caller that knows what it just wrote
    * (the streaming sink indexes per micro-batch) pays O(hot partitions),
    * not O(table), per invocation. Empty = whole table.
    */
  def build(
      spark: SparkSession,
      tablePath: String,
      n: Int = 4,
      expectedNdv: Long = 1L << 20,
      fpp: Double = 0.02,
      rebuild: Boolean = false,
      partitions: Seq[String] = Nil): Seq[String] = {
    GraftFunctions.registerAll(spark)
    require(!rebuild || partitions.isEmpty,
      "rebuild with a partition scope would overwrite the whole sidecar " +
        "with only the scoped rows, wiping index coverage everywhere else; " +
        "rebuild the full table, or use vacuum + incremental build")
    val live: Seq[String] =
      if (partitions.isEmpty) LogSchema.readLogs(spark, tablePath).inputFiles.toSeq
      else SidecarIndex.listFiles(spark.sparkContext.hadoopConfiguration, partitions)
    // distributed coverage probe ([[SidecarIndex.missingFiles]]): only
    // the files that actually need indexing come back to the driver —
    // the index's own rows (file paths at 10⁵–10⁶-file scale) never do
    val todo: Seq[String] =
      if (rebuild || !indexExists(spark, tablePath)) live
      else SidecarIndex.missingFiles(spark,
        SidecarIndex.scopeToPartitions(
          readIndex(spark, tablePath).select("file"), partitions), live)
    if (todo.isEmpty) return Seq.empty
    val rows = spark.read
      .option("basePath", tablePath)
      .parquet(todo: _*)
      .select(input_file_name().as("file"), col("log"))
      .groupBy("file")
      .agg(NgramBloomAgg.ngramBloom(col("log"), n, expectedNdv, fpp).as("bloom"))
      .withColumn("n", lit(n))
    rows.write.mode(if (rebuild) "overwrite" else "append")
      .parquet(indexPath(tablePath).toString)
    todo
  }

  /** Post-maintenance convergence in one call: index whatever compaction /
    * retention / ingest left unindexed, then drop rows for files they
    * removed. Returns (newly indexed files, dead rows vacuumed). Safe to
    * run at any time — both halves are idempotent no-ops on a converged
    * index.
    */
  def maintain(
      spark: SparkSession,
      tablePath: String,
      cfg: Config = Config()): (Seq[String], Long) = {
    val indexed = build(spark, tablePath, cfg.n, cfg.expectedNdv, cfg.fpp)
    val dead = vacuum(spark, tablePath)
    (indexed, dead)
  }

  /** Drop index rows whose data file no longer exists (post-compaction /
    * post-TTL hygiene; correctness never needs it — dead rows are ignored
    * by [[prune]] — but they cost probe I/O forever).
    */
  def vacuum(spark: SparkSession, tablePath: String): Long =
    SidecarIndex.vacuum(spark, tablePath, IndexDirName,
      LogSchema.readLogs(spark, tablePath).inputFiles.toSeq)

  /** The pruning decision for `needle`, or None when the index cannot help
    * (missing, or the needle is shorter than the gram width — no gram of
    * the needle exists to demand of a file).
    */
  def prune(
      spark: SparkSession,
      tablePath: String,
      needle: String,
      n: Int = 4): Option[Pruning] =
    // the live listing is BY-NAME into pruneAll: when the index is missing
    // or the needle too short, no table file listing is ever paid
    pruneAll(spark, tablePath, Seq(needle),
      LogSchema.readLogs(spark, tablePath).inputFiles.toSeq, n).headOption

  /** [[prune]] for SEVERAL needles in ONE index pass against a live file
    * list the caller already holds. Every needle's gram hashes become one
    * bloom-verdict column of a single index scan, so a k-needle query pays
    * one Spark job and one cached-index decode instead of k — the probe
    * constant that made the indexed front-end slower than the raw scan at
    * small SF. Needles too short to produce a gram are skipped (the
    * returned Seq covers only probe-able needles — each entry is an
    * independently sound prune, so callers intersect whatever comes back).
    * Blooms still never leave the executors, and the verdicts are
    * evaluated DISTRIBUTED: the fused scan filters to rows some needle
    * could not rule out, so the collect is bounded by the CANDIDATE
    * count, not the file count (the coverage manifest — (width, file)
    * string pairs, one collect per index generation — reconciles
    * unindexed files; see [[SidecarIndex.coverage]]). `live` is by-name:
    * no table listing is paid when the index is missing or no needle is
    * probe-able.
    */
  def pruneAll(
      spark: SparkSession,
      tablePath: String,
      needles: Seq[String],
      live: => Seq[String],
      n: Int = 4): Seq[Pruning] = {
    GraftFunctions.registerAll(spark)
    if (needles.isEmpty || !indexExists(spark, tablePath)) return Nil
    val keyed: Seq[(String, Array[Long])] = needles
      .map(nd => (nd, NgramHash.needleHashes(nd, n)))
      .filter(_._2.nonEmpty)
    if (keyed.isEmpty) return Nil
    // probe identity = gram width + the needle's gram hashes (what the
    // scan actually evaluates), so equal-hash probes share a cache row
    val byKey: Map[String, Array[Long]] =
      keyed.map { case (_, hs) => s"n$n:${hs.mkString(",")}" -> hs }.toMap
    val probeKeys = keyed.map { case (_, hs) => s"n$n:${hs.mkString(",")}" }
    val matches = SidecarIndex.probeCached(
        spark, tablePath, IndexDirName, probeKeys) { missing =>
      val cols = missing.zipWithIndex.map { case (k, i) =>
        NgramBloomExprs.bloomContainsAll(col("bloom"), byKey(k)).as(s"ok$i")
      }
      val anyOk = missing.indices.map(i => col(s"ok$i")).reduce(_ or _)
      val rows = readIndex(spark, tablePath).where(col("n") === lit(n))
        .select(col("file") +: cols: _*)
        .where(anyOk) // all-needles-reject rows never reach the driver
        .collect()
      SidecarIndex.lastProbeCollected.set(rows.length.toLong)
      missing.zipWithIndex.map { case (k, i) =>
        k -> rows.collect {
          case r if r.getBoolean(i + 1) => norm(r.getString(0))
        }.toSet
      }.toMap
    }
    val covered = SidecarIndex
      .coverage(spark, tablePath, IndexDirName, "n")
      .getOrElse(n.toString, Set.empty)
    val liveList = live
    // the computeMissing above answers every key, so .get never misses
    probeKeys.map(k =>
      SidecarIndex.decide(matches(k).getOrElse(Set.empty), covered, liveList))
  }

  /** Substring search over the table's `log` column, skip-reading via the
    * index when it can prove files irrelevant. Exactly equivalent to
    * `readLogs(...).where($"log".contains(needle))` for every needle and
    * every index state — the bloom only ever shrinks the file list, and
    * the exact filter is re-applied on what remains.
    */
  def searchLogs(
      spark: SparkSession,
      tablePath: String,
      needle: String,
      n: Int = 4): DataFrame = {
    val logs = LogSchema.readLogs(spark, tablePath)
    val full = logs.where(col("log").contains(needle))
    prune(spark, tablePath, needle, n) match {
      case Some(p) if p.pruned > 0 =>
        if (p.candidates.isEmpty) full.limit(0)
        else spark.read
          // reuse the already-resolved table schema: skips one
          // schema-inference job per candidate relation (r15, guide §5 —
          // readLogs is a bare parquet read, so the schemas coincide)
          .schema(logs.schema)
          .option("basePath", tablePath) // keep the `date` partition column
          .parquet(p.candidates: _*)
          .where(col("log").contains(needle))
      case _ => full
    }
  }

  /** The query front-end through the skip index: any needle the parsed
    * query provably requires of `log` ([[graft.query.LogQuery.
    * requiredLogNeedles]]) prunes files; several needles are ALL required,
    * so their candidate sets intersect (unindexed files sit in every set
    * and survive — the staleness contract carries over). The full compiled
    * predicate then runs over the surviving files, so the index never
    * changes an answer, only the bytes read to produce it.
    */
  def searchLogsQuery(
      spark: SparkSession,
      tablePath: String,
      query: String,
      n: Int = 4): DataFrame = {
    import graft.query.LogQuery
    val logs = LogSchema.readLogs(spark, tablePath)
    val full = LogQuery.filter(logs, query)
    // ONE combined probe across both sidecar indexes: every provable
    // log needle consults the n-gram blooms, every provable numeric
    // range on a direct column consults the zone map, and the file list
    // read is the INTERSECTION of all candidate sets — a query like
    // `log = 'x' _and_ num_event_value < 3` skips a file when EITHER
    // index can rule it out. Each prune is individually sound, so the
    // intersection is too. The probes are FUSED: the table is listed
    // once, all needles ride one ngram-index scan ([[pruneAll]]), all
    // ranges one zone-map scan — two Spark jobs total, regardless of
    // predicate count.
    val needles = LogQuery.requiredLogNeedles(query)
    val ranges =
      LogQuery.requiredNumericRanges(query, LogQuery.directColumns(logs))
    if (needles.isEmpty && ranges.isEmpty) return full
    val live = logs.inputFiles.toSeq
    val prunings = pruneAll(spark, tablePath, needles, live, n) ++
      ZoneMapIndex.pruneAll(spark, tablePath, ranges, live)
    if (prunings.isEmpty) return full
    val cand = prunings.map(_.candidates.toSet).reduce(_ intersect _)
    if (prunings.forall(_.pruned == 0) && cand.nonEmpty) full
    else if (cand.isEmpty) full.limit(0)
    else LogQuery.filter(
      // schema reuse: same rationale as [[searchLogs]] — one fewer
      // schema-inference job on the candidate relation
      spark.read.schema(logs.schema).option("basePath", tablePath)
        .parquet(cand.toSeq: _*),
      query)
  }
}
