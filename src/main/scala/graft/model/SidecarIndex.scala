package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared skeleton of a file-level skip index stored as a parquet
  * sidecar inside the table directory (underscore-prefixed, so Spark's
  * listing never surfaces it to table reads): path/identity conventions,
  * existence/read, and the stage-then-swap vacuum. [[NgramIndex]]
  * (ngrambf-style bloom) and [[ZoneMapIndex]] (minmax) are the two
  * instances; a fix to the swap or normalization logic lands in both by
  * construction.
  */
private[model] object SidecarIndex {

  /** Which live data files a probe must read, and why: `candidates` =
    * verdict-passing indexed files + unindexed files; `pruned` = live
    * files the index proved cannot match.
    */
  case class Pruning(candidates: Seq[String], pruned: Long, unindexed: Long)

  def indexPath(tablePath: String, dirName: String) =
    new org.apache.hadoop.fs.Path(tablePath, dirName)

  /** Scheme-insensitive file identity: `input_file_name()`, `inputFiles`
    * and Hadoop listings render the same local file as `file:///p`,
    * `file:/p` or `/p` depending on the producer.
    */
  def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def exists(spark: SparkSession, tablePath: String, dirName: String): Boolean = {
    val p = indexPath(tablePath, dirName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  def read(spark: SparkSession, tablePath: String, dirName: String): DataFrame =
    spark.read.parquet(indexPath(tablePath, dirName).toString)

  /** Data files directly under the given partition DIRS (full paths) —
    * the scoped discovery both index builds use so a caller that knows
    * what it just wrote (the streaming sink, per micro-batch) pays
    * O(hot partitions), not O(table), per invocation.
    */
  def listFiles(
      conf: org.apache.hadoop.conf.Configuration,
      dirs: Seq[String]): Seq[String] =
    dirs.flatMap { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.collect {
        case f if f.isFile && !f.getPath.getName.startsWith(".") &&
          !f.getPath.getName.startsWith("_") => f.getPath.toString
      }
    }

  /** Restrict an index frame (with a `file` column) to rows under the
    * named partition dirs: a parquet string predicate per dir keeps the
    * collected set proportional to the partitions being probed.
    */
  def scopeToPartitions(idx: DataFrame, partitions: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (partitions.isEmpty) idx
    else partitions
      .map(d => "/" + new org.apache.hadoop.fs.Path(d).getName + "/")
      .map(seg => idx.where(col("file").contains(seg)))
      .reduce(_ unionAll _)
  }

  /** Already-indexed file paths, optionally scoped to partition dirs. */
  def indexedFiles(
      idx: DataFrame, partitions: Seq[String]): Set[String] =
    scopeToPartitions(idx.select("file").distinct(), partitions)
      .collect().map(r => norm(r.getString(0))).toSet

  /** Combine a per-file verdict map with the live file list into the
    * pruning decision — the staleness contract both indexes share: a live
    * file the index has never seen is always a candidate; an index row
    * whose file is gone is simply ignored.
    */
  def decide(verdicts: Map[String, Boolean], live: Seq[String]): Pruning = {
    val (known, unindexed) = live.partition(f => verdicts.contains(norm(f)))
    val candidates = known.filter(f => verdicts(norm(f))) ++ unindexed
    Pruning(candidates, pruned = (live.size - candidates.size).toLong,
      unindexed = unindexed.size.toLong)
  }

  /** Drop index rows whose data file no longer exists (post-compaction /
    * post-TTL hygiene; correctness never needs it — dead rows are ignored
    * by the pruning decision — but they cost probe I/O forever). `file`
    * must be the index schema's file-path column. Stage-then-swap so a
    * crash mid-vacuum leaves a usable index; the swap steps are checked
    * and throw rather than silently leaving a half state.
    */
  def vacuum(
      spark: SparkSession,
      tablePath: String,
      dirName: String,
      liveFiles: => Seq[String]): Long = {
    if (!exists(spark, tablePath, dirName)) return 0L
    val liveSet = liveFiles.map(norm).toSet
    val idx = read(spark, tablePath, dirName)
    val all = idx.collect()
    val keep = all.filter(r => liveSet(norm(r.getString(r.fieldIndex("file")))))
    val dead = all.length - keep.length
    if (dead > 0) {
      val kept = spark.createDataFrame(
        java.util.Arrays.asList(keep: _*), idx.schema)
      val ip = indexPath(tablePath, dirName)
      val staged = new org.apache.hadoop.fs.Path(tablePath, "." + dirName + ".vacuum")
      kept.coalesce(1).write.mode("overwrite").parquet(staged.toString)
      val fs = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.delete(ip, true), s"vacuum could not delete $ip")
      require(fs.rename(staged, ip), s"vacuum could not publish $staged -> $ip")
    }
    dead.toLong
  }
}
