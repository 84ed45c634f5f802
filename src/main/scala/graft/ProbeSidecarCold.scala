package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-probe scaling over file count (VERDICT r11 #2's done-criterion):
  * builds synthetic range-clustered tables of N files (N in args, default
  * 1000 and 10000), zone-map-indexes them, and measures the COLD probe —
  * wall time and rows collected to the driver — for a selective range.
  * With candidate-bounded collection the driver transfer stays flat as N
  * grows 10×; the distributed index scan grows with N but stays a single
  * tiny-column job. Usage: `ProbeSidecarCold [N ...]`.
  */
object ProbeSidecarCold {
  def main(args: Array[String]): Unit = {
    val (decideSizes, tableSizes) = args.toSeq.span(_ != "--tables") match {
      case (pre, post) if pre.headOption.contains("--decide") =>
        (pre.drop(1).map(_.toInt), post.drop(1).map(_.toInt))
      case _ => (Nil, args.map(_.toInt).toSeq)
    }
    val sizes = if (tableSizes.nonEmpty || decideSizes.nonEmpty) tableSizes
      else Seq(1000, 10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.model.{SidecarIndex, ZoneMapIndex}

    for (n <- sizes) {
      val dir = java.nio.file.Files.createTempDirectory(s"sidecar-cold-$n").toString
      // n files, file i spanning x in [100i, 100(i+1)) — tight spans, the
      // layout zone maps exist for; ~20 rows per file keeps the build fast
      spark.range(n.toLong * 20)
        .select(col("id"), (col("id") * 5).as("x"))
        .repartitionByRange(n, col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(dir)
      val t0 = System.nanoTime()
      ZoneMapIndex.build(spark, dir, Seq("x"))
      val buildS = (System.nanoTime() - t0) / 1e9
      val live = spark.read.parquet(dir).inputFiles.toSeq
      // the per-generation coverage manifest fetch is the ONE surviving
      // O(files) driver transfer (SidecarIndex.coverage — (col, file)
      // string pairs, cached per generation); time it separately so its
      // linear growth is named instead of folded into the probe
      val tc = System.nanoTime()
      val cov = SidecarIndex.coverage(
        spark, dir, ZoneMapIndex.IndexDirName, "col")
      val covS = (System.nanoTime() - tc) / 1e9
      val covRows = cov.valuesIterator.map(_.size.toLong).sum
      // a ~2-file range in the middle of the domain; the probe below
      // reuses the manifest fetched above (the steady-state shape — one
      // manifest per generation amortized over every probe)
      val mid = n.toLong * 100 / 2
      SidecarIndex.lastProbeCollected.set(-1L)
      val t1 = System.nanoTime()
      val p = ZoneMapIndex.pruneAll(spark, dir,
        Seq(("x", mid.toDouble, (mid + 150).toDouble)), live).head
      val coldS = (System.nanoTime() - t1) / 1e9
      val collected = SidecarIndex.lastProbeCollected.get
      val t2 = System.nanoTime()
      val p2 = ZoneMapIndex.pruneAll(spark, dir,
        Seq(("x", mid.toDouble, (mid + 150).toDouble)), live).head
      val warmS = (System.nanoTime() - t2) / 1e9
      require(p2.candidates.toSet == p.candidates.toSet)
      println(f"[sidecar-cold] files=$n%6d build=$buildS%6.1fs " +
        f"manifest=$covS%6.3fs/$covRows%6d rows " +
        f"cold=$coldS%6.3fs warm=$warmS%6.3fs collected=$collected%4d " +
        f"candidates=${p.candidates.size}%4d pruned=${p.pruned}%6d")
    }
    // ---- decide-step scaling (VERDICT r14 #2): the decide step reads
    // only the sidecar and the live list — never the data files — so a
    // SYNTHETIC sidecar isolates exactly the cost under test at file
    // counts where physically materializing 10⁶ parquet files would
    // measure the filesystem, not the operator. Per size: one warm
    // driver-path probe (Seq decide — the measured ~6 µs/file) vs one
    // warm Df-path probe (SidecarIndex.decideDf — distributed joins,
    // candidate-bounded collect, liveDf held persisted the way a
    // streaming sink holds its hot listing).
    for (n <- decideSizes) {
      import graft.model.{SidecarIndex, ZoneMapIndex}
      val dir = java.nio.file.Files.createTempDirectory(s"sidecar-decide-$n").toString
      val idxRows = spark.range(n.toLong).select(
        concat(lit(s"$dir/part-"), format_string("%08d", col("id")),
          lit(".parquet")).as("file"),
        lit("x").as("col"),
        (col("id") * 100).cast("double").as("lo"),
        (col("id") * 100 + 95).cast("double").as("hi"))
      idxRows.write.mode("overwrite").parquet(
        SidecarIndex.indexPath(dir, ZoneMapIndex.IndexDirName).toString)
      val live: Seq[String] = (0L until n.toLong)
        .map(i => f"$dir%s/part-$i%08d.parquet")
      val liveDf = spark.range(n.toLong).select(
        concat(lit(s"$dir/part-"), format_string("%08d", col("id")),
          lit(".parquet")).as("file"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      liveDf.count()
      val mid = n.toLong * 100 / 2
      val range = Seq(("x", mid.toDouble, (mid + 150).toDouble))
      // warm both paths: index scan + match cache + manifest populate
      val seqWarm = ZoneMapIndex.pruneAll(spark, dir, range, live).head
      val dfWarm = ZoneMapIndex.pruneAllAlignedDf(spark, dir, range, liveDf)
        .head.get
      require(seqWarm.candidates.map(SidecarIndex.norm).toSet ==
        dfWarm.candidates.map(SidecarIndex.norm).toSet &&
        seqWarm.pruned == dfWarm.pruned &&
        seqWarm.unindexed == dfWarm.unindexed,
        s"decide paths disagree at n=$n: $seqWarm vs $dfWarm")
      val t1 = System.nanoTime()
      val a = ZoneMapIndex.pruneAll(spark, dir, range, live).head
      val seqS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val b = ZoneMapIndex.pruneAllAlignedDf(spark, dir, range, liveDf).head.get
      val dfS = (System.nanoTime() - t2) / 1e9
      println(f"[sidecar-decide] files=$n%8d warm_seq=$seqS%7.3fs " +
        f"warm_df=$dfS%7.3fs candidates=${b.candidates.size}%3d " +
        f"pruned=${b.pruned}%8d (seq candidates=${a.candidates.size})")
      liveDf.unpersist()
      ()
    }
    spark.stop()
  }
}
