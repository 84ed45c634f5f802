package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: split a warm query's wall time into build (DataFrame
  * construction + analysis), plan (optimization + physical planning),
  * and execute (the count action) — where does the tail's per-query
  * floor actually go?
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("agg_entropy", "agg_count", "win_topk_per_group",
        "fn_sequence_count", "text_analyze", "agg_grouping_sets",
        "set_intersect_except", "agg_minhash_group", "query_language_agg",
        "stream_session_window", "dedup_segment", "agg_histogram",
        "win_sessionize", "text_tfidf", "query_language_series")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("PROBE_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Queries.warmFixtures(spark, dir) catch { case _: Throwable => }
    // SWEEP mode: run full bench-shaped passes over every registry query
    // and report wall + whole-stage-codegen compile totals per pass — the
    // compiled-class cache (default 100 entries) is suspected to thrash
    // across 153 queries, recompiling "warm" code every pass.
    if (sys.env.get("PROBE_SWEEP").contains("1")) {
      import org.apache.spark.metrics.source.CodegenMetrics
      val all = Queries.registry.keys.toSeq.sorted
      (1 to 3).foreach { pass =>
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        all.foreach { n =>
          try Queries.registry(n).build(spark, dir).count()
          catch { case _: Throwable => }
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val compiles = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0
        println(f"[sweep] pass=$pass wall=$wall%.2fs codegenCompiles=$compiles")
      }
      spark.stop(); return
    }
    names.foreach { n =>
      val fn = Queries.registry(n).build
      try fn(spark, dir).count() catch { case _: Throwable => } // warm
      var (tb, tp, te) = (0.0, 0.0, 0.0)
      val reps = 3
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.analyzed // force analysis
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // optimize + physical plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        tb += (t1 - t0) / 1e6; tp += (t2 - t1) / 1e6; te += (t3 - t2) / 1e6
      }
      println(f"[phases] $n%-28s build=${tb / reps}%7.1fms plan=${tp / reps}%7.1fms exec=${te / reps}%7.1fms")
    }
    spark.stop()
  }
}
