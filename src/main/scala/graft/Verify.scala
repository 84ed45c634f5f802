package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional trailing query names: dump only those (local spot-checks;
    // the driver always calls with exactly two args = full dump)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // sized to the registry's ~1,400 codegen units (see Bench.scala) —
      // the 100-entry default recompiles the working set every pass
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // main.go:125-126 parity: announce what build is producing the dump
    System.err.println(BuildInfo.describe)
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failed += name
        // a reused outDir must NOT keep the previous run's dump for a now-
        // failing query — the compare would read stale data and report the
        // regression as green
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // deletion alone would let the failure vanish from a dump-enumerating
    // compare ("green by omission") — record it machine-readably too.
    // A FILTERED run (non-empty `only`) must MERGE with the previous run's
    // record, not clobber it: keep prior failures for queries not re-run,
    // drop the ones just re-run (they either passed now or re-appear in
    // `failed`). Query names are plain identifiers, so the simple-quoted
    // regex below parses everything this file ever writes.
    val failedPath = Paths.get(s"$outDir/_failed.json")
    val prior: Set[String] =
      if (only.nonEmpty && Files.exists(failedPath))
        "\"([^\"]+)\"".r.findAllMatchIn(Files.readString(failedPath))
          .map(_.group(1)).toSet
      else Set.empty
    val allFailed = ((prior -- only) ++ failed).toSeq.sorted
    Files.writeString(failedPath,
      allFailed.map("\"" + _ + "\"").mkString("[", ",", "]"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
