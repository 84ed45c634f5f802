package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The log-event data model: a fixed metadata "spine" plus two dynamic
  * typed map columns that absorb any flattened record shape.
  *
  * Mirrors the reference storage schema (/root/reference/schema.sql:3-19 —
  * `timestamp DateTime64(3)`, six `LowCardinality(String)` metadata columns,
  * `fields_string Map(String,String)`, `fields_number Map(String,Float64)`,
  * raw `log String`) re-expressed for Spark/Parquet:
  *   - `DateTime64(3)` → `TimestampType` (µs precision; ms at ingest),
  *   - `LowCardinality` → parquet dictionary encoding (automatic),
  *   - date partitioning + in-partition sort key replaces the MergeTree
  *     `PARTITION BY toDate(timestamp)` / `ORDER BY` physical design
  *     (/root/reference/schema.sql:17-18) so row-group min/max stats give
  *     the same data-skipping on metadata predicates.
  */
object LogSchema {

  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("cluster", StringType),
    StructField("namespace", StringType),
    StructField("app", StringType),
    StructField("pod_name", StringType),
    StructField("container_name", StringType),
    StructField("host", StringType),
    StructField("fields_string", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("fields_number", MapType(StringType, DoubleType, valueContainsNull = false)),
    StructField("log", StringType),
  ))

  /** The reference sort key (/root/reference/schema.sql:18). */
  val sortKey: Seq[String] =
    Seq("cluster", "namespace", "app", "pod_name", "container_name", "host", "timestamp")

  val metadataColumns: Seq[String] =
    Seq("cluster", "namespace", "app", "pod_name", "container_name", "host")

  /** Drop null-valued entries, mirroring nil elision at ingest
    * (/root/reference/main.go:269-270,312: nil fields are never stored, so
    * key-absence *means* "field not set").
    */
  def elideNulls(m: Column): Column = map_filter(m, (_, v) => v.isNotNull)

  /** Deterministic log-shaped view over the shared `events` table, used by
    * the map/metadata query operators and mirrored 1:1 by their DuckDB
    * oracle SQL. `id` (= event_id) is carried for deterministic ordering.
    */
  def logsFromEvents(events: DataFrame): DataFrame = {
    events.select(
      col("event_id").as("id"),
      col("ts").as("timestamp"),
      concat(lit("c"), col("user_id") % 2).as("cluster"),
      col("event_type").as("namespace"),
      concat(lit("app-"), col("user_id") % 10).as("app"),
      concat(lit("pod-"), col("user_id")).as("pod_name"),
      lit("main").as("container_name"),
      concat(lit("host-"), col("user_id") % 5).as("host"),
      elideNulls(map(
        lit("event.type"), col("event_type"),
        lit("flag.err"), when(col("event_type") === "error", lit("y")),
      )).as("fields_string"),
      elideNulls(map(
        lit("event.value"), col("value"),
        lit("props.k"), get_json_object(col("props"), "$.k").try_cast(DoubleType),
      )).as("fields_number"),
      concat_ws(" ", col("event_type"), col("props")).as("log"),
    )
  }

  /** Materialize promoted columns from map keys before writing — the Spark
    * form of the reference's `ADD COLUMN … DEFAULT fields_string[k]` +
    * `MATERIALIZE COLUMN` (README.md:68-84). Queries keep using the map
    * subscript; [[graft.plans.PromoteMapKeys]] rewrites them to these
    * columns so predicates push down to the parquet scan.
    */
  def withPromotedColumns(
      df: DataFrame,
      stringKeys: Seq[String] = Nil,
      numberKeys: Seq[String] = Nil): DataFrame = {
    // Each promoted column carries (source map, exact key) as column
    // metadata — the rule resolves by that metadata, never by name, so two
    // keys sanitizing to the same identifier (`a.b` / `a_b`) stay distinct.
    // The name itself only needs uniqueness; on a sanitization collision the
    // later key gets a deterministic hash suffix.
    def add(d: DataFrame, mapCol: String, k: String): DataFrame = {
      val base = graft.plans.PromoteMapKeys.promotedName(k)
      val name =
        if (!d.columns.contains(base)) base
        else base + "_" + java.lang.Integer.toHexString(k.hashCode)
      val md = new MetadataBuilder()
        .putString(graft.plans.PromoteMapKeys.MetaSourceMap, mapCol)
        .putString(graft.plans.PromoteMapKeys.MetaSourceKey, k)
        .build()
      d.select(col("*"), try_element_at(col(mapCol), lit(k)).as(name, md))
    }
    val s = stringKeys.foldLeft(df)((d, k) => add(d, "fields_string", k))
    numberKeys.foldLeft(s)((d, k) => add(d, "fields_number", k))
  }

  /** Physical write layout: daily partitions, reference sort key within each
    * partition, zstd — the Spark equivalent of schema.sql:17-19. Filters on
    * `date` prune directories; filters on the sort-key columns skip row
    * groups via parquet min/max stats.
    */
  def writePartitioned(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    // Repartition by date PLUS the sort-key prefix: hashing on date alone
    // would serialize each day into a single task (fatal when one day is
    // the whole ingest volume); including the metadata prefix spreads a day
    // across the shuffle while keeping co-located, sortable runs per file.
    // The sort LEADS with the partition column: the dynamic-partition
    // writer requires output ordered by its partition columns and would
    // otherwise insert its own sort by `date` alone on top of this one —
    // doubling the sort work and (Spark's sort is not guaranteed stable
    // across spills) destroying the sort-key clustering the row-group
    // skipping design depends on.
    // Bloom filters on the high-cardinality spine columns: the sort key
    // leads with cluster/namespace/app, so within a row group pod_name and
    // host min/max ranges are wide and stats-based skipping is useless for
    // the canonical "logs for pod X" point predicate. A per-row-group
    // bloom filter answers "definitely absent" for ~1 byte/ndv — the
    // parquet analogue of a MergeTree bloom_filter skip index. (ndv is a
    // per-ROW-GROUP estimate, not table-wide.)
    val bloomCols = Seq("pod_name", "host")
    val w0 = df.withColumn("date", to_date(col("timestamp")))
      .repartition(col("date"), col("cluster"), col("namespace"), col("app"))
      .sortWithinPartitions(("date" +: sortKey).map(col): _*)
      .write
      .mode(mode)
      .option("compression", "zstd")
    bloomCols.foldLeft(w0) { (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", "100000")
      }
      .partitionBy("date")
      .parquet(path)
  }

  def readLogs(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Retention: drop partitions older than `days` (the TTL job,
    * /root/reference/schema.sql:19 `TTL ... + INTERVAL 30 DAY`). At scale
    * this is a metadata-only directory drop, not a rewrite.
    */
  /** Execute retention: delete expired daily partition directories and
    * return what was dropped. Metadata/directory-level, no data rewrite —
    * the O(1)-per-partition equivalent of MergeTree TTL part drops.
    */
  def dropExpiredPartitions(spark: SparkSession, path: String, days: Int): Seq[String] = {
    // resolve the filesystem FROM the path — FileSystem.get(conf) returns
    // the default FS, which breaks (or silently no-ops) when the log table
    // lives on a different store (s3a:// table with hdfs:// defaultFS)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = expiredPartitions(spark, path, days)
    doomed.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    doomed
  }

  def expiredPartitions(spark: SparkSession, path: String, days: Int): Seq[String] = {
    // "today" must be reckoned in the SESSION timezone — partition names
    // come from to_date() under spark.sql.session.timeZone, and a skewed
    // JVM default zone (e.g. UTC+13 host, UTC session) would move the
    // cutoff a day forward and delete a still-live partition
    val tz = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID))
    val cutoff = java.time.LocalDate.now(tz).minusDays(days.toLong)
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath)
      .filter(_.getName.startsWith("date="))
      .filter { p =>
        val d = p.getName.stripPrefix("date=")
        scala.util.Try(java.time.LocalDate.parse(d).isBefore(cutoff)).getOrElse(false)
      }
      .map(_.toString)
  }
}
