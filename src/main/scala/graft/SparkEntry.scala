package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator implementations live in graft.Queries (one entry per
  * SURVEY.md §2 key); this object just adapts them to the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "How many errors per app in the last day of data" — the canonical
    * klogs question — over the log-shaped view of `events`.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val lg = model.LogSchema.logsFromEvents(
      sources.Tables.events(spark, dir))
    lg.where(col("namespace") === "error")
      .groupBy("app")
      .agg(count(lit(1)).as("n_errors"))
      .orderBy(desc("n_errors"), col("app"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
