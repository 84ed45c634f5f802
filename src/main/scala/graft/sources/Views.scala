package graft.sources

import graft.model.LogSchema
import org.apache.spark.sql.SparkSession

/** Raw-SQL surface parity: the reference documents plain SQL over the log
  * store as a first-class interface (/root/reference/README.md:145-151 —
  * `SELECT count(*) FROM logs.logs`). This registers the same names in the
  * session catalog so `spark.sql` serves them:
  *
  *   - database `logs` with external table `logs.logs` over a written
  *     [[LogSchema.writePartitioned]] layout (and alias `logs.logs_local`
  *     — in the reference that is the per-shard table behind the
  *     Distributed one; a Spark scan is already distributed, so both
  *     names serve the same data);
  *   - the shared testdata tables and the in-memory log view under their
  *     bare names as temp views.
  *
  * Registration is metadata-only (catalog entries + partition discovery);
  * no data moves. All graft SQL functions are available in the session
  * (GraftFunctions registers them).
  */
object Views {

  /** Register the testdata tables plus a bare `logs` temp view over
    * `events`.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.expressions.GraftFunctions.registerAll(spark)
    Tables.names.foreach { n =>
      Tables.read(spark, dir, n).createOrReplaceTempView(n)
    }
    LogSchema.logsFromEvents(Tables.events(spark, dir))
      .createOrReplaceTempView("logs")
  }

  /** Register a WRITTEN date-partitioned log table as the reference's
    * `logs.logs` / `logs.logs_local` SQL names. External datasource
    * tables + partition recovery — pure catalog metadata.
    */
  def registerLogDatabase(spark: SparkSession, path: String): Unit = {
    graft.expressions.GraftFunctions.registerAll(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS logs")
    Seq("logs.logs", "logs.logs_local").foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(
        s"CREATE TABLE $name USING parquet LOCATION '${path.replace("'", "''")}'")
      spark.catalog.recoverPartitions(name)
    }
  }
}
