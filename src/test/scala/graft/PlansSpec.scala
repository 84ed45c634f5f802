package graft

import java.nio.file.Files
import graft.model.LogSchema
import org.apache.spark.sql.functions._

/** The promoted-column rewrite: map-subscript predicates are redirected to
  * materialized columns and reach the parquet scan as pushed filters.
  */
class PlansSpec extends SparkTestBase {

  test("PromoteMapKeys rewrites map subscripts to promoted columns and pushes the predicate") {
    val out = Files.createTempDirectory("graft-promo").toString
    val logs = LogSchema.logsFromEvents(
      graft.sources.Tables.events(spark, sf())).drop("id")
    LogSchema.writePartitioned(
      LogSchema.withPromotedColumns(logs,
        stringKeys = Seq("event.type"), numberKeys = Seq("event.value")),
      out)

    val back = LogSchema.readLogs(spark, out)
    val q = back.where(
      try_element_at(col("fields_number"), lit("event.value")) >= 150.0 &&
      try_element_at(col("fields_string"), lit("event.type")) === "error")

    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("promoted_event_value"),
      s"numeric subscript not rewritten:\n$optimized")
    assert(optimized.contains("promoted_event_type"),
      s"string subscript not rewritten:\n$optimized")

    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(promoted_event_value"),
      s"numeric predicate did not reach the scan:\n$physical")

    // rewrite preserves semantics: same rows as the unrewritten map path
    val expected = LogSchema.logsFromEvents(
        graft.sources.Tables.events(spark, sf()))
      .where(try_element_at(col("fields_number"), lit("event.value")) >= 150.0 &&
        col("namespace") === "error")
      .count()
    assert(q.count() == expected && expected > 0)
  }

  test("no promoted column in scope → plan unchanged") {
    val logs = LogSchema.logsFromEvents(
      graft.sources.Tables.events(spark, sf()))
    val q = logs.where(
      try_element_at(col("fields_number"), lit("event.value")) >= 150.0)
    assert(!q.queryExecution.optimizedPlan.toString.contains("promoted_"))
    assert(q.count() > 0)
  }
}
