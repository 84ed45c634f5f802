package graft

import graft.operators.PipelineConfig
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** Config parsing with the reference's warn-and-default semantics
  * (/root/reference/main.go:121-228).
  */
class PipelineConfigSpec extends AnyFunSuite {

  test("defaults match the reference (main.go:37-38)") {
    val c = PipelineConfig.fromMap(Map.empty)
    assert(c.batchSize == 10000)
    assert(c.flushInterval == 60.seconds)
    assert(!c.forceUnderscores && c.forceNumberFields.isEmpty)
    assert(c.warnings.isEmpty)
  }

  test("malformed values warn and fall back instead of failing (main.go:169-172)") {
    val c = PipelineConfig.fromMap(Map(
      "Batch_Size" -> "not-a-number",
      "Force_Underscores" -> "maybe"))
    assert(c.batchSize == 10000 && !c.forceUnderscores)
    assert(c.warnings.size == 2)
  }

  test("negative batch size rejected like the reference's < 0 guard") {
    val c = PipelineConfig.fromMap(Map("batch_size" -> "-5"))
    assert(c.batchSize == 10000 && c.warnings.nonEmpty)
  }

  test("sub-second flush interval rejected (main.go:202-205)") {
    val c = PipelineConfig.fromMap(Map("flush_interval" -> "100ms"))
    assert(c.flushInterval == 60.seconds && c.warnings.nonEmpty)
    val ok = PipelineConfig.fromMap(Map("flush_interval" -> "10s"))
    assert(ok.flushInterval == 10.seconds && ok.warnings.isEmpty)
    // unit-less values are malformed to time.ParseDuration → default + warn
    val bare = PipelineConfig.fromMap(Map("flush_interval" -> "10"))
    assert(bare.flushInterval == 60.seconds && bare.warnings.nonEmpty)
  }

  test("Go compound durations parse; Scala-only forms are rejected (ParseDuration parity)") {
    val compound = PipelineConfig.fromMap(Map("flush_interval" -> "1m30s"))
    assert(compound.flushInterval == 90.seconds && compound.warnings.isEmpty)
    val frac = PipelineConfig.fromMap(Map("flush_interval" -> "1.5m"))
    assert(frac.flushInterval == 90.seconds && frac.warnings.isEmpty)
    // Go rejects space-separated Scala forms — so must we (default + warn)
    val scalaForm = PipelineConfig.fromMap(Map("flush_interval" -> "5 minutes"))
    assert(scalaForm.flushInterval == 60.seconds && scalaForm.warnings.nonEmpty)
    val garbage = PipelineConfig.fromMap(Map("flush_interval" -> "1m30"))
    assert(garbage.flushInterval == 60.seconds && garbage.warnings.nonEmpty)
  }

  test("bool parsing matches strconv.ParseBool exactly (main.go:211-215)") {
    // Go accepts only 1/t/T/TRUE/true/True and the false equivalents
    assert(PipelineConfig.fromMap(Map("Force_Underscores" -> "True")).forceUnderscores)
    assert(PipelineConfig.fromMap(Map("Force_Underscores" -> "t")).forceUnderscores)
    // "on"/"yes" are NOT valid Go bools: fall back with a warning
    val on = PipelineConfig.fromMap(Map("Force_Underscores" -> "on"))
    assert(!on.forceUnderscores && on.warnings.nonEmpty)
    val yes = PipelineConfig.fromMap(Map("Async_Insert" -> "yes"))
    assert(!yes.asyncInsert && yes.warnings.nonEmpty)
  }

  test("force_number_fields comma list (cluster/fluent-bit.yaml:104 shape)") {
    val c = PipelineConfig.fromMap(Map(
      "Force_Number_Fields" -> "content.upstream_service_time, content.duration"))
    assert(c.forceNumberFields ==
      Seq("content.upstream_service_time", "content.duration"))
    assert(c.ingest.forceNumberFields == c.forceNumberFields)
  }

  test("async insert flags (clickhouse.go:65-76)") {
    val c = PipelineConfig.fromMap(Map(
      "Async_Insert" -> "true", "Wait_For_Async_Insert" -> "1"))
    assert(c.asyncInsert && c.waitForAsyncInsert)
  }
}
