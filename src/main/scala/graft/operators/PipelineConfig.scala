package graft.operators

import scala.concurrent.duration.{Duration, FiniteDuration}
import scala.concurrent.duration._

/** The full ingest-pipeline configuration surface, mirroring the reference
  * plugin's config keys and — importantly — its fallback semantics: every
  * malformed value logs a warning and falls back to the default instead of
  * failing startup (/root/reference/main.go:121-228).
  *
  * | key (reference)       | default        | rule                              |
  * |-----------------------|----------------|-----------------------------------|
  * | Batch_Size            | 10000          | int ≥ 0 else default (main.go:37,169-172) |
  * | Flush_Interval        | 60s            | duration; values < 1s rejected → default (main.go:38,202-205) |
  * | Force_Number_Fields   | empty          | comma-separated list (main.go:207-208) |
  * | Force_Underscores     | false          | bool parse, malformed → default (main.go:210-215) |
  * | Async_Insert          | false          | bool (main.go:181-184)            |
  * | Wait_For_Async_Insert | false          | bool (main.go:186-191)            |
  */
case class PipelineConfig(
    batchSize: Int = 10000,
    flushInterval: FiniteDuration = 60.seconds,
    forceNumberFields: Seq[String] = Nil,
    forceUnderscores: Boolean = false,
    asyncInsert: Boolean = false,
    waitForAsyncInsert: Boolean = false,
    warnings: Seq[String] = Nil) {
  def ingest: IngestConfig = IngestConfig(forceNumberFields, forceUnderscores)
}

object PipelineConfig {
  val MinFlushInterval: FiniteDuration = 1.second

  private val DurationTerm = "([0-9]*\\.?[0-9]+)(ns|us|µs|μs|ms|s|m|h)".r

  /** Go `time.ParseDuration` subset: a concatenation of number+unit terms
    * that must consume the whole string ("90s", "1m30s", "1.5h"); None on
    * anything else (bare numbers, unknown units, trailing garbage).
    */
  private[operators] def parseGoDuration(v: String): Option[FiniteDuration] = {
    val s = v.trim.stripPrefix("+")
    val terms = DurationTerm.findAllMatchIn(s).toList
    if (terms.isEmpty || terms.map(_.matched).mkString != s) None
    else {
      val nanos = terms.map { t =>
        val mult = t.group(2) match {
          case "ns" => 1.0
          case "us" | "µs" | "μs" => 1e3
          case "ms" => 1e6
          case "s" => 1e9
          case "m" => 6e10
          case "h" => 3.6e12
        }
        t.group(1).toDouble * mult
      }.sum
      Some(Duration.fromNanos(nanos.toLong))
    }
  }

  /** Parse from a key→value map (case-insensitive keys, like Fluent Bit's
    * config). Never throws; collects warnings for malformed values.
    */
  def fromMap(raw: Map[String, String]): PipelineConfig = {
    val m = raw.map { case (k, v) => k.toLowerCase -> v.trim }
    var warnings = Vector.empty[String]
    def warn(key: String, v: String, default: Any): Unit =
      warnings :+= s"invalid $key '$v', using default $default"

    def intOr(key: String, default: Int): Int =
      m.get(key).filter(_.nonEmpty).map { v =>
        v.toIntOption.filter(_ >= 0).getOrElse { warn(key, v, default); default }
      }.getOrElse(default)

    // Go strconv.ParseBool's exact accepted set (main.go:211-215): no
    // "on"/"yes"/"off"/"no" — those are malformed and fall back with a
    // warning, same as the reference.
    def boolOr(key: String, default: Boolean): Boolean =
      m.get(key).filter(_.nonEmpty).map { v =>
        v match {
          case "1" | "t" | "T" | "true" | "TRUE" | "True" => true
          case "0" | "f" | "F" | "false" | "FALSE" | "False" => false
          case other => warn(key, other, default); default
        }
      }.getOrElse(default)

    // Go time.ParseDuration semantics (main.go:201-205): one or more
    // number+unit terms ("300ms", "1m30s", "1.5h"); a bare number has no
    // unit and is MALFORMED (→ default + warning), as are values below one
    // second. The previous Scala Duration(v) parser rejected Go's
    // compound forms ("1m30s") — silently degrading valid reference
    // configs to the default — while accepting Scala-only forms Go rejects.
    def durationOr(key: String, default: FiniteDuration): FiniteDuration =
      m.get(key).filter(_.nonEmpty).map { v =>
        parseGoDuration(v) match {
          case Some(d) if d >= MinFlushInterval => d
          case Some(_) => // reference rejects sub-second intervals, main.go:202-205
            warn(key, v, default); default
          case None => warn(key, v, default); default
        }
      }.getOrElse(default)

    val fields = m.get("force_number_fields").filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

    PipelineConfig(
      batchSize = intOr("batch_size", 10000),
      flushInterval = durationOr("flush_interval", 60.seconds),
      forceNumberFields = fields,
      forceUnderscores = boolOr("force_underscores", default = false),
      asyncInsert = boolOr("async_insert", default = false),
      waitForAsyncInsert = boolOr("wait_for_async_insert", default = false),
      warnings = warnings.toSeq)
  }
}
