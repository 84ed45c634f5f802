package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for suites: one JVM-wide SparkSession (local[4], UTC). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Temp dir that is actually deleted when the test JVM exits — bare
    * Files.createTempDirectory accumulates sf-sized parquet trees in /tmp
    * across runs until writes start failing.
    */
  def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    SparkTestBase.deleteOnExit(d.toFile)
    d.toString
  }

  /** Retry an assertion until it holds or `timeoutMs` elapses. Needed for
    * StreamingQueryListener counters: Spark delivers progress events
    * asynchronously on the listener bus, which processAllAvailable() does
    * NOT flush — asserting immediately races event delivery.
    */
  def eventually(timeoutMs: Long = 10000, intervalMs: Long = 50)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) {
      Thread.sleep(intervalMs)
      ok = cond
    }
    assert(ok, s"condition not met within ${timeoutMs}ms")
  }
}

object SparkTestBase {
  private[graft] def deleteOnExit(f: java.io.File): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(f)
    }))

  lazy val session: SparkSession = {
    // embedded Derby (JdbcSinkSpec) writes derby.log into the CWD — the
    // repo root under sbt — unless told otherwise
    System.setProperty("derby.stream.error.file",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }
}
