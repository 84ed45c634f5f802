ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "klogsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Driver contract: `sbt "runMain graft.Bench"` must end its stdout with the
// bench's single JSON line. Two sbt behaviours break that: (a) forked-run
// output is routed through the logger and prefixed `[info]`, (b) sbt appends
// a `[success] Total time: ...` trailer AFTER the program's output — the
// driver's last-line parse has received that trailer instead of the JSON
// since r10 (BENCH_r10–r14 all have parsed:null). StdoutOutput passes the
// forked JVM's stdout through verbatim; showSuccess drops the trailer.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — the unused-key
// lint can't see that; exclude it so the warning doesn't pollute stdout.
Global / excludeLintKeys += showSuccess
// Build-metadata injection — the sbt analogue of the reference's
// `-ldflags -X github.com/kobsio/klogs/pkg/version.Version=...` population
// of pkg/version/version.go:11-18. The build date is the HEAD commit date
// (not wall clock) so repeated compiles of the same tree stay reproducible
// and the generated file only changes when the commit does.
Compile / sourceGenerators += Def.task {
  def git(args: String*): String =
    try {
      val out = scala.sys.process.Process("git" +: args, baseDirectory.value).!!.trim
      if (out.isEmpty) "unknown" else out
    } catch { case _: Exception => "unknown" }
  val revision = git("rev-parse", "--short", "HEAD")
  val branch = git("rev-parse", "--abbrev-ref", "HEAD")
  val buildDate = git("show", "-s", "--format=%cI", "HEAD")
  val buildUser = sys.props.getOrElse("user.name", "unknown")
  val f = (Compile / sourceManaged).value / "graft" / "BuildInfo.scala"
  val content =
    s"""package graft
       |
       |/** Build metadata, injected at compile time by the build.sbt source
       |  * generator — the repo's equivalent of the reference's `-ldflags -X`
       |  * injection into /root/reference/pkg/version/version.go:11-18.
       |  * GENERATED FILE — edit the generator in build.sbt, not this.
       |  */
       |object BuildInfo {
       |  val program: String = "${name.value}"
       |  val version: String = "${version.value}"
       |  val revision: String = "$revision"
       |  val branch: String = "$branch"
       |  val buildUser: String = "$buildUser"
       |  val buildDate: String = "$buildDate"
       |  val scalaVersion: String = "${scalaVersion.value}"
       |  def sparkVersion: String = org.apache.spark.SPARK_VERSION
       |
       |  /** Human-readable block, version.go:22-47 `Print` parity. */
       |  def describe: String =
       |    s"$$program, version $$version (branch: $$branch, revision: $$revision)\\n" +
       |      s"  build user:       $$buildUser\\n" +
       |      s"  build date:       $$buildDate\\n" +
       |      s"  scala version:    $$scalaVersion\\n" +
       |      s"  spark version:    $$sparkVersion"
       |
       |  /** One INFO line at process bootstrap — main.go:125-126 parity
       |    * (the reference logs version.Info + version.BuildContext at init).
       |    */
       |  def logAtBootstrap(): Unit = {
       |    org.slf4j.LoggerFactory.getLogger(getClass).info(
       |      "Version information. version={} branch={} revision={} " +
       |        "buildUser={} buildDate={} scala={} spark={}",
       |      version, branch, revision, buildUser, buildDate,
       |      scalaVersion, sparkVersion)
       |    ()
       |  }
       |}
       |""".stripMargin
  if (!f.exists || IO.read(f) != content) IO.write(f, content)
  Seq(f)
}.taskValue
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
