ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gearpumpspark"
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
// Pass the forked program's stdout through verbatim: sbt's default logged
// output prefixes every line with "[info] ", which broke the driver's
// parse of Bench's JSON metric line (BENCH_r03.json: line present in the
// tail, "parsed": null).
// (set unscoped so run, runMain, and forked tests all delegate to it)
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suites share one SparkSession (SparkTestBase getOrCreate) and several
// specs mutate session confs (broadcast threshold, state-store provider)
// that other suites' plan assertions read — run suites sequentially so a
// concurrent conf flip can't flake an unrelated assertion.
Test / parallelExecution := false
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
// The ~50 suites share one forked JVM; cached plans + streaming state
// accumulate across them (SparkTestBase.afterAll cleans up, this is the
// safety margin against a full-GC spiral on unlucky suite orderings).
Test / javaOptions += "-Xmx12g"

// Single source of truth for the engine version: generate a properties
// resource from `ThisBuild / version` so OpsServer's /version endpoint can
// never drift from the build (the jar manifest covers packaged runs; this
// covers classes-dir runs — tests, scripts/run_verify.sh). Written straight
// into classDirectory so a bare `compile` (no copyResources) already
// serves it on the run_verify.sh classpath.
Compile / resourceGenerators += Def.task {
  val out = (Compile / resourceManaged).value / "graft-version.properties"
  IO.write(out, s"version=${version.value}\n")
  val inClasses = (Compile / classDirectory).value / "graft-version.properties"
  IO.write(inClasses, s"version=${version.value}\n")
  Seq(out)
}.taskValue
Compile / compile := ((Compile / compile) dependsOn (Compile / copyResources)).value
