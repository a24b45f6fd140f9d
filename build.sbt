ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The bench driver records only the last ~2000 bytes of stdout and parses a
// JSON line out of that window; sbt's "[success] Total time" footer printed
// AFTER the forked main's compact JSON line was what kept BENCH_r*.json at
// "parsed": null (round-8 verdict #3). Failures still log at [error].
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// ... and sbt's logger prefixes every forked-stdout line with "[info] ",
// which a strict JSON parse of the tail's last line would choke on: give
// the forked JVM the real stdout/stderr instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
name := "defendadatalakespark"
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
  // the harness box has 128 GiB; 8g starved local[32] (32 concurrent tasks
  // over multi-million-row candidate joins) into GC thrash — the observed
  // 5.7-24.8 s spread on q_dedup_ngram across identical-code bench runs
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
