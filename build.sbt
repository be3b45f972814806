ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "triskspark"
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
// The driver tail-captures `sbt runMain` stdout and json-parses the
// LAST line (graft.Bench prints a <2 KB summary line last). sbt's
// default LoggedOutput prefixes every forked line with "[info] " and
// appends its own "[success] Total time: …" after the run — both of
// which break that parse. Emit forked output raw and drop the success
// banner so the summary line really is the last line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// both keys are consumed by sbt's command/forked-run machinery, which
// the unused-key lint can't see
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // the box has 125 GiB; a roomy heap keeps the 48-query bench sweep
  // out of GC thrash (broadcast/shuffle bookkeeping accumulates until
  // the ContextCleaner's weak refs are collected)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
