ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xtdbspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Bench contract (VERDICT r17 #2): the driver invokes the bench through
// sbt and expects the one-line JSON as the FINAL, prefix-free stdout
// line — BENCH_r13..r17 all recorded "parsed": null because sbt's
// logger wrapped the forked program's stdout in "[info] " and appended
// "[success] Total time..." after it. Forked run/runMain output now
// passes through to stdout unmodified (tests keep the logged style
// their summary parsing relies on), and the success trailer is off —
// exit codes, which the driver records ("rc"), are untouched.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// (showSuccess is read by the command engine, runMain's strategy by the
// in-config runner — both false-positive sbt's unused-key lint)
Global / excludeLintKeys ++= Set(showSuccess, outputStrategy)
