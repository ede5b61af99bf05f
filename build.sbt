ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatascalaofflinedatacleanspark"
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
// Forked run output must NOT pass through sbt's logger: the driver
// parses Bench's single JSON stdout line, and LoggedOutput would
// prefix it with "[info] ".
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: local[32] runs 32 concurrent tasks in ONE JVM — at 8g a
  // contended machine spends the bench in GC; the harness box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A 294-query bench generates thousands of whole-stage-codegen classes
  // in one JVM; the JDK default ReservedCodeCacheSize (240 MB) filling up
  // DISABLES the JIT mid-run — the exact signature of the round-7 bench
  // artifact (one contiguous window of 10-60x CPU inflation at code that
  // benched in-band eight straight runs). 512 MB + flushing gives the
  // compiler room and a recovery path; Bench.scala records occupancy per
  // query so a recurrence names itself in the artifact.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
  // raise the initial metaspace GC threshold (NOT a cap): Spark codegen +
  // 54 test suites churn class metadata; the default 21 MB trigger forces
  // repeated full-GC metaspace expansions early in every forked JVM
  "-XX:MetaspaceSize=512m",
)
