ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "newscrawlerspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " log
// prefix): the bench harness parses the final stdout line as JSON.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] puts all executor work on the driver heap: size it for the
  // box (128 GiB), not for a thin driver. ZGC: G1 full-GC pauses on the
  // large heap caused 20-120s per-wave variance at 32 threads.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ParallelGC + large young gen: the parse path allocates ~GB/s of
  // short-lived DOM garbage; generational young collections absorb it
  // with no G1 full-GC variance (20-120s outliers) and no JDK17-ZGC
  // (non-generational) allocation stalls — measured in BASELINE.md
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC",
) ++ sys.env.getOrElse("SPARK_GRAFT_GC_OPTS", "-Xmn20g").split(" ").toSeq ++ Seq(
)
