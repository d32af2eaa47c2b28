ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fortymhzspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions ++= Seq("-deprecation", "-unchecked")
Test / fork := true
run / fork := true
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON. Two sbt behaviors have broken that for three rounds running
// (BENCH_r08..r10 all carry parsed: null — VERDICT r10 §1):
//  1. forked-run output is pumped through sbt's logger, which prefixes
//     every line with "[info] " — not valid JSON;
//  2. sbt prints "[success] Total time: ..." AFTER the program's output,
//     so even a clean JSON line is never last.
// StdoutOutput makes the forked JVM inherit stdout directly (no prefix);
// showSuccess := false drops the trailer, leaving Bench's compact line as
// the final line the driver's 2 KB tail sees.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task, so the
// unused-key lint flags it — exclude it rather than let a [warn] block
// land in every driver log.
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~90 queries of whole-stage codegen in one JVM overflow the default
  // 240m JIT code cache; once full, HotSpot stops compiling and every
  // later query runs partly interpreted — measured as a uniform
  // ~25% late-run slowdown at identical plans. Headroom removes it.
  "-XX:ReservedCodeCacheSize=512m",
)
