ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdfetlocrinferencespark"
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
// No "[success] Total time" banner after runMain: the driver's bench
// capture parses the LAST output line as JSON, and sbt's banner was
// what kept defeating it (BENCH_r6–r8 `parsed` null). With the banner
// off, graft.Bench's compact final JSON line is the last line sbt
// prints.
Global / showSuccess := false
// ... and no "[info] " prefix on the forked JVM's stdout either: the
// driver's tail parser is strict JSON, and sbt's default logged output
// strategy decorates every forked-process line (BENCH_r9 `parsed` null
// with the compact line present but framed). StdoutOutput pipes the
// child's stdout through unmodified.
run / outputStrategy := Some(StdoutOutput)
// (the key IS read by the forked runMain; sbt's lintUnused just can't see it)
Global / excludeLintKeys += run / outputStrategy
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
  // 16g default: the single-JVM full suite (~285 queries, cold+warm
  // each) OOM'd an 8g heap near the end even with between-query
  // cache/RDD cleanup — the box has 128 GiB, and the driver-gate
  // bench inherits this setting
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
