ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "colttspark"
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
// The driver's BENCH contract parses a one-line JSON from the tail of
// `sbt "runMain graft.Bench"` stdout. sbt's default LoggedOutput strategy
// prefixes every forked-JVM stdout line with "[info] " — which made the
// line unparseable in EVERY round to date (BENCH_r01..r14 all record
// parsed: null). StdoutOutput passes the child's stdout through verbatim;
// showSuccess drops the trailing "[success] Total time ..." line so the
// JSON line is the last thing sbt prints. Measurement-plumbing fix only —
// no timed code changes (documented in OPTIMIZATION_r15.md).
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // Bench caches the 1M + 10M vector collections in memory (~9 GB columnar)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // The full suite JITs hundreds of generated classes before the big-scan
  // suites run; the default 240m code cache runs warm enough that C2 can
  // start flushing/refusing exactly when the hot scan loops compile —
  // the bimodal-latency trap (PLANS.md r3/r4). Re-raised 512m -> 768m in
  // r6 when the suite grew past 70 queries (more generated classes ahead
  // of the floor-sensitive 1M scans).
  "-XX:ReservedCodeCacheSize=768m",
) ++ sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
