ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_grpcspark"
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
// Pass the forked app's stdout through verbatim: sbt's default logger
// prefixes every line with "[info] ", which breaks machine parsing of
// Bench's single JSON output line (BENCH_r02.json shows parsed: null).
run / outputStrategy := Some(StdoutOutput)
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
  // Throughput collector for the batch/bench JVM (optimization round 13,
  // guide §1.2 step 3 + §5): the battery is a throughput workload with no
  // pause-time goal, and G1's concurrent cycles tax the many short-lived
  // allocation bursts local-mode Spark produces. Measured on a 10-query
  // mixed subset at sf0.1 (min-of-3 per query): ParallelGC is 3-7% faster
  // on every mid-tier query, neutral on the graph heavies, no regression
  // anywhere; a 24g heap on top of it bought nothing (measured), so the
  // default heap stays 8g. Overridable per-run via SPARK_GRAFT_JAVA_OPTS
  // (e.g. "-XX:+UseG1GC"), and cluster deployments set their own GC in
  // spark.executor.extraJavaOptions — this only sizes the LOCAL JVM.
  "-XX:+UseParallelGC",
) ++
  // Optimization-round measurement hook (guide §1/§5): lets a local
  // experiment vary GC / heap-region flags per run without editing the
  // build (e.g. SPARK_GRAFT_JAVA_OPTS="-XX:+UseParallelGC"). Unset in
  // the driver's environment, so the bench contract is unchanged.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+").toSeq)
