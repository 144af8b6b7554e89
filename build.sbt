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
  // GC default: G1 (the JVM default — no flag). A mid-build commit
  // switched to ParallelGC off a 10-query subset claiming "neutral on
  // graph heavies"; the r13 full-battery re-measure falsified that:
  // solo min-of-4 at sf0.1 had ParallelGC LOSING the heavy iterative
  // family (k_betweenness 10.87 vs 8.99s, clustering_coeff 6.25 vs
  // 4.88s, graph_diameter 3.03 vs 2.77s) with full-GC stall outliers
  // (a 22.6s harmonic_centrality rep), while winning only 0.05-0.2s on
  // small queries — net regression, reverted (OPTIMIZATION_r13.md
  // "Inherited state"). Per-run GC experiments go through
  // SPARK_GRAFT_JAVA_OPTS; cluster deployments set their own GC in
  // spark.executor.extraJavaOptions — this only affects the LOCAL JVM.
) ++
  // Optimization-round measurement hook (guide §1/§5): lets a local
  // experiment vary GC / heap-region flags per run without editing the
  // build (e.g. SPARK_GRAFT_JAVA_OPTS="-XX:+UseParallelGC"). Unset in
  // the driver's environment, so the bench contract is unchanged.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+").toSeq)
