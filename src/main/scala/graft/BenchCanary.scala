package graft

import org.apache.spark.sql.SparkSession

/** Bench-stability canary (round-6 verdict #7): the r6 driver bench
  * died mid-battery from cross-query driver-state accumulation — the
  * kind of failure that should die HERE, not in the grading gate. Runs
  * the heaviest declared queries back-to-back N times in ONE session
  * (no recycling — this canary exists to catch what recycling papers
  * over) and fails loudly if the SparkContext dies or the post-GC heap
  * grows monotonically across reps.
  *
  *   SPARK_GRAFT_CANARY_REPS=10 sbt "runMain graft.BenchCanary"
  *   (or tools/bench_canary.sh)
  *
  * Exit 0 = stable; exit 1 = context death or unbounded heap growth.
  */
object BenchCanary {

  private def usedHeapMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("pagerank_bipartite", "dedup_keep_best", "dedup_components")
    val reps = sys.env.getOrElse("SPARK_GRAFT_CANARY_REPS", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // deliberately the DEFAULT 10s heartbeat (unlike Bench's raised
      // timeouts): if driver pauses approach it, the canary should see
      // the context die the way the r6 bench did
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val heap = Array.newBuilder[Long]
    var failed = false
    for (r <- 1 to reps; name <- names if !failed) {
      try {
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[canary] rep $r $name FAILED: ${e.getMessage}")
          failed = true
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (spark.sparkContext.isStopped) {
        System.err.println(s"[canary] CONTEXT DEATH at rep $r ($name)")
        failed = true
      }
      if (name == names.last) {
        val mb = usedHeapMb()
        heap += mb
        System.err.println(s"[canary] rep $r post-GC heap ${mb}MB")
      }
    }
    val hs = heap.result()
    // Strictly-monotone growth across EVERY rep is the leak signature;
    // a plateau (caches warming, then stable) is fine.
    val monotone = hs.length >= 4 && hs.sliding(2).forall(w => w(1) > w(0))
    val blownUp = hs.nonEmpty && hs.last > math.max(2 * hs.head, hs.head + 1024)
    if (monotone || blownUp)
      System.err.println(
        s"[canary] heap growth suspicious: ${hs.mkString("MB, ")}MB")
    val ok = !failed && !monotone && !blownUp
    println(s"""{"canary":${if (ok) "\"ok\"" else "\"FAIL\""},"reps":$reps,""" +
      s""""queries":${names.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""heap_mb":${hs.mkString("[", ",", "]")}}""")
    try spark.stop() catch { case _: Throwable => () }
    if (!ok) sys.exit(1)
  }
}
