package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement-only harness for the optimization rounds (guide §1):
  * runs named declared queries in a Bench-identical session, printing
  *  - wall seconds per rep (noop sink, same timed action as Bench), and
  *  - for streaming parity rows, every micro-batch's durationMs
  *    breakdown (triggerExecution / queryPlanning / getBatch /
  *    addBatch / walCommit / commitOffsets) plus per-operator state
  *    commit times from the progress JSON — the evidence that says
  *    WHERE a 7-second parity row actually spends its time.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Probe <name>[,<name>...] [reps]"
  *
  * Never run by the driver; changes nothing about the bench contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extraConf: Seq[(String, String)] =
      sys.env.get("SPARK_GRAFT_PROBE_CONF").toSeq.flatMap(_.split(";"))
        .map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wantProgress = sys.env.get("SPARK_GRAFT_PROBE_PROGRESS").contains("1")
    if (wantProgress)
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
          println(s"[probe] stream started ${e.name} at ${System.nanoTime() / 1000000}ms")
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          val state = Option(p.stateOperators).map(_.toSeq.map(so =>
            s"commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}").mkString(" | ")).getOrElse("")
          println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} dur=$dur state{$state}")
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          println(s"[probe] stream terminated at ${System.nanoTime() / 1000000}ms")
      })

    val qs = SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep $r: $dt%.3f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1")) {
        println(s"[probe] ===== explain $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
