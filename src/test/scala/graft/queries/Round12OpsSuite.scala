package graft.queries

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Property / plan pins for the round-12 operators, at sf0.001 — the
  * spec leg of the oracle+spec+plan discipline. The three new ops are
  * the streaming fault-tolerance pair (checkpoint recovery,
  * stream–static enrichment) and the AQE skew-join audit; each spec
  * proves the interesting mechanism actually FIRED (anti-vacuity), not
  * just that the result matched.
  */
class Round12OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  /** Every node of an EXECUTED plan, descending through the adaptive
    * wrappers `collect` treats as leaves (AdaptiveSparkPlanExec's
    * current plan, materialized QueryStageExec bodies, reused
    * exchanges) — the executed node instances, whose metrics are
    * populated, live inside these. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  // ------------------------------------------------- skew_join_audit ---

  test("skew_join_audit: AQE skew split fires under the pinned window " +
    "(skew=true SMJ + skewed AQEShuffleRead), the default plan does " +
    "not, and both agree with the declared row") {
    val df = IncrOps.skewedJoinAgg(spark, sfDir)
    val viaSkew = IncrOps.withSkewSplit(spark) {
      val rows = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "skew split did not fire under the pinned window — the audit " +
          "gate is vacuous:\n" + plan.take(2000))
      assert(plan.contains("skewed"),
        "no skewed AQEShuffleRead in the executed plan")
      rows
    }
    // counterfactual: with default confs the small dim broadcasts (or
    // at least no skew rewrite happens) — the pinned plan is different
    val df2 = IncrOps.skewedJoinAgg(spark, sfDir)
    val plain = df2.collect().toSeq
    assert(!df2.queryExecution.executedPlan.toString.contains("skew=true"),
      "default plan unexpectedly carries the skew marker — the pinned " +
        "window asserts nothing")
    assert(viaSkew == plain,
      "skew-split result diverges from the default plan's result")
    assert(run("skew_join_audit").collect().toSeq == viaSkew)
  }

  // ------------------------------------- stream_static_join_parity ---

  test("stream_static_join_parity: >= 4 micro-batches, dim joined " +
    "per-batch via broadcast, stream fixpoint == batch join") {
    // batch expected (the oracle shape, computed Spark-side)
    val exp = graft.Tables.events(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        unix_millis(date_trunc("DAY", col("ts"))).as("d_ms"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
      .orderBy("c_mktsegment", "d_ms")
      .collect().toSeq
    val got = run("stream_static_join_parity").collect().toSeq
    assert(got == exp)

    // mechanism probe: rerun the stream inline to reach the progress
    // feed and the last micro-batch's executed plan (the declared query
    // encapsulates its StreamingQuery handle)
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val physical = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(physical)
      .option("maxFilesPerTrigger", "1")
      .parquet(StreamingOps.chunkDir(spark, sfDir))
    val src = if (physical("ts").dataType == LongType)
      streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else streamed
    val q = src.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("r12_static_probe")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"expected one micro-batch per chunk (4), saw $dataBatches")
      // the static side must be re-planned per batch as a broadcast
      // join — private[sql] members are public in bytecode, so plain
      // reflection reaches the last IncrementalExecution
      val se = q.getClass.getMethod("streamingQuery").invoke(q)
      val le = se.getClass.getMethod("lastExecution").invoke(se)
      val plan = le.getClass.getMethod("executedPlan").invoke(le).toString
      assert(plan.contains("BroadcastHashJoin"),
        "dim join did not broadcast in the micro-batch plan:\n" +
          plan.take(2000))
    } finally q.stop()
  }

  // ----------------------------------------- stream_recovery_parity ---

  test("stream_recovery_parity: restart RESUMES from the checkpoint " +
    "(offsets advanced, committed chunks never re-read, state and sink " +
    "log restored) and the final output == the uninterrupted run") {
    val r = StreamingOps.runRecovery(spark, sfDir)
    val chunks = StreamingOps.timeChunkDir(spark, sfDir)
    def chunk(i: Int) =
      spark.read.parquet(f"$chunks/chunk_$i%02d.parquet")
    def n(i: Int) = chunk(i).count()

    // phase 1 consumed exactly chunks 0-1, phase 2 exactly chunks 2-3:
    // a from-scratch rerun would show postRows == all four chunks
    assert(r.preRows == n(0) + n(1),
      s"pre-stop phase read ${r.preRows} rows, expected ${n(0) + n(1)}")
    assert(r.postRows == n(2) + n(3),
      s"restart read ${r.postRows} rows — committed chunks were " +
        s"reprocessed (expected ${n(2) + n(3)})")
    // batch ids continue past the checkpoint instead of restarting at 0
    assert(r.preBatchIds.nonEmpty && r.postBatchIds.nonEmpty)
    assert(r.postBatchIds.min > r.preBatchIds.max,
      s"restart batch ids ${r.postBatchIds} did not advance past " +
        s"pre-stop ids ${r.preBatchIds}")

    // the sink accumulated across the restart: some windows finalized
    // before the stop, more after — neither phase is vacuous
    val fin = spark.read.parquet(r.outDir)
    assert(r.rowsAtStop > 0,
      "no window finalized before the stop — recovery gate is vacuous")
    assert(fin.count() > r.rowsAtStop,
      "no window finalized after the restart")

    // STATE RESTORE is load-bearing: ≥1 window was still PENDING in
    // state at the stop (its end hadn't passed the phase-1 watermark,
    // so it was not yet emitted) and finalizes only after the restart —
    // from restored state. If state were lost, that window would be
    // absent (or under-counted) in the final output and both this
    // subset check and the row equality below would fail. (A window
    // straddling the quartile boundary would test the merge path too,
    // but at sf0.001 the fixture is too sparse for one to exist — the
    // pending-window property holds at every SF by construction: the
    // last phase-1 hour's window end always exceeds max(phase-1 ts) −
    // 10 min.)
    def hoursMs(i: Int) = {
      val ts = if (chunk(i).schema("ts").dataType == LongType)
        expr("timestamp_micros(ts div 1000)") else col("ts")
      chunk(i).select(unix_millis(date_trunc("HOUR", ts)).as("h"))
        .distinct().collect().map(_.getLong(0)).toSet
    }
    val ev = graft.Tables.events(spark, sfDir)
    val wmFinalMs = ev.agg(max(col("ts"))).head()
      .getTimestamp(0).getTime - 600000L
    val maxTs01Ms = Seq(0, 1).map { i =>
      val ts = if (chunk(i).schema("ts").dataType == LongType)
        expr("timestamp_micros(ts div 1000)") else col("ts")
      chunk(i).agg(max(ts)).head().getTimestamp(0).getTime
    }.max
    val pending = (hoursMs(0) ++ hoursMs(1)).filter(h =>
      h + 3600000L > maxTs01Ms - 600000L && h + 3600000L < wmFinalMs)
    assert(pending.nonEmpty,
      "no window was pending in state at the stop point — state " +
        "restore untested")
    val finalHours = fin.select("w_ms").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(pending.subsetOf(finalHours),
      s"windows pending at the stop were lost across the restart: " +
        s"${pending -- finalHours}")

    // final output == the uninterrupted run (= the oracle predicate:
    // every window whose end precedes the final watermark, no drops)
    val exp = ev
      .select(unix_millis(date_trunc("HOUR", col("ts"))).as("w_ms"),
        col("event_type"))
      .filter(col("w_ms") + lit(3600000L) < lit(wmFinalMs))
      .groupBy("w_ms", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("w_ms", "event_type")
      .collect().toSeq
    assert(fin.orderBy("w_ms", "event_type").collect().toSeq == exp)
  }

  // ------------------------------------------------------- dpp_audit ---

  test("dpp_audit: the scan carries a DYNAMIC partition filter, reads " +
    "only the 3 surviving month files, disabling the rule removes the " +
    "filter, and the pruned join lost nothing") {
    val df = IncrOps.dppJoinAgg(spark, sfDir)
    val out = df.collect()
    // the EXECUTED scan instance (inside the adaptive stages) carries
    // both the dynamic filter and the populated metrics
    val scan = allNodes(df.queryExecution.executedPlan).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.output.exists(_.name == "o_month") => f
    }.getOrElse(fail("no partitioned-orders FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      s"no DynamicPruningExpression on the fact scan: ${scan.partitionFilters}")
    // runtime pruning actually happened: the scan's numFiles metric
    // counts files READ, which with DPP is only the dim's months
    assert(scan.metrics("numFiles").value == 3,
      s"expected 3 files read after dynamic pruning, got " +
        s"${scan.metrics("numFiles").value}")
    val total = scan.relation.location.listFiles(Nil, Nil)
    assert(total.length > 70,
      s"fixture should have ~80 month partitions, got ${total.length}")

    // counterfactual: with the rule off the scan has no dynamic filter
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df2 = IncrOps.dppJoinAgg(spark, sfDir)
      val noDpp = df2.collect()
      val scan2 = allNodes(df2.queryExecution.executedPlan).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "o_month") => f
      }.get
      assert(!scan2.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning")),
        "dynamic filter present with the rule disabled — the audit " +
          "asserts nothing")
      assert(out.toSeq == noDpp.toSeq,
        "pruned result diverges from the unpruned plan's result")
    } finally spark.conf.set(key, prev)
    assert(run("dpp_audit").collect().toSeq == out.toSeq)
  }

  // --------------------------------------------------- aqe_bhj_audit ---

  test("aqe_bhj_audit: static plan is an SMJ, AQE demotes it to a " +
    "BroadcastHashJoin at runtime, pinning the adaptive threshold off " +
    "keeps the SMJ, and all three agree") {
    val viaBhj = IncrOps.withAqeBhj(spark) {
      val df = IncrOps.bhjJoinAgg(spark, sfDir)
      val rows = df.collect().toSeq
      // the INITIAL (pre-adaptive) physical plan must be the SMJ the
      // static planner chose with broadcast denied
      assert(df.queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
        "static plan is not a SortMergeJoin — the demotion has nothing " +
          "to demote")
      val fin = df.queryExecution.executedPlan.toString
      assert(fin.contains("BroadcastHashJoin"),
        "AQE did not rewrite the SMJ to a broadcast join:\n" + fin.take(2000))
      assert(fin.contains("isFinalPlan=true"))
      rows
    }
    // counterfactual: adaptive threshold off too -> the SMJ survives
    val pins = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = pins.map { case (k, _) => k -> spark.conf.getOption(k) }
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    val viaSmj = try {
      val df2 = IncrOps.bhjJoinAgg(spark, sfDir)
      val rows = df2.collect().toSeq
      val fin2 = df2.queryExecution.executedPlan.toString
      assert(fin2.contains("SortMergeJoin") && !fin2.contains("BroadcastHashJoin"),
        "join broadcast with both thresholds off — the window asserts " +
          "nothing")
      rows
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    assert(viaBhj == viaSmj,
      "demoted-join result diverges from the SMJ result")
    assert(run("aqe_bhj_audit").collect().toSeq == viaBhj)
  }

  // ---------------------------------------------- aqe_coalesce_audit ---

  test("aqe_coalesce_audit: AQE folds the 200 static reducers into a " +
    "handful of coalesced partitions, disabling coalescing keeps all " +
    "200, and both agree") {
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    def shuffleReadSpecs(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      allNodes(df.queryExecution.executedPlan).collect {
        case r: AQEShuffleReadExec => r.partitionSpecs.length
      }
    val viaCoalesce = IncrOps.withAqeCoalesce(spark)(enabled = true) {
      val df = IncrOps.coalesceAgg(spark, sfDir)
      val rows = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("coalesced"),
        "no coalesced AQEShuffleRead in the final plan:\n" + plan.take(2000))
      val specs = shuffleReadSpecs(df)
      assert(specs.nonEmpty && specs.forall(_ < 50),
        s"shuffle reads not meaningfully coalesced (got $specs of 200)")
      rows
    }
    val viaStatic = IncrOps.withAqeCoalesce(spark)(enabled = false) {
      val df2 = IncrOps.coalesceAgg(spark, sfDir)
      val rows = df2.collect().toSeq
      assert(!df2.queryExecution.executedPlan.toString.contains("coalesced"),
        "coalescing fired while disabled — the window asserts nothing")
      rows
    }
    assert(viaCoalesce == viaStatic,
      "coalesced result diverges from the static-200 result")
    assert(run("aqe_coalesce_audit").collect().toSeq == viaCoalesce)
  }

  // ------------------------------------------------ compaction_audit ---

  test("compaction_audit: the compacted zone has the bin-packed file " +
    "count (<< 64 sprayed files) and is row-for-row identical to the " +
    "spray") {
    run("compaction_audit").collect() // force both layouts to exist
    val compactedDir = IncrOps.compactedOrders(spark, sfDir)
    val sprayDir = compactedDir.stripSuffix("_compacted")
    def parquetFiles(dir: String) = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { st =>
      st.iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val sprayN = parquetFiles(sprayDir)
    val compactN = parquetFiles(compactedDir)
    assert(sprayN == 64, s"spray should be 64 files, got $sprayN")
    assert(compactN < sprayN / 4,
      s"compaction barely reduced the file count: $sprayN -> $compactN")
    // bin-packing arithmetic: ceil(totalBytes / 1 MiB)
    val totalBytes = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(sprayDir))) { st =>
      st.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
    }
    val expectN = math.max(1L, (totalBytes + (1L << 20) - 1) / (1L << 20))
    assert(compactN == expectN,
      s"expected ceil($totalBytes / 1MiB) = $expectN files, got $compactN")
    // zero row loss, zero mutation
    val spray = spark.read.parquet(sprayDir)
    val compact = spark.read.parquet(compactedDir)
    assert(spray.count() == compact.count())
    assert(spray.exceptAll(compact).isEmpty && compact.exceptAll(spray).isEmpty,
      "compacted rows differ from the spray")
  }

  // ----------------------------------------------- schema_drift_audit ---

  test("schema_drift_audit: mergeSchema reconciles the two vintages — " +
    "union schema, NULL o_orderpriority exactly on pre-migration keys, " +
    "aggregate equals the raw replay") {
    val out = run("schema_drift_audit").collect().toSeq
    // the merged frame the query reads: union schema, NULLs only where
    // vintage 1 (even keys) lacked the column
    val merged = spark.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(IncrOps.driftedOrders(spark, sfDir))
    assert(merged.schema.fieldNames.toSet ==
      Set("o_orderkey", "o_totalprice", "o_orderpriority"),
      s"merged schema wrong: ${merged.schema.fieldNames.mkString(",")}")
    val badNulls = merged.filter(
      (col("o_orderpriority").isNull && col("o_orderkey") % 2 =!= 0) ||
        (col("o_orderpriority").isNotNull && col("o_orderkey") % 2 === 0))
      .count()
    assert(badNulls == 0,
      s"$badNulls rows have the drifted column on the wrong vintage")
    assert(merged.count() == graft.Tables.orders(spark, sfDir).count())
    val expect = graft.Tables.orders(spark, sfDir)
      .groupBy(when(col("o_orderkey") % 2 === 0, "(pre-migration)")
        .otherwise(col("o_orderpriority")).as("prio"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("prio").collect().toSeq
    assert(out == expect)
    assert(out.exists(_.getString(0) == "(pre-migration)"),
      "no pre-migration bucket — vintage 1 contributed nothing")
    assert(out.length > 1, "drifted column never materialized")
  }

  // ------------------------------------------------------- cdc_apply ---

  test("cdc_apply: one-shuffle last-writer-wins apply equals the naive " +
    "driver-side changelog replay under duplicate delivery") {
    val base = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    // naive replay: apply I, then U, then D in version order (dup U is
    // idempotent); snapshot = surviving (status, cents)
    val snapshot = scala.collection.mutable.Map.empty[Long, (String, Long)]
    base.foreach { case (k, st, c) => snapshot(k) = (st, c) }          // v1 I
    base.foreach { case (k, st, c) =>                                  // v2 U x2
      if (k % 3 == 0) { snapshot(k) = (st, c + 500); snapshot(k) = (st, c + 500) }
    }
    base.foreach { case (k, _, _) => if (k % 7 == 0) snapshot.remove(k) } // v3 D
    val expect = snapshot.values.toSeq.groupBy(_._1).map { case (st, vs) =>
      (st, vs.size.toLong, vs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = run("cdc_apply").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the delete leg is live: some keys vanished
    assert(expect.map(_._2).sum < base.length,
      "no key was deleted — the D path is vacuous")
  }

  // ------------------------------------------------ stream_tws_parity ---

  test("stream_tws_parity: transformWithState runs >= 4 micro-batches " +
    "with real cross-batch state merging, fixpoint == batch group-by") {
    val got = run("stream_tws_parity").collect().toSeq
    val exp = graft.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("total_cents"))
      .orderBy("user_id").collect().toSeq
    assert(got == exp)

    // mechanism probe: rerun inline to reach the progress feed; the
    // chunk layout interleaves every user across batches, so users MUST
    // be emitted repeatedly (cumulative updates), proving the ValueState
    // merge happened across batches rather than one degenerate batch
    import spark.implicits._
    val physical = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamed = spark.readStream.schema(physical)
      .option("maxFilesPerTrigger", "1")
      .parquet(StreamingOps.chunkDir(spark, sfDir))
    val src = if (physical("ts").dataType == LongType)
      streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else streamed
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = src.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[graft.streaming.Event]
      val q = ev.groupByKey(_.user_id)
        .transformWithState(new graft.streaming.RunningTotalsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .writeStream.format("memory").queryName("r12_tws_probe")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        assert(dataBatches >= 4,
          s"expected one micro-batch per chunk (4), saw $dataBatches")
        val emitted = spark.table("r12_tws_probe")
        val users = emitted.select("user_id").distinct().count()
        assert(emitted.count() > users,
          "every user emitted exactly once — no cross-batch state " +
            "merge happened")
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  // --------------------------------------------------- ann_prefilter ---

  test("ann_prefilter: neighbors respect the label predicate, match the " +
    "brute-force filtered top-3, and differ from the UNfiltered top-3 " +
    "for at least one query (the filter is load-bearing)") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def top3(qid: Long, filtered: Boolean): Seq[(Long, Double)] = {
      val (_, ql, qe) = byId(qid)
      vecs.filter(v => v._1 != qid && (!filtered || v._2 == ql))
        .map(v => (v._1, cos(qe, v._3)))
        .sortBy { case (id, c) => (-c, id) }.take(3).toSeq
    }
    val queries = vecs.map(_._1).filter(id => id % 100 == 0 && id < 5000)
      .sorted.toSeq
    val expect = queries.flatMap(q => top3(q, filtered = true)
      .map { case (id, c) => (q, id, c) })
    val got = run("ann_prefilter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.sortBy(t => (t._1, -t._3, t._2)) ==
      expect.sortBy(t => (t._1, -t._3, t._2)))
    got.foreach { case (q, id, _) =>
      assert(byId(id)._2 == byId(q)._2,
        s"neighbor $id of query $q violates the label predicate")
      assert(id != q, s"query $q returned itself")
    }
    assert(queries.exists(q =>
      top3(q, filtered = true).map(_._1) != top3(q, filtered = false).map(_._1)),
      "filtered and unfiltered top-3 agree for every query — the " +
        "predicate never mattered (vacuous fixture)")
  }

  // -------------------------------------------- exchange_reuse_audit ---

  test("exchange_reuse_audit: the twice-referenced aggregate computes " +
    "once (ReusedExchange in the executed plan), turning reuse off " +
    "removes it without changing the result") {
    val df = IncrOps.momSelfJoin(spark, sfDir)
    val out = df.collect().toSeq
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "no ReusedExchange — the aggregate was computed twice or the " +
        "plan shape changed")
    val key = "spark.sql.exchange.reuse"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val df2 = IncrOps.momSelfJoin(spark, sfDir)
      val noReuse = df2.collect().toSeq
      assert(!df2.queryExecution.executedPlan.toString.contains("ReusedExchange"),
        "ReusedExchange present with reuse disabled — the audit " +
          "asserts nothing")
      assert(out == noReuse, "reused plan diverges from the plain plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // naive replay: driver-side month totals + lag
    val monthly = graft.Tables.orders(spark, sfDir)
      .select(expr("CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)")
        .as("idx"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (i, vs) => i -> vs.map(_._2).sum }
    val expect = monthly.keys.toSeq.sorted.flatMap(i =>
      monthly.get(i - 1).map(p => (i, monthly(i), p)))
    assert(run("exchange_reuse_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == expect)
  }

  // -------------------------------------------------- hard_negatives ---

  test("hard_negatives: top-3 cross-label neighbors with triplet " +
    "margins match the brute-force replay; every negative has a " +
    "different label than its anchor") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val anchors = vecs.map(_._1).filter(id => id % 100 == 0 && id < 5000)
    val expect = anchors.sorted.flatMap { q =>
      val (_, ql, qe) = byId(q)
      val posCos = vecs.filter(v => v._1 != q && v._2 == ql)
        .map(v => cos(qe, v._3)).max
      vecs.filter(v => v._2 != ql)
        .map(v => (v._1, cos(qe, v._3)))
        .sortBy { case (id, c) => (-c, id) }.take(3)
        .map { case (id, c) => (q, id, c, r6(posCos - c)) }
    }.toSeq
    val got = run("hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expect)
    got.foreach { case (q, id, _, _) =>
      assert(byId(id)._2 != byId(q)._2,
        s"negative $id of anchor $q shares its label")
    }
    assert(got.nonEmpty)
  }

  // -------------------------------------------------- dp_count_noise ---

  test("dp_count_noise: noisy release replays the seeded Laplace " +
    "inverse-CDF, noise is live on every group, and the exact counts " +
    "survive beside it") {
    val exact = graft.Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val expect = exact.keys.toSeq.sorted.map { src =>
      val k = src.drop(3).toLong
      val u = ((k & 2147483647L) * 2654435761L % 1000003 + 1) / 1000004.0
      val noise = -2.0 * math.signum(u - 0.5) * math.log(1 - 2 * math.abs(u - 0.5))
      (src, exact(src), r4(exact(src) + noise), r4(math.abs(noise)))
    }
    val got = run("dp_count_noise").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expect)
    got.foreach { case (src, n, noisy, err) =>
      assert(noisy != n.toDouble, s"$src drew zero noise — the release " +
        "is the raw count (u hit exactly 0.5?)")
      assert(err > 0 && math.abs(r4(math.abs(noisy - n)) - err) <= 2e-4,
        s"$src: |noisy - n| inconsistent with the published abs_err")
    }
  }

  // ------------------------------------------- cbo_join_reorder_audit ---

  test("cbo_join_reorder_audit: with ANALYZE stats the CBO joins the " +
    "selective dimensions first (order changes vs the written plan), " +
    "without it the written order survives, and both agree") {
    def joinOrder(plan: String, t: (String, String, String)): Seq[String] = {
      val (li, or, cu) = t
      val pat = s"($li|$or|$cu)".r
      pat.findAllIn(plan).toList.distinct
    }
    val (viaCbo, orderCbo, names) = IncrOps.withCbo(spark)(enabled = true) {
      val (df, t) = IncrOps.cboStarJoin(spark, sfDir)
      val rows = df.collect().toSeq
      (rows, joinOrder(df.queryExecution.optimizedPlan.toString, t), t)
    }
    val (viaOff, orderOff) = IncrOps.withCbo(spark)(enabled = false) {
      val (df, t) = IncrOps.cboStarJoin(spark, sfDir)
      (df.collect().toSeq, joinOrder(df.queryExecution.optimizedPlan.toString, t))
    }
    assert(orderOff.head == names._1,
      s"written order should scan the fact table first, got $orderOff")
    assert(orderCbo != orderOff,
      s"CBO did not reorder the join: $orderCbo == $orderOff — the " +
        "audit is vacuous")
    assert(orderCbo.head != names._1,
      s"CBO still joins the fact table first: $orderCbo")
    assert(viaCbo == viaOff, "reordered result diverges from written order")
    assert(run("cbo_join_reorder_audit").collect().toSeq == viaCbo)
  }

  // ------------------------------------------------- span_mask_stats ---

  test("span_mask_stats: per-position replay of the seeded span " +
    "corruption, mask rate lands near the T5 target, and overlapping " +
    "spans union (masked < 3 x starts somewhere)") {
    def starts(docId: Long, p: Long): Boolean =
      ((docId * 131071 + p) & 2147483647L) * 2654435761L % 1000003 + 1 <
        0.05 * 1000004.0
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val expect = docs.sortBy(_._1).map { case (id, n) =>
      val st = (1L to n).count(p => starts(id, p)).toLong
      val mk = (1L to n).count(p => starts(id, p) ||
        (p >= 2 && starts(id, p - 1)) || (p >= 3 && starts(id, p - 2))).toLong
      (id, n, st, mk, math.floor(mk * 10000.0 / n + 0.5) / 10000)
    }.toSeq
    val got = run("span_mask_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    val totalTok = expect.map(_._2).sum.toDouble
    val rate = expect.map(_._4).sum / totalTok
    assert(rate > 0.08 && rate < 0.22,
      f"corpus mask rate $rate%.3f far from the ~15%% target")
    assert(expect.exists(e => e._3 > 0 && e._4 < 3 * e._3),
      "no document has overlapping/truncated spans — union semantics " +
        "untested")
    assert(expect.forall(e => e._4 <= 3 * e._3),
      "masked count exceeds 3 x span starts — mask leaked outside spans")
  }

  // ------------------------------------- stream_init_state_parity ---

  test("stream_init_state_parity: batch bootstrap seeds the stream's " +
    "state (totals include pre-stream history), the stream reads only " +
    "the 2 tail chunks, and the fixpoint equals the whole-corpus " +
    "group-by for tail-active users") {
    val got = run("stream_init_state_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val chunks = StreamingOps.timeChunkDir(spark, sfDir)
    def load(glob: String) = {
      val raw = spark.read.option("pathGlobFilter", glob).parquet(chunks)
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    }
    def totals(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("c"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val boot = totals(load("chunk_0[01].parquet"))
    val tail = totals(load("chunk_0[23].parquet"))
    // contract: exactly the tail-active users, whole-corpus totals
    val expect = tail.keys.toSeq.sorted.map { u =>
      val (bn, bc) = boot.getOrElse(u, (0L, 0L))
      val (tn, tc) = tail(u)
      (u, bn + tn, bc + tc)
    }
    assert(got == expect)
    // the bootstrap is load-bearing: some tail user carries history,
    // and its emitted total EXCEEDS anything the tail alone could give
    val carried = tail.keys.filter(u => boot.getOrElse(u, (0L, 0L))._1 > 0)
    assert(carried.nonEmpty,
      "no tail user has bootstrap history — initial state untested")
    carried.take(5).foreach { u =>
      val n = got.find(_._1 == u).get._2
      assert(n > tail(u)._1,
        s"user $u's total $n does not exceed its tail-only count " +
          s"${tail(u)._1} — initial state was not loaded")
    }
    // bootstrap-only users (no tail activity) must NOT surface
    val bootOnly = boot.keySet -- tail.keySet
    assert(got.map(_._1).toSet.intersect(bootOnly).isEmpty,
      "bootstrap-only users emitted — handleInitialState leaked output")
  }

  // --------------------------------------------------- orc_roundtrip ---

  test("orc_roundtrip: the ORC copy is row-identical to the parquet " +
    "original, the predicate reaches the ORC scan as a pushed filter, " +
    "and the gate aggregate matches the raw replay") {
    val out = run("orc_roundtrip").collect().toSeq
    val orc = spark.read.orc(IncrOps.orcOrders(spark, sfDir))
    val raw = graft.Tables.orders(spark, sfDir)
    assert(orc.schema == raw.schema,
      s"ORC round-trip changed the schema:\n${orc.schema}\nvs\n${raw.schema}")
    assert(orc.count() == raw.count())
    assert(orc.exceptAll(raw).isEmpty && raw.exceptAll(orc).isEmpty,
      "ORC rows differ from the parquet original")
    // pushdown: the filter must appear on the ORC scan node
    val df = orc.filter(col("o_totalprice") >= 150000)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec over the ORC dir"))
    assert(scan.relation.fileFormat.toString.toLowerCase.contains("orc"),
      s"scan is not ORC: ${scan.relation.fileFormat}")
    assert(scan.dataFilters.exists(_.toString.contains("o_totalprice")),
      s"predicate not pushed to the ORC scan: ${scan.dataFilters}")
    assert(scan.metadata.get("PushedFilters").exists(p =>
      p.contains("GreaterThanOrEqual(o_totalprice")),
      s"PushedFilters missing the range predicate: ${scan.metadata.get("PushedFilters")}")
    // gate replay
    val expect = raw.filter(col("o_totalprice") >= 150000)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(out == expect)
    assert(out.nonEmpty, "threshold filtered everything — gate vacuous")
  }
}
