package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property / plan pins for the round-11 cleanups and operators, at
  * sf0.001 — the spec leg of the oracle+spec+plan discipline. */
class Round11OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("zorder_layout: standalone invocation leaves no persisted RDDs") {
    // r10 advisor: the Morton projection was cached with release
    // deferred to the battery's reset(), so library callers leaked
    // ~20 MB (SF-scaled) per call. The cache is now scoped to the two
    // eager rank passes — after run() + materialization, nothing stays
    // persisted (rank output executes off the already-materialized
    // range shuffles, so correctness is unchanged — the oracle row
    // re-proved that at both SFs this round).
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val out = run("zorder_layout").collect()
    assert(out.length == 2)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"zorder_layout left persisted RDDs behind: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
  }

  test("slo_burn_rate: day-key fan-out plan (no nested-loop join) " +
    "matches the naive trailing-7-day replay") {
    val df = run("slo_burn_rate")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "slo_burn_rate should be a bounded ×7 fan-out EQUI-join now")
    // naive replay: per-day counts, then an O(days²) trailing-window
    // scan over the collected ≤|days| daily relation
    val daily = graft.Tables.events(spark, sfDir)
      .select(to_date(date_trunc("day", col("ts"))).as("day"),
        when(col("value") > 90, 1L).otherwise(0L).as("bad"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("bad").as("nbad"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    def r6(v: Double) = math.floor(v * 1000000 + 0.5) / 1000000
    val expect = daily.map { case (d, n, nbad) =>
      val w = daily.filter { case (b, _, _) =>
        !b.isBefore(d.minusDays(6)) && !b.isAfter(d) }
      val n7 = w.map(_._2).sum
      val nbad7 = w.map(_._3).sum
      val b1 = r6(nbad.toDouble / n / 0.05)
      val b7 = r6(nbad7.toDouble / n7 / 0.05)
      val sev = if (b1 >= 14.4 && b7 >= 6) "page"
        else if (b7 >= 1) "ticket" else "ok"
      (d.toString, b1, b7, sev)
    }.sortBy { case (d, b1, _, _) => (-b1, d) }.take(15)
    val got = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == expect.toSeq)
  }

  test("bucket_join_audit: exchange-free sort-free bucketed join, " +
    "result identical to the unbucketed join") {
    val df = run("bucket_join_audit")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      "bucketed fact-fact join must be a SortMergeJoin")
    assert("Bucketed: true".r.findAllIn(plan).size >= 2,
      s"both scans must be bucketed reads:\n$plan")
    // THE claim: no shuffle and no sort anywhere on the join key —
    // the bucket layout (8 buckets, one sorted file each) feeds the
    // merge join directly. The only Exchanges in the plan are the
    // 5-group aggregate + presentation sort AFTER the join.
    val exchanges = "Exchange [^\n]*".r.findAllIn(plan).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("o_orderpriority")),
      s"unexpected Exchange (join-key shuffle?): $exchanges")
    val sorts = "[+\\-:] Sort \\[[^\n]*".r.findAllIn(plan).toList
    assert(sorts.forall(x => !x.contains("orderkey")),
      s"join-side Sort should be eliminated by sortBy metadata: $sorts")
    // result ≡ unbucketed join (the oracle proves this vs DuckDB; the
    // spec re-proves it vs Spark's own unbucketed plan)
    val plain = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("stream_timeout_parity: naive sessionizer replay, and the " +
    "timeout path provably fired") {
    val got = run("stream_timeout_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // naive driver-side replay of the whole protocol: ms-truncated
    // event times, 30-min-gap islands per user, final watermark
    // max_ms − 10 min, emit non-final sessions plus final sessions
    // whose end + gap < watermark (the strict timeout comparator)
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) DIV 1000 AS m",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wm = ev.map(_._2).max - 600000L
    val gap = 1800000L
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)] // s, e, n, cents
      sorted.foreach { case (m, c) =>
        if (sessions.nonEmpty && m - sessions.last._2 <= gap) {
          val s0 = sessions.last
          sessions(sessions.length - 1) = (s0._1, m, s0._3 + 1, s0._4 + c)
        } else sessions += ((m, m, 1L, c))
      }
      val umax = sorted.last._1
      sessions.collect {
        case (s0, e0, n, c) if e0 < umax || e0 + gap < wm =>
          (uid, s0, e0, n, c)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expect)
    // the timeout-only emissions: a user's FINAL session has no later
    // event to close it — it can only have been emitted by the
    // EventTimeTimeout branch. Require at least one in the output.
    val timeoutOnly = expect.groupBy(_._1).values
      .map(_.maxBy(_._2)).count { case (uid, _, e0, _, _) =>
        e0 + gap < wm &&
          ev.filter(_._1 == uid).map(_._2).max == e0
      }
    assert(timeoutOnly > 0,
      "fixture produced no timeout-path emission; the gate is vacuous")
  }

  test("dup_span_bounds: w-gram union ≡ brute-force all-length " +
    "duplicated-substring enumeration (the no-suffix-array-needed proof)") {
    // synthetic corpus over a 4-token alphabet so length-≥5 repeats
    // are dense: brute-force enumerate EVERY substring of EVERY
    // length ≥ 5, count corpus-wide occurrences, mark covered tokens —
    // the literal Lee-2022 removal set — and check it equals the
    // duplicated-5-gram window union the operator computes.
    val rng = new scala.util.Random(42)
    val docs = (0 until 15).map { d =>
      d.toLong -> Array.fill(20 + rng.nextInt(12))(s"t${rng.nextInt(4)}")
    }
    val w = 5
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ws) <- docs; l <- w to ws.length; i <- 0 to ws.length - l)
      counts(ws.slice(i, i + l).toSeq) =
        counts.getOrElse(ws.slice(i, i + l).toSeq, 0) + 1
    val bruteCovered = docs.map { case (d, ws) =>
      d -> (for {
        l <- w to ws.length; i <- 0 to ws.length - l
        if counts(ws.slice(i, i + l).toSeq) >= 2
        t <- i until (i + l)
      } yield t).toSet
    }.toMap
    val gramCovered = docs.map { case (d, ws) =>
      d -> (for {
        i <- 0 to ws.length - w
        if counts(ws.slice(i, i + w).toSeq) >= 2
        t <- i until (i + w)
      } yield t).toSet
    }.toMap
    assert(bruteCovered == gramCovered)

    // and the declared query replays the same protocol on the fixture
    val fixture = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      .filter(_._2.length >= w)
    val gc = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ws) <- fixture; i <- 0 to ws.length - w)
      gc(ws.slice(i, i + w).toSeq) = gc.getOrElse(ws.slice(i, i + w).toSeq, 0) + 1
    val expect = fixture.flatMap { case (d, ws) =>
      val hit = (1 to ws.length - w + 1)
        .filter(i => gc(ws.slice(i - 1, i - 1 + w).toSeq) >= 2)
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      hit.foreach { i =>
        if (spans.nonEmpty && i - spans.last._2 <= 5) {
          val s0 = spans.last
          spans(spans.length - 1) = (s0._1, i, s0._3 + 1)
        } else spans += ((i, i, 1L))
      }
      spans.map { case (a, b, nw) =>
        (d, a.toLong, b.toLong + 4, (b - a + 5).toLong, nw) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = run("dup_span_bounds").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("skyline_pareto: prefix-max plan matches brute-force dominance, " +
    "no quadratic operator in the plan") {
    val df = run("skyline_pareto")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "skyline must be agg + prefix-max + equi-join, never pairwise")
    val pts = graft.Tables.part(spark, sfDir)
      .selectExpr("p_partkey", "CAST(p_size AS BIGINT) AS s",
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = pts.filter { case (_, s, c) =>
      !pts.exists { case (_, s2, c2) =>
        s2 >= s && c2 >= c && (s2 > s || c2 > c) }
    }.sortBy { case (k, s, _) => (-s, k) }
      .map { case (k, s, c) => (k, s, c) }.toSeq
    val got = run("skyline_pareto").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty && got.size < pts.length,
      "skyline should be a proper non-empty subset")
  }

  test("partition_prune_audit: scan opens ONLY the three pruned month " +
    "directories, and the partitioned rewrite lost nothing") {
    val df = run("partition_prune_audit")
    val out = df.collect()
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the physical plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("o_month")),
      s"partition filter must be pushed to the scan: ${scan.partitionFilters}")
    // planning-time pruning: the file index, asked with the scan's own
    // partition filters, lists exactly the 3 selected month dirs (the
    // layout writes one file per month -> 3 files)
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    assert(pruned.length == 3, s"expected 3 pruned partitions, got ${pruned.length}")
    assert(pruned.map(_.files.size).sum == 3,
      s"expected 3 files, got ${pruned.map(_.files.size).sum}")
    val total = scan.relation.location.listFiles(Nil, Nil)
    assert(total.length > 70,
      s"fixture should have ~80 month partitions, got ${total.length}")
    // rewrite fidelity: same quarter from the raw table
    val expect = graft.Tables.orders(spark, sfDir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_month").isin("1997-01", "1997-02", "1997-03"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_month").collect()
    assert(out.toSeq == expect.toSeq)
  }

  test("cascade_delete_audit: semi-join chain counts equal the naive " +
    "membership walk") {
    val cust = graft.Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
    val delC = cust.filter(_ % 10 == 3).toSet
    val ords = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delO = ords.filter(o => delC(o._2)).map(_._1).toSet
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey").collect().map(_.getLong(0))
    val delL = li.count(delO)
    val got = run("cascade_delete_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = Seq(
      ("customer", delC.size.toLong, cust.length.toLong,
        (cust.length - delC.size).toLong),
      ("lineitem", delL.toLong, li.length.toLong, (li.length - delL).toLong),
      ("orders", delO.size.toLong, ords.length.toLong,
        (ords.length - delO.size).toLong))
    assert(got.toSeq == expect)
  }

  test("weighted_sample: Efraimidis-Spirakis top-k equals the naive " +
    "per-stratum key sort") {
    val docsRows = graft.Tables.documents(spark, sfDir)
      .selectExpr("source", "CAST(doc_id AS BIGINT) AS doc_id",
        "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0)
    val expect = docsRows.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, id, nc) =>
        val u = (((id & 2147483647L) * 2654435761L) % 1000003 + 1) / 1000004.0
        (id, nc, -math.log(u) / nc)
      }.sortBy { case (id, _, k) => (k, id) }.take(8).zipWithIndex
        .map { case ((id, nc, _), i) => (src, i + 1, id, nc) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = run("weighted_sample")
      .selectExpr("source", "CAST(rn AS INT) AS rn",
        "CAST(doc_id AS BIGINT) AS doc_id", "CAST(n_chars AS BIGINT) AS nc")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // heavier docs must be over-represented vs uniform: the sampled
    // mean n_chars should exceed the corpus mean (A-ES is
    // weight-proportional by construction; this pins the direction)
    val corpusMean = docsRows.map(_._3).sum.toDouble / docsRows.length
    val sampleMean = got.map(_._4).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("stream_dedup_within_parity: pinned two-trigger-lag protocol " +
    "replays the exec, and every path fired") {
    val rows = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "event_id % 4 AS c",
        """CASE WHEN event_id % 5 = 0
          |  THEN 64800 + (event_id % 4) * 43200
          |  ELSE ((user_id & 2147483647) * 2654435761) % 690 * 60 + 90
          |    + (event_id % 4) *
          |      (CASE WHEN user_id % 3 = 0 THEN 1800 ELSE 43200 END)
          |END AS h""".stripMargin,
        "event_id % 5 = 0 AS clock")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val chunkMax = rows.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap
    val m0 = chunkMax(0L)
    val m1 = math.max(m0, chunkMax(1L))
    val delta = 3600L
    // V_k = watermark two triggers back (the pinned lag): -inf, -inf,
    // M_0 - delta, M_1 - delta
    val v = Array(Long.MinValue, Long.MinValue, m0 - delta, m1 - delta)
    val keyed = rows.filterNot(_._5)
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => r._3 -> r._4).toMap).toMap
    var reEmit = 0; var dupDrop = 0; var late = 0
    val expect = keyed.toSeq.flatMap { case ((u, e), hs) =>
      var state = Option.empty[Long]
      val emits = scala.collection.mutable.ArrayBuffer.empty[Long]
      (0 to 3).foreach { c =>
        hs.get(c.toLong).foreach { h =>
          if (state.exists(_ + delta < v(c))) { state = None }
          if (h < v(c)) { late += 1 }
          else if (state.isEmpty) {
            if (emits.nonEmpty) reEmit += 1
            emits += h; state = Some(h)
          } else dupDrop += 1
        }
      }
      emits.map(h => (u, e, h))
    }.sortBy(t => (t._1, t._2, t._3))
    val anchorMs = graft.Tables.events(spark, sfDir)
      .selectExpr("unix_millis(date_trunc('month', min(ts)))")
      .head().getLong(0)
    val got = run("stream_dedup_within_parity").collect()
      .map(r => (r.getLong(0), r.getString(1),
        (r.getLong(2) - anchorMs) / 1000)).toSeq
    assert(got == expect)
    assert(reEmit > 0, "eviction/re-emission path never fired")
    assert(dupDrop > 0, "duplicate-drop path never fired")
    assert(late > 0, "late-input path never fired")
  }

  test("markov_attribution: independent journey replay + removal-effect " +
    "invariants") {
    // naive replay: collect raw events, walk each user's journey in
    // (ts, event_id) order, truncate at first purchase, count
    // transitions, run the SAME pinned 12-step integer recurrence —
    // no window functions, no unions, a from-scratch reimplementation
    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3)))
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val path0 = rows.sortBy(r => (r._2, r._3))
        .map(r => if (r._4 == "purchase") "CONV" else r._4)
      val cut = path0.indexOf("CONV")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      var prev = "START"
      path.foreach { st =>
        cells((prev, st)) = cells.getOrElse((prev, st), 0L) + 1; prev = st }
      if (cut < 0)
        cells((prev, "NULL")) = cells.getOrElse((prev, "NULL"), 0L) + 1
    }
    val tot = cells.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val states = tot.keySet.toSeq.sorted
    val channels = states.filterNot(_ == "START")
    def solve(removed: Option[String]): Long = {
      var v = states.map(_ -> 0L).toMap
      for (_ <- 1 to 12) v = states.map { a =>
        a -> (states.map { b =>
          if (removed.contains(b)) 0L
          else cells.getOrElse((a, b), 0L) * v(b) / tot(a)
        }.sum + cells.getOrElse((a, "CONV"), 0L) * 1000000000L / tot(a))
      }.toMap
      v("START")
    }
    val baseV = solve(None)
    val res = channels.map(c => (c, baseV - solve(Some(c))))
    val sre = res.map(_._2).sum
    val expect = res.map { case (c, re) =>
      (c, baseV, re, if (sre == 0) 0L else re * 1000000L / sre) }
    val got = run("markov_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    // invariants: removal can only hurt conversion; credit shares form
    // a (floor-truncated) distribution; the chain actually converts
    assert(baseV > 0, "fixture has no conversions; gate is vacuous")
    assert(got.forall { case (_, b, re, _) => re >= 0 && re <= b })
    assert(got.map(_._4).sum <= 1000000L && got.map(_._4).sum > 900000L)
  }

  test("k_betweenness: brute-force capped Brandes replay (BFS + sigma + " +
    "integer dependency accumulation)") {
    // from-scratch reimplementation: collect the co-purchase edges,
    // run textbook Brandes from each seed with the 3-hop cap and the
    // same 1e-6 integer-grid backward recurrence
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    li.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).distinct
      for (a <- ps; b <- ps if a != b)
        adj(a) = adj.getOrElse(a, Set.empty) + b
    }
    val seeds = adj.keys.filter(_ % 1000 == 0).toSeq.sorted
    val U = 1000000L
    val bc = scala.collection.mutable.Map.empty[Long, Long]
    seeds.foreach { s0 =>
      var levels = Vector(Map(s0 -> 1L)) // level -> node -> sigma
      var visited = Set(s0)
      for (_ <- 1 to 3) {
        val cur = levels.last
        val nx = scala.collection.mutable.Map.empty[Long, Long]
        cur.foreach { case (u, sig) =>
          adj.getOrElse(u, Set.empty).foreach { w =>
            if (!visited(w)) nx(w) = nx.getOrElse(w, 0L) + sig } }
        visited ++= nx.keys
        levels :+= nx.toMap
      }
      var delta = levels(3).map { case (v, _) => v -> 0L }
      for (l <- 2 to 1 by -1) {
        val succ = levels(l + 1)
        delta = levels(l).map { case (v, sig) =>
          v -> adj.getOrElse(v, Set.empty).toSeq.flatMap { w =>
            succ.get(w).map(ws => sig * (U + delta.getOrElse(w, 0L)) / ws)
          }.sum
        }
        delta.foreach { case (v, dq) => bc(v) = bc.getOrElse(v, 0L) + dq }
      }
    }
    val expect = bc.toSeq.sortBy { case (v, b) => (-b, v) }.take(20)
    val got = run("k_betweenness").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.exists(_._2 > 0), "all-zero betweenness; gate is vacuous")
  }

  test("runtime_filter_audit: bloom runtime filter injected on the fact " +
    "scan, result identical to the unfiltered-plan join") {
    val (planStr, viaBloom) = graft.queries.IncrOps.withRuntimeFilter(spark) {
      val df = graft.queries.IncrOps.runtimeFilteredJoin(spark, sfDir)
      (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
    }
    assert(planStr.contains("bloom_filter_agg") &&
      planStr.contains("might_contain"),
      s"runtime bloom filter was not injected:\n$planStr")
    // without the conf window: plain plan, no bloom, same rows
    val dfPlain = graft.queries.IncrOps.runtimeFilteredJoin(spark, sfDir)
    assert(!dfPlain.queryExecution.optimizedPlan.toString
      .contains("bloom_filter_agg"),
      "control plan unexpectedly carries a runtime filter")
    assert(viaBloom == dfPlain.collect().toSeq)
    assert(run("runtime_filter_audit").collect().toSeq == viaBloom)
  }
}
