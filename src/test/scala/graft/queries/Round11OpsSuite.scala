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
}
