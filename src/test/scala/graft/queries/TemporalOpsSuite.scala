package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property pins for the temporal/event-stream operators — invariants
  * the oracle gate's value equality can't state directly, plus the
  * naive-recompute parity checks that catch window-frame off-by-ones. */
class TemporalOpsSuite extends SparkSpec {

  test("interval_merge: islands are disjoint and cover every interval") {
    val out = TemporalOps.intervalMerge.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // Coverage can't exceed raw summed length, and must be positive;
    // islands count can't exceed interval count per user.
    val raw = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), floor(col("value")).cast("long").as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("rawlen"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (rawlen, n) = raw(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("covered_s") <= rawlen)
      assert(r.getAs[Long]("n_islands") <= n)
      assert(r.getAs[Long]("max_len_s") <= r.getAs[Long]("covered_s"))
    }
  }

  test("max_concurrency: matches a naive per-user point-count recompute") {
    val iv = graft.Tables.events(spark, sfDir)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("st"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast("long")).as("en"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expected = iv.map { case (u, rows) =>
      val ivs = rows.map(r => (r.getAs[Long]("st"), r.getAs[Long]("en")))
      // At each start point, count intervals covering it (half-open).
      u -> ivs.map { case (t, _) =>
        ivs.count { case (s2, e2) => s2 <= t && t < e2 }
      }.max.toLong
    }
    val got = TemporalOps.maxConcurrency.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("max_cc")).toMap
    expected.foreach { case (u, m) =>
      assert(got(u) == m, s"user $u: sweep said ${got(u)}, naive says $m")
    }
  }

  test("attribution: conversions partition the purchase set") {
    val out = TemporalOps.attribution.run(spark, sfDir).collect()
    val totalPurchases = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getAs[Long]("conversions")).sum == totalPurchases)
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view", "none")))
  }

  test("acf: lag-0 identity sanity and bounded range") {
    val rows = TemporalOps.acfDaily.run(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val v = r.getAs[Double]("acf")
      assert(v >= -1.000001 && v <= 1.000001, s"acf out of range: $v")
      assert(r.getAs[Long]("pairs") > 0)
    }
  }

  test("rolling_z: z-scores match a naive sliding-window recompute") {
    val rows = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expected = rows.flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
      val cents = sorted.map(_.getAs[Long]("cents"))
      val zs = cents.indices.flatMap { i =>
        val win = cents.slice(math.max(0, i - 20), i)
        val n = win.length
        if (n >= 5) {
          val s = win.sum; val sq = win.map(c => c * c).sum
          if (n.toLong * sq > s * s) {
            val z = (cents(i) - s.toDouble / n) /
              math.sqrt((sq - s.toDouble * s / n) / (n - 1))
            Some(z)
          } else None
        } else None
      }
      if (zs.isEmpty) None
      else Some(u -> (zs.count(z => math.abs(z) > 3).toLong,
        math.floor(zs.map(math.abs).max * 1000000 + 0.5) / 1000000))
    }
    val got = TemporalOps.rollingZ.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_anomalies"), r.getAs[Double]("max_abs_z"))).toMap
    assert(expected.nonEmpty)
    expected.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: engine ${got(u)}, naive $e")
    }
    assert(got.keySet == expected.map(_._1).toSet)
  }

  test("twap_value: matches a naive per-user piecewise-constant integral") {
    val got = TemporalOps.twapValue.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val raw = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    raw.foreach { case (u, evs) =>
      val s = evs.sortBy(e => (e._3, e._2))
      val pairs = s.zip(s.tail)
      val wsum = pairs.map { case (a, b) =>
        math.floor(a._4 * 100 + 0.5) * (b._3 - a._3) }.sum
      val dsum = pairs.map { case (a, b) => (b._3 - a._3).toDouble }.sum
      if (dsum > 0) {
        val naive = wsum / dsum / 100
        assert(math.abs(got(u) - naive) < 1e-3, s"user $u: ${got(u)} vs $naive")
      }
    }
  }

  test("sliding_distinct_users: each window counts exactly the 7-day union") {
    val got = TemporalOps.slidingDistinct.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(date_trunc("day", col("ts")),
        "yyyy-MM-dd").as("day")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val days = ud.map(_._2).distinct
    days.foreach { d =>
      val end = java.time.LocalDate.parse(d, fmt)
      val naive = ud.filter { case (_, dd) =>
        val x = java.time.LocalDate.parse(dd, fmt)
        !x.isAfter(end) && x.isAfter(end.minusDays(7))
      }.map(_._1).distinct.length
      assert(got(d) == naive, s"window $d: ${got(d)} vs $naive")
    }
    assert(got.keySet == days.toSet)
  }

  test("holt_linear: fold matches a naive driver-side recurrence") {
    val got = TemporalOps.holtLinear.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val daily = graft.Tables.events(spark, sfDir)
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("user_id", "day").agg(sum("c").as("y")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (u, rows) =>
      val ys = rows.sortBy(_._2).map(_._3.toDouble)
      if (ys.length >= 2) {
        var l = ys.head; var b = 0.0
        ys.tail.foreach { y =>
          val l2 = 0.5 * y + 0.5 * (l + b)
          b = 0.5 * (l2 - l) + 0.5 * b
          l = l2
        }
        val (gl, gt) = got(u)
        assert(math.abs(gl - l / 100) < 1e-3 && math.abs(gt - b / 100) < 1e-3,
          s"user $u: ($gl, $gt) vs naive (${l / 100}, ${b / 100})")
      }
    }
  }

  test("holt_winters: fold matches a naive seasonal-ring recurrence") {
    val got = TemporalOps.holtWinters.run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == (1L to 7L).toSet)
    val ys = graft.Tables.orders(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2.toDouble)
    var l = ys.head; var b = 0.0; var s = Array.fill(7)(0.0)
    ys.tail.foreach { y =>
      val l2 = 0.5 * (y - s(0)) + 0.5 * (l + b)
      val b2 = 0.5 * (l2 - l) + 0.5 * b
      s = s.drop(1) :+ (0.5 * (y - l2) + 0.5 * s(0))
      l = l2; b = b2
    }
    (1 to 7).foreach { h =>
      val (nDays, gl, gt, gf) = got(h.toLong)
      assert(nDays == ys.length)
      assert(math.abs(gl - l / 100) < 1e-3, s"level $gl vs ${l / 100}")
      assert(math.abs(gt - b / 100) < 1e-3, s"trend $gt vs ${b / 100}")
      val fc = (l + h * b + s(h - 1)) / 100
      assert(math.abs(gf - fc) < 1e-3, s"h=$h forecast $gf vs $fc")
    }
  }

  test("cohort_ltv: per-cohort LTV is cumulative and replays naively") {
    val rows = TemporalOps.cohortLtv.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // LTV never decreases with age inside a cohort
    rows.groupBy(_._1).values.foreach { l =>
      l.sortBy(_._2).map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9)
        case _           => ()
      }
    }
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("datediff(CAST(date_trunc('day', ts) AS DATE), " +
          "DATE '1970-01-01')"),
        floor(col("value") * 100 + lit(0.5)).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, l) => u -> l.map(_._3).min }
    val sz = su.values.groupBy(d => d / 7).map(t => (t._1.toLong, t._2.size))
    rows.foreach { case (cw, age, nUsers, ltv) =>
      assert(nUsers == sz(cw).toLong)
      val rev = ev.filter(e => e._2 == "purchase" && su.contains(e._1)
        && su(e._1) / 7 == cw && e._3 >= su(e._1)
        && (e._3 - su(e._1)) / 7 <= age).map(_._4).sum
      val exp = math.floor(rev.toDouble / nUsers / 100 * 10000 + 0.5) / 10000
      assert(math.abs(ltv - exp) < 1e-9, s"cohort $cw age $age: $ltv vs $exp")
    }
  }

  test("mann_kendall: S and z replay a naive pair scan with ties") {
    val row = TemporalOps.mannKendall.run(spark, sfDir).collect().head
    val ys = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val n = ys.length
    var s0 = 0L
    for (i <- ys.indices; j <- i + 1 until n)
      s0 += java.lang.Long.signum(ys(j) - ys(i))
    val tc = ys.groupBy(identity).values.map(_.size.toLong)
      .filter(_ > 1).map(tp => tp * (tp - 1) * (2 * tp + 5)).sum
    val vr = (n.toDouble * (n - 1) * (2 * n + 5) - tc) / 18.0
    val z = if (s0 > 0) (s0 - 1) / math.sqrt(vr)
      else if (s0 < 0) (s0 + 1) / math.sqrt(vr) else 0.0
    assert(row.getLong(0) == n.toLong && row.getLong(1) == s0)
    assert(math.abs(row.getDouble(3)
      - math.floor(z * 10000 + 0.5) / 10000) < 1e-9)
    val trend = if (z > 1.959964) "increasing"
      else if (z < -1.959964) "decreasing" else "none"
    assert(row.getString(4) == trend)
  }

  test("retention_curve: cohort shares replay a naive per-user check") {
    val rows = TemporalOps.retentionCurve.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 7L))
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).cast("date")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate))
    val signup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, l) => u -> l.map(_._3).min }
    val active = ev.groupBy(_._1).map { case (u, l) => u -> l.map(_._3).toSet }
    (1 to 7).foreach { k =>
      val n = signup.count { case (u, sd) => active(u).contains(sd.plusDays(k)) }
      val row = rows(k - 1)
      assert(row._2 == signup.size.toLong)
      assert(row._3 == n.toLong, s"day $k: ${row._3} vs $n")
      assert(math.abs(row._4 - math.floor(n.toDouble / signup.size
        * 1000000 + 0.5) / 1000000) < 1e-9)
    }
  }

  test("value_drift_kl: KL nonnegative and replays smoothed bins") {
    val row = TemporalOps.valueDriftKl.run(spark, sfDir).collect().head
    val (np, nq, nb, kl) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3))
    assert(np > 0 && nq > 0 && nb >= 1 && nb <= 10)
    assert(kl >= -1e-9, s"KL must be nonnegative, got $kl")
    val os = graft.Tables.orders(spark, sfDir)
      .select(col("o_totalprice"), year(col("o_orderdate"))).collect()
      .map(r => (math.min(math.floor(r.getDouble(0) / 50000).toLong, 9L),
        r.getInt(1)))
    val p = os.filter(_._2 == 1996).groupBy(_._1).map(t => t._1 -> t._2.size)
    val q = os.filter(_._2 == 2000).groupBy(_._1).map(t => t._1 -> t._2.size)
    val bins = (p.keySet ++ q.keySet).toSeq.sorted
    assert(nb == bins.length.toLong)
    val expKl = bins.map { b =>
      val cp = p.getOrElse(b, 0); val cq = q.getOrElse(b, 0)
      val pp = (cp + 1.0) / (np + nb); val qq = (cq + 1.0) / (nq + nb)
      pp * math.log(pp / qq)
    }.sum
    assert(math.abs(kl - math.floor(expKl * 1000000 + 0.5) / 1000000)
      < 1e-6)
  }

  test("price_index: base year is unity and Fisher sits between L and P") {
    val rows = TemporalOps.priceIndex.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.nonEmpty && rows.head._1 == 1995L)
    assert(rows.head._2 == 1.0 && rows.head._3 == 1.0
      && rows.head._4 == 1.0, s"base year ${rows.head}")
    rows.foreach { case (y, l, p, f) =>
      assert(l > 0 && p > 0, s"year $y")
      assert(f >= math.min(l, p) - 1e-4 && f <= math.max(l, p) + 1e-4,
        s"year $y: fisher $f outside [$l, $p]")
      // the geometric-mean identity up to display rounding
      assert(math.abs(f - math.sqrt(l * p)) < 1e-3)
    }
  }

  test("topk_turnover: overlaps replay a naive monthly top-20") {
    val rows = TemporalOps.topkTurnover.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val mc = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_format(date_trunc("month", col("o_orderdate")),
        "yyyy-MM").as("mon"), col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val tops = mc.map { case (m, l) =>
      m -> l.sortBy(t => (-t._3, t._2)).take(20).map(_._2).toSet
    }
    rows.foreach { case (ma, mb, common, jac) =>
      val inter = tops(ma).intersect(tops(mb)).size.toLong
      assert(common == inter, s"$ma->$mb: $common vs $inter")
      assert(math.abs(jac - math.floor(inter.toDouble / (40 - inter)
        * 1000000 + 0.5) / 1000000) < 1e-9)
    }
    // every consecutive month pair with data appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("ljung_box: Q replays the acf lags and respects the bound") {
    val row = TemporalOps.ljungBox.run(spark, sfDir).collect().head
    val (n, q, df, sig) = (row.getLong(0), row.getDouble(1),
      row.getLong(2), row.getBoolean(3))
    assert(df == 5 && q >= 0)
    assert(sig == (q > 11.0705 || (q == 11.0705 && false)))
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    assert(n == daily.size.toLong)
    val sx = daily.values.sum; val sxx = daily.values.map(x => x * x).sum
    val mu = sx.toDouble / n
    val s = (1 to 5).map { k =>
      val pairs = daily.toSeq.flatMap { case (d0, x) =>
        daily.get(d0 + k).map(x2 => (x, x2))
      }
      val c = pairs.length.toLong
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val r = (sxy - mu * (sa + sb) + c * mu * mu) / (sxx - n * mu * mu)
      r * r / (n - k)
    }.sum
    val expQ = math.floor(n * (n + 2) * s * 10000 + 0.5) / 10000
    assert(math.abs(q - expQ) < 1e-6, s"Q $q vs $expQ")
  }

  test("overdispersion_check: moments replay; identity D = var/mean") {
    val row = TemporalOps.overdispersionCheck.run(spark, sfDir)
      .collect().head
    val cs = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c")).collect().map(_.getLong(1))
    val n = cs.length
    val mean = cs.sum.toDouble / n
    val vr = (cs.map(c => c.toDouble * c).sum - cs.sum.toDouble * cs.sum / n) / (n - 1)
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - math.floor(mean * 10000 + 0.5) / 10000) < 1e-9)
    assert(math.abs(row.getDouble(3)
      - math.floor(vr / mean * 10000 + 0.5) / 10000) < 1e-3)
    val z = (vr / mean - 1) * math.sqrt((n - 1) / 2.0)
    assert(row.getBoolean(5) == (z > 1.644854))
  }

  test("seasonal_strength: in [0,1] and consistent with decompose") {
    val row = TemporalOps.seasonalStrength.run(spark, sfDir).collect().head
    val fs = row.getDouble(3)
    assert(fs >= 0 && fs <= 1, s"strength $fs")
    val (vd, vr) = (row.getDouble(1), row.getDouble(2))
    assert(vd > 0 && vr >= 0 && vr <= vd + 1e-6)
    // identity: strength == 1 - var_rem/var_det up to display rounding
    assert(math.abs(fs - math.max(0.0, 1 - vr / vd)) < 1e-3)
  }

  test("kleinberg_burst: flags replay a naive Viterbi") {
    val rows = TemporalOps.kleinbergBurst.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val tt = daily.length
    val nn = daily.map(_._2).sum; val cc = daily.map(_._3).sum
    val p0 = cc.toDouble / nn
    val (lh0, lm0) = (math.log(p0), math.log(1.0 - p0))
    val (lh1, lm1) = (math.log(2.0 * p0), math.log(1.0 - 2.0 * p0))
    val lnt = math.log(tt.toDouble)
    def sig(i: Int, lh: Double, lm: Double): Double =
      -(daily(i)._3 * lh + (daily(i)._2 - daily(i)._3) * lm)
    var d0 = sig(0, lh0, lm0); var d1 = lnt + sig(0, lh1, lm1)
    val preds = Array.ofDim[(Int, Int)](tt - 1)
    for (i <- 1 until tt) {
      val p0c = if (d0 <= d1) 0 else 1
      val p1c = if (d0 + lnt < d1) 0 else 1
      preds(i - 1) = (p0c, p1c)
      val nd0 = sig(i, lh0, lm0) + math.min(d0, d1)
      val nd1 = sig(i, lh1, lm1) + math.min(d0 + lnt, d1)
      d0 = nd0; d1 = nd1
    }
    var cur = if (d0 <= d1) 0 else 1
    val flags = Array.fill(tt)(0)
    flags(tt - 1) = cur
    for (i <- tt - 1 to 1 by -1) {
      cur = if (cur == 0) preds(i - 1)._1 else preds(i - 1)._2
      flags(i - 1) = cur
    }
    assert(rows.length == tt)
    rows.zip(daily).zipWithIndex.foreach { case (((rd, rn, rc, rb), (dd, dn, dc)), i) =>
      assert(rd == dd && rn == dn && rc == dc)
      assert(rb == (flags(i) == 1), s"day $rd burst $rb vs ${flags(i)}")
    }
  }

  test("max_drawdown: replays a naive running-peak scan") {
    val row = TemporalOps.maxDrawdown.run(spark, sfDir).collect().head
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
        .when(col("event_type") === "error",
          -floor(col("value") * 100 + lit(0.5)).cast("long"))
        .otherwise(0L)).as("flow"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L; var peak = Long.MinValue; var peakDayOfPeak = ""
    var mdd = Long.MinValue; var trough = ""; var peakDay = ""
    daily.foreach { case (day, f) =>
      cum += f
      if (cum > peak) { peak = cum; peakDayOfPeak = day }
      val draw = peak - cum
      if (draw > mdd) { mdd = draw; trough = day; peakDay = peakDayOfPeak }
    }
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getString(1) == peakDay, s"${row.getString(1)} vs $peakDay")
    assert(row.getString(2) == trough)
    assert(math.abs(row.getDouble(3)
      - math.floor(mdd.toDouble / 100 * 10000 + 0.5) / 10000) < 1e-9)
  }

  test("adf_test: beta and t replay a naive lag-pair OLS") {
    val row = TemporalOps.adfTest.run(spark, sfDir).collect().head
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(floor(sum(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("y"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      .sortBy(_._1).toMap
    val dayMs = 86400000L
    val pairs = daily.toSeq.flatMap { case (t, y) =>
      daily.get(t + dayMs).map(y2 => (y, y2 - y))
    }
    val n = pairs.length.toLong
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val cxx = sxx - sx.toDouble * sx / n
    val cxy = sxy - sx.toDouble * sy / n
    val cyy = syy - sy.toDouble * sy / n
    val beta = cxy / cxx
    val s2 = (cyy - cxy / cxx * cxy) / (n - 2)
    val t = beta / math.sqrt(s2 / cxx)
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1)
      - math.floor(beta * 1000000 + 0.5) / 1000000) < 1e-9)
    assert(math.abs(row.getDouble(2)
      - math.floor(t * 10000 + 0.5) / 10000) < 1e-9)
    assert(row.getBoolean(3) == (t < -2.86))
  }

  test("event_regex_match: counts replay a per-user journey regex") {
    val got = TemporalOps.eventRegexMatch.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val journeys = ev.groupBy(_._1).map { case (u, l) =>
      u -> l.sortBy(e => (e._2, e._3)).map(e => e._4 match {
        case "click" => 'c'; case "view" => 'v'; case "signup" => 's'
        case "purchase" => 'p'; case _ => 'e'
      }).mkString
    }
    val pat = java.util.regex.Pattern.compile("c[^e]*p")
    val counts = journeys.map { case (u, j) =>
      val m = pat.matcher(j); var c = 0L
      while (m.find()) c += 1
      (u, j.length.toLong, c)
    }.filter(_._3 > 0).toSeq
      .sortBy(t => (-t._3, t._1)).take(20)
    assert(got.toSeq == counts, s"${got.toSeq}\nvs\n$counts")
  }

  test("rolling_corr: windows replay exact co-moments; r in [-1, 1]") {
    val rows = TemporalOps.rollingCorr.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, c) => assert(c >= -1 - 1e-9 && c <= 1 + 1e-9) }
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long")).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val expected = daily.indices.flatMap { i =>
      if (i < 13) None
      else {
        val w = daily.slice(i - 13, i + 1)
        val n = w.length.toLong
        val (sx, sy) = (w.map(_._2).sum, w.map(_._3).sum)
        val sxy = w.map(t => t._2 * t._3).sum
        val sxx = w.map(t => t._2 * t._2).sum
        val syy = w.map(t => t._3 * t._3).sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx <= 0 || vy <= 0) Some((daily(i)._1, Double.NaN))
        else Some((daily(i)._1, math.floor(
          (n * sxy - sx * sy).toDouble / math.sqrt(vx.toDouble * vy.toDouble)
            * 1000000 + 0.5) / 1000000))
      }
    }
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case ((d1, c1), (d2, c2)) =>
      assert(d1 == d2 && math.abs(c1 - c2) < 1e-9, s"$d1: $c1 vs $c2")
    }
  }

  test("ship_latency: percentiles replay a sorted interpolation") {
    val got = TpchLike.shipLatency.run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val lats = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS DOUBLE)"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1)
    assert(got.keySet == lats.keySet)
    lats.foreach { case (pri, l) =>
      val v = l.map(_._2).sorted
      def q(p: Double): Double = {
        val pos = (v.length - 1) * p
        val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
        val x = v(lo) + (pos - lo) * (v(hi) - v(lo))
        math.floor(x * 10000 + 0.5) / 10000
      }
      val (n, p50, p90) = got(pri)
      assert(n == v.length.toLong)
      assert(math.abs(p50 - q(0.5)) < 1e-9, s"$pri p50 $p50 vs ${q(0.5)}")
      assert(math.abs(p90 - q(0.9)) < 1e-9, s"$pri p90 $p90 vs ${q(0.9)}")
    }
  }

  test("decayed_popularity: scores replay a k-sorted dyadic fold") {
    val rows = TemporalOps.decayedPopularity.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 15)
    val data = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"),
        expr("CAST(datediff(TIMESTAMP '2001-08-01 00:00:00', o_orderdate) " +
          "div 28 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val scores = data.groupBy(_._1).map { case (p, l) =>
      val byK = l.groupBy(_._2).map { case (k, g) => (k, g.length.toLong) }
        .toSeq.sortBy(_._1)
      val sc = byK.foldLeft(0.0) { case (acc, (k, cnt)) =>
        acc + cnt * math.pow(0.5, k.toDouble)
      }
      (p, l.length.toLong, math.floor(sc * 10000 + 0.5) / 10000)
    }.toSeq
    val expTop = scores.sortBy(t => (-t._3, t._1)).take(15)
    assert(rows.toSeq == expTop, s"${rows.toSeq}\nvs\n$expTop")
    // recency dominance: a score can never exceed the order count
    rows.foreach { case (_, n, sc) => assert(sc <= n + 1e-9) }
  }

  test("sax_symbols: words replay a naive per-user SAX pipeline") {
    val got = TemporalOps.saxSymbols.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty && got.length <= 15)
    got.foreach { case (w, _) =>
      assert(w.length == 8 && w.forall("abcd".contains(_)), s"word $w")
    }
    val daily = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("user_id", "day").agg(sum("c").as("y"))
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
      .groupBy(_._1)
    val words = daily.toSeq.flatMap { case (_, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      val n = ys.length
      if (n < 8) None
      else {
        val s0 = ys.sum; val q = ys.map(y => y * y).sum
        val rad = n * q - s0 * s0
        val word = (0 until 8).map { g =>
          val seg = ys.zipWithIndex.filter(t => (t._2 * 8) / n == g).map(_._1)
          val zn = n * seg.sum - seg.length * s0
          if (rad == 0) 'c'
          else {
            val z = zn.toDouble / (seg.length * math.sqrt(rad.toDouble))
            if (z < -0.6745) 'a' else if (z < 0) 'b'
            else if (z < 0.6745) 'c' else 'd'
          }
        }.mkString
        Some(word)
      }
    }
    val counts = words.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    got.foreach { case (w, n) =>
      assert(counts.getOrElse(w, 0L) == n, s"word $w: $n vs ${counts.get(w)}")
    }
    // the returned rows are the true top by count
    val minGot = got.map(_._2).min
    counts.foreach { case (w, n) =>
      assert(n <= minGot || got.exists(_._1 == w) || got.length < 15,
        s"missed high-count word $w ($n)")
    }
  }

  test("cusum_drift: matches a naive driver-side recurrence replay") {
    val row = TemporalOps.cusumDrift.run(spark, sfDir).collect().head
    val (nDays, cmax, day) =
      (row.getLong(0), row.getDouble(1), row.getString(2))
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(nDays == daily.length.toLong)
    val (nd, t) = (daily.length.toLong, daily.map(_._2).sum)
    var s = 0L; var best = -1L; var bd = ""
    daily.foreach { case (d, x) =>
      s = math.max(0L, s + nd * x - t)
      if (s > best) { best = s; bd = d }
    }
    assert(bd == day, s"drift day $day vs naive $bd")
    assert(math.abs(cmax - best.toDouble / nd / 100) < 1e-3,
      s"cusum_max $cmax vs naive ${best.toDouble / nd / 100}")
  }

  test("kendall_tau: matches a naive O(n^2) pair classification") {
    val row = TemporalOps.kendallTau.run(spark, sfDir).collect().head
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    var (nc, nd) = (0L, 0L); var (tx, ty) = (0L, 0L)
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val dx = daily(j)._1 - daily(i)._1; val dy = daily(j)._2 - daily(i)._2
      if (dx != 0 && dy != 0) { if (dx.sign == dy.sign) nc += 1 else nd += 1 }
      else if (dx == 0 && dy != 0) tx += 1
      else if (dy == 0 && dx != 0) ty += 1
    }
    assert(row.getLong(2) == nc && row.getLong(3) == nd)
    val naive = (nc - nd).toDouble /
      math.sqrt((nc + nd + ty).toDouble * (nc + nd + tx))
    assert(math.abs(row.getDouble(4) - naive) < 1e-5)
  }

  test("theil_sen: slope is the lower-median pairwise slope") {
    val row = TemporalOps.theilSen.run(spark, sfDir).collect().head
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
      .select(datediff(col("day"), to_date(lit("1970-01-01"))).as("x"),
        col("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (100.0 * (daily(j)._1 - daily(i)._1))).sorted
    val k = (slopes.length + 1) / 2
    val naive = math.floor(slopes(k - 1) * 1e6 + 0.5) / 1e6
    assert(row.getLong(1) == slopes.length.toLong)
    assert(math.abs(row.getDouble(2) - naive) < 1e-9,
      s"slope ${row.getDouble(2)} vs naive $naive")
  }

  test("runs_test: runs count matches a naive sign-scan") {
    val row = TemporalOps.runsTest.run(spark, sfDir).collect().head
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    val revs = daily.map(_._2).sorted
    val med = revs((revs.length + 1) / 2 - 1)
    val signs = daily.map(_._2).filter(_ != med).map(_ > med)
    val runs = 1 + signs.sliding(2).count {
      case Array(a, b) => a != b
      case _ => false
    }
    assert(row.getLong(0) == signs.count(identity).toLong)
    assert(row.getLong(1) == signs.count(!_).toLong)
    assert(row.getLong(2) == runs.toLong, s"runs ${row.getLong(2)} vs $runs")
  }

  test("seasonal_decompose: matches a naive centered-MA decomposition") {
    val rows = TemporalOps.seasonalDecompose.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 7)
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
      .sortBy(_._1.toString)
    val byDay = daily.toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    val naive = scala.collection.mutable.Map
      .empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    daily.foreach { case (day, rev) =>
      val window = (-3 to 3).flatMap { o =>
        val d2 = java.sql.Date.valueOf(day.toLocalDate.plusDays(o))
        byDay.get(d2)
      }
      if (window.length == 7) {
        cal.setTime(day)
        val dow = cal.get(java.util.Calendar.DAY_OF_WEEK).toLong // 1=Sun
        val det7 = 7 * rev - window.sum
        val (n, s) = naive(dow); naive(dow) = (n + 1, s + det7)
      }
    }
    rows.foreach { case (dow, nObs, seasonal) =>
      val (n, s) = naive(dow)
      assert(nObs == n, s"dow $dow n_obs $nObs vs $n")
      val exp = math.floor(s.toDouble / (7 * n) / 100 * 1e4 + 0.5) / 1e4
      assert(math.abs(seasonal - exp) < 1e-9, s"dow $dow: $seasonal vs $exp")
    }
    // additive identity: weighted seasonal components sum to ~0 —
    // Σ n·s = Σ(rev − MA) over interior days, which only approaches 0
    // as the series grows (the fixture month leaves edge residue), so
    // the gate is "small relative to total revenue", not exact
    val weighted = rows.map { case (_, n, sVal) => n * sVal }.sum
    val totalRev = daily.map(_._2).sum / 100.0
    assert(math.abs(weighted) < totalRev * 0.05,
      s"weighted seasonal sum $weighted should be near 0 (rev $totalRev)")
  }

  test("markov_stationary: pi is a distribution near its own next step") {
    val pi = TemporalOps.markovStationary.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi.values.sum - 1.0) < 1e-4, s"sum ${pi.values.sum}")
    pi.values.foreach(v => assert(v > 0 && v < 1))
    // apply one more pi <- pi P step driver-side from the transition
    // matrix; after 3 iterations the chain should be near-stationary
    val trans = TemporalOps.eventTransitions.run(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    val next = trans.groupBy(_._1._2).map { case (state, cells) =>
      state -> cells.map { case ((cur, _), p) => pi.getOrElse(cur, 0.0) * p }.sum
    }
    next.foreach { case (state, v) =>
      assert(math.abs(v - pi(state)) < 0.02,
        s"$state: pi=${pi(state)} vs next-step $v — not near stationary")
    }
  }

  test("entropy_rate: bounded by log2(k) and matches a naive recompute") {
    val row = TemporalOps.entropyRate.run(spark, sfDir).collect().head
    val (h, hMax, eff) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(h > 0 && h <= hMax + 1e-9, s"H=$h must be in (0, $hMax]")
    assert(math.abs(eff - h / hMax) < 1e-4)
    val pi = TemporalOps.markovStationary.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val trans = TemporalOps.eventTransitions.run(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    val naive = -trans.map { case ((cur, _), p) =>
      pi(cur) * p * (math.log(p) / math.log(2))
    }.sum
    // pi and p are rounded to 1e-6 in the declared outputs, so the
    // driver-side replay agrees only to ~1e-4
    assert(math.abs(h - naive) < 1e-3, s"H $h vs naive $naive")
  }

  test("temporal windows all partition by user (no global-sort windows)") {
    for (q <- Seq(TemporalOps.intervalMerge, TemporalOps.maxConcurrency,
        TemporalOps.attribution, TemporalOps.rollingZ)) {
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      // Every Window operator in these plans must carry a partition spec.
      val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
      windowLines.foreach { l =>
        assert(!l.contains("windowspecdefinition()"),
          s"${q.name}: partition-less window:\n$l")
      }
    }
  }

  test("forecast_backtest: metrics replay a naive in-memory backtest") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
        .as("d"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((0 to 29).forall(daily.contains), "every January day trades")
    val (r22, r0) = (daily(22), daily(0))
    def metrics(pred: Int => Double): (Double, Double, Double) = {
      val es = (23 to 29).map { t =>
        val e = daily(t).toDouble - pred(t)
        (math.abs(e), e * e, math.abs(e) / daily(t))
      }
      (es.map(_._1).sum / 7 / 100, math.sqrt(es.map(_._2).sum / 7) / 100,
        es.map(_._3).sum / 7)
    }
    val exp = Map(
      "naive" -> metrics(_ => r22.toDouble),
      "snaive" -> metrics(t => daily(t - 7).toDouble),
      "drift" -> metrics(t => r22 + (t - 22) * (r22 - r0) / 22.0))
    val rows = TemporalOps.forecastBacktest.run(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (mae, rmse, mape) = exp(r.getString(0))
      assert(math.abs(r.getDouble(1) - mae) < 0.02, s"mae ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - rmse) < 0.02, s"rmse ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - mape) < 2e-6, s"mape ${r.getString(0)}")
    }
    // the seasonal baseline must actually differ from naive (else the
    // backtest compares nothing)
    assert(rows.map(_.getDouble(1)).distinct.length > 1)
  }

  test("seq_support: first/last compression equals brute subsequence check") {
    import org.apache.spark.sql.functions._
    val evts = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evts.groupBy(_._1)
    val nUsers = byUser.size.toLong
    val types = evts.map(_._2).distinct.sorted
    val expected = (for {
      a <- types; b <- types
      n = byUser.count { case (_, xs) =>
        xs.exists(e1 => e1._2 == a &&
          xs.exists(e2 => e2._2 == b && e1._3 < e2._3))
      }
      if n > 0
    } yield (a, b) -> n.toLong).toMap
    val got = TemporalOps.seqSupport.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"support sets differ")
    // support column really is n/users
    val rows = TemporalOps.seqSupport.run(spark, sfDir).collect()
    rows.foreach { r =>
      val s = math.floor(r.getLong(2).toDouble / nUsers * 1000000 + 0.5) / 1000000
      assert(r.getDouble(3) == s)
    }
  }

  test("funnel_latency: picks are the exact order statistics") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val deltas = su.toSeq.flatMap { case (u, st) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 > st)
      if (ps.nonEmpty) Some((ps.map(_._3).min - st, u)) else None
    }.sorted
    val n = deltas.length
    val rows = TemporalOps.funnelLatency.run(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val q = r.getInt(0)
      val pick = math.ceil(q * n / 100.0).toLong.toInt
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == deltas(pick - 1)._1,
        s"p$q: ${r.getLong(2)} vs ${deltas(pick - 1)._1}")
    }
    // percentiles are monotone
    val ds = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
  }

  test("inventory_runout: capped-scan recurrence replays in memory") {
    import org.apache.spark.sql.functions._
    val dd = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("sk"),
        datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01")))
          .as("day"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("sk", "day").agg(sum("q").as("dm"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val rows = TemporalOps.inventoryRunout.run(spark, sfDir).collect()
    rows.foreach { out =>
      val sk = out.getLong(0)
      val days = dd.filter(_._1 == sk).sortBy(_._2)
      val tot = days.map(_._3).sum
      val span = days.last._2 - days.head._2 + 1
      val r = (tot + span - 1) / span
      var inv = math.max(r - days.head._3, 0L)
      var zeros = if (r - days.head._3 <= 0) 1L else 0L
      var mx = inv
      var pd = days.head._2
      days.tail.foreach { case (_, day, dm) =>
        val supply = inv + r * (day - pd) - dm
        inv = math.max(supply, 0L)
        if (supply <= 0) zeros += 1
        mx = math.max(mx, inv)
        pd = day
      }
      assert(out.getLong(1) == days.length.toLong, s"n_days for $sk")
      assert(out.getLong(2) == r, s"restock for $sk")
      assert(out.getLong(3) == inv, s"end stock for $sk")
      assert(out.getLong(4) == zeros, s"stockouts for $sk")
      assert(out.getLong(5) == mx, s"peak for $sk")
    }
  }

  test("hampel_filter: flags replay a naive rolling median/MAD filter") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val s = xs.sortBy(_._2)
      s.indices.flatMap { i =>
        val w = s.slice(math.max(0, i - 3), math.min(s.length, i + 4))
          .map(_._3).sorted
        val med = w((w.length - 1) / 2)
        val mad = w.map(v => math.abs(v - med)).sorted.apply((w.length - 1) / 2)
        val c = s(i)._3
        if (math.abs(c - med) > 3 * mad) Some((u, s(i)._2, c, med, mad))
        else None
      }
    }.sortBy(t => (t._1, t._2)).take(25)
    val got = TemporalOps.hampelFilter.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"flags:\n$got\nvs\n$expected")
  }

  test("bollinger_bands: flagged days replay the naive 20-day band walk") {
    val got = TemporalOps.bollingerBands.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(5)))
    val rows = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2)))
    val naive = rows.groupBy(_._1).toSeq.flatMap { case (b, xs) =>
      val s = xs.sortBy(_._2)
      s.indices.drop(19).flatMap { i =>
        val w = s.slice(i - 19, i + 1).map(_._3)
        val mean = w.sum.toDouble / 20
        val sd = math.sqrt(w.map(v => (v - mean) * (v - mean)).sum / 20)
        val rev = s(i)._3
        if (rev > mean + 2 * sd) Some((b, s(i)._2, "above"))
        else if (rev < mean - 2 * sd) Some((b, s(i)._2, "below"))
        else None
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == naive, s"${got.length} flags vs naive ${naive.length}")
  }

  test("rsi_cutler: per-brand extremes replay the naive 14-day SMA RSI") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2)))
    val naive = rows.groupBy(_._1).map { case (b, xs) =>
      val revs = xs.sortBy(_._2).map(_._3)
      val deltas = revs.sliding(2).map(p => p(1) - p(0)).toSeq
      val rsis = deltas.indices.drop(13).map { i =>
        val w = deltas.slice(i - 13, i + 1)
        val sg = w.filter(_ > 0).sum.toDouble
        val sl = -w.filter(_ < 0).sum.toDouble
        if (sg + sl == 0) 50.0 else 100.0 * sg / (sg + sl)
      }
      b -> rsis
    }
    val got = TemporalOps.rsiCutler.run(spark, sfDir).collect()
    got.foreach { r =>
      val rsis = naive(r.getString(0))
      assert(r.getLong(1) == rsis.length.toLong)
      assert(r.getLong(2) == rsis.count(_ >= 70).toLong, s"${r.getString(0)} overbought")
      assert(r.getLong(3) == rsis.count(_ <= 30).toLong, s"${r.getString(0)} oversold")
      assert(math.abs(r.getDouble(4) - rsis.max) < 1e-3)
      assert(math.abs(r.getDouble(5) - rsis.min) < 1e-3)
    }
  }

  test("var_cvar: CVaR is no better than VaR and replays the sorted tail") {
    val got = TemporalOps.varCvar.run(spark, sfDir).collect()
    assert(got.length == 2)
    val daily = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val ch = daily.sliding(2).map(p => p(1) - p(0)).toArray.sorted
    val n = ch.length
    got.foreach { row =>
      val alpha = row.getDouble(0)
      val r = (1 - alpha) * (n - 1)
      val lo = math.floor(r).toInt
      val varc = ch(lo) + (r - lo) * (ch(lo + 1) - ch(lo))
      val m = math.max(1, math.floor((1 - alpha) * n).toInt)
      val cvarc = ch.take(m).map(_.toDouble).sum / m
      assert(math.abs(row.getDouble(2) - varc / 100) < 1e-3,
        s"var ${row.getDouble(2)} vs ${varc / 100}")
      assert(math.abs(row.getDouble(3) - cvarc / 100) < 1e-3,
        s"cvar ${row.getDouble(3)} vs ${cvarc / 100}")
      assert(row.getDouble(3) <= row.getDouble(2) + 1e-9,
        "expected shortfall is at least as extreme as VaR")
    }
  }

  test("activity_streaks: top streaks replay the naive gaps-and-islands") {
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val best = ud.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).sorted
      var streaks = Seq.empty[(Int, Int)] // (len, start)
      var start = ds.head; var len = 1
      for (i <- 1 until ds.length) {
        if (ds(i) == ds(i - 1) + 1) len += 1
        else { streaks :+= ((len, start)); start = ds(i); len = 1 }
      }
      streaks :+= ((len, start))
      val top = streaks.sortBy(t => (-t._1, t._2)).head
      (u, top._1.toLong, java.time.LocalDate.ofEpochDay(top._2).toString)
    }.toSeq.sortBy(t => (-t._2, t._3, t._1)).take(25)
    val got = TemporalOps.activityStreaks.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == best, s"\n$got\nvs\n$best")
  }

  test("ccf_leadlag: lag-0 matches naive Pearson; peak flag attained") {
    val rows = TemporalOps.ccfLeadlag.run(spark, sfDir).collect()
    assert(rows.length == 15)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    assert(rows.count(_.getBoolean(3)) >= 1)
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = daily.length
    val (sx, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val sxy = daily.map(t => t._1 * t._2).sum
    val sxx = daily.map(t => t._1 * t._1).sum
    val syy = daily.map(t => t._2 * t._2).sum
    val r0 = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got0 = rows.find(_.getInt(0) == 0).get.getDouble(2)
    assert(math.abs(got0 - r0) < 1e-5, s"lag0 $got0 vs $r0")
  }

  test("pacf_lags: Durbin-Levinson replays from naive autocorrelations") {
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    val n = daily.size
    val mu = daily.values.sum.toDouble / n
    val den = daily.values.map(v => (v - mu) * (v - mu)).sum
    def rho(l: Int): Double = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d + l).map(y => (x - mu) * (y - mu))
    }.sum / den
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    val row = TemporalOps.pacfLags.run(spark, sfDir).collect().head
    assert(math.abs(row.getDouble(0) - r1) < 1e-5)
    assert(math.abs(row.getDouble(1) - p22) < 1e-5)
    assert(math.abs(row.getDouble(2) - p33) < 1e-5)
  }

  test("theil_u: replays drift-vs-naive relative error ratio") {
    val daily = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2.toDouble)
    val (sf, sa) = daily.sliding(3).foldLeft((0.0, 0.0)) {
      case ((f, a), w) =>
        val fpe = (2 * w(1) - w(0) - w(2)) / w(1)
        val ape = (w(2) - w(1)) / w(1)
        (f + fpe * fpe, a + ape * ape)
    }
    val u2 = math.sqrt(sf / sa)
    val row = TemporalOps.theilU.run(spark, sfDir).collect().head
    assert(row.getLong(0) == daily.length - 2L)
    assert(math.abs(row.getDouble(1) - u2) < 1e-5,
      s"U2 ${row.getDouble(1)} vs naive $u2")
    assert(row.getBoolean(2) == (u2 < 1.0))
  }
}
