package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties for the statistical-audit queries (StatOps) and the
  * incremental-pipeline queries (IncrOps) beyond their oracle rows. */
class StatOpsSuite extends SparkSpec {

  test("nb_langid: classifier beats chance on the held-out split") {
    val cm = StatOps.nbLangid.run(spark, sfDir).collect()
    val total = cm.map(_.getLong(2)).sum
    val diag = cm.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val nLangs = cm.map(_.getString(0)).distinct.length
    assert(total > 0)
    // multinomial NB on a hash split must beat uniform guessing
    assert(diag.toDouble / total > 1.0 / nLangs,
      s"accuracy ${diag.toDouble / total} vs chance ${1.0 / nLangs}")
  }

  test("ks_test: statistic is a valid, attained ECDF gap") {
    val row = StatOps.ksTest.run(spark, sfDir).collect().head
    val (n1, n2, d) = (row.getLong(0), row.getLong(1), row.getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(d >= 0.0 && d <= 1.0, s"KS distance in [0,1], got $d")
    // the gap is a multiple of 1/(n1*n2) up to the 1e-6 display grid
    val units = d * n1 * n2
    assert((units - math.round(units)).abs < 1e-6 * n1 * n2 + 1e-6)
  }

  test("drift_psi: bins are exhaustive and shares sum to 1") {
    val rows = StatOps.driftPsi.run(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted ==
      rows.map(_.getInt(0)).toSeq.sorted.distinct, "unique bins")
    val pSum = rows.map(_.getDouble(1)).sum
    val qSum = rows.map(_.getDouble(2)).sum
    // Laplace smoothing reserves mass for EMPTY bins, so observed bins
    // sum to <= 1 and to exactly 1 when all 10 bins are occupied
    assert(pSum <= 1.0 + 1e-9 && pSum > 0.8, s"p mass $pSum")
    assert(qSum <= 1.0 + 1e-9 && qSum > 0.8, s"q mass $qSum")
  }

  test("welch_ttest: statistic matches a naive driver-side recomputation") {
    val row = StatOps.welchTtest.run(spark, sfDir).collect().head
    val vals = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5)))
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    def meanVar(x: Array[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val ((m1, v1), (m2, v2)) = (meanVar(a), meanVar(b))
    val t = (m1 - m2) / math.sqrt(v1 / a.length + v2 / b.length)
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(math.abs(row.getDouble(4) - t) < 1e-4,
      s"t ${row.getDouble(4)} vs naive $t")
  }

  test("mann_whitney: U is consistent with the complement identity") {
    val row = StatOps.mannWhitney.run(spark, sfDir).collect().head
    val (n1, n2, u1) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    // 0 <= U1 <= n1*n2, and a naive midrank recomputation agrees
    assert(u1 >= 0 && u1 <= n1.toDouble * n2)
    val vals = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0) == "purchase", r.getDouble(1)))
    val ranked = vals.sortBy(_._2).zipWithIndex
      .groupBy(_._1._2).values.flatMap { grp =>
        val mid = grp.map(_._2 + 1.0).sum / grp.length
        grp.map(g => (g._1._1, mid))
      }
    val r1 = ranked.filter(_._1).map(_._2).sum
    val naive = r1 - n1.toDouble * (n1 + 1) / 2
    assert(math.abs(u1 - naive) < 1e-6, s"U $u1 vs naive $naive")
  }

  test("benford_law: digit counts are exhaustive and chi2 terms nonnegative") {
    val rows = StatOps.benfordLaw.run(spark, sfDir).collect()
    val nOrders = graft.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "every order has a lead digit")
    assert(rows.map(_.getInt(0)).forall(d => d >= 1 && d <= 9))
    assert(rows.map(_.getDouble(4)).forall(_ >= 0))
    val benfordMass = rows.map(_.getDouble(3)).sum
    assert(math.abs(benfordMass - 1.0) < 1e-3, s"Benford shares sum $benfordMass")
  }

  test("gini_spend: matches a naive sorted-rank recomputation") {
    val row = StatOps.giniSpend.run(spark, sfDir).collect().head
    val spend = graft.Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("c"))
      .select("c").collect().map(_.getLong(0)).sorted
    val n = spend.length.toLong
    val tot = spend.sum
    val rs = spend.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val naive = (2.0 * rs - (n + 1.0) * tot) / (n.toDouble * tot)
    assert(row.getLong(0) == n && row.getLong(1) == tot)
    assert(math.abs(row.getDouble(2) - naive) < 1e-5)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) < 1)
  }

  test("ab_srm_check: chi2 terms nonnegative, counts cover the corpus") {
    val got = graft.queries.CurationOps.srmCheck.run(spark, sfDir).collect()
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(got.map(_.getLong(1)).sum == n)
    got.foreach(r => assert(r.getDouble(2) >= 0))
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
  }

  test("hhi_concentration: bounds 1/n <= hhi <= 1 per nation") {
    val rows = StatOps.hhiConcentration.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getDouble(3))
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9,
        s"nation ${r.getInt(0)}: hhi $hhi outside [1/$n, 1]")
    }
  }

  test("dow_seasonality: indices average to ~1 under event weighting") {
    val rows = StatOps.dowSeasonality.run(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted == (1 to 7).toSeq)
    val n = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / n
    assert(math.abs(weighted - 1.0) < 1e-3,
      s"event-weighted mean seasonal index $weighted should be 1")
  }

  test("weighted_median: matches a naive driver-side weighted scan") {
    val got = StatOps.weightedMedian.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"),
        floor(col("l_quantity")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (f, rs) =>
      val sorted = rs.sortBy(_._2)
      val tw = rs.map(_._3).sum
      var c = 0L
      val med = sorted.find { r => c += r._3; 2 * c >= tw }.get._2
      assert(got(f)._1 == tw)
      assert(math.abs(got(f)._2 - med / 100.0) < 1e-9,
        s"$f: ${got(f)._2} vs naive ${med / 100.0}")
    }
  }

  test("event_transitions: per-state probabilities sum to 1") {
    val rows = TemporalOps.eventTransitions.run(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (cur, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$cur: p sums to $pSum")
    }
    // transition count = events - one terminal event per user
    val nEvents = graft.Tables.events(spark, sfDir).count()
    val nUsers = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("q119_assoc_rules: rule algebra invariants hold") {
    val rows = Relational.q119AssocRules.run(spark, sfDir).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getLong(2) >= 3, "min support respected")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1, "confidence in (0,1]")
      assert(r.getDouble(4) > 0, "lift positive")
    }
    val lifts = rows.map(_.getDouble(4)).toSeq
    assert(lifts == lifts.sortBy(-(_: Double)), "lift-descending")
  }

  test("spearman_corr: matches a naive driver-side midrank recompute") {
    val rho = StatOps.spearmanCorr.run(spark, sfDir).collect().head.getDouble(1)
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select(floor(col("l_quantity")).cast("long"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def midranks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2 + 1.0).sum / g.length
      }
    }
    val (rx, ry) = (midranks(rows.map(_._1)), midranks(rows.map(_._2)))
    val xs = rows.map(r => rx(r._1)); val ys = rows.map(r => ry(r._2))
    val n = rows.length.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val naive = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(rho - naive) < 1e-5, s"rho $rho vs naive $naive")
    assert(rho >= -1 && rho <= 1)
  }

  test("neyman_allocation: allocations track N_h*sigma_h and sum to ~budget") {
    val rows = StatOps.neymanAllocation.run(spark, sfDir).collect()
    assert(rows.length == 5)
    val total = rows.map(_.getLong(3)).sum
    // per-stratum rounding can drift the sum by at most strata/2
    assert(math.abs(total - 1000) <= 3, s"allocated $total of 1000")
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getLong(3) > 0))
  }

  test("incr_agg_merge: merged partials equal the one-shot aggregate") {
    // the oracle proves it against DuckDB; this pins it Spark-vs-Spark
    // so a refactor that breaks merge algebra fails fast in CI
    val merged = IncrOps.incrAggMerge.run(spark, sfDir).collect()
    val full = graft.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100)
          .as("total"))
      .orderBy("o_orderpriority").collect()
    assert(merged.toSeq == full.toSeq)
  }

  test("incr_join_delta: 4-term IVM decomposition equals the direct join") {
    val merged = IncrOps.incrJoinDelta.run(spark, sfDir).collect()
    val direct = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority").collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("snapshot_diff: statuses partition keys per the modular derivation") {
    val rows = IncrOps.snapshotDiff.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = keys.count(k => k % 10 == 0 && k % 13 != 0)
    val removed = keys.count(k => k % 13 == 0 && k % 10 != 0)
    val changed = keys.count(k => k % 10 != 0 && k % 13 != 0 && k % 7 == 0)
    assert(rows("added")._1 == added)
    assert(rows("removed")._1 == removed)
    assert(rows("changed")._1 == changed)
    // every changed key moved exactly +100 cents
    assert(rows("changed")._2 == changed * 100L)
    assert(rows("unchanged")._2 == 0L)
  }

  test("k_anonymity: ascending class sizes; head is the dataset's k") {
    val rows = IncrOps.kAnonymity.run(spark, sfDir).collect()
    val sizes = rows.map(_.getLong(2)).toSeq
    assert(sizes == sizes.sorted)
    val trueK = graft.Tables.customer(spark, sfDir)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .agg(min("count")).collect().head.getLong(0)
    assert(sizes.head == trueK)
  }

  test("compact_bins: bins partition all days, in order, within target+max") {
    val bins = IncrOps.compactBins.run(spark, sfDir).collect()
    val nDays = graft.Tables.lineitem(spark, sfDir)
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd")).distinct().count()
    assert(bins.map(_.getLong(1)).sum == nDays, "every day lands in a bin")
    // greedy first-fit by starting offset: a bin exceeds the 20k target
    // by at most one file's rows, and bins cover contiguous day ranges
    val sorted = bins.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(4) <= b.getString(3),
          "bin day-ranges are ordered and non-overlapping")
      case _ => ()
    }
  }

  test("anova_quantity: matches a naive driver-side F recompute") {
    val row = StatOps.anovaQuantity.run(spark, sfDir).collect().head
    val (f, eta) = (row.getDouble(2), row.getDouble(3))
    val groups = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
      .groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = groups.map(_.length).sum.toDouble
    val grand = groups.map(_.sum).sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum }).sum
    val naiveF = (ssb / (groups.length - 1)) / (ssw / (n - groups.length))
    assert(math.abs(f - naiveF) < 1e-4, s"F $f vs naive $naiveF")
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-5)
    assert(eta >= 0 && eta <= 1)
  }

  test("cramers_v: matches a naive contingency recompute, bounded in [0,1]") {
    val row = StatOps.cramersV.run(spark, sfDir).collect().head
    val (chi2, v) = (row.getDouble(2), row.getDouble(3))
    val cells = graft.Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2).toDouble)).toMap
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val naiveChi2 = cells.map { case ((s, na), o) =>
      val e = rt(s) * ct(na) / n; (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2 - naiveChi2) < 1e-2, s"chi2 $chi2 vs $naiveChi2")
    val naiveV = math.sqrt(naiveChi2 / (n * math.min(rt.size - 1, ct.size - 1)))
    assert(math.abs(v - naiveV) < 1e-5 && v >= 0 && v <= 1)
  }

  test("multireg_normal: betas solve the naive normal equations") {
    val row = StatOps.multiregNormal.run(spark, sfDir).collect().head
    val data = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("y"))
      .agg(count(lit(1)).as("x1"),
        sum(floor(col("l_quantity")).cast("long")).as("x2"))
      .collect().map(r => (r.getLong(2).toDouble, r.getLong(3).toDouble,
        r.getLong(1).toDouble))
    val n = data.length.toDouble
    // solve [ [n,S1,S2], [S1,S11,S12], [S2,S12,S22] ] b = [Sy,S1y,S2y]
    val s1 = data.map(_._1).sum; val s2 = data.map(_._2).sum
    val sy = data.map(_._3).sum
    val s11 = data.map(d => d._1 * d._1).sum
    val s12 = data.map(d => d._1 * d._2).sum
    val s22 = data.map(d => d._2 * d._2).sum
    val s1y = data.map(d => d._1 * d._3).sum
    val s2y = data.map(d => d._2 * d._3).sum
    val dd = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / dd / 100
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / dd / 100
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / dd / 100
    assert(math.abs(row.getDouble(1) - b0) < 1e-2, s"b0 ${row.getDouble(1)} vs $b0")
    assert(math.abs(row.getDouble(2) - b1) < 1e-2, s"b1 ${row.getDouble(2)} vs $b1")
    assert(math.abs(row.getDouble(3) - b2) < 1e-2, s"b2 ${row.getDouble(3)} vs $b2")
    val rsq = row.getDouble(4)
    assert(rsq > 0 && rsq <= 1, s"r_sq $rsq")
  }

  test("poisson_bootstrap: CI brackets the mean; replicates replay exactly") {
    val row = StatOps.poissonBootstrap.run(spark, sfDir).collect().head
    val (mean, lo, hi) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] misses mean $mean")
    assert(hi - lo < mean, "80% CI suspiciously wide")
    // replay replicates 0 and 17 driver-side from the same hash
    val xs = graft.Tables.events(spark, sfDir)
      .select(col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cdf = Seq(367879L, 735759L, 919699L, 980985L, 996341L)
    def mult(id: Long, b: Long): Long = {
      val u = (id * 2654435761L + b * 2246822519L) % 1000003L
      cdf.indexWhere(u < _) match { case -1 => 5L; case i => i.toLong }
    }
    val reps = Seq(0L, 17L).map { b =>
      val (s, k) = xs.foldLeft((0L, 0L)) { case ((s, k), (id, c)) =>
        val m = mult(id, b); (s + m * c, k + m)
      }
      s.toDouble / k / 100
    }
    // both replicate means must lie within the full replicate range
    // implied by the CI order statistics (4th..29th of 32) or outside
    // only if they are among the 3 most extreme on either side; the
    // strong check: replicate means are finite and near the mean
    reps.foreach(m => assert(math.abs(m - mean) < mean * 0.5,
      s"replicate mean $m implausibly far from $mean"))
  }

  test("lorenz_deciles: monotone convex shares matching a naive sort") {
    val rows = StatOps.lorenzDeciles.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == 10)
    // final decile holds everything
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    // shares strictly increase and the curve is convex (Lorenz property)
    val shares = rows.map(_._3)
    shares.zip(shares.tail).foreach { case (a, b) => assert(a < b) }
    val gaps = (0.0 +: shares).sliding(2).map(w => w(1) - w(0)).toSeq
    gaps.zip(gaps.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-9, "Lorenz increments must be non-decreasing")
    }
    // naive replay
    val spend = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted
    val total = spend.map(_._1).sum.toDouble
    val cum = spend.map(_._1).scanLeft(0L)(_ + _).tail
    rows.foreach { case (k, nCust, share) =>
      assert(nCust == spend.length.toLong * k / 10)
      val exp = math.floor(cum(nCust.toInt - 1) / total * 1e6 + 0.5) / 1e6
      assert(math.abs(share - exp) < 1e-9, s"decile $k: $share vs $exp")
    }
  }

  test("rfm_segments: codes are valid quintile triples, counts bounded") {
    val rows = StatOps.rfmSegments.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { case (seg, n, avg) =>
      val (r, f, m) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5,
        s"segment $seg is not a quintile triple")
      assert(n > 0 && avg > 0)
    }
    // ranked by size descending
    val ns = rows.map(_._2)
    ns.zip(ns.tail).foreach { case (a, b) => assert(a >= b) }
    val nCust = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey").distinct().count()
    assert(ns.sum <= nCust)
  }

  test("abc_class: matches a naive descending-cumulative classification") {
    val rows = StatOps.abcClass.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    val revs = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (pk, c) => (-c, pk) }
    val t = revs.map(_._2).sum
    var cum = 0L
    val naive = revs.map { case (_, c) =>
      cum += c
      if ((cum - c) * 5 < t * 4) "A"
      else if ((cum - c) * 20 < t * 19) "B" else "C"
    }
    Seq("A", "B", "C").zip(rows).foreach { case (cls, (got, n, _)) =>
      assert(got == cls && n == naive.count(_ == cls).toLong,
        s"$cls: $n vs ${naive.count(_ == cls)}")
    }
  }

  test("did_estimate: 2x2 cells and the DiD identity replay in memory") {
    val rows = graft.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("CAST(floor(value * 100 + 0.5) AS LONG) AS cents",
        "((user_id & 2147483647) * 2654435761) % 100 < 50 AS tr",
        "ts >= TIMESTAMP '2024-01-16 00:00:00' AS post")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    def cell(tr: Boolean, post: Boolean) = {
      val xs = rows.filter(t => t._2 == tr && t._3 == post).map(_._1)
      (xs.length.toLong, xs.sum.toDouble / xs.length / 100)
    }
    val r = StatOps.didEstimate.run(spark, sfDir).collect()(0)
    val (ntp, mtp) = cell(tr = true, post = true)
    val (nta, mta) = cell(tr = true, post = false)
    val (ncp, mcp) = cell(tr = false, post = true)
    val (nca, mca) = cell(tr = false, post = false)
    assert(r.getLong(0) == ntp && r.getLong(1) == nta &&
      r.getLong(2) == ncp && r.getLong(3) == nca)
    assert(math.abs(r.getDouble(4) - mtp) < 1e-4)
    val did = (mtp - mta) - (mcp - mca)
    assert(math.abs(r.getDouble(8) - did) < 2e-6, s"did ${r.getDouble(8)} vs $did")
  }

  test("cuped_adjust: theta replays and the adjustment never adds variance") {
    val r = StatOps.cupedAdjust.run(spark, sfDir).collect()(0)
    val (n, theta, vy, vadj, red) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0)
    assert(vadj <= vy + 1e-9, "CUPED can only remove variance")
    assert(red >= 0 && red <= 1 + 1e-9, s"reduction is rho^2: $red")
    // replay theta from per-user pre/post totals
    val u = graft.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS cents",
        "ts < TIMESTAMP '2024-01-16 00:00:00' AS pre")
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getBoolean(2)))
      .groupBy(_._1).map { case (_, xs) =>
        (xs.filter(_._3).map(_._2).sum, xs.filterNot(_._3).map(_._2).sum) }
      .toSeq
    val nn = u.length.toDouble
    val (sx, sy) = (u.map(_._1).sum.toDouble, u.map(_._2).sum.toDouble)
    val cov = (u.map(t => t._1.toDouble * t._2).sum - sx * sy / nn) / nn
    val vx = (u.map(t => t._1.toDouble * t._1).sum - sx * sx / nn) / nn
    assert(math.abs(theta - cov / vx) < 2e-6, s"theta $theta vs ${cov / vx}")
  }

  test("prop_ztest: z replays from the four exact counts") {
    val r = StatOps.propZtest.run(spark, sfDir).collect()(0)
    val (n1, x1, n2, x2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(n1 > 0 && n2 > 0 && x1 > 0 && x2 > 0)
    assert(x1 <= n1 && x2 <= n2)
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(r.getDouble(4) - p1) < 2e-6)
    assert(math.abs(r.getDouble(5) - p2) < 2e-6)
    assert(math.abs(r.getDouble(6) - z) < 2e-6, s"z ${r.getDouble(6)} vs $z")
  }

  test("ab_power_mde: MDE replays from the pooled rate and arm sizes") {
    val r = StatOps.abPowerMde.run(spark, sfDir).collect()(0)
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val (pp, se, mdeA, mdeR) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    assert(n1 > 0 && n2 > 0 && pp > 0 && pp < 1)
    val seExp = math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(se - seExp) < 5e-6)
    assert(math.abs(mdeA - (1.959964 + 0.841621) * se) < 5e-6)
    assert(math.abs(mdeR - mdeA / pp) < 5e-5)
    // sanity: a detectable effect is larger than one standard error
    assert(mdeA > se)
  }

  test("james_stein_shrink: pulls every group mean toward the grand mean") {
    val rows = StatOps.jamesStein.run(spark, sfDir).collect()
    assert(rows.length == 25)
    val mu = rows.map(_.getDouble(2)).sum / 25 // ~ grand mean of raw means
    val shrink = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == shrink), "one global factor")
    assert(shrink > 0, "some shrinkage happens")
    rows.foreach { r =>
      val (raw, js) = (r.getDouble(2), r.getDouble(3))
      // js lies between raw and the grand mean (strictly closer to mu
      // whenever raw != mu), up to the 2dp output rounding
      assert(math.abs(js - mu) <= math.abs(raw - mu) + 0.02,
        s"james-stein moved AWAY from the grand mean: $r (mu ~ $mu)")
    }
    // shrinkage is material on at least one small group: some js != raw
    assert(rows.exists(r => r.getDouble(2) != r.getDouble(3)))
  }

  test("simpson_check: slopes replay and the pooled row is the merge") {
    val rows = StatOps.simpsonCheck.run(spark, sfDir).collect()
    assert(rows.length == 4)
    val all = rows.find(_.getString(0) == "ALL").get
    val grps = rows.filterNot(_.getString(0) == "ALL")
    assert(all.getLong(1) == grps.map(_.getLong(1)).sum,
      "pooled n is the sum of the groups")
    assert(all.getInt(3) == 0, "the pooled row cannot flip against itself")
    // naive replay of one group's slope
    import org.apache.spark.sql.functions._
    val b = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === grps.head.getString(0))
      .select(floor(col("l_discount") * 100 + lit(0.5)).cast("long"),
        floor(col("l_quantity") + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = b.length.toLong
    val (sx, sy) = (b.map(_._1).sum, b.map(_._2).sum)
    val sxy = b.map(t => t._1 * t._2).sum
    val sxx = b.map(t => t._1 * t._1).sum
    val slope = math.floor((n * sxy - sx * sy).toDouble
      / (n.toDouble * sxx - sx.toDouble * sx) * 1000000 + 0.5) / 1000000
    assert(grps.head.getDouble(2) == slope)
  }

  test("dq_scorecard and l_diversity: clean fixture, sane diversity") {
    val dq = IncrOps.dqScorecard.run(spark, sfDir).collect()
    assert(dq.length == 8)
    // the generated fixture is contract-clean: every rule passes fully
    dq.foreach { r =>
      assert(r.getLong(2) == 0L, s"unexpected violations: $r")
      assert(r.getDouble(3) == 1.0)
    }
    val ld = IncrOps.lDiversity.run(spark, sfDir).collect()
    assert(ld.length == 10)
    ld.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(2),
        s"l bounded by group size: $r")
    }
    // rows are sorted by ascending diversity — the dataset's l is row 1
    val ls = ld.map(_.getLong(3))
    assert(ls.toSeq == ls.sorted.toSeq)
  }

  test("t_closeness: EMD bounded in [0,1] and matches a naive recompute") {
    val got = IncrOps.tCloseness.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 10)
    got.values.foreach { case (_, t) =>
      assert(t >= 0.0 && t <= 1.0, s"t outside [0,1]: $t")
    }
    // naive EMD over ordered bands for every reported class
    val rows = graft.Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bands = rows.map(_._3).distinct.sorted
    val nTotal = rows.length.toLong
    val globalCum = bands.map(b => rows.count(_._3 <= b).toLong)
    got.foreach { case ((nk, seg), (nMembers, t)) =>
      val cls = rows.filter(r => r._1 == nk && r._2 == seg)
      assert(cls.length.toLong == nMembers)
      val nc = cls.length.toLong
      val num = bands.zip(globalCum).map { case (b, cg) =>
        math.abs(cls.count(_._3 <= b).toLong * nTotal - cg * nc)
      }.sum
      val expect = math.floor(num.toDouble
        / ((bands.length - 1).toLong * nc * nTotal) * 1000000 + 0.5) / 1000000
      assert(math.abs(t - expect) < 1e-9, s"class ($nk,$seg): $t vs $expect")
    }
  }

  test("bh_fdr: step-up discovery set is consistent with the thresholds") {
    val rows = StatOps.bhFdr.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._3)
    val m = rows.length
    assert(m > 0)
    // ranks are 1..m and chi2 is non-increasing in rank
    assert(rows.map(_._3).toSeq == (1 to m).map(_.toLong))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2, s"chi2 order: $a $b")
      case _           => ()
    }
    rows.foreach { case (_, chi2, _, _, _) => assert(chi2 >= 0) }
    // BH: discoveries are exactly ranks <= max{k: chi2_k >= thresh_k}
    val kstar = rows.filter(r => r._2 >= r._4 - 1e-9).map(_._3)
      .foldLeft(0L)(math.max)
    rows.foreach { case (brand, _, rank, _, disc) =>
      assert(disc == (rank <= kstar), s"$brand rank $rank vs k*=$kstar")
    }
    // thresholds replay -2 ln(0.1 k / m)
    rows.foreach { case (_, _, k, th, _) =>
      val expect =
        math.floor(-2.0 * math.log(0.1 * k / m) * 1000000 + 0.5) / 1000000
      assert(math.abs(th - expect) < 1e-9)
    }
  }

  test("ps_match: matches replay a naive banded 1-NN and ATT is exact") {
    val row = StatOps.psMatch.run(spark, sfDir).collect().head
    val (nT, nM, att, gap) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    assert(nM <= nT && nM > 0)
    val spend = graft.Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map { r =>
        val score = math.floor(r.getDouble(2) * 100 + 0.5).toLong
        (r.getLong(0), r.getString(1), score,
          spend.getOrElse(r.getLong(0), 0L))
      }
    val treated = cs.filter(_._2 == "BUILDING")
    val control = cs.filter(_._2 != "BUILDING")
    def band(sc: Long): Long = math.floor(sc / 2000.0).toLong
    var sumDiff = 0L; var sumGap = 0L; var matched = 0
    treated.foreach { case (_, _, sc, out) =>
      val cands = control.filter(c => math.abs(band(c._3) - band(sc)) <= 1)
      if (cands.nonEmpty) {
        val bst = cands.minBy(c => (math.abs(sc - c._3), c._1))
        sumDiff += out - bst._4
        sumGap += math.abs(sc - bst._3)
        matched += 1
      }
    }
    assert(nT == treated.length.toLong && nM == matched.toLong)
    val expAtt =
      math.floor(sumDiff.toDouble / matched / 100 * 10000 + 0.5) / 10000
    val expGap =
      math.floor(sumGap.toDouble / matched / 100 * 10000 + 0.5) / 10000
    assert(math.abs(att - expAtt) < 1e-9, s"att $att vs $expAtt")
    assert(math.abs(gap - expGap) < 1e-9, s"gap $gap vs $expGap")
  }

  test("sprt_monitor: trace replays the cumulative LLR and stops at crossing") {
    val rows = StatOps.sprtMonitor.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val l1 = math.log(0.22 / 0.15); val l0 = math.log(0.78 / 0.85)
    val b = math.log(19.0)
    var (ct, cc) = (0L, 0L)
    val trace = daily.map { case (day, t, c) =>
      ct += t; cc += c
      val llr = cc * l1 + (ct - cc) * l0
      (day, t, c, llr,
        if (llr >= b) "accept_h1" else if (llr <= -b) "accept_h0"
        else "continue")
    }
    val cross = trace.indexWhere(_._5 != "continue")
    val expected = if (cross < 0) trace else trace.take(cross + 1)
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5)
      assert(math.abs(g._4 - math.floor(e._4 * 10000 + 0.5) / 10000) < 1e-9)
    }
    // every non-final row is 'continue'
    rows.init.foreach(r => assert(r._5 == "continue"))
  }

  test("wilson_ci: bounds bracket the rate and replay the formula") {
    val rows = StatOps.wilsonCi.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 25)
    rows.foreach { case (_, n, k, rate, lo, hi) =>
      assert(k <= n && lo <= rate + 1e-9 && rate <= hi + 1e-9)
      assert(lo >= -1e-9 && hi <= 1 + 1e-9)
      val z = 1.959964; val p = k.toDouble / n
      val rad = math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
      val den = 1 + z * z / n
      def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
      assert(math.abs(lo - r6((p + z * z / (2 * n) - z * rad) / den)) < 1e-9)
      assert(math.abs(hi - r6((p + z * z / (2 * n) + z * rad) / den)) < 1e-9)
    }
  }

  test("brand_diversity: H bounded by ln(k); replay of one nation") {
    val rows = StatOps.brandDiversity.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length == 25)
    rows.foreach { case (nat, n, k, h, j) =>
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6,
        s"nation $nat: H $h outside [0, ln $k]")
      assert(j >= -1e-9 && j <= 1 + 1e-6)
    }
    // replay the densest nation
    val target = rows.maxBy(_._2)._1
    val cs = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .join(graft.Tables.customer(spark, sfDir)
        .filter(col("c_nationkey") === target),
        col("c_custkey") === col("o_custkey"))
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = cs.map(_._2).sum
    val h = -cs.map { case (_, c) =>
      (c.toDouble / n) * math.log(c.toDouble / n)
    }.sum
    val got = rows.find(_._1 == target).get
    assert(got._2 == n && got._3 == cs.length.toLong)
    assert(math.abs(got._4 - math.floor(h * 1000000 + 0.5) / 1000000)
      < 1e-6)
  }

  test("broadcast_advisor: estimates replay and rank by table size") {
    val rows = IncrOps.broadcastAdvisor.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 6)
    rows.foreach { case (t, n, est, adv) =>
      assert(n > 0 && est > 8 * n, s"$t estimate too small")
      assert(adv == (if (est <= 10 * 1024 * 1024) "broadcast"
        else "shuffle"))
    }
    val byT = rows.map(r => r._1 -> r._3).toMap
    // the fact table dominates every dimension
    assert(byT("lineitem") > byT("customer") && byT("lineitem") > byT("part"))
    assert(byT("region") < byT("nation")) // 5 regions < 25 nations always
    // region really is its exact counted size
    val exp = graft.Tables.region(spark, sfDir)
      .select(length(col("r_name"))).collect().map(_.getInt(0) + 8L).sum
    assert(byT("region") == exp)
  }

  test("catalog_coverage: flags replay a naive anti-join per brand") {
    val rows = IncrOps.catalogCoverage.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == 25)
    val sold = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().collect().map(_.getLong(0)).toSet
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    rows.foreach { case (brand, n, nOrd, nDead, cov) =>
      val ps = parts(brand)
      assert(n == ps.length.toLong)
      val ordered = ps.count(p => sold(p._1)).toLong
      assert(nOrd == ordered && nDead == n - ordered)
      assert(math.abs(cov - math.floor(ordered.toDouble / n * 1000000
        + 0.5) / 1000000) < 1e-9)
    }
  }

  test("partial_corr: correlations replay exact driver-side co-moments") {
    val row = StatOps.partialCorr.run(spark, sfDir).collect().head
    val b = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .select(floor(col("l_quantity") + lit(0.5)).cast("long"),
        floor(col("l_extendedprice") + lit(0.5)).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = b.length.toLong
    def corr(f: ((Long, Long, Long)) => Long,
        g: ((Long, Long, Long)) => Long): Double = {
      val sa = b.map(f).sum; val sb = b.map(g).sum
      val sab = b.map(t => f(t) * g(t)).sum
      val saa = b.map(t => f(t) * f(t)).sum
      val sbb = b.map(t => g(t) * g(t)).sum
      (n.toDouble * sab - sa.toDouble * sb) /
        math.sqrt((n.toDouble * saa - sa.toDouble * sa)
          * (n.toDouble * sbb - sb.toDouble * sb))
    }
    val rxy = corr(_._1, _._2); val rxz = corr(_._1, _._3)
    val ryz = corr(_._2, _._3)
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - r6(rxy)) < 1e-9)
    assert(math.abs(row.getDouble(4) - r6((rxy - rxz * ryz)
      / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz)))) < 1e-9)
  }

  test("capture_recapture: estimator brackets and replays truth") {
    val row = StatOps.captureRecapture.run(spark, sfDir).collect().head
    val (n1, n2, m, lp, chap, truth) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getDouble(4), row.getLong(5))
    assert(m <= math.min(n1, n2) && m > 0)
    assert(lp >= math.max(n1, n2) - 1e-9,
      "the union can't be smaller than either capture")
    assert(math.abs(lp - math.floor(n1.toDouble * n2 / m * 100 + 0.5)
      / 100) < 1e-9)
    assert(math.abs(chap - math.floor(((n1 + 1).toDouble * (n2 + 1)
      / (m + 1) - 1) * 100 + 0.5) / 100) < 1e-9)
    // truth is the directly counted union of both captures
    assert(truth == n1 + n2 - m)
    // on a closed population LP should land within 25% of truth
    assert(math.abs(lp - truth) / truth < 0.25, s"LP $lp vs truth $truth")
  }

  test("grubbs_test: argmax day and G replay exact moments") {
    val row = StatOps.grubbsTest.run(spark, sfDir).collect().head
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(floor(sum(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val n = daily.length.toLong
    val s0 = daily.map(_._2).sum
    val ss = daily.map(t => t._2 * t._2).sum
    val best = daily.map { case (day, y) =>
      (math.abs(n * y - s0), day, y)
    }.minBy(t => (-t._1, t._2))
    val g = (best._1.toDouble / n) /
      math.sqrt((ss - s0.toDouble * s0 / n) / (n - 1))
    assert(row.getLong(0) == n)
    assert(row.getString(1) == best._2 && row.getLong(2) == best._3)
    assert(math.abs(row.getDouble(3)
      - math.floor(g * 10000 + 0.5) / 10000) < 1e-9)
    assert(row.getBoolean(4) == (g > 3.0))
  }

  test("levene_test: Brown-Forsythe F replays a naive recompute") {
    val row = StatOps.leveneTest.run(spark, sfDir).collect().head
    val data = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") + lit(0.5)).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val devs = data.toSeq.sortBy(_._1).map { case (gname, l) =>
      val v = l.map(_._2).sorted
      val pos = (v.length - 1) * 0.5
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      val med2 = math.round(2 * (v(lo) + (pos - lo) * (v(hi) - v(lo))))
      gname -> l.map(t => math.abs(2 * t._2 - med2))
    }
    val k = devs.length.toLong
    val nn = devs.map(_._2.length).sum.toLong
    val st = devs.map(_._2.sum).sum
    val sst = devs.map(_._2.map(x => x * x).sum).sum
    val sb = devs.map { case (_, ds) =>
      val sg = ds.sum
      sg.toDouble * sg / ds.length
    }.sum
    val ssb = sb - st.toDouble * st / nn
    val ssw = sst - sb
    val f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert(row.getLong(0) == k && row.getLong(1) == nn)
    assert(math.abs(row.getDouble(2) - ssb) < 1e-2)
    assert(math.abs(row.getDouble(3) - ssw) < 1e-2)
    assert(math.abs(row.getDouble(4) - f) < 1e-4, s"F ${row.getDouble(4)} vs $f")
    assert(row.getDouble(4) >= 0)
  }

  test("iv_2sls: Wald estimate replays exact driver-side co-moments") {
    val row = StatOps.iv2sls.run(spark, sfDir).collect().head
    val b = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_size").cast("long"),
        floor(col("l_discount") * 100 + lit(0.5)).cast("long"),
        floor(col("l_quantity") + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = b.length.toLong
    val (sz, sx, sy) = (b.map(_._1).sum, b.map(_._2).sum, b.map(_._3).sum)
    val szy = b.map(t => t._1 * t._3).sum
    val szx = b.map(t => t._1 * t._2).sum
    val szz = b.map(t => t._1 * t._1).sum
    val sxx = b.map(t => t._2 * t._2).sum
    val sxy = b.map(t => t._2 * t._3).sum
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) ==
      r6((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    assert(row.getDouble(2) ==
      r6((n * szy - sz * sy).toDouble / (n * szx - sz * sx).toDouble))
    assert(row.getDouble(3) ==
      r6((n * szx - sz * sx).toDouble / (n * szz - sz * sz).toDouble))
  }

  private def quantities(flag: String): Array[Long] =
    graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === flag)
      .select(floor(col("l_quantity") + lit(0.5)).cast("long"))
      .collect().map(_.getLong(0))

  test("kruskal_wallis: H replays a naive midrank computation") {
    val rows = StatOps.kruskalWallis.run(spark, sfDir).collect()
    val groups = rows.map(_.getString(0)).sorted
    val data = groups.map(g => g -> quantities(g)).toMap
    val all = data.values.flatten.toArray.sorted
    val n = all.length.toDouble
    // midrank per value
    val rank = all.distinct.map { v =>
      val below = all.count(_ < v)
      val eq = all.count(_ == v)
      v -> (below + (eq + 1) / 2.0)
    }.toMap
    val sumT = all.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    val h = 12.0 / (n * (n + 1)) * groups.map { g =>
      val rs = data(g).map(rank).sum
      rs * rs / data(g).length
    }.sum - 3 * (n + 1)
    val hc = h / (1.0 - sumT / (n * n * n - n))
    val got = rows.head.getDouble(3)
    assert(math.abs(got - hc) < 1e-4, s"H $got vs naive $hc")
    // weighted mean of mean-ranks is the global mean rank (N+1)/2
    val wm = rows.map(r => r.getDouble(2) * r.getLong(1)).sum / n
    assert(math.abs(wm - (n + 1) / 2) < 1e-2)
  }

  test("fisher_exact: p replays the log-space hypergeometric walk") {
    val row = StatOps.fisherExact.run(spark, sfDir).collect().head
    val (n, r1, c1, a) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    val kmin = math.max(0L, r1 + c1 - n)
    val kmax = math.min(r1, c1)
    val lnr = (kmin until kmax).map(j =>
      math.log(((r1 - j) * (c1 - j)).toDouble) -
        math.log(((j + 1) * (n - r1 - c1 + j + 1)).toDouble))
    val lnw = lnr.scanLeft(0.0)(_ + _) // lnw(kmin)=0, cumulative
    val mx = lnw.max
    val lna = lnw((a - kmin).toInt)
    val tail = lnw.filter(_ <= lna + 1e-9)
    val p = tail.map(x => math.exp(x - mx)).sum /
      lnw.map(x => math.exp(x - mx)).sum
    assert(row.getLong(4) == kmax - kmin + 1)
    assert(row.getLong(5) == tail.length.toLong)
    val got = row.getDouble(6)
    assert(got >= 0.0 && got <= 1.0)
    assert(math.abs(got - p) < 1e-5, s"p $got vs naive $p")
  }

  test("cohens_d: replays the pooled-SD effect size") {
    val row = StatOps.cohensD.run(spark, sfDir).collect().head
    val (x1, x2) = (quantities("A").map(_.toDouble),
      quantities("R").map(_.toDouble))
    def mean(x: Array[Double]) = x.sum / x.length
    def ss(x: Array[Double]) = {
      val m = mean(x); x.map(v => (v - m) * (v - m)).sum
    }
    val d = (mean(x1) - mean(x2)) /
      math.sqrt((ss(x1) + ss(x2)) / (x1.length + x2.length - 2))
    assert(math.abs(row.getDouble(2) - d) < 1e-5,
      s"d ${row.getDouble(2)} vs naive $d")
    assert(math.abs(row.getDouble(3)) <= math.abs(row.getDouble(2)),
      "Hedges g shrinks toward zero")
  }

  test("cliffs_delta: dominance counts replay the naive pair walk") {
    val row = StatOps.cliffsDelta.run(spark, sfDir).collect().head
    val (x, y) = (quantities("A"), quantities("R"))
    var gt = 0L; var lt = 0L
    for (a <- x; b <- y) { if (a > b) gt += 1 else if (a < b) lt += 1 }
    assert(row.getLong(2) == gt && row.getLong(3) == lt)
    val delta = (gt - lt).toDouble / (x.length.toLong * y.length)
    assert(math.abs(row.getDouble(4) - delta) < 1e-6)
  }

  test("wasserstein_1d: replays |ECDF gap| * gap-width and is a metric") {
    val rows = StatOps.wasserstein1d.run(spark, sfDir).collect()
    assert(rows.length == 3) // A-N, A-R, N-R
    rows.foreach { r =>
      val (x, y) = (quantities(r.getString(0)), quantities(r.getString(1)))
      val vals = (x ++ y).distinct.sorted
      var w = 0.0
      for (i <- 0 until vals.length - 1) {
        val f1 = x.count(_ <= vals(i)).toDouble / x.length
        val f2 = y.count(_ <= vals(i)).toDouble / y.length
        w += math.abs(f1 - f2) * (vals(i + 1) - vals(i))
      }
      assert(r.getDouble(4) >= 0.0)
      assert(math.abs(r.getDouble(4) - w) < 1e-5,
        s"${r.getString(0)}-${r.getString(1)}: ${r.getDouble(4)} vs $w")
    }
  }

  test("durbin_watson: replays OLS residual serial ratio, dw in (0,4)") {
    val row = StatOps.durbinWatson.run(spark, sfDir).collect().head
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val n = daily.length.toDouble
    val (st, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val stt = daily.map(t => t._1 * t._1).sum
    val sty = daily.map(t => t._1 * t._2).sum
    val b = (n * sty - st.toDouble * sy) / (n * stt - st.toDouble * st)
    val a = (sy - b * st) / n
    val e = daily.map { case (t, y) => y - a - b * t }
    val den = e.map(v => v * v).sum
    val num = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val dw = num / den
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 4)
    assert(math.abs(row.getDouble(1) - dw) < 1e-5,
      s"dw ${row.getDouble(1)} vs naive $dw")
  }

  test("median_polish: replays the exact one-sweep decomposition") {
    val cells = graft.Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val brands = cells.keys.map(_._1).toSeq.distinct.sorted
    val years = Seq(1996, 1997, 1998)
    val rowMed = brands.map { b =>
      val vs = years.map(y => cells((b, y)))
      b -> (vs.sum - vs.max - vs.min)
    }.toMap
    def med25(vs: Seq[(Long, String)]): Long =
      vs.sortBy(t => (t._1, t._2)).apply(12)._1
    val colMed = years.map { y =>
      y -> med25(brands.map(b => (cells((b, y)) - rowMed(b), b)))
    }.toMap
    val overall = med25(brands.map(b => (rowMed(b), b)))
    val maxResid = (for (b <- brands; y <- years)
      yield math.abs(cells((b, y)) - rowMed(b) - colMed(y))).max
    val got = StatOps.medianPolish.run(spark, sfDir).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val b = r.getString(0)
      assert(math.abs(r.getDouble(1) - (rowMed(b) - overall) / 100.0) < 0.011)
      assert(math.abs(r.getDouble(2) - overall / 100.0) < 0.011)
      assert(math.abs(r.getDouble(6) - maxResid / 100.0) < 0.011)
    }
    // overall is the median of row effects, so brand effects center on 0
    val effs = got.map(_.getDouble(1)).sorted
    assert(math.abs(effs(12)) < 0.011, s"median brand effect ${effs(12)}")
  }

  test("cvm_test: replays the atom-weighted quadratic ECDF functional") {
    val (x, y) = (quantities("A"), quantities("R"))
    val (m, n) = (x.length.toDouble, y.length.toDouble)
    val vals = (x ++ y).distinct.sorted
    var s = 0.0
    vals.foreach { v =>
      val w = x.count(_ == v) + y.count(_ == v)
      val d = x.count(_ <= v) / m - y.count(_ <= v) / n
      s += w * d * d
    }
    val t = s * m * n / ((m + n) * (m + n))
    val row = StatOps.cvmTest.run(spark, sfDir).collect().head
    assert(row.getLong(0) == m.toLong && row.getLong(1) == n.toLong)
    assert(row.getDouble(2) >= 0)
    assert(math.abs(row.getDouble(2) - t) < 1e-4,
      s"T ${row.getDouble(2)} vs naive $t")
  }

  test("kendalls_w: replays rank-sum concordance over brand-year cells") {
    val cells = graft.Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .join(graft.Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val years = cells.map(_._2).distinct.sorted
    val ranks = years.flatMap { y =>
      val yr = cells.filter(_._2 == y).sortBy(t => (-t._3, t._1))
      yr.zipWithIndex.map { case ((b, _, _), i) => (b, i + 1L) }
    }
    val rs = ranks.groupBy(_._1).map { case (b, l) => b -> l.map(_._2).sum }
    val n = rs.size.toDouble
    val m = years.length.toDouble
    val sBar = m * (n + 1) / 2
    val sDev = rs.values.map(r => (r - sBar) * (r - sBar)).sum
    val w = 12.0 * sDev / (m * m * (n * n * n - n))
    val row = StatOps.kendallsW.run(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == m.toLong)
    assert(math.abs(row.getDouble(2) - w) < 1e-5,
      s"W ${row.getDouble(2)} vs naive $w")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1 + 1e-9)
  }

  test("cochran_q: replays the repeated-measures binary algebra") {
    val flags = graft.Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .groupBy("l_partkey")
      .agg(max(when(year(col("l_shipdate")) === 1996, 1L).otherwise(0L))
        .as("x1"),
        max(when(year(col("l_shipdate")) === 1997, 1L).otherwise(0L))
          .as("x2"),
        max(when(year(col("l_shipdate")) === 1998, 1L).otherwise(0L))
          .as("x3"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val (c1, c2, c3) = (flags.map(_._1).sum, flags.map(_._2).sum,
      flags.map(_._3).sum)
    val den = flags.map { t =>
      val r = t._1 + t._2 + t._3; 3 * r - r * r
    }.sum
    val num = 3.0 * (c1.toDouble * c1 + c2.toDouble * c2 + c3.toDouble * c3) -
      (c1 + c2 + c3).toDouble * (c1 + c2 + c3)
    val q = 2.0 * num / den
    val row = StatOps.cochranQ.run(spark, sfDir).collect().head
    assert(row.getLong(0) == flags.length.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((c1, c2, c3)))
    assert(math.abs(row.getDouble(4) - q) < 1e-3, s"Q ${row.getDouble(4)} vs $q")
  }

  test("friedman_test: replays midranked weekday blocks") {
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)))
    val weeks = daily.groupBy(t => t._1 / 7).filter(_._2.length == 7)
    val b = weeks.size.toDouble
    // midranks within each week: m2 = 2*LT(others) + EQ(others) + 2
    val m2fix = weeks.toSeq.flatMap { case (_, days) =>
      days.map { case (t, y) =>
        val others = days.filter(_._1 != t)
        (t % 7, 2L * others.count(_._2 < y) + others.count(_._2 == y) + 2)
      }
    }
    val rj = m2fix.groupBy(_._1).map { case (d, l) => d -> l.map(_._2).sum }
    val sm2 = m2fix.map(t => t._2 * t._2).sum
    val s2 = rj.values.map(r => (r - 8 * b.toLong) * (r - 8 * b.toLong)).sum
    val chi = 6.0 * s2 / (sm2 - 448 * b)
    val rows = StatOps.friedmanTest.run(spark, sfDir).collect()
    assert(rows.length == 7)
    assert(rows.head.getLong(3) == b.toLong)
    assert(math.abs(rows.head.getDouble(4) - chi) < 1e-3,
      s"chi2 ${rows.head.getDouble(4)} vs $chi")
    rows.foreach { r =>
      assert(r.getLong(1) == rj(r.getLong(0)), s"dow ${r.getLong(0)} rank sum")
    }
    // mean ranks over a week average to (k+1)/2 = 4
    val wm = rows.map(_.getDouble(2)).sum / 7
    assert(math.abs(wm - 4.0) < 1e-3, s"mean of mean-ranks $wm")
  }
}
