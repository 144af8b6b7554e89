package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property pins for the feature-engineering/survival batch: LOO target
  * encoding, WoE/IV binning, and the Kaplan–Meier curve. */
class FeatureOpsSuite extends SparkSpec {

  test("target_encode_loo: encodings replay from the segment aggregates") {
    val spend = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("c"))
      .join(graft.Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySeg = spend.groupBy(_._2).map { case (seg, xs) =>
      seg -> (xs.length.toLong, xs.map(_._3).sum) }
    val rows = FeatureOps.targetEncodeLoo.run(spark, sfDir).collect()
    assert(rows.length == 15)
    val spendMap = spend.map(t => t._1 -> t._3).toMap
    rows.foreach { r =>
      val (ck, seg, cents) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(spendMap(ck) == cents)
      val (n, sum) = bySeg(seg)
      val naive = math.floor(sum.toDouble / n * 10000 + 0.5) / 10000
      val loo = math.floor((sum - cents).toDouble / (n - 1) * 10000 + 0.5) / 10000
      assert(r.getDouble(3) == naive, s"naive for $ck")
      assert(n > 1 && r.getDouble(4) == loo, s"loo for $ck")
    }
    // the list really is the most-leaking rows, descending
    val leaks = rows.map(_.getDouble(5))
    assert(leaks.toSeq == leaks.sortBy(-_).toSeq)
  }

  test("woe_iv: bins cover the corpus; iv terms are non-negative") {
    val rows = FeatureOps.woeIv.run(spark, sfDir).collect()
    assert(rows.length == 10)
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == n, "deciles partition the corpus")
    // ntile spreads sizes within 1 of each other
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1))
      // (gs - bs) and ln(gs/bs) always share sign, so IV terms are >= 0
      assert(r.getDouble(5) >= -1e-12, s"iv_term negative: $r")
    }
  }

  test("kaplan_meier: curve is a replay of the in-memory KM estimator") {
    val day = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
    val cust = graft.Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(min(day).as("f"), max(day).as("l"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    val mx = cust.map(_._2).max
    val obs = cust.map { case (f, l) => ((l - f).toLong, mx - l >= 90) }
    val byT = obs.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    val n = obs.length.toLong
    val rows = FeatureOps.kaplanMeier.run(spark, sfDir).collect()
    var expected = Map.empty[Int, (Long, Double)]
    for (k <- 1 to 10) {
      var surv = 1.0; var events = 0L; var before = 0L
      byT.foreach { case (t, cnt, d) =>
        if (t <= 300 && t <= k * 30L) {
          val atRisk = n - before // durations < t have left the risk set
          surv *= (atRisk - d).toDouble / atRisk
          events += d
        }
        before += cnt
      }
      expected += (k * 30) -> ((events, surv))
    }
    rows.foreach { r =>
      val h = r.getInt(0)
      val (ev, surv) = expected(h)
      assert(r.getLong(1) == ev, s"events at $h")
      assert(math.abs(r.getDouble(2) - surv) < 2e-6, s"survival at $h")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    }
    // survival is non-increasing in the horizon
    val sv = rows.sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(sv.zip(sv.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("quantile_normalize: monotone deciles; equal-size sources align") {
    val rows = FeatureOps.quantileNormalize.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 20 * 9)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      val befs = sorted.map(_._3); val afts = sorted.map(_._4)
      assert(befs.zip(befs.tail).forall { case (a, b) => a <= b },
        s"$src before deciles not monotone")
      assert(afts.zip(afts.tail).forall { case (a, b) => a <= b },
        s"$src after deciles not monotone")
    }
    // the fixture's sources are equal-sized, so the normalized decile
    // values must be IDENTICAL across sources — the whole point of
    // quantile normalization
    (1 to 9).foreach { k =>
      val vals = rows.filter(_._2 == k).map(_._4).distinct
      assert(vals.length == 1, s"decile $k not aligned: ${vals.toSeq}")
    }
  }

  test("golden_record: survivorship fields are consistent with the clusters") {
    val rows = DedupAnn.goldenRecord.run(spark, sfDir).collect()
    assert(rows.length == 15)
    val comps = DedupAnn.dedupComponents.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "length(text) AS l", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap
    val sizes = rows.map(_.getLong(1))
    assert(sizes.toSeq == sizes.sortBy(-_).toSeq, "largest clusters first")
    rows.foreach { r =>
      val (comp, csize) = (r.getLong(0), r.getLong(1))
      val (canonical, golden) = (r.getLong(2), r.getLong(3))
      // cluster membership and size agree with dedup_components
      assert(comps(golden)._1 == comp && comps(canonical)._1 == comp)
      assert(comps(golden)._2.toLong == csize)
      assert(canonical <= golden || canonical < golden || canonical == comp,
        "canonical is the min id (= component label)")
      assert(canonical == comp, "component label IS the min member id")
      // the representative really is the longest text in the cluster
      val members = comps.collect { case (id, (c, _)) if c == comp => id }
      val best = members.map(id => (-docs(id)._1, id)).min._2
      assert(golden == best, s"golden_doc $golden vs expected $best")
      assert(r.getLong(4) == docs(golden)._1, "golden_len matches")
    }
  }

  test("log_rank: chi2 replays a naive risk-set walk") {
    val row = FeatureOps.logRank.run(spark, sfDir).collect().head
    val data = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .select("o_custkey", "c_mktsegment", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getString(1) == "BUILDING",
        r.getTimestamp(2).toLocalDateTime.toLocalDate.toEpochDay))
      .groupBy(_._1)
    val cust = data.values.map { l =>
      val days = l.map(_._3)
      (l.head._2, days.max - days.min, days.max)
    }.toSeq
    val mx = cust.map(_._3).max
    val obs = cust.map { case (g, t, last) => (g, t, mx - last >= 90) }
    assert(row.getLong(0) == obs.count(_._1).toLong)
    assert(row.getLong(1) == obs.count(!_._1).toLong)
    assert(row.getLong(2) == obs.count(o => o._1 && o._3).toLong)
    assert(row.getLong(3) == obs.count(o => !o._1 && o._3).toLong)
    // naive log-rank over event times
    val times = obs.filter(_._3).map(_._2).distinct.sorted
    var oe = 0.0; var vv = 0.0
    times.foreach { t =>
      val n1 = obs.count(o => o._1 && o._2 >= t).toLong
      val n0 = obs.count(o => !o._1 && o._2 >= t).toLong
      val d1 = obs.count(o => o._1 && o._3 && o._2 == t).toLong
      val d0 = obs.count(o => !o._1 && o._3 && o._2 == t).toLong
      val nt = n1 + n0; val dt = d1 + d0
      if (dt > 0 && nt > 1) {
        oe += d1 - dt * (n1.toDouble / nt)
        vv += dt * (n1.toDouble / nt) * (n0.toDouble / nt) *
          (nt - dt) / (nt - 1)
      }
    }
    val chi2 = oe * oe / vv
    assert(math.abs(row.getDouble(4) - chi2) < 1e-2,
      s"chi2 ${row.getDouble(4)} vs $chi2")
    assert(row.getBoolean(5) == (chi2 > 3.841459))
  }
}
