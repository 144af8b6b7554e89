package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property pins for the round-7 profiling/feature-prep batch: RAKE
  * keyword extraction, winsorized means, the SCD2 point-in-time join,
  * key-sampled join-cardinality estimation, and one-pass multi-
  * quantiles. */
class ProfileOpsSuite extends SparkSpec {

  test("rake: phrases contain no stopwords and scores are positive") {
    val rows = TextOps.rakeKeywords.run(spark, sfDir).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(!words.exists(Set("a", "the")), s"stopword in: ${r.get(0)}")
      assert(r.getAs[Double]("score") > 0)
      assert(r.getAs[Long]("n_occ") >= 1)
      // RAKE: a phrase's score is >= its length (deg/freq >= 1 per word)
      assert(r.getAs[Double]("score") >= words.length - 1e-6)
    }
  }

  test("skyline: frontier is exactly the non-dominated set, monotone in both dims") {
    val rows = Relational.q118Skyline.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // monotone: price ascending implies size strictly ascending
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1 && a._2 < b._2,
          s"frontier not strictly monotone: $a then $b")
      case _ => ()
    }
    // naive O(n^2) dominance check on the collected fixture
    val pts = graft.Tables.part(spark, sfDir)
      .select(floor(col("p_retailprice") * 100 + lit(0.5)).cast("long"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val frontier = pts.distinct.filter { case (p, sz) =>
      !pts.exists { case (p2, s2) =>
        (p2 < p && s2 >= sz) || (p2 <= p && s2 > sz) }
    }.sorted
    assert(rows.map(t => (t._1, t._2)).sorted.toSeq == frontier.toSeq)
  }

  test("winsorize: clipped mean sits between bounds; clip counts ~5% tails") {
    val rows = StatOps.winsorize.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val lo = r.getAs[Long]("n_clip_lo"); val hi = r.getAs[Long]("n_clip_hi")
      // Exact p05/p95 clip: each tail is at most ~5% + interpolation slack.
      assert(lo <= n * 6 / 100 + 1, s"low tail $lo of $n")
      assert(hi <= n * 6 / 100 + 1, s"high tail $hi of $n")
      assert(r.getAs[Double]("win_mean") > 0)
    }
  }

  test("temporal join: every click maps to at most one version") {
    // The validity windows partition each user's timeline, so the sum of
    // per-version clicks equals the count of clicks at-or-after that
    // user's first purchase.
    val ev = graft.Tables.events(spark, sfDir)
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("t0"))
    val expected = ev.filter(col("event_type") === "click")
      .join(firstPurchase, "user_id")
      .filter(col("ts") >= col("t0")).count()
    val got = TemporalOps.temporalJoin.run(spark, sfDir)
      .agg(sum("n_clicks")).collect()(0).getLong(0)
    assert(got == expected, s"joined clicks $got != timeline clicks $expected")
  }

  test("join cardinality: estimate within 3x of actual; exact-key math") {
    val rows = StatOps.joinCardinality.run(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val p = r.getAs[Long]("predicted"); val a = r.getAs[Long]("actual")
      assert(a > 0 && p > 0)
      assert(p <= 3 * a && a <= 3 * p,
        s"${r.get(0)}: predicted $p vs actual $a (sampling should be ~10%)")
    }
  }

  test("multi-quantile: p25 <= p50 <= p75 and matches the exact single pass") {
    val rows = StatOps.multiQuantile.run(spark, sfDir).collect()
    val med = Relational.q53PercentileExact.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("exact_p50")).toMap
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      assert(math.abs(p50 - med(r.getString(0))) < 1e-9,
        s"${r.get(0)}: multi-quantile p50 $p50 != exact ${med(r.getString(0))}")
    }
  }

  test("ql_dirichlet: matches a naive full-corpus QL score recompute") {
    val got = SearchOps.qlDirichlet.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qTerms = Seq("spark", "vector", "stream", "window")
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val c = docs.map(_._2.length.toLong).sum.toDouble
    val cf = qTerms.map(t =>
      t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val mu = 2000.0
    val naive = docs.map { case (id, ws) =>
      id -> qTerms.map { t =>
        math.log((ws.count(_ == t) + mu * cf(t) / c) / (ws.length + mu))
      }.sum
    }.toMap
    // the declared query emits the global top-10; every emitted score
    // must match the naive QL value and be among the 10 best overall
    val top10 = naive.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(10).map(_._1).toSet
    got.foreach { case (id, sc) =>
      assert(math.abs(sc - naive(id)) < 1e-4,
        s"doc $id: $sc vs naive ${naive(id)}")
      assert(top10.contains(id), s"doc $id not in naive top-10")
    }
    assert(got.size == 10)
  }

  test("gopher_rules: funnel counts match a naive per-doc rule replay") {
    val row = TextOps.gopherRules.run(spark, sfDir).collect().head
    val docs = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val stops = Set("the", "a", "and", "of", "to")
    val checks = docs.map { t =>
      val ws = t.split(" ")
      val nc = t.replace(" ", "").length
      val wcOk = ws.length >= 50 && ws.length <= 100000
      val mwlOk = { val m = nc.toDouble / ws.length; m >= 3 && m <= 10 }
      val stopOk = ws.count(stops) >= 2
      val alphaOk = ws.count(_.exists(ch => ch >= 'a' && ch <= 'z')) * 10 >=
        ws.length * 8
      (wcOk, mwlOk, stopOk, alphaOk)
    }
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(1) == checks.count(!_._1).toLong, "wordcount fails")
    assert(row.getLong(2) == checks.count(!_._2).toLong, "wordlen fails")
    assert(row.getLong(3) == checks.count(!_._3).toLong, "stopword fails")
    assert(row.getLong(4) == checks.count(!_._4).toLong, "alpha fails")
    assert(row.getLong(5) ==
      checks.count(c => c._1 && c._2 && c._3 && c._4).toLong, "pass-all")
  }

  test("good_turing: matches a naive trigram frequency-of-frequencies") {
    val rows = TextOps.goodTuring.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 5)
    val grams = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
      .flatMap { t =>
        val ws = t.split(" ")
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      }
    val counts = grams.groupBy(identity).map(_._2.length.toLong)
    val ff = counts.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val n = counts.sum
    val n1 = ff.getOrElse(1L, 0L)
    rows.foreach { case (r, nTypes, rStar, pUnseen) =>
      assert(nTypes == ff(r), s"S($r) ${nTypes} vs ${ff(r)}")
      val exp = math.floor(
        (r + 1) * ff.getOrElse(r + 1, 0L).toDouble / ff(r) * 1e4 + 0.5) / 1e4
      assert(math.abs(rStar - exp) < 1e-9, s"r*($r) $rStar vs $exp")
      assert(math.abs(pUnseen - math.floor(n1.toDouble / n * 1e6 + 0.5) / 1e6)
        < 1e-9)
      assert(pUnseen > 0 && pUnseen < 1)
    }
  }

  test("term_burstiness: matches naive dispersion; bursty beats uniform") {
    val rows = TextOps.termBurstiness.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 15)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0).split(" ").toSeq)
    val nd = docs.length.toLong
    rows.foreach { case (w, cf, d) =>
      val tfs = docs.map(_.count(_ == w).toLong)
      assert(cf == tfs.sum, s"$w cf")
      val s2 = tfs.map(t => t * t).sum
      val exp = math.floor(
        (nd * s2 - cf * cf).toDouble / (nd * cf) * 1e6 + 0.5) / 1e6
      assert(math.abs(d - exp) < 1e-9, s"$w: $d vs $exp")
      // dispersion can never fall below the binomial floor of 0 and the
      // ranking keeps it descending
      assert(d >= 0)
    }
    val ds = rows.map(_._3)
    ds.zip(ds.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("token_fertility: one row per language, fertility >= 1") {
    val rows = TextOps.tokenFertility.run(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // every whitespace word yields at least one regex token, so the
      // corpus-level ratio can never dip below 1
      assert(r.getDouble(2) >= 1.0, s"${r.getString(0)}: fertility < 1")
      assert(r.getDouble(3) > 0)
    }
  }

  test("rrf_fusion: ranks replay in memory and fused scores are consistent") {
    // sf0.001: recompute both rankings naively from the two scored
    // relations' own declared top-10 queries is not enough (RRF ranks
    // the FULL population) — so replay the rank arithmetic instead:
    // every output row's rrf must equal its two rank terms, ranks must
    // be positive and distinct per column, and the QL rank column must
    // cover 1..n without gaps on the output's best rows.
    val rows = SearchOps.rrfFusion.run(spark, sfDir).collect()
    assert(rows.length == 15)
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.toSeq == rrfs.sortBy(-_).toSeq, "sorted by fused score")
    rows.foreach { r =>
      val rB = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rQ = r.getLong(2)
      val expected = rB.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        1.0 / (60 + rQ)
      assert(math.abs(r.getDouble(3) - expected) < 2e-6,
        s"rrf mismatch for doc ${r.getLong(0)}: $r")
      assert(rQ >= 1 && rB.forall(_ >= 1))
    }
    // a doc ranked #1 by BOTH retrievers would score 2/61; nothing can
    // exceed that
    assert(rrfs.forall(_ <= 2.0 / 61 + 1e-9))
    // fusion actually mixes: at least one output doc carries a BM25
    // rank (the query terms do occur in the fixture corpus)
    assert(rows.exists(!_.isNullAt(1)))
  }

  test("kneser_ney: per-doc scores replay the full in-memory KN model") {
    import org.apache.spark.sql.functions._
    val docsAll = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      .filter(_._2.length >= 2)
    val train = docsAll.filter(_._1 % 10 < 8).map(_._2)
    val eval0 = docsAll.filter(_._1 % 10 >= 8)
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    train.foreach { ts =>
      ts.sliding(2).foreach { p => big((p(0), p(1))) = big.getOrElse((p(0), p(1)), 0L) + 1 }
    }
    val c1 = big.toSeq.groupBy(_._1._1).map { case (v, xs) => v -> xs.map(_._2).sum }
    val n1f = big.toSeq.groupBy(_._1._1).map { case (v, xs) => v -> xs.length.toLong }
    val n1b = big.toSeq.groupBy(_._1._2).map { case (w, xs) => w -> xs.length.toLong }
    val n1pp = big.size.toLong
    val vsize = train.flatten.distinct.length.toLong
    val expected = eval0.map { case (id, ts) =>
      val lps = ts.sliding(2).toSeq
        .map { p => (p(0), p(1)) }
        .sortBy(identity)
        .flatMap { case (v, w) =>
          c1.get(v).map { cv =>
            math.log(
              math.max(big.getOrElse((v, w), 0L) - 0.75, 0.0) / cv
                + 0.75 * n1f(v) / cv * (n1b.getOrElse(w, 0L) + 1.0)
                  / (n1pp + vsize))
          }
        }
      val nTot = ts.length - 1
      (id, lps.length.toLong, nTot - lps.length.toLong,
        if (lps.nonEmpty)
          Some(math.floor(lps.sum / lps.length * 10000 + 0.5) / 10000)
        else None)
    }.sortBy(_._1)
    val rows = CurationOps.kneserNey.run(spark, sfDir).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (id, ns, nk, lp)) =>
      assert(r.getLong(0) == id && r.getLong(1) == ns && r.getLong(2) == nk,
        s"counts for doc $id")
      lp match {
        case Some(x) => assert(math.abs(r.getDouble(3) - x) < 2e-4,
          s"kn_lp for doc $id: ${r.getDouble(3)} vs $x")
        case None => assert(r.isNullAt(3))
      }
    }
  }

  test("textrank_keywords: top-20 replays an in-memory weighted PageRank") {
    import org.apache.spark.sql.functions._
    val docsAll = graft.Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("ts")).collect()
      .map(_.getSeq[String](0).toArray).filter(_.length >= 2)
    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
    docsAll.foreach(_.sliding(2).foreach { p =>
      if (p(0).length >= 4 && p(1).length >= 4 && p(0) != p(1))
        bg((p(0), p(1))) = bg.getOrElse((p(0), p(1)), 0L) + 1
    })
    val ed = scala.collection.mutable.Map.empty[(String, String), Long]
    bg.foreach { case ((v, w), c) =>
      ed((v, w)) = ed.getOrElse((v, w), 0L) + c
      ed((w, v)) = ed.getOrElse((w, v), 0L) + c
    }
    val wdeg = ed.toSeq.groupBy(_._1._1).map { case (u, xs) => u -> xs.map(_._2).sum }
    var r = wdeg.map { case (u, _) => u -> 1.0 }
    for (_ <- 1 to 3) {
      val byDst = ed.toSeq.filter(e => r.contains(e._1._1))
        .groupBy(_._1._2)
      r = byDst.map { case (w, es) =>
        val contrib = es.map { case ((u, _), c) => (u, r(u) * c / wdeg(u)) }
          .sortBy(_._1).map(_._2).sum
        w -> (0.15 + 0.85 * contrib)
      }
    }
    val expected = r.toSeq.sortBy(t => (-t._2, t._1)).take(20)
      .map { case (k, v) => (k, math.floor(v * 1000000 + 0.5) / 1000000) }
    val got = TextOps.textrankKeywords.run(spark, sfDir).collect()
      .map(rr => (rr.getString(0), rr.getDouble(1))).toSeq
    assert(got.map(_._1) == expected.map(_._1),
      s"keyword set/order: $got vs $expected")
    got.zip(expected).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 2e-6) }
  }

  test("fs_linkage: weights take only the four agreement-pattern values") {
    val rows = SearchOps.fsLinkage.run(spark, sfDir).collect()
    assert(rows.length == 15)
    val wAgree = math.log(0.9 / 0.05); val wDis = math.log(0.1 / 0.95)
    val bAgree = math.log(0.3 / 0.1); val bDis = math.log(0.7 / 0.9)
    val legal = Set(wAgree + bAgree, wAgree + bDis, wDis + bAgree,
      wDis + bDis).map(x => math.floor(x * 1000000 + 0.5) / 1000000)
    rows.foreach { r =>
      assert(legal.contains(r.getDouble(4)), s"illegal FS weight: $r")
      val expectedName = if (r.getDouble(2) >= 0.85) wAgree else wDis
      val expectedBand = if (r.getInt(3) == 1) bAgree else bDis
      val w = math.floor((expectedName + expectedBand) * 1000000 + 0.5) / 1000000
      assert(r.getDouble(4) == w, s"weight inconsistent with fields: $r")
    }
    // descending by weight then jw
    val ws = rows.map(r => (r.getDouble(4), r.getDouble(2)))
    assert(ws.toSeq == ws.sortBy(t => (-t._1, -t._2)).toSeq)
  }

  test("tfidf_cosine_pairs: top pairs replay a naive sparse cosine") {
    import org.apache.spark.sql.functions._
    val docsAll = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ts")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[String](1).filter(_.nonEmpty).toArray))
    val nDocs = docsAll.length.toLong
    val tf = docsAll.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val sub = tf.filter(_._1 < 50)
    def w(id: Long): Map[String, Double] =
      sub(id).map { case (t, c) => t -> c * math.log((nDocs + 1.0) / (df(t) + 1.0)) }
    def nrm(m: Map[String, Double]): Double =
      math.sqrt(m.toSeq.sortBy(_._1).map(t => t._2 * t._2).sum)
    val ids = sub.keys.toSeq.sorted
    val cands = for {
      i <- ids; j <- ids if i < j
      wi = w(i); wj = w(j)
      shared = wi.keySet.intersect(wj.keySet).toSeq.sorted
      if shared.nonEmpty
    } yield {
      val dt = shared.map(t => wi(t) * wj(t)).sum
      ((i, j), dt / (nrm(wi) * nrm(wj)))
    }
    val expTop = cands.sortBy(t => (-t._2, t._1._1, t._1._2)).take(20)
      .map { case ((a, b), c) =>
        (a, b, math.floor(c * 1000000 + 0.5) / 1000000) }
    val got = TextOps.tfidfCosinePairs.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == expTop.map(t => (t._1, t._2)),
      s"pair membership/order:\n$got\nvs\n$expTop")
    got.zip(expTop).foreach { case ((_, _, a), (_, _, b)) =>
      assert(math.abs(a - b) < 2e-6) }
  }

  test("skipgram_pairs: generated multiset replays incl. fingerprint") {
    val rows = TrainingPrep.skipgramPairs.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set(0L, 1L))
    // one negative per positive by construction
    assert(rows(0L)._1 == rows(1L)._1)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val vocab = docs.flatMap(_._2).distinct.sorted
    val v = vocab.length.toLong
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    docs.foreach { case (id, ts) =>
      for (p0 <- ts.indices; off <- 1 to 2 if p0 + off < ts.length) {
        val pos = p0 + 1L
        pairs += ((ts(p0), ts(p0 + off), 1L))
        val idx = ((id % 524287) * 8191 + pos * 131 + off * 7919) % 1000003 % v
        pairs += ((ts(p0), vocab(idx.toInt), 0L))
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(c: String, x: String, l: Long): Long = {
      val hex = md.digest(s"$c|$x|$l".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 8).map(j => hex(j).toLong * math.pow(31, j).toLong).sum % 1000003
    }
    Seq(0L, 1L).foreach { lbl =>
      val sub = pairs.filter(_._3 == lbl)
      val (n, nd, f) = rows(lbl)
      assert(n == sub.length.toLong, s"lbl $lbl count")
      assert(nd == sub.map(t => t._1 + "|" + t._2).distinct.length.toLong)
      val expF = sub.map(t => fp(t._1, t._2, t._3)).sum
      assert(f == expF, s"lbl $lbl fingerprint $f vs $expF")
    }
  }

  test("lsh_planner: S-curve replays closed form; monotone in the grid") {
    val rows = DedupAnn.lshPlanner.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 7)
    rows.foreach { case (b, r, t, p05, p08) =>
      assert(b * r == 64)
      def p(s: Double) = 1 - math.pow(1 - math.pow(s, r.toDouble), b.toDouble)
      assert(math.abs(t - math.floor(math.pow(1.0 / b, 1.0 / r) * 10000
        + 0.5) / 10000) < 1e-4)
      assert(math.abs(p05 - p(0.5)) < 1e-4, s"($b,$r) p05")
      assert(math.abs(p08 - p(0.8)) < 1e-4, s"($b,$r) p08")
      assert(p08 >= p05 - 1e-12, "collision prob increases with similarity")
    }
    // t_est rises as banding gets coarser (rows per band grow)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3 + 1e-12)
      case _           => ()
    }
  }

  test("zonemap_audit: layouts replay; date layout strictly prunes") {
    val rows = IncrOps.zonemapAudit.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length == 2)
    val a = rows.find(_._1 == "a_roundrobin").get
    val b = rows.find(_._1 == "b_bydate").get
    // same data, same matches; only the layout differs
    assert(a._4 == b._4 && a._6 == b._6)
    // the date layout scans (weakly) fewer bins and rows
    assert(b._3 <= a._3 * 3 && b._5 <= a._5)
    assert(b._7 >= a._7, "date layout is at least as scan-efficient")
    // scanned bins always cover every matching row
    assert(a._5 >= a._6 && b._5 >= b._6)
  }

  test("rocchio_expand: expansion excludes query terms, replays weights") {
    val rows = SearchOps.rocchioExpand.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5)
    rows.foreach { case (t, df, w) =>
      assert(t != "spark" && t != "vector" && t.nonEmpty)
      assert(df > 0 && w > 0)
    }
    // weights are emitted in descending order
    rows.sliding(2).foreach {
      case Array(x, y) => assert(x._3 >= y._3 - 1e-12)
      case _           => ()
    }
  }

  test("huffman_codes: Kraft equality, entropy sandwich, naive replay") {
    val rows = TextOps.huffmanCodes.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // Kraft equality for a complete prefix code: sum 2^-len == 1
    val kraft = rows.map(r => math.pow(2, -r._3.toDouble)).sum
    assert(math.abs(kraft - 1.0) < 1e-9, s"Kraft sum $kraft")
    val (avg, h) = (rows.head._4, rows.head._5)
    assert(h <= avg + 1e-9 && avg < h + 1, s"H=$h avg=$avg")
    // naive Huffman replay with the same (weight, member-set) order
    case class Node(w: Long, ms: List[Int])
    // member sets are disjoint, so lexicographic ms order == head order
    implicit val ord: Ordering[Node] = Ordering.by(n => (n.w, n.ms.head))
    val sorted = rows.sortBy(_._1)
    var nodes = sorted.zipWithIndex.map { case (r, i) => Node(r._2, List(i)) }
      .toVector
    val depths = Array.fill(nodes.length)(0L)
    while (nodes.length > 1) {
      val s = nodes.sorted
      val (a, b) = (s(0), s(1))
      (a.ms ++ b.ms).foreach(i => depths(i) += 1)
      nodes = s.drop(2) :+ Node(a.w + b.w, a.ms ++ b.ms)
    }
    sorted.zipWithIndex.foreach { case ((w, _, len, _, _), i) =>
      assert(len == depths(i), s"word $w: $len vs ${depths(i)}")
    }
    // avg replays sum(cnt*len)/N
    val n = sorted.map(_._2).sum
    val exp = math.floor(sorted.map(r => r._2 * r._3).sum.toDouble / n
      * 10000 + 0.5) / 10000
    assert(math.abs(avg - exp) < 1e-9)
  }

  test("chao1_vocab: estimator replays the trigram frequency head") {
    val row = TextOps.chao1Vocab.run(spark, sfDir).collect().head
    val (n, v, f1, f2, chao1, cov) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4), row.getDouble(5))
    val grams = graft.Tables.documents(spark, sfDir)
      .select("text").collect().flatMap { r =>
        val ts = r.getString(0).split(" ", -1)
        ts.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }
    val counts = grams.groupBy(identity).map(_._2.size)
    assert(n == grams.length.toLong && v == counts.size.toLong)
    assert(f1 == counts.count(_ == 1).toLong)
    assert(f2 == counts.count(_ == 2).toLong)
    assert(chao1 >= v, "Chao1 never estimates below the observed richness")
    val exp = math.floor((v + f1.toDouble * (f1 - 1) / (2 * (f2 + 1)))
      * 10000 + 0.5) / 10000
    assert(math.abs(chao1 - exp) < 1e-9)
    assert(math.abs(cov - math.floor((1 - f1.toDouble / n) * 1000000 + 0.5)
      / 1000000) < 1e-9)
  }

  test("audio_features: features replay the fixture formula driver-side") {
    val got = PipelineOps.audioFeatures.run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 1)
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val n = (200 + id % 100).toInt
      val sm = Array.tabulate(n)(i => text.charAt(i % text.length).toInt * 257 - 16384)
      val frames = sm.grouped(50).toArray
      val es = frames.map(_.map(x => x.toLong * x).sum)
      val zc = frames.map(fr =>
        fr.sliding(2).count(p => p.length == 2 && p(0).toLong * p(1) < 0)
      ).sum.toLong
      val peak = es.zipWithIndex.maxBy(t => (t._1, -t._2))
      val (nf, tzc, pf, pe) = got(id)
      assert(nf == frames.length.toLong, s"doc $id frames")
      assert(tzc == zc, s"doc $id zc: $tzc vs $zc")
      assert(pf == peak._2.toLong && pe == peak._1, s"doc $id peak")
    }
  }

  test("er_block_metrics: metrics replay a naive full-pair audit") {
    val row = SearchOps.erBlockMetrics.run(spark, sfDir).collect().head
    val c = graft.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") <= 200)
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    var np = 0L; var nc = 0L; var nt = 0L; var ntb = 0L
    for (i <- c.indices; j <- c.indices if c(i)._1 < c(j)._1) {
      np += 1
      val blocked = math.abs(c(i)._2.length - c(j)._2.length) <= 2
      val istrue = lev(c(i)._2, c(j)._2) <= 2
      if (blocked) nc += 1
      if (istrue) nt += 1
      if (blocked && istrue) ntb += 1
    }
    assert(row.getLong(0) == np && row.getLong(1) == nc)
    assert(row.getLong(3) == nt && row.getLong(4) == ntb)
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    assert(row.getDouble(2) == r6(1 - nc.toDouble / np))
    assert(row.getDouble(5) == r6(ntb.toDouble / nt))
  }

  test("best_passage: windows replay a naive per-doc sweep") {
    val terms = Set("hash", "join", "sort", "merge")
    val got = SearchOps.bestPassage.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.nonEmpty && got.length <= 15)
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    got.foreach { case (doc, s, cov, hits, passage) =>
      val toks = texts(doc)
      // the returned window really has that coverage/hit count
      val win = toks.slice(s.toInt - 1, s.toInt - 1 + 10)
      assert(win.mkString(" ") == passage, s"doc $doc passage mismatch")
      val inWin = win.filter(terms)
      assert(inWin.length.toLong == hits, s"doc $doc hits")
      assert(inWin.distinct.length.toLong == cov, s"doc $doc coverage")
      // and no anchored window in the doc beats it
      val anchors = toks.zipWithIndex.collect {
        case (w, i) if terms(w) => i + 1
      }
      anchors.foreach { a =>
        val aw = toks.slice(a - 1, a - 1 + 10).filter(terms)
        val key = (aw.distinct.length, aw.length)
        assert(key._1 < cov
          || (key._1 == cov && key._2 < hits)
          || (key._1 == cov.toInt && key._2 == hits.toInt && a >= s),
          s"doc $doc: anchor $a ($key) beats returned ($cov, $hits, $s)")
      }
    }
    // ranked by coverage then hits
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._4 > b._4) ||
          (a._3 == b._3 && a._4 == b._4 && a._1 < b._1))
      case _ => ()
    }
  }
}
