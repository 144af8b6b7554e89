package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property / naive-replay pins for the round-8 operators, at sf0.001 —
  * the spec leg of the oracle+spec+plan discipline. Each test checks
  * an algebraic invariant or recomputes the answer with an independent
  * driver-side naive algorithm over collected fixture rows (small at
  * this SF), so a bug that happened to fool the SQL oracle's
  * formulation is still caught. */
class Round8OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("recursive_closure: depth and ancestor sum match the closed form") {
    // parent(p) = p DIV 2 means depth(p) = floor(log2 p) and the
    // ancestor multiset is exactly {p/2, p/4, ..., 1}
    val rows = run("recursive_closure").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getLong(0); val depth = r.getLong(1); val ancSum = r.getLong(2)
      val expDepth = (63 - java.lang.Long.numberOfLeadingZeros(p)).toLong
      assert(depth == expDepth, s"part $p depth $depth != $expDepth")
      var a = p / 2; var sum = 0L
      while (a >= 1) { sum += a; a /= 2 }
      assert(ancSum == sum, s"part $p ancestor sum $ancSum != $sum")
    }
  }

  test("hamilton_apportion: allocations sum to the budget, within 1 of quota") {
    val rows = run("hamilton_apportion").collect()
    val totalAlloc = rows.map(_.getLong(4)).sum
    assert(totalAlloc == 100000L, s"allocations must sum exactly: $totalAlloc")
    val totalTokens = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val quota = 100000.0 * r.getLong(1) / totalTokens
      val alloc = r.getLong(4)
      assert(math.abs(alloc - quota) < 1.0,
        s"${r.getString(0)}: alloc $alloc vs quota $quota breaks quota rule")
      assert(alloc == r.getLong(2) || alloc == r.getLong(2) + 1)
    }
  }

  test("tukey_hsd: q statistics match a naive recompute from raw rows") {
    val raw = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = raw.groupBy(_._1).map { case (f, xs) =>
      f -> xs.map(_._2.toDouble)
    }
    val k = groups.size
    val n = raw.length
    val msw = {
      val ssw = groups.values.map { xs =>
        val m = xs.sum / xs.size
        xs.map(x => (x - m) * (x - m)).sum
      }.sum
      ssw / (n - k)
    }
    val expected = groups.toSeq.sortBy(_._1).combinations(2).map {
      case Seq((f1, a), (f2, b)) =>
        val diff = a.sum / a.size - b.sum / b.size
        val q = math.abs(diff) / math.sqrt(msw / 2 * (1.0 / a.size + 1.0 / b.size))
        (f1, f2, q)
    }.toSeq
    val got = run("tukey_hsd").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(got.length == expected.length)
    got.sortBy(t => (t._1, t._2)).zip(expected.sortBy(t => (t._1, t._2)))
      .foreach { case ((f1, f2, qGot), (e1, e2, qExp)) =>
        assert(f1 == e1 && f2 == e2)
        // the query rounds MSW's between-sum on a 1e-6 grid; allow 1e-3
        assert(math.abs(qGot - qExp) < 1e-3,
          s"($f1,$f2) q $qGot vs naive $qExp")
      }
  }

  test("bradley_terry: scores match a naive MM recompute") {
    val ip = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_partkey"))
      .agg(max(col("l_extendedprice")).as("pr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = ip.groupBy(_._1).values.toSeq.flatMap { itemsArr =>
      val items = itemsArr.toSeq
      for {
        a <- items; b <- items if a._2 < b._2
      } yield {
        val uw = a._3 > b._3 || (a._3 == b._3 && a._2 < b._2)
        ((a._2, b._2), if (uw) 1 else 0)
      }
    }.toSeq
    val pg = pairs.groupBy(_._1).map { case ((u, v), xs) =>
      (u, v, xs.size.toLong, xs.map(_._2).sum.toLong)
    }
    val node = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    pg.foreach { case (u, v, nUv, uWins) =>
      val (n1, w1) = node.getOrElse(u, (0L, 0L))
      node(u) = (n1 + nUv, w1 + uWins)
      val (n2, w2) = node.getOrElse(v, (0L, 0L))
      node(v) = (n2 + nUv, w2 + nUv - uWins)
    }
    val w1 = node.map { case (pk, (ni, wins)) => pk -> 2.0 * wins / ni }
    val den = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    pg.foreach { case (u, v, nUv, _) =>
      val s = w1(u) + w1(v)
      if (s > 0) {
        val t = math.floor(nUv / s * 1e9 + 0.5) / 1e9
        den(u) += t; den(v) += t
      }
    }
    val naive = node.collect {
      case (pk, (_, wins)) if wins > 0 && den(pk) > 0 =>
        pk -> math.floor(wins / den(pk) * 1e6 + 0.5) / 1e6
    }.toMap
    val got = run("bradley_terry").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { case (pk, sc) =>
      assert(naive.contains(pk) && math.abs(naive(pk) - sc) < 1e-9,
        s"part $pk bt $sc vs naive ${naive.get(pk)}")
    }
    // and the top-20 really are the top by score
    val worstShown = got.map(_._2).min
    val shown = got.map(_._1).toSet
    naive.foreach { case (pk, sc) =>
      assert(shown.contains(pk) || sc <= worstShown + 1e-12,
        s"part $pk score $sc should have made the top-20 (cutoff $worstShown)")
    }
  }

  test("huber_irls: weights bounded, robust slope differs from OLS sanely") {
    val r = run("huber_irls").collect().head
    val (slopeOls, slopeHuber) = (r.getDouble(0), r.getDouble(3))
    val nDown = r.getLong(5)
    assert(nDown > 0, "some rows must be down-weighted on real data")
    assert(r.getDouble(2) > 0, "mean absolute residual scale must be positive")
    // robust fit stays in the same regime as OLS on this data
    assert(math.abs(slopeHuber - slopeOls) / math.abs(slopeOls) < 0.5)
  }

  test("binseg_split: the reported split maximizes the naive gain scan") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val totN = daily.length.toLong
    val totS = daily.map(_._2).sum
    val gains = daily.indices.drop(1).map { i =>
      val n = (i + 1).toLong
      val s = daily.take(i + 1).map(_._2).sum
      val g = if (n >= 2 && totN - n >= 2)
        s.toDouble * s / n + (totS - s).toDouble * (totS - s) / (totN - n) -
          totS.toDouble * totS / totN
      else Double.NegativeInfinity
      (daily(i)._1, g / 10000)
    }
    val bestNaive = gains.maxBy(t => (t._2, -t._1.hashCode)) // gain first
    val got = run("binseg_split").collect().head
    assert(math.abs(got.getDouble(1) -
      math.floor(bestNaive._2 * 1e6 + 0.5) / 1e6) < 1e-6,
      s"gain ${got.getDouble(1)} vs naive ${bestNaive._2}")
  }

  test("harmonic_centrality: h6 matches a naive BFS on collected edges") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Set[(Long, Long)] = li.groupBy(_._1).values.toSeq.flatMap { itemsArr =>
      val items = itemsArr.toSeq
      for { a <- items; b <- items if a._2 != b._2 } yield (a._2, b._2)
    }.toSet
    val adjMap: Map[Long, Set[Long]] =
      adj.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val rows = run("harmonic_centrality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seed = r.getLong(0)
      var frontier = Set(seed); var visited = Set(seed)
      val levels = (1 to 3).map { _ =>
        val next = frontier.flatMap(n => adjMap.getOrElse(n, Set.empty)) --
          visited - seed
        visited ++= next; frontier = next
        next.size.toLong
      }
      val h6 = 6 * levels(0) + 3 * levels(1) + 2 * levels(2)
      assert(r.getLong(4) == h6,
        s"seed $seed h6 ${r.getLong(4)} != naive $h6 (levels $levels)")
    }
  }

  test("mrl_truncation: overlaps in [0,3]; apdex within [0,1]") {
    val mrl = run("mrl_truncation").collect()
    assert(mrl.length == 5)
    mrl.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= 3))
    val apdex = run("apdex_score").collect()
    apdex.foreach { r =>
      val a = r.getDouble(4)
      assert(a >= 0 && a <= 1)
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1))
    }
  }

  test("media_h264_pcm: decode equals the generation formula exactly") {
    // independent check of the oracle formula: recompute expected sums
    // in Scala from the raw documents and compare to the decoded rows
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = run("media_h264_pcm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, fi) = (r.getLong(0), r.getInt(1))
      val text = docs(id); val len = text.length
      def cp(j: Int) = text.charAt(j % len).toInt
      val ySum = (0 until 512).map(j => cp(fi * 11 + j).toLong).sum
      val cbSum = (0 until 128).map(j => cp(fi * 11 + 2 * j + 3).toLong).sum
      val crSum = (0 until 128).map(j => cp(fi * 11 + 3 * j + 5).toLong).sum
      assert(r.getLong(4) == ySum && r.getLong(5) == cbSum &&
        r.getLong(6) == crSum, s"doc $id frame $fi plane sums diverge")
    }
  }

  test("embedding_whiten and groupwise_ols: invariants") {
    val wh = run("embedding_whiten").collect()
    assert(wh.length == 64)
    wh.foreach(r => assert(r.getDouble(2) >= 0, "variance must be >= 0"))
    val ols = run("groupwise_ols").collect()
    assert(ols.nonEmpty)
    ols.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0 + 1e-9,
        s"r2 out of range: ${r.getDouble(4)}")
    }
  }

  private def docTokens(): Seq[(Long, String, Array[String])] =
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
      .toSeq

  test("ngram_novelty: replays the naive trigram split census") {
    val ds = docTokens()
    def grams(t: Array[String]): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    def isTrain(id: Long): Boolean = ((id & 2147483647L) * 1442695041L) % 100 < 80
    val train = ds.filter(d => isTrain(d._1)).flatMap(d => grams(d._3)).toSet
    val bysrc = ds.filter(d => !isTrain(d._1)).groupBy(_._2).map {
      case (src, docs) =>
        val vg = docs.flatMap(d => grams(d._3)).toSet
        (src, vg.size.toLong, vg.count(g => !train.contains(g)).toLong)
    }
    val got = run("ngram_novelty").collect()
    got.foreach { r =>
      val (_, nv, nn) = bysrc.find(_._1 == r.getString(0)).get
      assert(r.getLong(1) == nv, s"${r.getString(0)} val grams")
      assert(r.getLong(2) == nn, s"${r.getString(0)} novel grams")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }

  test("distinct_ngrams: replays naive distinct-n ratios per source") {
    val ds = docTokens()
    val got = run("distinct_ngrams").collect()
    got.foreach { r =>
      val docs = ds.filter(_._2 == r.getString(0)).map(_._3)
      val tot1 = docs.map(_.length.toLong).sum
      def dn(n: Int): Long = docs.flatMap(t =>
        (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")))
        .distinct.length.toLong
      assert(r.getLong(1) == tot1)
      def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
      assert(r.getDouble(2) == r6(dn(1).toDouble / tot1))
      assert(r.getDouble(3) == r6(dn(2).toDouble /
        docs.map(t => math.max(t.length - 1L, 0L)).sum))
      assert(r.getDouble(4) == r6(dn(3).toDouble /
        docs.map(t => math.max(t.length - 2L, 0L)).sum))
    }
  }

  test("quantize_recall: replays the naive fp32-vs-int8 top-10 overlap") {
    val embs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dq = embs.flatMap { case (id, v) =>
      val mx = v.map(math.abs).max
      if (mx <= 0) None
      else Some((id, v, v.map(x =>
        math.floor(x * (127.0 / mx) + 0.5).toInt * (mx / 127.0))))
    }
    def top10(qid: Long, qv: Array[Double],
        pick: ((Long, Array[Double], Array[Double])) => Array[Double]): Set[Long] =
      dq.filter(_._1 != qid).map { t =>
        val cv = pick(t)
        (t._1, round6(dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv)))))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val got = run("quantize_recall").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val qid = r.getLong(0)
      val qv = embs.find(_._1 == qid).get._2
      val n = (top10(qid, qv, _._2) intersect top10(qid, qv, _._3)).size
      assert(r.getLong(1) == n.toLong, s"probe $qid overlap ${r.getLong(1)} vs $n")
    }
  }

  test("granger_lag1: replays the two-regressor OLS F-test") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1).toDouble, r.getLong(2).toDouble))
    val m = daily.map(t => t._1 -> t).toMap
    val tri = daily.flatMap { case (d, _, yprev) =>
      m.get(d + 1).map { case (_, _, yt) => (yt, m(d)._3, m(d)._2) }
    }
    val n = tri.length.toDouble
    val (su, sv, sy) = (tri.map(_._2).sum, tri.map(_._3).sum, tri.map(_._1).sum)
    val cuu = tri.map(t => t._2 * t._2).sum - su * su / n
    val cvv = tri.map(t => t._3 * t._3).sum - sv * sv / n
    val cuv = tri.map(t => t._2 * t._3).sum - su * sv / n
    val cuy = tri.map(t => t._2 * t._1).sum - su * sy / n
    val cvy = tri.map(t => t._3 * t._1).sum - sv * sy / n
    val cyy = tri.map(t => t._1 * t._1).sum - sy * sy / n
    val det = cuu * cvv - cuv * cuv
    val b = (cuy * cvv - cvy * cuv) / det
    val c = (cvy * cuu - cuy * cuv) / det
    val rssR = cyy - cuy * cuy / cuu
    val rssU = cyy - b * cuy - c * cvy
    val f = (rssR - rssU) / (rssU / (n - 3))
    val row = run("granger_lag1").collect().head
    assert(row.getLong(0) == tri.length.toLong)
    assert(math.abs(row.getDouble(3) - f) < 1e-2, s"F ${row.getDouble(3)} vs $f")
    assert(rssU <= rssR + 1e-9, "unrestricted RSS can only be lower")
  }

  test("lsh_recall: full naive replay of both legs at sf0.001") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .filter(_._2.length >= 4)
    val P = 2147483647L
    def wh(w: String): Long =
      w.take(8).zipWithIndex.map { case (c, j) =>
        c.toLong * math.pow(31, j).toLong
      }.sum % P
    val hhd = docs.map { case (id, ts) =>
      val whs = ts.map(wh)
      val hh = (0 to ts.length - 4).map { i =>
        ((((whs(i) * 1000003L + whs(i + 1)) % P) * 1000003L
          + whs(i + 2)) % P * 1000003L + whs(i + 3)) % P
      }
      (id, hh, hh.distinct.toSet)
    }
    val rnd = new scala.util.Random(20260815L)
    val as = Seq.fill(16)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Seq.fill(16)(rnd.nextInt(Int.MaxValue).toLong)
    val sigs = hhd.map { case (id, hh, _) =>
      id -> (0 until 16).map(k => hh.map(h => (as(k) * h + bs(k)) % P).min)
    }.toMap
    val cand = (for {
      a <- hhd; b <- hhd if a._1 < b._1
      if (0 until 8).exists(i =>
        sigs(a._1)(2 * i) == sigs(b._1)(2 * i)
          && sigs(a._1)(2 * i + 1) == sigs(b._1)(2 * i + 1))
    } yield (a._1, b._1)).toSet
    val exact = (for {
      a <- hhd; b <- hhd if a._1 < b._1
      if 3 * (a._3 intersect b._3).size >= a._3.size + b._3.size
    } yield (a._1, b._1)).toSet
    val row = run("lsh_recall").collect().head
    assert(row.getLong(0) == exact.size.toLong, s"exact ${row.getLong(0)} vs ${exact.size}")
    assert(row.getLong(1) == cand.size.toLong, s"cand ${row.getLong(1)} vs ${cand.size}")
    assert(row.getLong(2) == (cand intersect exact).size.toLong)
  }

  test("evt_gumbel: replays method-of-moments over monthly maxima") {
    val daily = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val mm = daily.groupBy(t => t._1.getYear * 12 + t._1.getMonthValue)
      .map { case (_, xs) => xs.map(_._2).max / 100 }.map(_.toDouble).toSeq
    val n = mm.length
    val mean = mm.sum / n
    val sd = math.sqrt(mm.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val beta = sd * math.sqrt(6) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    val rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 120))
    val row = run("evt_gumbel").collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mu) < 0.02 + math.abs(mu) * 1e-9)
    assert(math.abs(row.getDouble(2) - beta) < 0.02 + beta * 1e-9)
    assert(math.abs(row.getDouble(3) - rl) < 0.02 + rl * 1e-9)
    assert(row.getDouble(3) > row.getDouble(1), "return level above location")
  }

  test("xbar_chart: replays Shewhart limits over complete weeks") {
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)))
    val wks = daily.groupBy(_._1 / 7).filter(_._2.length == 7)
      .map { case (_, xs) =>
        (xs.map(_._2).sum, xs.map(_._2).max - xs.map(_._2).min)
      }.toSeq
    val b = wks.length
    val xbb = wks.map(_._1).sum.toDouble / (7 * b)
    val rb = wks.map(_._2).sum.toDouble / b
    val outX = wks.count(w => w._1.toDouble / 7 > xbb + 0.419 * rb
      || w._1.toDouble / 7 < xbb - 0.419 * rb)
    val outR = wks.count(w => w._2 > 1.924 * rb || w._2 < 0.076 * rb)
    val row = run("xbar_chart").collect().head
    assert(row.getLong(0) == b.toLong)
    assert(math.abs(row.getDouble(1) - xbb) < 1e-3)
    assert(math.abs(row.getDouble(2) - rb) < 1e-3)
    assert(row.getLong(5) == outX.toLong && row.getLong(6) == outR.toLong)
    assert(row.getDouble(3) > row.getDouble(4), "UCL above LCL")
  }

  test("croston_sma: replays the intermittent-demand panel") {
    val wk = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") % 8 === 0)
      .groupBy(col("l_partkey"),
        floor(datediff(col("l_shipdate").cast("date"),
          lit("1970-01-01").cast("date")) / 7).cast("long").as("w"))
      .agg(sum(floor(col("l_quantity") + lit(0.5)).cast("long")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = wk.groupBy(_._1).flatMap { case (pk, xs) =>
      val k = xs.length
      val span = xs.map(_._2).max - xs.map(_._2).min
      if (k >= 2 && span > 0) {
        val dEst = xs.map(_._3).sum.toDouble / k
        val iEst = span.toDouble / (k - 1)
        Some((pk, k.toLong, dEst / iEst))
      } else None
    }.toSeq.sortBy(t => (-t._3, t._1)).take(25)
    val got = run("croston_sma").collect()
    assert(got.length == exp.length.min(25))
    got.zip(exp).foreach { case (r, (pk, k, f)) =>
      assert(r.getLong(0) == pk && r.getLong(1) == k)
      assert(math.abs(r.getDouble(4) - f) < 1e-3)
    }
  }

  test("mase_eval: MASE replays the exact integer MAE ratio") {
    val daily = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    var maeM = 0L; var maeN = 0L; var smape = 0.0
    daily.sliding(3).foreach { w =>
      maeM += math.abs(2 * w(1) - w(0) - w(2))
      maeN += math.abs(w(2) - w(1))
      smape += 2.0 * math.abs(2 * w(1) - w(0) - w(2)) /
        (math.abs(w(2).toDouble) + math.abs(2.0 * w(1) - w(0)))
    }
    val n = daily.length - 2
    val row = run("mase_eval").collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - maeM.toDouble / maeN) < 1e-5)
    assert(math.abs(row.getDouble(2) - smape / n) < 1e-5)
  }

  test("nelson_aalen: replays the quantized hazard sum; bounds vs KM") {
    val custs = graft.Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(min(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date"))).as("f"),
        max(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date"))).as("l"))
      .collect().map(r => (r.getInt(1).toLong, r.getInt(2).toLong))
    val mx = custs.map(_._2).max
    val obs = custs.map { case (f, l) => (l - f, if (mx - l >= 90) 1L else 0L) }
    val n = obs.length.toLong
    val byT = obs.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = run("nelson_aalen").collect()
    got.foreach { r =>
      val h = r.getInt(0)
      var before = 0L; var h9 = 0L; var ev = 0L
      byT.foreach { case (t, cnt, d) =>
        if (t <= math.min(h, 300)) {
          val atRisk = n - before
          h9 += math.floor(d.toDouble * 1e9 / atRisk + 0.5).toLong
          ev += d
        }
        if (t <= math.min(h, 300)) before += cnt
      }
      assert(r.getLong(1) == ev, s"horizon $h events")
      assert(math.abs(r.getDouble(2) - h9 / 1e9) < 2e-6,
        s"horizon $h hazard ${r.getDouble(2)} vs ${h9 / 1e9}")
      assert(r.getDouble(2) >= 0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
    // monotone cumulative hazard
    val hz = got.map(_.getDouble(2))
    assert(hz.zip(hz.tail).forall(p => p._2 >= p._1 - 1e-9))
  }

  test("kneedle_pareto: replays the exact knee argmax") {
    val revs = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1))
    val n = revs.length.toLong
    val t = revs.map(_._2).sum
    var cum = 0L; var best = (0L, 0L); var bestScore = Long.MinValue
    revs.zipWithIndex.foreach { case ((_, rev), i) =>
      cum += rev
      val score = cum * n - (i + 1) * t
      if (score > bestScore) { bestScore = score; best = (i + 1L, cum) }
    }
    val row = run("kneedle_pareto").collect().head
    assert(row.getLong(0) == n && row.getLong(1) == best._1,
      s"knee ${row.getLong(1)} vs ${best._1}")
    assert(row.getDouble(3) > row.getDouble(2),
      "knee must sit above the diagonal")
  }

  test("lift_gain: monotone depth/gain, lift 1.0 at full depth") {
    val rows = run("lift_gain").collect().sortBy(_.getLong(0))
    // bins ascend; cumulative-from-top counts DESCEND with bin
    val cw = rows.map(_.getLong(1))
    assert(cw.zip(cw.tail).forall(p => p._1 >= p._2))
    val full = rows.head // lowest bin = full corpus
    assert(full.getDouble(3) == 1.0 && full.getDouble(4) == 1.0)
    assert(math.abs(full.getDouble(5) - 1.0) < 1e-6,
      "lift at depth 1.0 is exactly 1")
    rows.foreach(r => assert(r.getDouble(5) >= 0))
  }

  test("boxcox_grid: replays profile log-likelihoods; one winner") {
    val daily = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(floor(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("x"))
      .collect().map(_.getLong(1).toDouble).filter(_ > 0)
    val n = daily.length
    def ll(lam: Double): Double = {
      val y = daily.map { x =>
        if (lam == 1.0) x - 1
        else if (lam == 0.5) 2 * (math.sqrt(x) - 1)
        else if (lam == 0.0) math.log(x)
        else if (lam == -0.5) 2 * (1 - 1 / math.sqrt(x))
        else 1 - 1 / x
      }
      val m = y.sum / n
      val v = y.map(d => (d - m) * (d - m)).sum / n
      -(n / 2.0) * math.log(v) + (lam - 1) * daily.map(math.log).sum
    }
    val rows = run("boxcox_grid").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val e = ll(r.getDouble(0))
      assert(math.abs(r.getDouble(1) - e) < math.abs(e) * 1e-6 + 1e-2,
        s"lambda ${r.getDouble(0)}: ${r.getDouble(1)} vs $e")
    }
    assert(rows.count(_.getBoolean(2)) == 1, "exactly one best lambda")
    val bestLam = rows.find(_.getBoolean(2)).get.getDouble(0)
    val naiveBest = Seq(-1.0, -0.5, 0.0, 0.5, 1.0).maxBy(ll)
    assert(bestLam == naiveBest)
  }

  test("ivf_probe_sweep: recall monotone in nprobe; replay at nprobe=8") {
    val rows = run("ivf_probe_sweep").collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    val recalls = rows.map(_.getDouble(2))
    assert(recalls.zip(recalls.tail).forall(p => p._2 >= p._1 - 1e-9),
      s"recall must not drop as nprobe grows: ${recalls.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 25)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    }
    // with all 8 cells probed IVF degenerates to brute force: recall 1
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = graft.ann.AnnIvf.medoids(emb, "vec_id", "embedding", k = 8)
    val full = graft.ann.AnnIvf.topKWith(cents, emb,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 5, nProbe = 8).select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val bf = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("cv"))
      .join(broadcast(q), col("qid") =!= col("id"))
      .withColumn("cos",
        round(GraftFunctions.cosineNative(col("qv"), col("cv")), 6))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("id"))))
      .filter(col("rn") <= 5).select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf, "nProbe = #cells must equal brute force")
  }

  test("mmd_embeddings: replays the kernel sums; within-group > cross") {
    val vs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 4096 && col("label").isin(0, 1))
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def k(a: Array[Double], b: Array[Double]): Double =
      math.exp(-(dot(a, a) - 2 * dot(a, b) + dot(b, b)) / 128.0)
    val x = vs.filter(_._2 == 0); val y = vs.filter(_._2 == 1)
    var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    for (a <- x; b <- x if a._1 < b._1) sxx += k(a._3, b._3)
    for (a <- y; b <- y if a._1 < b._1) syy += k(a._3, b._3)
    for (a <- x; b <- y) sxy += k(a._3, b._3)
    val (m, n) = (x.length.toDouble, y.length.toDouble)
    val kxx = 2 * sxx / (m * (m - 1)); val kyy = 2 * syy / (n * (n - 1))
    val kxy = sxy / (m * n)
    val row = run("mmd_embeddings").collect().head
    assert(row.getLong(0) == m.toLong && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - kxx) < 1e-5)
    assert(math.abs(row.getDouble(3) - kyy) < 1e-5)
    assert(math.abs(row.getDouble(4) - kxy) < 1e-5)
    assert(math.abs(row.getDouble(5) - (kxx + kyy - 2 * kxy)) < 1e-5)
  }

  test("topic_coherence: replays the UMass pair walk per source") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val nSources = docs.map(_._2).distinct.length
    val stf = docs.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).map { case ((s, t), l) => (s, t, l.length.toLong) }
    val sdf = stf.groupBy(_._2).map { case (t, l) =>
      t -> l.map(_._1).toSeq.distinct.length.toLong
    }
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    val top5 = stf.groupBy(_._1).map { case (s, ts) =>
      s -> ts.toSeq.map(t =>
          (t._2, r6(t._3 * math.log(nSources.toDouble / sdf(t._2)))))
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1)
    }
    val docTerms = docs.map(d => d._1 -> d._3.toSet).toMap
    def df(t: String) = docTerms.values.count(_.contains(t))
    def dij(a: String, b: String) =
      docTerms.values.count(s => s.contains(a) && s.contains(b))
    val got = run("topic_coherence").collect()
    got.foreach { r =>
      val ws = top5(r.getString(0))
      var c = 0.0; var np = 0
      for (i <- ws.indices; j <- ws.indices if i < j) {
        c += math.log((dij(ws(i), ws(j)) + 1.0) / df(ws(i)))
        np += 1
      }
      assert(r.getLong(1) == np.toLong)
      assert(math.abs(r.getDouble(2) - c) < 1e-4,
        s"${r.getString(0)}: ${r.getDouble(2)} vs $c")
    }
  }

  test("hurst_rs: replays naive R/S over dyadic windows") {
    val daily = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1).map(_._2.toDouble)
    def rsMean(scale: Int): (Int, Double) = {
      val wins = daily.grouped(scale).filter(_.length == scale).toSeq
      val rss = wins.flatMap { w =>
        val mean = w.sum / scale
        val z = w.scanLeft(0.0)(_ + _).drop(1).zipWithIndex
          .map { case (cum, j) => cum - (j + 1) * mean }
        val sd = math.sqrt(w.map(v => (v - mean) * (v - mean)).sum / scale)
        if (sd > 0) Some((z.max - z.min) / sd) else None
      }
      (rss.length, if (rss.isEmpty) 0.0 else rss.sum / rss.length)
    }
    val got = run("hurst_rs").collect()
    got.foreach { r =>
      val (nw, mrs) = rsMean(r.getLong(0).toInt)
      assert(r.getLong(1) == nw.toLong, s"scale ${r.getLong(0)} windows")
      assert(math.abs(r.getDouble(2) - mrs) < 1e-4,
        s"scale ${r.getLong(0)}: ${r.getDouble(2)} vs $mrs")
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 1.2)
    }
  }
}
