package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties + plan pins for the distributed-ML queries (MlOps):
  * k-means, count-min sketch, JL random projection. */
class MlOpsSuite extends SparkSpec {

  test("kmeans_embed: clusters partition the corpus; result is stable") {
    val out = MlOps.kmeansEmbed.run(spark, sfDir).collect()
    assert(out.length == 8, "k = 8 clusters")
    val total = out.map(_.getLong(1)).sum
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(total == n, s"cluster sizes sum to the corpus: $total vs $n")
    // Lloyd never empties a cluster on this fixture and norms are finite
    assert(out.forall(_.getLong(1) > 0))
    assert(out.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) > 0))
    // determinism: a re-run reproduces the exact rows (argmin has no
    // engine-order dependence — the whole point of the design)
    val again = MlOps.kmeansEmbed.run(spark, sfDir).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("kmeans assignment plan: broadcast centroids, partial-agg argmin") {
    // The scale contract: the per-iteration argmin must partial-
    // aggregate map-side (one row per point crosses the exchange) and
    // the centroid side must broadcast — never a point-side shuffle
    // of the k-times-replicated candidates.
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val pts = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT))").as("xi"))
      .withColumn("xd", expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)"))
    val cents = pts.filter(col("id") < 8).limit(8)
      .select(col("id").cast("int").as("cid"),
        col("xd").as("md"))
    val dot = graft.functions.GraftFunctions.dotNative _
    val assigned = pts.crossJoin(broadcast(cents))
      .withColumn("dist", dot(col("xd"), col("md")))
      .select(col("id"), struct(col("dist"), col("cid"), col("xi")).as("sc"))
      .groupBy("id").agg(min("sc").as("m"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "centroids broadcast")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"argmin partial-aggregates map-side:\n$plan")
  }

  test("cms_freq: CMS estimate >= true count for EVERY vocabulary token") {
    // The oracle row pins the top-20 cells exactly; this pins the
    // sketch's defining one-sided-error property over the whole vocab.
    val docs = graft.Tables.documents(spark, sfDir)
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val mults = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val h = wc.withColumn("hb", expr(
      "aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, CAST(j + 1 AS INT), 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003"))
    val b = h.select(col("w"), col("cnt"),
      posexplode(array(mults.map(m => (col("hb") * m) % 1048573 % 1024): _*))
        .as(Seq("j", "b")))
    val cells = b.groupBy("j", "b").agg(sum("cnt").as("c"))
    val est = b.join(cells, Seq("j", "b"))
      .groupBy("w").agg(first("cnt").as("cnt"), min("c").as("est"))
    val under = est.filter(col("est") < col("cnt")).count()
    assert(under == 0, "count-min never underestimates")
  }

  test("embed_dim_profile: variances nonnegative, descending, over all vectors") {
    val rows = MlOps.embedDimProfile.run(spark, sfDir).collect()
    assert(rows.length == 10)
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) == nVecs, "every vector contributes to every dim")
      assert(r.getDouble(2) >= 0)
    }
    val vs = rows.map(_.getDouble(2)).toSeq
    assert(vs == vs.sortBy(-_), "top-10 is variance-descending")
    // naive check of the winner against a driver-side recompute
    val dims = graft.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1048576.0)))
    val top = rows.head
    val xs = dims.map(_(top.getLong(0).toInt))
    val mean = xs.sum / xs.length
    val naive = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1) /
      1048576.0 / 1048576.0
    assert(math.abs(top.getDouble(2) - naive) < 1e-6,
      s"top variance ${top.getDouble(2)} vs naive $naive")
  }

  test("best_split: threshold matches an exhaustive driver-side search") {
    val row = MlOps.bestSplit.run(spark, sfDir).collect().head
    val evs = graft.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "purchase", r.getDouble(1)))
    val vs = evs.map(_._2).distinct.sorted
    val n1 = evs.count(_._1).toLong
    val n2 = evs.size - n1
    val best = vs.flatMap { t =>
      val al = evs.count(e => e._1 && e._2 <= t).toLong
      val bl = evs.count(e => !e._1 && e._2 <= t).toLong
      val (ar, br) = (n1 - al, n2 - bl)
      val (nl, nr) = (al + bl, ar + br)
      if (nl == 0 || nr == 0) None
      else Some((t, ((nl * nl - al * al - bl * bl).toDouble * nr
        + (nr * nr - ar * ar - br * br).toDouble * nl) / (nl.toDouble * nr)))
    }.minBy { case (t, g) => (g, t) }
    assert(math.abs(row.getDouble(0) - best._1) < 1e-12,
      s"split ${row.getDouble(0)} vs naive ${best._1}")
    assert(math.abs(row.getDouble(3) - best._2) < 1e-6)
  }

  test("tree_depth2: all three nodes match an exhaustive greedy search") {
    val rows = MlOps.treeDepth2.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set("root", "left", "right"))
    val evs = graft.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.expr("CAST(hour(ts) AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0) == "purchase", r.getDouble(1), r.getLong(2)))
    def bestOn[T: Ordering](data: Seq[(Boolean, T)]): (T, Double) = {
      val n1 = data.count(_._1).toLong
      val n2 = data.size - n1
      val ord = implicitly[Ordering[T]]
      data.map(_._2).distinct.sorted.flatMap { t =>
        val al = data.count(e => e._1 && ord.lteq(e._2, t)).toLong
        val bl = data.count(e => !e._1 && ord.lteq(e._2, t)).toLong
        val (ar, br) = (n1 - al, n2 - bl)
        val (nl, nr) = (al + bl, ar + br)
        if (nl == 0 || nr == 0) None
        else Some((t, ((nl * nl - al * al - bl * bl).toDouble * nr
          + (nr * nr - ar * ar - br * br).toDouble * nl)
          / (nl.toDouble * nr)))
      }.minBy { case (t, g) => (g, t) }
    }
    val (rootV, rootG) = bestOn(evs.map(e => (e._1, e._2)).toSeq)
    assert(math.abs(rows("root")._2 - rootV) < 1e-12)
    assert(math.abs(rows("root")._5 - rootG) < 1e-6)
    Seq(("left", (e: (Boolean, Double, Long)) => e._2 <= rootV),
        ("right", (e: (Boolean, Double, Long)) => e._2 > rootV))
      .foreach { case (leaf, pred) =>
        val (h, g) = bestOn(evs.filter(pred).map(e => (e._1, e._3)).toSeq)
        assert(rows(leaf)._1 == "hour")
        assert(rows(leaf)._2 == h.toDouble, s"$leaf split ${rows(leaf)._2} vs $h")
        assert(math.abs(rows(leaf)._5 - g) < 1e-6, s"$leaf gini")
      }
  }

  test("ransac_fit: consensus and refit replay a full driver-side RANSAC") {
    val row = MlOps.ransacFit.run(spark, sfDir).collect().head
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) + 0.5).toLong,
        math.floor(r.getDouble(4) * 100 + 0.5).toLong))
    val sample1 = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") <= 24 && col("l_linenumber") === 1)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) + 0.5).toLong,
        math.floor(r.getDouble(4) * 100 + 0.5).toLong)).distinct
    val cands = for {
      a <- sample1; b <- sample1
      if a._1 < b._1 || (a._1 == b._1 && (a._2 < b._2 ||
        (a._2 == b._2 && a._3 < b._3)))
      if a._4 != b._4
    } yield {
      val m = (b._5 - a._5).toDouble / (b._4 - a._4)
      (m, a._5.toDouble - m * a._4)
    }
    assert(row.getLong(0) == sample1.length.toLong)
    assert(row.getLong(1) == cands.length.toLong)
    val pts = li.map(t => (t._4, t._5))
    val scored = cands.map { case (m, c) =>
      (pts.count(p => math.abs(p._2 - (m * p._1 + c)) <= 1500000).toLong,
        m, c)
    }
    val best = scored.maxBy(t => (t._1, -t._2, -t._3))
    assert(row.getLong(2) == best._1, s"inliers ${row.getLong(2)} vs $best")
    val inl = pts.filter(p => math.abs(p._2 - (best._2 * p._1 + best._3))
      <= 1500000)
    val n = inl.length.toLong
    val (sx, sy) = (inl.map(_._1).sum, inl.map(_._2).sum)
    val sxy = inl.map(p => p._1 * p._2).sum
    val sxx = inl.map(p => p._1 * p._1).sum
    val m2 = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(math.abs(row.getDouble(3) - r4(m2)) < 1e-9)
    assert(math.abs(row.getDouble(4) - r4((sy - m2 * sx) / n / 100)) < 1e-9)
  }

  test("davies_bouldin: index replays a naive scatter/separation grid") {
    val rows = MlOps.daviesBouldin.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 8)
    val (a3, _, cleanup) = MlOps.lloyd(spark, sfDir)
    val pts = a3.select("id", "cid", "xi").collect()
      .map(r => (r.getInt(1), r.getSeq[Long](2).toArray))
    cleanup()
    val byC = pts.groupBy(_._1)
    val dims = pts.head._2.length
    val stats = byC.map { case (cid, l) =>
      val n = l.length
      val sums = Array.tabulate(dims)(d => l.map(_._2(d)).sum)
      val sxx = l.map(_._2.map(x => x * x).sum).sum
      val num = sxx.toDouble -
        sums.map(s0 => s0.toDouble * s0 / n).sum
      val md = sums.map(_.toDouble / n / 1048576.0)
      cid -> (n.toLong, math.sqrt(num / n) / 1048576.0, md)
    }
    val dbTerms = stats.map { case (ci, (_, si, mi)) =>
      ci -> stats.collect { case (cj, (_, sj, mj)) if cj != ci =>
        val dij = math.sqrt(mi.zip(mj).map(t => (t._1 - t._2) * (t._1 - t._2)).sum)
        (si + sj) / dij
      }.max
    }
    val dbi = dbTerms.values.sum / dbTerms.size
    rows.foreach { case (cid, n, sc, rmax, db) =>
      val (en, es, _) = stats(cid)
      assert(n == en)
      assert(math.abs(sc - es) < 1e-5, s"cluster $cid scatter $sc vs $es")
      assert(math.abs(rmax - dbTerms(cid)) < 1e-4)
      assert(math.abs(db - dbi) < 1e-4)
    }
  }

  test("graph_assortativity: r in [-1, 1] and matches a naive recompute") {
    val row = GraphOps.assortativity.run(spark, sfDir).collect().head
    val r = row.getDouble(1)
    assert(r >= -1.0 && r <= 1.0)
    val e0 = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(x => (x.getLong(0) * 2, x.getLong(1) * 2 + 1))
    val ed = e0 ++ e0.map(e => (e._2, e._1))
    val deg = ed.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pairs = ed.map { case (u, v) => (deg(u), deg(v)) }
    val m = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val syy = pairs.map(p => p._2 * p._2).sum.toDouble
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val naive = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(r - naive) < 1e-5, s"r $r vs naive $naive")
    assert(row.getLong(0) == pairs.length)
  }

  test("rp_reduce: JL norm concentration on the fixture") {
    val rows = MlOps.rpReduce.run(spark, sfDir)
      .select("jl_ratio").collect().map(_.getDouble(0))
    val mean = rows.sum / rows.length
    assert(mean > 0.8 && mean < 1.2,
      s"E[|y|^2 / (16 |x|^2)] should concentrate near 1, got $mean")
    assert(rows.forall(r => r > 0 && r < 8), "no degenerate projections")
  }

  test("ams_f2: exact F2 matches naive; sketch lands within 50%") {
    val row = MlOps.amsF2.run(spark, sfDir).collect().head
    val counts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map(_._2.length.toLong)
    val exact = counts.map(c => c * c).sum
    assert(row.getLong(0) == exact, s"F2 ${row.getLong(0)} vs naive $exact")
    // 16 counters give a crude estimate; the gate is order-of-magnitude
    // sanity (the oracle pins the exact value bit-for-bit)
    assert(math.abs(row.getDouble(2)) < 0.5,
      s"AMS rel_err ${row.getDouble(2)} out of +-50%")
  }

  test("pca_power: iterate once more and the direction is stable") {
    // Power iteration has converged enough when the reported top-10
    // loading dims align with the dominant |loading| dims of the raw
    // second-moment matrix action applied to the result vector.
    val rows = MlOps.pcaPower.run(spark, sfDir).collect()
    assert(rows.length == 10)
    val loadings = rows.map(r => (r.getLong(0), r.getDouble(1)))
    assert(loadings.exists(l => math.abs(l._2) == 1.0),
      "infinity-norm scaling pins the max |loading| at exactly 1")
    val sorted = loadings.map(l => math.abs(l._2))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      "|loading| is non-increasing down the top-10")
    // one more full C*v application (driver-side, exact integers)
    // must not reorder the top dims: sign-consistent dominance
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        math.floor(f.toDouble * 1048576).toLong))
    val v = Array.fill(64)(0L)
    loadings.foreach { case (d, l) => v(d.toInt) = math.round(l * 1e6) }
    // dims outside the top-10 keep their (unreported) values; rebuild
    // them by replaying the 3 iterations exactly
    def iterate(v0: Array[Long]): Array[Long] = {
      val w = Array.fill(64)(BigInt(0))
      vecs.foreach { x =>
        var s = 0L
        var j = 0
        while (j < 64) { s += x(j) * v0(j); j += 1 }
        j = 0
        while (j < 64) { w(j) += BigInt(x(j)) * s; j += 1 }
      }
      val m = w.map(_.abs).max
      w.map(b => math.floor(b.toDouble / m.toDouble * 1e6 + 0.5).toLong)
    }
    val full = iterate(iterate(iterate(Array.fill(64)(1000000L))))
    val topNaive = full.zipWithIndex.sortBy { case (l, i) =>
      (-math.abs(l), i)
    }.take(10).map { case (l, i) => (i.toLong, l) }
    assert(topNaive.map(_._1).toSeq == loadings.map(_._1).toSeq,
      s"naive replay top dims ${topNaive.map(_._1).mkString(",")} vs " +
        s"query ${loadings.map(_._1).mkString(",")}")
    topNaive.zip(loadings).foreach { case ((_, ln), (_, lq)) =>
      assert(math.abs(ln / 1e6 - lq) < 2e-6, s"loading drift: $ln vs $lq")
    }
  }

  test("kmv_distinct: estimate lands near exact and the sketch is saturated") {
    val r = MlOps.kmvDistinct.run(spark, sfDir).collect()(0)
    val (kUsed, kth, est) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (exH, exT) = (r.getLong(3), r.getLong(4))
    assert(kUsed == math.min(256L, exH), "bottom-k holds min(k, D) values")
    assert(kth > 0 && kth < 1000003)
    assert(exH <= exT, "hashing can only merge tokens")
    // k=256 gives sigma ~ 1/sqrt(254) ~ 6.3%; 25% is a 4-sigma gate
    assert(math.abs(est - exH).toDouble / exH < 0.25,
      s"KMV estimate $est vs exact $exH")
    // the estimate is what the formula says it is
    if (kUsed == 256) {
      val expected = math.floor(255.0 * 1000003 / kth + 0.5).toLong
      assert(est == expected)
    } else assert(est == kUsed)
  }

  test("knn_classify: confusion matrix replays a naive driver-side kNN") {
    import org.apache.spark.sql.functions._
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val qs = vecs.filter(t => t._1 >= 100 && t._1 < 140)
    val train = vecs.filter(t => t._1 < 100 || t._1 >= 140)
    val expected = qs.map { case (_, trueL, qv) =>
      val top5 = train.map { case (id, l, cv) => (r6(cos(qv, cv)), id, l) }
        .sortBy(t => (-t._1, t._2)).take(5)
      val pred = top5.groupBy(_._3).map { case (l, xs) => (l, xs.length) }
        .toSeq.sortBy(t => (-t._2, t._1)).head._1
      (trueL, pred)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = MlOps.knnClassify.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.values.sum == 40L, "every query classified exactly once")
    assert(got == expected, s"confusion mismatch:\n$got\nvs\n$expected")
  }

  test("rocchio_classify: confusion replays a naive centroid classifier") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label",
        "transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT)) AS xi")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val tr = vecs.filter(t => t._1 < 100 || t._1 >= 140)
    val te = vecs.filter(t => t._1 >= 100 && t._1 < 140)
    val cents = tr.groupBy(_._2).map { case (l, xs) =>
      val sums = new Array[Long](64)
      xs.foreach(t => (0 until 64).foreach(i => sums(i) += t._3(i)))
      l -> sums.map(_.toDouble / xs.length / 1048576.0)
    }
    val expected = te.map { case (_, trueL, xi) =>
      val xd = xi.map(_.toDouble / 1048576.0)
      val dxx = xd.map(x => x * x).sum
      val pred = cents.toSeq.map { case (l, md) =>
        val dot = xd.zip(md).map { case (a, b) => a * b }.sum
        val dmm = md.map(x => x * x).sum
        (dxx - 2 * dot + dmm, l)
      }.minBy(identity)._2
      (trueL, pred)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = MlOps.rocchioClassify.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.values.sum == 40L)
    assert(got == expected, s"confusion:\n$got\nvs\n$expected")
  }

  test("f1_report: per-class metrics reconcile with rocchio's confusion") {
    val conf = MlOps.rocchioClassify.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rows = MlOps.f1Report.run(spark, sfDir).collect()
    val classes = rows.filter(_.getInt(0) >= 0)
    val macroR = rows.find(_.getInt(0) == -1).get
    classes.foreach { r =>
      val c = r.getInt(0)
      val tp = conf.getOrElse((c, c), 0L)
      val fn = conf.collect { case ((t, p), n) if t == c && p != c => n }.sum
      val fp = conf.collect { case ((t, p), n) if p == c && t != c => n }.sum
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn,
        s"counts for class $c: $r")
      if (tp + fp > 0)
        assert(math.abs(r.getDouble(4) - tp.toDouble / (tp + fp)) < 2e-6)
    }
    // macro row averages the per-class metrics
    val k = classes.length
    assert(math.abs(macroR.getDouble(6) -
      classes.map(_.getDouble(6)).sum / k) < 5e-6, "macro F1")
    // micro accuracy sanity: total tp = correctly classified
    assert(macroR.getLong(1) == conf.collect {
      case ((t, p), n) if t == p => n }.sum)
  }
}
