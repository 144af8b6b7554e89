package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties + plan pins for the model-evaluation batch (EvalOps):
  * exact rank-sum AUC, the PR threshold sweep, and retrieval nDCG@10. */
class EvalOpsSuite extends SparkSpec {

  test("auc_roc: AUC in [0,1], gini = 2*auc - 1, counts cover the corpus") {
    val r = EvalOps.aucRoc.run(spark, sfDir).collect()
    assert(r.length == 1)
    val (nPos, nNeg) = (r(0).getLong(0), r(0).getLong(1))
    val (auc, gini) = (r(0).getDouble(2), r(0).getDouble(3))
    val nDocs = graft.Tables.documents(spark, sfDir)
      .filter(length(trim(col("text"))) > 0).count()
    assert(nPos > 0 && nNeg > 0 && nPos + nNeg == nDocs,
      s"every non-empty doc is scored: $nPos + $nNeg vs $nDocs")
    assert(auc >= 0.0 && auc <= 1.0)
    // both derive from the same exact integer; only rounding separates them
    assert(math.abs(gini - (2 * auc - 1)) < 3e-6, s"gini $gini vs auc $auc")
  }

  test("auc_roc equals the O(n^2) pair-counting definition") {
    // AUC = (#concordant + 0.5 * #ties) / (n_pos * n_neg) over ALL
    // pos x neg pairs — brute-forced driver-side at sf0.001 (500 docs).
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val scored = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), size(ts).as("n"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024).as("raw"))
      .filter(col("n") > 0)
      .select((col("raw") / col("n")).as("v"),
        (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- pos; q <- neg)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val expected = num / (pos.length.toDouble * neg.length)
    val auc = EvalOps.aucRoc.run(spark, sfDir).collect()(0).getDouble(2)
    assert(math.abs(auc - expected) < 2e-6, s"$auc vs naive $expected")
  }

  test("pr_curve: 11 thresholds, monotone counts, consistent totals") {
    val rows = EvalOps.prCurve.run(spark, sfDir).collect()
    assert(rows.length == 11)
    assert(rows.map(_.getInt(0)).toSeq == (-5 to 5))
    val nPos = rows.map(r => r.getLong(1) + r.getLong(3)).distinct
    assert(nPos.length == 1, s"tp + fn is the constant positive count: $nPos")
    // raising the threshold can only shrink the predicted-positive set
    val predicted = rows.map(r => r.getLong(1) + r.getLong(2)).toSeq
    assert(predicted == predicted.sorted.reverse, s"monotone: $predicted")
    val tps = rows.map(_.getLong(1)).toSeq
    assert(tps == tps.sorted.reverse)
    rows.foreach { r =>
      val recall = r.getDouble(5)
      assert(recall >= 0 && recall <= 1)
    }
  }

  test("ndcg_retrieval: 20 queries, ndcg in [0,1], dcg <= idcg") {
    val rows = EvalOps.ndcgRetrieval.run(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nRel, dcg, idcg, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nRel >= 0 && nRel <= 10)
      assert(dcg >= 0 && idcg > 0)
      assert(dcg <= idcg + 2e-6, s"ideal ranking bounds the real one: $r")
      assert(ndcg >= 0 && ndcg <= 1 + 2e-6)
      // top rank discount is 1: a query with k relevant hits in top-10
      // has dcg at least its worst possible placement value
      if (nRel == 0) assert(dcg == 0.0)
    }
  }

  test("ndcg plan: query side broadcasts, corpus scanned once") {
    val df = EvalOps.ndcgRetrieval.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "bounded query set broadcasts")
  }

  test("conformal_interval: coverage honors the marginal guarantee") {
    val r = EvalOps.conformalInterval.run(spark, sfDir).collect()(0)
    val (nCal, nTest, nCov) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (qhat, cov) = (r.getDouble(3), r.getDouble(4))
    assert(nCal > 0 && nTest > 0 && qhat > 0)
    assert(nCov <= nTest)
    assert(math.abs(cov - nCov.toDouble / nTest) < 1e-4)
    // split-conformal guarantee: E[coverage] >= 0.9; on a finite test
    // split allow binomial noise (4 sigma below 0.9 fails loudly)
    val sigma = math.sqrt(0.9 * 0.1 / nTest)
    assert(cov >= 0.9 - 4 * sigma, s"coverage $cov way below nominal 0.9")
  }

  test("mi_features: MI is non-negative and bounded by label entropy") {
    val rows = EvalOps.miFeatures.run(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("n_chars_decile", "n_tokens_decile", "source"))
    rows.foreach { r =>
      val (mi, nmi) = (r.getDouble(1), r.getDouble(2))
      assert(mi >= -1e-9, s"MI negative: $r")
      assert(nmi >= -1e-9 && nmi <= 1 + 1e-9, s"NMI outside [0,1]: $r")
    }
  }

  test("isotonic_calibration: monotone fit equals direct PAV pooling") {
    val rows = EvalOps.isotonicCalibration.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // monotone non-decreasing by construction
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4 + 1e-9, s"not monotone: $a $b")
      case _           => ()
    }
    // classic PAV: pool adjacent violators until monotone, weighted
    var blocks = rows.map(r => (r._2.toDouble, r._3.toDouble)).toBuffer
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < blocks.length - 1) {
        val (w1, p1) = blocks(i); val (w2, p2) = blocks(i + 1)
        if (p1 / w1 > p2 / w2 + 1e-12) {
          blocks(i) = (w1 + w2, p1 + p2)
          blocks.remove(i + 1)
          changed = true
        } else i += 1
      }
    }
    // expand pooled blocks back to per-bin fitted rates
    val fitted = blocks.flatMap { case (w, p) =>
      Seq.fill(math.round(w).toInt)(p / w)
    }
    // fitted has one entry per ORDER counted across bins; rebuild per-bin
    val perBin = {
      var off = 0
      rows.map { r =>
        val v = fitted(off); off += r._2.toInt; v
      }
    }
    rows.zip(perBin).foreach { case ((bin, _, _, iso), pav) =>
      assert(math.abs(iso - pav) < 1e-5, s"bin $bin: $iso vs PAV $pav")
    }
  }

  test("cohen_kappa: agreement algebra replays the 2x2 confusion") {
    val row = EvalOps.cohenKappa.run(spark, sfDir).collect().head
    val (n, agree, po, pe, kappa) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), size(ts).as("nt"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("nt") > 0).collect()
      .map(r => (r.getDouble(2) / r.getInt(1) > 0, r.getString(0) == "en"))
    val a11 = docs.count(t => t._1 && t._2).toLong
    val a10 = docs.count(t => t._1 && !t._2).toLong
    val a01 = docs.count(t => !t._1 && t._2).toLong
    val a00 = docs.count(t => !t._1 && !t._2).toLong
    assert(n == docs.length.toLong && agree == a11 + a00)
    val prodSum = (a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    assert(po == r6(agree.toDouble / n))
    assert(pe == r6(prodSum.toDouble / (n * n)))
    assert(kappa ==
      r6((n * agree - prodSum).toDouble / (n * n - prodSum).toDouble))
    // kappa consistency with (po - pe) / (1 - pe) up to display rounding
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-3)
  }

  test("mcnemar_test: discordant counts tie to kappa's confusion") {
    val mc = EvalOps.mcnemarTest.run(spark, sfDir).collect().head
    val (n, b, c, nd, chi2, sig) = (mc.getLong(0), mc.getLong(1),
      mc.getLong(2), mc.getLong(3), mc.getDouble(4), mc.getBoolean(5))
    assert(nd == b + c && nd <= n)
    val exp = math.floor((math.abs(b - c) - 1).toDouble
      * (math.abs(b - c) - 1) / (b + c) * 1000000 + 0.5) / 1000000
    assert(math.abs(chi2 - exp) < 1e-9)
    assert(sig == ((math.abs(b - c) - 1).toDouble
      * (math.abs(b - c) - 1) / (b + c) > 3.841459))
    // the discordant cells must match cohen_kappa's confusion exactly
    val kp = EvalOps.cohenKappa.run(spark, sfDir).collect().head
    val agree = kp.getLong(1)
    assert(n == kp.getLong(0) && n - agree == b + c)
  }

  test("ece_calibration: exact-integer gaps replay; mce bounds ece") {
    val row = EvalOps.eceCalibration.run(spark, sfDir).collect().head
    val (n, ece, mce) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(ece >= 0 && mce >= ece - 1e-9 && mce <= 1 + 1e-9)
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val bins = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), size(ts).as("nt"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("nt") > 0).collect()
      .map { r =>
        val v = r.getDouble(2) / r.getInt(1)
        val bin = math.min(math.max(math.floor((v + 0.5) * 10).toLong, 0L), 9L)
        (bin, if (r.getString(0) == "en") 1L else 0L)
      }.groupBy(_._1).map { case (b, l) =>
        (b, l.size.toLong, l.map(_._2).sum)
      }
    val nn = bins.map(_._2).sum
    val num = bins.map { case (b, w, p) => math.abs(20 * p - (2 * b + 1) * w) }.sum
    val expEce = math.floor(num.toDouble / (20 * nn) * 1000000 + 0.5) / 1000000
    val expMce = math.floor(bins.map { case (b, w, p) =>
      math.abs(20 * p - (2 * b + 1) * w).toDouble / (20 * w)
    }.max * 1000000 + 0.5) / 1000000
    assert(n == nn && ece == expEce && mce == expMce,
      s"($n,$ece,$mce) vs ($nn,$expEce,$expMce)")
  }

  private def binTable(): Iterable[(Long, Long, Long)] = {
    val ts = filter(split(col("text"), " "), x => x =!= "")
    graft.Tables.documents(spark, sfDir)
      .select(col("lang"), size(ts).as("nt"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("nt") > 0).collect()
      .map { r =>
        val v = r.getDouble(2) / r.getInt(1)
        val bin = math.min(math.max(math.floor((v + 0.5) * 10).toLong, 0L), 9L)
        (bin, if (r.getString(0) == "en") 1L else 0L)
      }.groupBy(_._1).map { case (b, l) =>
        (b, l.size.toLong, l.map(_._2).sum)
      }
  }

  test("brier_decomposition: replays Murphy terms; identity holds") {
    val row = EvalOps.brierDecomposition.run(spark, sfDir).collect().head
    val bins = binTable().toSeq.sortBy(_._1)
    val n = bins.map(_._2).sum.toDouble
    val pp = bins.map(_._3).sum.toDouble
    val rel = bins.map { case (b, w, p) =>
      val d = (2 * b + 1) * w - 20 * p
      d.toDouble * d / (400.0 * w)
    }.sum / n
    val res = bins.map { case (b, w, p) =>
      val d = p * n - pp * w
      d * d / (w * n * n)
    }.sum / n
    val unc = pp * (n - pp) / (n * n)
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rel) < 1e-5, s"rel ${row.getDouble(1)} vs $rel")
    assert(math.abs(row.getDouble(2) - res) < 1e-5, s"res ${row.getDouble(2)} vs $res")
    assert(math.abs(row.getDouble(3) - unc) < 1e-5)
    assert(math.abs(row.getDouble(4) - (rel - res + unc)) < 1e-5)
    assert(row.getDouble(1) >= 0 && row.getDouble(2) >= 0)
    assert(row.getDouble(3) <= 0.25 + 1e-9)
  }

  test("youden_mcc: replays the argmax over the nine-threshold sweep") {
    val row = EvalOps.youdenMcc.run(spark, sfDir).collect().head
    val bins = binTable()
    val nn = bins.map(_._2).sum
    val pp = bins.map(_._3).sum
    val sweep = (1L to 9L).map { th =>
      val tp = bins.filter(_._1 >= th).map(_._3).sum
      val fp = bins.filter(_._1 >= th).map(t => t._2 - t._3).sum
      val j = tp.toDouble / pp - fp.toDouble / (nn - pp)
      (th, tp, fp, j)
    }
    val best = sweep.sortBy(t => (-t._4, t._1)).head
    assert(row.getDouble(0) == best._1 / 10.0)
    assert(row.getLong(1) == best._2 && row.getLong(2) == best._3)
    val (tp, fp) = (best._2.toDouble, best._3.toDouble)
    val (fn, tn) = (pp - tp, nn - pp - fp)
    val mcc = (tp * tn - fp * fn) /
      math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert(math.abs(row.getDouble(6) - mcc) < 1e-5)
    assert(math.abs(row.getDouble(5) - best._4) < 1e-5)
  }
}
