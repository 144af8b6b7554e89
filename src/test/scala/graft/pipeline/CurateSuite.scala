package graft.pipeline

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Behavioral gate for the curation pipeline: each stage drops exactly
  * the document planted to trigger it. */
class CurateSuite extends SparkSpec {

  private lazy val planted = {
    import spark.implicits._
    val good = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").limit(10)
      .as[(Long, String, Long)].collect()
    val goodText = good.head._2
    val extra = Seq(
      // 9001: too short (< 100 chars)
      (9001L, "tiny doc", 8L),
      // 9002: pathological repetition (one word repeated)
      (9002L, Seq.fill(60)("spam").mkString(" "), 299L),
      // 9003: exact duplicate of doc 0 (higher id → dropped)
      (9003L, goodText, good.head._3),
      // 9004: near-duplicate of doc 1 (~5% token perturbation)
      (9004L, good(1)._2.split(" ").zipWithIndex
        .map { case (t, i) => if (i % 20 == 19) "zzqx" else t }
        .mkString(" "), good(1)._3))
    spark.createDataFrame(good.toSeq ++ extra)
      .toDF("doc_id", "text", "n_chars")
  }

  test("curate drops short, repetitive, exact-dup and near-dup docs") {
    val kept = Curate.curate(planted,
      Curate.Params(minhash = graft.dedup.MinHashLSH.Params(threshold = 0.5)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(9001L), "short doc dropped by length band")
    assert(!kept.contains(9002L), "repetitive doc dropped by repetition")
    assert(!kept.contains(9003L), "exact duplicate dropped (keep-first)")
    assert(!kept.contains(9004L), "near duplicate dropped (keep-first)")
    assert(kept.contains(0L), "lowest-id original survives its duplicates")
    // fixture docs 0-9 contain planted near-dup pairs among themselves
    // (keep-first keeps only the lower id of each), so no assertion that
    // every original survives — only that every planted-bad doc is gone
  }

  test("dsir_weights: English docs rank above non-English under the en target") {
    val rows = graft.queries.CurationOps.dsirWeights.run(spark, sfDir).collect()
    assert(rows.length == 15)
    // weights are ranked descending (after the 1e-6 floor rounding)
    val ws = rows.map(_.getDouble(2)).toSeq
    assert(ws == ws.sortBy(-(_: Double)), "weights descending")
    // the target slice should dominate its own importance ranking:
    // a majority of the top-15 under the 'en' target model are 'en'
    val enShareTop = rows.count(_.getString(1) == "en").toDouble / rows.length
    val enShareAll = {
      val d = Tables.documents(spark, sfDir)
      d.filter(col("lang") === "en").count().toDouble / d.count()
    }
    assert(enShareTop > enShareAll,
      s"top-15 en share $enShareTop should beat corpus share $enShareAll")
  }

  test("semdedup: cluster sizes cover the corpus; drops match a naive recompute") {
    val rows = graft.queries.MlOps.semDedup.run(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "clusters partition the corpus")
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1)))
    // at least one near-dup pair exists in the fixture (the planted
    // perturbed copies cosine_dedup_stats counts), and semdedup must
    // not drop MORE than the unclustered exact count (clustering can
    // only split pairs apart, never invent similarity)
    val exactDropped = graft.queries.DedupAnn.cosineDedupStats
      .run(spark, sfDir).collect().head
    val exactDrops = exactDropped.getLong(0) - exactDropped.getLong(2)
    assert(rows.map(_.getLong(2)).sum <= exactDrops,
      "cluster-bounded drops cannot exceed the all-pairs drops")
    // the sf0.001 embedding slice may carry no >= 0.95 pair at all;
    // only when the exact all-pairs scan finds drops must the
    // cluster-bounded scan find them too (near-identical vectors land
    // in the same cluster, so SemDeDup recovers the exact pairs)
    if (exactDrops > 0)
      assert(rows.map(_.getLong(2)).sum > 0, "fixture near-dups detected")
  }

  test("containment_pairs: asymmetry and the planted-dup signal") {
    val rows = graft.queries.TextOps.containmentPairs.run(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "shared <= src grams")
      val c = r.getDouble(4)
      assert(c >= 0 && c <= 1)
    }
    // ranking is containment-descending
    val cs = rows.map(_.getDouble(4)).toSeq
    assert(cs == cs.sortBy(-(_: Double)))
    // sf0.001's doc<50 slice carries planted near-dups: the top pair
    // must show near-total containment
    assert(cs.head > 0.9, s"top containment ${cs.head}")
  }

  test("score_calibration: bins cover all scored docs with valid rates") {
    val rows = graft.queries.CurationOps.scoreCalibration.run(spark, sfDir)
      .collect()
    val scored = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) > 0).count()
    assert(rows.map(_.getLong(1)).sum == scored)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
    }
  }

  test("report accounts raw vs kept vs tokens consistently") {
    import spark.implicits._
    val r = Curate.report(planted,
      Curate.Params(minhash = graft.dedup.MinHashLSH.Params(threshold = 0.5)))
      .as[(Long, Long, Long)].collect().head
    val (nRaw, nKept, totalTokens) = r
    assert(nRaw === planted.count())
    assert(nKept < nRaw)
    val kept = Curate.curate(planted,
      Curate.Params(minhash = graft.dedup.MinHashLSH.Params(threshold = 0.5)))
    assert(totalTokens === kept.agg(sum("n_tokens")).collect().head.getLong(0))
  }

  test("temperature_mix: shares normalize and tails are up-weighted") {
    val rows = graft.queries.CurationOps.temperatureMix
      .run(spark, sfDir).collect()
    assert(rows.length == 20)
    val raw = rows.map(_.getDouble(3)); val t2 = rows.map(_.getDouble(4))
    assert(math.abs(raw.sum - 1.0) < 1e-4, s"raw shares sum ${raw.sum}")
    assert(math.abs(t2.sum - 1.0) < 1e-4, s"t2 shares sum ${t2.sum}")
    // temperature flattening: the largest source loses share, the
    // smallest gains (strict when shares differ)
    val byRaw = rows.sortBy(_.getDouble(3))
    if (byRaw.head.getDouble(3) < byRaw.last.getDouble(3)) {
      assert(byRaw.head.getDouble(4) >= byRaw.head.getDouble(3),
        "smallest source must be up-weighted")
      assert(byRaw.last.getDouble(4) <= byRaw.last.getDouble(3),
        "largest source must be down-weighted")
    }
    rows.foreach(r => assert(r.getDouble(5) > 0, s"epochs positive: $r"))
  }

  test("fairness_parity: ratios anchored to the max group; flags at 0.8") {
    val rows = graft.queries.CurationOps.fairnessParity
      .run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getDouble(4))
    assert(ratios.max <= 1.0 + 1e-9, "reference group has ratio 1")
    assert(math.abs(ratios.max - 1.0) < 2e-6)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val flagged = r.getInt(5) == 1
      // the flag is consistent with the reported ratio up to rounding
      if (r.getDouble(4) < 0.8 - 1e-6) assert(flagged, s"missed flag: $r")
      if (r.getDouble(4) > 0.8 + 1e-6) assert(!flagged, s"false flag: $r")
    }
  }
}
