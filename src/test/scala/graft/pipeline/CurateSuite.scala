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
}
