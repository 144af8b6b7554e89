package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Model-evaluation metrics over the corpus — the audit layer that sits
  * between the quality classifier (`quality_classify`) / retrieval
  * stack (`cosine_topk`, `bm25_topdocs`) and a production filter
  * decision: exact ROC AUC, a precision/recall threshold sweep, and
  * graded-relevance nDCG@10 for the embedding retriever.
  *
  * Cross-engine determinism: the classifier score is the per-token
  * normalized `HashedLinearScore` margin whose bit-identical DuckDB
  * replica is established by `score_calibration`; AUC is computed from
  * EXACT integer rank sums (mann_whitney's doubled-midrank device over
  * the distributed PrefixScan — ties handled exactly, no partition-less
  * window); the PR sweep is pure integer conditional counts with one
  * final division per cell; nDCG folds its ≤10 discount terms in rank
  * order on both engines and uses `ln` (corpus-wide parity established
  * by lm_perplexity) instead of `log2`, whose libm rounding may differ.
  *
  * Scale: AUC = one score scan + a value-grouped PrefixScan (range
  * shuffle over distinct scores); the sweep = one scan with a ×11
  * literal fan-out into an 11-group partial aggregate; nDCG = the
  * brute-force retrieval shape (bounded query set broadcast, corpus
  * scanned once, per-query top-k window) plus ≤20-row finals.
  */
object EvalOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** Shared DuckDB replica of the per-token-normalized classifier score
    * (identical to score_calibration's established fragment). */
  private val scoreCte: String =
    """WITH t AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
      |  FROM documents),
      |s AS (SELECT doc_id, lang, CAST(len(ts) AS INTEGER) AS n_tokens,
      |  list_sum(list_transform(ts, tok ->
      |    ((((list_sum(list_transform(
      |          range(0, CAST(least(length(tok), 8) AS BIGINT)),
      |          j -> ascii(substring(tok, CAST(j + 1 AS INTEGER), 1))
      |               * CAST(pow(31, j) AS BIGINT))) % 1024)
      |       * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS score
      |  FROM t WHERE len(ts) > 0)""".stripMargin

  /** Spark twin of scoreCte: (doc_id, lang, v) with v the normalized
    * margin — bit-identical to the oracle's `score / n_tokens`. */
  private def scoredDocs(s: SparkSession, d: String): DataFrame = {
    val ts = filter(split(col("text"), " "), x => x =!= "")
    docs(s, d)
      .select(col("doc_id"), col("lang"), size(ts).as("n_tokens"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("lang"),
        (col("raw") / col("n_tokens")).as("v"))
  }

  /** Exact ROC AUC of the quality score against the 'en' label, via the
    * rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with midranks
    * for ties — the doubled-midrank integer algebra from mann_whitney
    * over the distributed PrefixScan, so the whole statistic is exact
    * until two final divisions (floor-rounded 1e-6). The fixture scorer
    * is hash-random (AUC ≈ 0.5); the gate pins the rank arithmetic, not
    * model quality. Scales as one scan + a score-grouped range shuffle. */
  val aucRoc: Q = Q(
    "auc_roc",
    scoreCte +
      """,
        |norm AS (SELECT score / n_tokens AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
        |  FROM s),
        |c AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |      CAST(sum(b) AS BIGINT) AS cb FROM norm GROUP BY v),
        |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
        |      CAST(sum(cb) AS BIGINT) AS n2 FROM c),
        |sc AS (SELECT v, ca, cb,
        |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
        |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb FROM c),
        |r AS (SELECT
        |    CAST(sum(ca * (2 * (cum_ca + cum_cb - ca - cb) + (ca + cb + 1)))
        |      AS BIGINT) AS r1x2
        |  FROM sc)
        |SELECT n1 AS n_pos, n2 AS n_neg,
        |  floor(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / (2.0 * n1 * n2)
        |    * 1000000 + 0.5) / 1000000 AS auc,
        |  floor(CAST(r1x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * n2) * 1000000 + 0.5) / 1000000
        |    AS gini_coef
        |FROM r, n""".stripMargin) { (s, d) =>
    val e = scoredDocs(s, d).select(col("v"),
      when(col("lang") === "en", 1L).otherwise(0L).as("a"),
      when(col("lang") === "en", 0L).otherwise(1L).as("b"))
    val c = e.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      c, Seq(col("v")), Seq("ca", "cb"))
    val (n1, n2) = (totals(0), totals(1))
    val t = col("ca") + col("cb")
    val r = scanned.agg(
      sum(col("ca") * ((col("cum_ca") + col("cum_cb") - col("ca") - col("cb"))
        * 2 + (t + 1))).as("r1x2"))
    r.select(lit(n1).as("n_pos"), lit(n2).as("n_neg"),
      (floor((col("r1x2") - lit(n1 * (n1 + 1))).cast("double")
        / lit(2.0 * n1 * n2) * 1000000 + lit(0.5)) / 1000000).as("auc"),
      (floor((col("r1x2") - lit(n1 * (n1 + 1)) - lit(n1 * n2)).cast("double")
        / (lit(n1.toDouble) * lit(n2)) * 1000000 + lit(0.5)) / 1000000)
        .as("gini_coef"))
  }

  /** Precision/recall/F1 threshold sweep of the quality classifier —
    * the table read before picking a filter cutoff. Eleven fixed
    * thresholds k/100 (k ∈ −5..5, spanning the normalized margin's
    * mass) fan out map-side via a literal `sequence` explode (×11, no
    * join) into one 11-group partial aggregate; TP/FP/FN are exact
    * integers and each metric is one guarded final division. */
  val prCurve: Q = Q(
    "pr_curve",
    scoreCte +
      """,
        |norm AS (SELECT score / n_tokens AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM s),
        |th AS (SELECT unnest(range(-5, 6)) AS k),
        |pred AS (SELECT k, pos,
        |    CASE WHEN v >= k / 100.0 THEN 1 ELSE 0 END AS pr
        |  FROM norm CROSS JOIN th),
        |agg AS (SELECT k, CAST(sum(pos * pr) AS BIGINT) AS tp,
        |    CAST(sum((1 - pos) * pr) AS BIGINT) AS fp,
        |    CAST(sum(pos * (1 - pr)) AS BIGINT) AS fn FROM pred GROUP BY k)
        |SELECT CAST(k AS INTEGER) AS k, tp, fp, fn,
        |  CASE WHEN tp + fp > 0 THEN
        |    floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000 + 0.5) / 1000000
        |  END AS precision_at,
        |  floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000 + 0.5) / 1000000
        |    AS recall_at,
        |  floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1000000 + 0.5)
        |    / 1000000 AS f1
        |FROM agg ORDER BY k""".stripMargin) { (s, d) =>
    val e = scoredDocs(s, d).select(col("v"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val f = e
      .select(col("v"), col("pos"),
        explode(sequence(lit(-5), lit(5))).as("k"))
      .select(col("k"), col("pos"),
        when(col("v") >= col("k") / lit(100.0), 1L).otherwise(0L).as("pr"))
    val agg = f.groupBy("k").agg(
      sum(col("pos") * col("pr")).as("tp"),
      sum((lit(1L) - col("pos")) * col("pr")).as("fp"),
      sum(col("pos") * (lit(1L) - col("pr"))).as("fn"))
    agg.select(col("k").cast("int").as("k"),
      col("tp"), col("fp"), col("fn"),
      when(col("tp") + col("fp") > 0,
        floor(col("tp").cast("double") / (col("tp") + col("fp"))
          * 1000000 + lit(0.5)) / 1000000).as("precision_at"),
      (floor(col("tp").cast("double") / (col("tp") + col("fn"))
        * 1000000 + lit(0.5)) / 1000000).as("recall_at"),
      (floor((col("tp") * 2).cast("double")
        / (col("tp") * 2 + col("fp") + col("fn"))
        * 1000000 + lit(0.5)) / 1000000).as("f1"))
      .orderBy("k")
  }

  /** Graded-relevance nDCG@10 of brute-force cosine retrieval: for each
    * of the 20 bounded query vectors, retrieve top-10 by exact cosine
    * (rounded 6 dp, vec_id tie-break — cosine_topk's device) over the
    * broadcast-query / single-corpus-scan plan, grade a hit as
    * label-match, and normalize by the ideal DCG for that query's
    * relevant-population size (label count − 1, capped at 10). Both
    * engines fold the ≤10 discount terms in rank order and express the
    * discount through `ln` (libm parity established corpus-wide), never
    * `log2`. Scales exactly like cosine_topk + two ≤20-row finals. */
  val ndcgRetrieval: Q = Q(
    "ndcg_retrieval",
    """WITH q AS (SELECT vec_id AS qid, label AS qlabel,
      |    CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
      |      FROM embeddings),
      |scored AS (SELECT qid, qlabel, vec_id, label,
      |    round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv))
      |         * sqrt(list_dot_product(cv, cv))), 6) AS cos
      |  FROM q JOIN c ON qid <> vec_id),
      |top AS (SELECT qid, qlabel, rn,
      |    CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
      |  FROM (SELECT qid, qlabel, label,
      |      row_number() OVER (PARTITION BY qid
      |        ORDER BY cos DESC, vec_id) AS rn
      |    FROM scored) WHERE rn <= 10),
      |d AS (SELECT qid, any_value(qlabel) AS qlabel,
      |    CAST(sum(rel) AS BIGINT) AS n_rel10,
      |    list_aggregate(list(CAST(rel AS DOUBLE) * ln(2.0) / ln(rn + 1.0)
      |      ORDER BY rn), 'sum') AS dcg_raw
      |  FROM top GROUP BY qid),
      |lc AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt
      |       FROM embeddings GROUP BY label),
      |f AS (SELECT qid, n_rel10, dcg_raw,
      |    list_aggregate(list_transform(
      |      range(1, greatest(least(10, cnt - 1), 1) + 1),
      |      i -> ln(2.0) / ln(CAST(i AS DOUBLE) + 1.0)), 'sum') AS idcg_raw
      |  FROM d JOIN lc ON lc.label = d.qlabel)
      |SELECT qid, n_rel10,
      |  floor(dcg_raw * 1000000 + 0.5) / 1000000 AS dcg,
      |  floor(idcg_raw * 1000000 + 0.5) / 1000000 AS idcg,
      |  floor(dcg_raw / idcg_raw * 1000000 + 0.5) / 1000000 AS ndcg
      |FROM f ORDER BY qid""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val q = emb(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        round(graft.functions.GraftFunctions
          .cosineNative(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val top = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("qlabel"), col("rn"),
        when(col("label") === col("qlabel"), 1).otherwise(0).as("rel"))
    val dcg = top
      .withColumn("term",
        col("rel").cast("double") * log(lit(2.0)) / log(col("rn") + lit(1.0)))
      .groupBy("qid")
      .agg(first("qlabel").as("qlabel"), sum("rel").cast("long").as("n_rel10"),
        expr("aggregate(transform(array_sort(collect_list(struct(rn, term))), " +
          "t -> t.term), 0D, (a, x) -> a + x)").as("dcg_raw"))
    val lc = emb(s, d).groupBy("label").agg(count(lit(1)).as("cnt"))
    dcg.join(broadcast(lc), col("label") === col("qlabel"))
      .withColumn("idcg_raw", expr(
        "aggregate(transform(sequence(1L, greatest(least(10L, cnt - 1L), 1L)), " +
          "i -> ln(2.0D) / ln(CAST(i AS DOUBLE) + 1.0D)), " +
          "0D, (a, x) -> a + x)"))
      .select(col("qid"), col("n_rel10"),
        (floor(col("dcg_raw") * 1000000 + lit(0.5)) / 1000000).as("dcg"),
        (floor(col("idcg_raw") * 1000000 + lit(0.5)) / 1000000).as("idcg"),
        (floor(col("dcg_raw") / col("idcg_raw") * 1000000 + lit(0.5))
          / 1000000).as("ndcg"))
      .orderBy("qid")
  }

  val all: Seq[Q] = Seq(aucRoc, prCurve, ndcgRetrieval)
}
