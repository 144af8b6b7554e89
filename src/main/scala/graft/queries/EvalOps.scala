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

  /** Split-conformal prediction interval (Vovk et al.; Lei et al.
    * 2018) — the distribution-free uncertainty wrapper modern ML
    * pipelines bolt onto any point model: fit on train (here a
    * per-priority mean-spend model — conformal makes NO assumption
    * about model quality), take the ⌈0.9(n+1)⌉-th smallest absolute
    * residual on the calibration split as q̂, and measure empirical
    * test coverage of ŷ ± q̂ (guaranteed ≥ 0.9 marginally). The
    * calibration quantile is an EXACT order statistic picked by the
    * distributed PrefixScan (cum-count crossing k — never a
    * partition-less rank window, never a driver sort); k comes from
    * the PrefixScan's bounded totals. Residuals are |exact cents −
    * fixed-form mean|, bit-identical cross-engine. */
  val conformalInterval: Q = Q(
    "conformal_interval",
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    ((o_orderkey & 2147483647) * 2654435761) % 100 AS h
      |  FROM orders),
      |model AS (SELECT o_orderpriority,
      |    CAST(sum(cents) AS DOUBLE) / count(*) AS yhat
      |  FROM o WHERE h < 60 GROUP BY o_orderpriority),
      |cal AS (SELECT o.o_orderkey, abs(o.cents - m.yhat) AS r
      |  FROM o JOIN model m ON m.o_orderpriority = o.o_orderpriority
      |  WHERE h >= 60 AND h < 80),
      |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
      |ranked AS (SELECT r,
      |    row_number() OVER (ORDER BY r, o_orderkey) AS rk FROM cal),
      |qh AS (SELECT r AS qhat FROM ranked CROSS JOIN nc
      |       WHERE rk = CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT)),
      |test AS (SELECT abs(o.cents - m.yhat) AS r
      |  FROM o JOIN model m ON m.o_orderpriority = o.o_orderpriority
      |  WHERE h >= 80),
      |cov AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_covered
      |  FROM test CROSS JOIN qh)
      |SELECT n_cal, n_test, n_covered,
      |  floor(qhat / 100 * 100 + 0.5) / 100 AS qhat_dollars,
      |  floor(CAST(n_covered AS DOUBLE) / n_test * 10000 + 0.5) / 10000
      |    AS coverage
      |FROM cov CROSS JOIN qh CROSS JOIN nc""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
      ((col("o_orderkey").bitwiseAND(lit(2147483647L)) * lit(2654435761L))
        % 100).as("h"))
    val model = o.filter(col("h") < 60).groupBy("o_orderpriority")
      .agg((sum("cents").cast("double") / count(lit(1))).as("yhat"))
    val cal = o.filter(col("h") >= 60 && col("h") < 80)
      .join(broadcast(model), "o_orderpriority")
      .select(col("o_orderkey"), abs(col("cents") - col("yhat")).as("r"))
      .withColumn("one", lit(1L))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      cal, Seq(col("r"), col("o_orderkey")), Seq("one"))
    val nCal = totals(0)
    val k = math.ceil(0.9 * (nCal + 1)).toLong
    val qh = scanned.filter(col("cum_one") === k)
      .select(col("r").as("qhat"))
    val test = o.filter(col("h") >= 80)
      .join(broadcast(model), "o_orderpriority")
      .select(abs(col("cents") - col("yhat")).as("r"))
    val cov = test.crossJoin(broadcast(qh)) // 1-row calibration quantile
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"),
        first("qhat").as("qhat"))
    cov.select(lit(nCal).as("n_cal"), col("n_test"), col("n_covered"),
      (floor(col("qhat") / 100 * 100 + lit(0.5)) / 100).as("qhat_dollars"),
      (floor(col("n_covered").cast("double") / col("n_test") * 10000
        + lit(0.5)) / 10000).as("coverage"))
  }

  /** Mutual-information feature ranking against the 'en' label — the
    * information-theoretic sibling of woe_iv / q96_chi2_terms: for each
    * candidate feature (n_chars decile via DistributedNtile, token-
    * count decile, source), MI(F; L) = Σ (c/N)·ln(c·N/(r·k)) over the
    * contingency cells, plus the normalized MI / H(L). Every term is
    * exact integer counts through one fixed-form expression, folded
    * CELL-SORTED; deciles come from the distributed two-pass ntile
    * (never a partition-less window). Three contingency aggregates +
    * 1-row totals. */
  val miFeatures: Q = Q(
    "mi_features",
    """WITH base AS (SELECT doc_id, n_chars, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS n_tokens,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |f1 AS (SELECT CAST(ntile(10) OVER (ORDER BY n_chars, doc_id)
      |         AS VARCHAR) AS fv, pos FROM base),
      |f2 AS (SELECT CAST(ntile(10) OVER (ORDER BY n_tokens, doc_id)
      |         AS VARCHAR) AS fv, pos FROM base),
      |f3 AS (SELECT source AS fv, pos FROM base),
      |u AS (SELECT 'n_chars_decile' AS feature, fv, pos FROM f1
      |  UNION ALL SELECT 'n_tokens_decile', fv, pos FROM f2
      |  UNION ALL SELECT 'source', fv, pos FROM f3),
      |cells AS (SELECT feature, fv, pos, CAST(count(*) AS BIGINT) AS c
      |  FROM u GROUP BY feature, fv, pos),
      |rows_ AS (SELECT feature, fv, CAST(sum(c) AS BIGINT) AS rt
      |  FROM cells GROUP BY feature, fv),
      |cols_ AS (SELECT feature, pos, CAST(sum(c) AS BIGINT) AS ct
      |  FROM cells GROUP BY feature, pos),
      |n AS (SELECT feature, CAST(sum(c) AS BIGINT) AS n FROM cells
      |      GROUP BY feature),
      |terms AS (SELECT cells.feature, cells.fv, cells.pos,
      |    CAST(c AS DOUBLE) / n * ln(CAST(c AS DOUBLE) * n
      |      / (CAST(rt AS DOUBLE) * ct)) AS t
      |  FROM cells
      |  JOIN rows_ ON rows_.feature = cells.feature AND rows_.fv = cells.fv
      |  JOIN cols_ ON cols_.feature = cells.feature
      |    AND cols_.pos = cells.pos
      |  JOIN n ON n.feature = cells.feature),
      |mi AS (SELECT feature,
      |    list_aggregate(list(t ORDER BY fv, pos), 'sum') AS mi
      |  FROM terms GROUP BY feature),
      |hl AS (SELECT feature,
      |    -list_aggregate(list(CAST(ct AS DOUBLE) / n
      |        * ln(CAST(ct AS DOUBLE) / n) ORDER BY pos), 'sum') AS h
      |  FROM cols_ JOIN n USING (feature) GROUP BY feature)
      |SELECT mi.feature,
      |  floor(mi.mi * 1000000 + 0.5) / 1000000 AS mi,
      |  floor(mi.mi / hl.h * 1000000 + 0.5) / 1000000 AS nmi
      |FROM mi JOIN hl ON hl.feature = mi.feature
      |ORDER BY mi.feature""".stripMargin) { (s, d) =>
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val base = docs(s, d).select(col("doc_id"), col("n_chars"),
      col("source"), size(ts).cast("long").as("n_tokens"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    def decile(c: String): DataFrame = graft.ops.DistributedNtile.ntile(
      base.select(col(c), col("doc_id"), col("pos")),
      Seq(col(c), col("doc_id")), 10)
      .select(col("bucket").cast("string").as("fv"), col("pos"))
    val u = decile("n_chars").withColumn("feature", lit("n_chars_decile"))
      .unionAll(decile("n_tokens")
        .withColumn("feature", lit("n_tokens_decile")))
      .unionAll(base.select(col("source").as("fv"), col("pos"))
        .withColumn("feature", lit("source")))
    val cells = u.groupBy("feature", "fv", "pos")
      .agg(count(lit(1)).as("c"))
    val rowsT = cells.groupBy(col("feature").as("rf"), col("fv").as("rfv"))
      .agg(sum("c").as("rt"))
    val colsT = cells.groupBy(col("feature").as("cf"), col("pos").as("cp"))
      .agg(sum("c").as("ct"))
    val nT = cells.groupBy(col("feature").as("nf")).agg(sum("c").as("n"))
    val terms = cells
      .join(broadcast(rowsT),
        col("feature") === col("rf") && col("fv") === col("rfv"))
      .join(broadcast(colsT),
        col("feature") === col("cf") && col("pos") === col("cp"))
      .join(broadcast(nT), col("feature") === col("nf"))
      .select(col("feature"), col("fv"), col("pos"),
        (col("c").cast("double") / col("n")
          * log(col("c").cast("double") * col("n")
            / (col("rt").cast("double") * col("ct")))).as("t"))
    val mi = terms.groupBy("feature")
      .agg(expr("aggregate(transform(array_sort(collect_list(" +
        "struct(fv, pos, t))), x -> x.t), 0D, (a, x) -> a + x)").as("mi"))
    val hl = colsT.join(broadcast(nT), col("cf") === col("nf"))
      .select(col("cf").as("feature"), col("cp").as("pos"),
        (col("ct").cast("double") / col("n")
          * log(col("ct").cast("double") / col("n"))).as("t"))
      .groupBy("feature")
      .agg((-expr("aggregate(transform(array_sort(collect_list(" +
        "struct(pos, t))), x -> x.t), 0D, (a, x) -> a + x)")).as("h"))
    mi.join(hl, "feature")
      .select(col("feature"),
        (floor(col("mi") * 1000000 + lit(0.5)) / 1000000).as("mi"),
        (floor(col("mi") / col("h") * 1000000 + lit(0.5)) / 1000000)
          .as("nmi"))
      .orderBy("feature")
  }

  /** Isotonic-regression score calibration (pool-adjacent-violators) —
    * score_calibration's reliability diagram made actionable: fit the
    * best MONOTONE calibration map over the binned score axis, the
    * standard last-mile calibrator (Zadrozny & Elkan, KDD'02). The
    * data-scale work is ONE binned count aggregate (B ≤ 20 groups);
    * the PAV fit then runs on the bounded bin table via the exact
    * minimax identity iso(k) = max_{i≤k} min_{j≥k} mean(i..j) —
    * O(B³) expression work on a single row, no driver loop, no
    * partition-less window. Every mean is ONE division of exact
    * integer prefix sums, so both engines take min/max over the
    * identical double multiset. Emits per-bin raw vs calibrated rates;
    * iso_rate is non-decreasing by construction (pinned in
    * EvalOpsSuite against a direct PAV pooling reference). */
  val isotonicCalibration: Q = Q(
    "isotonic_calibration",
    """WITH b AS (SELECT
      |    least(19, CAST(floor(o_totalprice / 25000) AS BIGINT)) AS bin,
      |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      |  FROM orders),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(pos) AS BIGINT) AS p FROM b GROUP BY 1),
      |pre AS (SELECT bin, w, p,
      |    CAST(sum(w) OVER (ORDER BY bin) AS BIGINT) AS cw,
      |    CAST(sum(p) OVER (ORDER BY bin) AS BIGINT) AS cp,
      |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS r FROM g),
      |m AS (SELECT i.r AS ri, j.r AS rj,
      |    CAST(j.cp - i.cp + i.p AS DOUBLE)
      |      / CAST(j.cw - i.cw + i.w AS DOUBLE) AS mean
      |  FROM pre i JOIN pre j ON i.r <= j.r),
      |t3 AS (SELECT m.ri, k.r AS rk, min(m.mean) AS mn
      |  FROM m JOIN pre k ON m.ri <= k.r AND m.rj >= k.r
      |  GROUP BY 1, 2),
      |fit AS (SELECT rk, max(mn) AS iso FROM t3 GROUP BY 1)
      |SELECT p.bin, p.w AS n_orders, p.p AS n_pos,
      |  floor(CAST(p.p AS DOUBLE) / p.w * 1000000 + 0.5) / 1000000
      |    AS raw_rate,
      |  floor(f.iso * 1000000 + 0.5) / 1000000 AS iso_rate
      |FROM pre p JOIN fit f ON f.rk = p.r ORDER BY p.bin""".stripMargin) {
    (s, d) =>
    Tables.orders(s, d)
      .select(
        least(lit(19L), floor(col("o_totalprice") / 25000).cast("long"))
          .as("bin"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("pos").as("p"))
      .agg(expr("array_sort(collect_list(struct(bin, w, p)))").as("a"))
      .withColumn("nb", expr("size(a)"))
      .withColumn("pw", expr("transform(sequence(1, nb), " +
        "j -> aggregate(slice(a, 1, j), 0L, (acc, t) -> acc + t.w))"))
      .withColumn("pp", expr("transform(sequence(1, nb), " +
        "j -> aggregate(slice(a, 1, j), 0L, (acc, t) -> acc + t.p))"))
      .withColumn("iso", expr(
        "transform(sequence(1, nb), k -> " +
          "array_max(transform(sequence(1, k), i -> " +
          "array_min(transform(sequence(k, nb), j -> " +
          "CAST(pp[j-1] - IF(i = 1, 0L, pp[i-2]) AS DOUBLE) / " +
          "CAST(pw[j-1] - IF(i = 1, 0L, pw[i-2]) AS DOUBLE))))))"))
      .select(col("iso"), posexplode(col("a")).as(Seq("k0", "t")))
      .select(col("t.bin").as("bin"), col("t.w").as("n_orders"),
        col("t.p").as("n_pos"),
        (floor(col("t.p").cast("double") / col("t.w") * 1000000 + lit(0.5))
          / 1000000).as("raw_rate"),
        (floor(expr("element_at(iso, k0 + 1)") * 1000000 + lit(0.5))
          / 1000000).as("iso_rate"))
      .orderBy("bin")
  }

  /** Cohen's κ inter-rater agreement (Cohen 1960) between the quality
    * classifier's sign (rater A: normalized margin > 0) and the 'en'
    * label (rater B) — the chance-corrected agreement check run
    * before trusting auto-labels against a reference labeler. The
    * 2×2 confusion fills from ONE conditional-aggregation scan, and
    * κ = (N·agree − Σ marginal products) / (N² − Σ marginal products)
    * is computed ENTIRELY on exact integers with a single final
    * division (no po/pe float intermediates — N² stays < 2⁶³ past
    * 10⁹ docs). po and pe are reported as their own one-division
    * rationals. The fixture scorer is hash-random, so the gate pins
    * the agreement algebra, not label quality. */
  val cohenKappa: Q = Q(
    "cohen_kappa",
    scoreCte + """,
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN score / n_tokens > 0 AND lang = 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a11,
      |    CAST(sum(CASE WHEN score / n_tokens > 0 AND lang <> 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a10,
      |    CAST(sum(CASE WHEN score / n_tokens <= 0 AND lang = 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a01,
      |    CAST(sum(CASE WHEN score / n_tokens <= 0 AND lang <> 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a00
      |  FROM s)
      |SELECT n AS n_docs, a11 + a00 AS n_agree,
      |  floor(CAST(a11 + a00 AS DOUBLE) / n * 1000000 + 0.5) / 1000000
      |    AS po,
      |  floor(CAST((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)
      |      AS DOUBLE) / (n * n) * 1000000 + 0.5) / 1000000 AS pe,
      |  floor(CAST(n * (a11 + a00)
      |      - ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00))
      |      AS DOUBLE)
      |    / CAST(n * n
      |      - ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00))
      |      AS DOUBLE) * 1000000 + 0.5) / 1000000 AS kappa
      |FROM c""".stripMargin) { (s, d) =>
    val a = col("v") > 0
    val b = col("lang") === "en"
    val c = scoredDocs(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(a && b, 1L).otherwise(0L)).as("a11"),
      sum(when(a && !b, 1L).otherwise(0L)).as("a10"),
      sum(when(!a && b, 1L).otherwise(0L)).as("a01"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("a00"))
    val prodSum = (col("a11") + col("a10")) * (col("a11") + col("a01")) +
      (col("a01") + col("a00")) * (col("a10") + col("a00"))
    c.select(col("n").as("n_docs"),
      (col("a11") + col("a00")).as("n_agree"),
      (floor((col("a11") + col("a00")).cast("double") / col("n")
        * 1000000 + lit(0.5)) / 1000000).as("po"),
      (floor(prodSum.cast("double") / (col("n") * col("n"))
        * 1000000 + lit(0.5)) / 1000000).as("pe"),
      (floor((col("n") * (col("a11") + col("a00")) - prodSum).cast("double")
        / (col("n") * col("n") - prodSum).cast("double")
        * 1000000 + lit(0.5)) / 1000000).as("kappa"))
  }

  /** Expected / maximum calibration error (ECE / MCE, Naeini et al.
    * AAAI'15) over score_calibration's 10 reliability bins — the
    * headline scalar a model eval reports where the reliability table
    * is the diagnostic detail. The per-bin gap |acc_b − conf_b| (bin
    * confidence = midpoint (2b+1)/20) is kept EXACT: its numerator
    * |20·p_b − (2b+1)·w_b| is a pure integer, so ECE = Σ_b num_b /
    * (20N) is ONE division and MCE's max compares identical doubles.
    * One binned count scan; 10-row finals. */
  val eceCalibration: Q = Q(
    "ece_calibration",
    scoreCte + """,
      |b AS (SELECT least(greatest(
      |      CAST(floor((score / n_tokens + 0.5) * 10) AS BIGINT), 0), 9)
      |      AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM s),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(pos) AS BIGINT) AS p FROM b GROUP BY 1),
      |f AS (SELECT CAST(sum(w) AS BIGINT) AS n,
      |    CAST(sum(abs(20 * p - (2 * bin + 1) * w)) AS BIGINT) AS num,
      |    max(CAST(abs(20 * p - (2 * bin + 1) * w) AS DOUBLE) / (20 * w))
      |      AS mce
      |  FROM g)
      |SELECT n AS n_docs,
      |  floor(CAST(num AS DOUBLE) / (20 * n) * 1000000 + 0.5) / 1000000
      |    AS ece,
      |  floor(mce * 1000000 + 0.5) / 1000000 AS mce
      |FROM f""".stripMargin) { (s, d) =>
    val g = scoredDocs(s, d)
      .select(
        least(greatest(
          floor((col("v") + lit(0.5)) * 10).cast("long"), lit(0L)), lit(9L))
          .as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("pos").as("p"))
    val num = abs(lit(20) * col("p") - (lit(2) * col("bin") + 1) * col("w"))
    g.agg(sum("w").as("n"), sum(num).as("num"),
        max(num.cast("double") / (lit(20) * col("w"))).as("mce"))
      .select(col("n").as("n_docs"),
        (floor(col("num").cast("double") / (lit(20) * col("n"))
          * 1000000 + lit(0.5)) / 1000000).as("ece"),
        (floor(col("mce") * 1000000 + lit(0.5)) / 1000000).as("mce"))
  }

  /** McNemar's paired test (McNemar 1947, continuity-corrected) on
    * the same two raters as cohen_kappa — κ asks "do they agree";
    * McNemar asks the DIRECTIONAL question "when they disagree, is
    * one systematically more positive", the test for comparing two
    * classifiers on identical items. Only the discordant counts
    * matter: χ² = (|b−c|−1)²/(b+c), every input an exact integer from
    * the same single-scan confusion, one division. Significance at
    * the χ²₁ 5% bound 3.841459. */
  val mcnemarTest: Q = Q(
    "mcnemar_test",
    scoreCte + """,
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN score / n_tokens > 0 AND lang <> 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN score / n_tokens <= 0 AND lang = 'en'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS cc
      |  FROM s)
      |SELECT n AS n_docs, b, cc AS c, b + cc AS n_discordant,
      |  floor(CAST((abs(b - cc) - 1) * (abs(b - cc) - 1) AS DOUBLE)
      |    / (b + cc) * 1000000 + 0.5) / 1000000 AS chi2,
      |  CAST((abs(b - cc) - 1) * (abs(b - cc) - 1) AS DOUBLE) / (b + cc)
      |    > 3.841459 AS significant
      |FROM c""".stripMargin) { (s, d) =>
    val a = col("v") > 0
    val en = col("lang") === "en"
    val c = scoredDocs(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(a && !en, 1L).otherwise(0L)).as("b"),
      sum(when(!a && en, 1L).otherwise(0L)).as("cc"))
    val num = ((abs(col("b") - col("cc")) - 1)
      * (abs(col("b") - col("cc")) - 1)).cast("double")
    c.select(col("n").as("n_docs"), col("b"), col("cc").as("c"),
      (col("b") + col("cc")).as("n_discordant"),
      (floor(num / (col("b") + col("cc")) * 1000000 + lit(0.5)) / 1000000)
        .as("chi2"),
      (num / (col("b") + col("cc")) > 3.841459).as("significant"))
  }

  /** Bradley–Terry preference ranking (Bradley & Terry 1952), one full
    * distributed minorization-maximization step past the closed-form
    * start — the aggregation a pairwise-preference (RLHF-style)
    * pipeline runs over judgment logs. Comparisons: within each order,
    * the higher-priced part "wins" each pairwise matchup (ties to the
    * smaller key) — deterministic and fan-out-bounded (items/order is
    * a data constant). From w⁰=1 the first MM update collapses to the
    * closed form w¹_i = 2·wins_i/n_i (exact rational); the second is
    * the real distributed step: pair relation joined to BOTH
    * endpoints' w¹, per-pair terms n_uv/(w¹_u+w¹_v) rounded to the
    * 1e-9 grid (order-independent sum), grouped per node, one
    * division. Plan: per-order pair expansion → pair groupBy → two
    * BROADCAST |V|-sized weight lookups (the pair stream never
    * re-shuffles) + node groupBy. */
  val bradleyTerry: Q = Q(
    "bradley_terry",
    """WITH ip AS (SELECT l_orderkey AS ok, l_partkey AS pk,
      |    max(l_extendedprice) AS pr FROM lineitem GROUP BY 1, 2),
      |pairs AS (SELECT a.pk AS u, b.pk AS v,
      |    CASE WHEN a.pr > b.pr OR (a.pr = b.pr AND a.pk < b.pk)
      |         THEN 1 ELSE 0 END AS uw
      |  FROM ip a JOIN ip b ON a.ok = b.ok AND a.pk < b.pk),
      |pg AS (SELECT u, v, CAST(count(*) AS BIGINT) AS n_uv,
      |    CAST(sum(uw) AS BIGINT) AS u_wins FROM pairs GROUP BY u, v),
      |node AS (SELECT pk, CAST(sum(n) AS BIGINT) AS n_i,
      |    CAST(sum(w) AS BIGINT) AS wins
      |  FROM (SELECT u AS pk, n_uv AS n, u_wins AS w FROM pg
      |        UNION ALL SELECT v, n_uv, n_uv - u_wins FROM pg)
      |  GROUP BY pk),
      |w1 AS (SELECT pk, 2.0 * wins / n_i AS w FROM node),
      |dirs AS (SELECT u AS pk, v AS o, n_uv AS n FROM pg
      |         UNION ALL SELECT v, u, n_uv FROM pg),
      |terms AS (SELECT dirs.pk,
      |    floor(dirs.n / (wa.w + wb.w) * 1000000000 + 0.5) / 1000000000
      |      AS t
      |  FROM dirs JOIN w1 wa ON wa.pk = dirs.pk
      |            JOIN w1 wb ON wb.pk = dirs.o
      |  WHERE wa.w + wb.w > 0),
      |den AS (SELECT pk, sum(t) AS dn FROM terms GROUP BY pk)
      |SELECT node.pk AS part_id, node.wins, node.n_i,
      |  floor(node.wins / den.dn * 1000000 + 0.5) / 1000000 AS bt_score
      |FROM node JOIN den ON den.pk = node.pk
      |WHERE node.wins > 0 AND den.dn > 0
      |ORDER BY bt_score DESC, part_id LIMIT 20""".stripMargin) { (s, d) =>
    val ip = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .agg(max(col("l_extendedprice")).as("pr"))
    // pair expansion via the group-explode builder (copurchaseEdges'
    // measured-cheaper path, r13): ONE groupBy(ok) shuffle of the
    // (pk, pr) rows + executor-side u<v fan-out instead of two shuffled
    // self-join sides. pk is unique within ok (ip is grouped on it), so
    // filter(b.pk > a.pk) emits each unordered pair exactly once with
    // u < v — and the oracle's tie-break (a.pr = b.pr AND a.pk < b.pk)
    // is always true in that orientation, i.e. uw = (a.pr >= b.pr).
    val pairs = ip
      .groupBy("ok").agg(collect_list(struct(col("pk"), col("pr"))).as("xs"))
      .select(explode(expr(
        """flatten(transform(xs, (a, i) ->
          |  transform(filter(xs, b -> b.pk > a.pk),
          |    b -> struct(a.pk AS u, b.pk AS v,
          |                CASE WHEN a.pr >= b.pr THEN 1 ELSE 0 END AS uw))))"""
          .stripMargin)).as("e"))
      .select(col("e.u"), col("e.v"), col("e.uw"))
    val pg = pairs.groupBy("u", "v")
      .agg(count(lit(1)).as("n_uv"), sum("uw").as("u_wins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val node = pg.select(col("u").as("pk"), col("n_uv").as("n"), col("u_wins").as("w"))
      .union(pg.select(col("v"), col("n_uv"), col("n_uv") - col("u_wins")))
      .groupBy("pk").agg(sum("n").as("n_i"), sum("w").as("wins"))
    val w1 = node.select(col("pk"), (lit(2.0) * col("wins") / col("n_i")).as("w"))
    val dirs = pg.select(col("u").as("pk"), col("v").as("o"), col("n_uv").as("n"))
      .union(pg.select(col("v"), col("u"), col("n_uv")))
    // w1 is |V|-sized (one row per part) — broadcast both endpoint
    // lookups so the pair-sized `dirs` stream never shuffles; the only
    // exchange after pg is the map-side-combined groupBy in `den`.
    val terms = dirs
      .join(broadcast(w1.select(col("pk"), col("w").as("wa"))), "pk")
      .join(broadcast(w1.select(col("pk").as("o"), col("w").as("wb"))), "o")
      .filter(col("wa") + col("wb") > 0)
      .select(col("pk"),
        (floor(col("n") / (col("wa") + col("wb")) * 1000000000L + lit(0.5))
          / 1000000000L).as("t"))
    val den = terms.groupBy("pk").agg(sum("t").as("dn"))
    node.join(den, "pk")
      .filter(col("wins") > 0 && col("dn") > 0)
      .select(col("pk").as("part_id"), col("wins"), col("n_i"),
        (floor(col("wins") / col("dn") * 1000000 + lit(0.5)) / 1000000)
          .as("bt_score"))
      .orderBy(col("bt_score").desc, col("part_id"))
      .limit(20)
  }

  /** Per-segment conditional average treatment effect (the two-group
    * CATE table behind an uplift report): treatment = deep discount
    * (l_discount > 0.05), outcome = quantity, segment = brand. One
    * fact-dim join + one conditional grouped aggregate: exact BIGINT
    * (n, sum) per arm per brand, difference-of-means + pooled-SE
    * z per segment as fixed-form doubles. The causal caveat is the
    * did_estimate/cuped family's; this is the SEGMENTED descriptive
    * layer. */
  lazy val cateSegments: Q = Q(
    "cate_segments",
    """WITH b AS (SELECT p.p_brand AS brand,
      |    CASE WHEN li.l_discount > 0.05 THEN 1 ELSE 0 END AS t,
      |    CAST(floor(li.l_quantity) AS BIGINT) AS y
      |  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey),
      |g AS (SELECT brand,
      |    CAST(sum(t) AS BIGINT) AS nt,
      |    CAST(sum(1 - t) AS BIGINT) AS nc,
      |    CAST(sum(y * t) AS BIGINT) AS st,
      |    CAST(sum(y * (1 - t)) AS BIGINT) AS sc,
      |    CAST(sum(y * y * t) AS BIGINT) AS qt,
      |    CAST(sum(y * y * (1 - t)) AS BIGINT) AS qc
      |  FROM b GROUP BY brand)
      |SELECT brand, nt, nc,
      |  floor((CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)
      |    * 1000000 + 0.5) / 1000000 AS cate,
      |  floor((CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)
      |    / sqrt((CAST(qt AS DOUBLE) / nt
      |        - (CAST(st AS DOUBLE) / nt) * (CAST(st AS DOUBLE) / nt)) / nt
      |      + (CAST(qc AS DOUBLE) / nc
      |        - (CAST(sc AS DOUBLE) / nc) * (CAST(sc AS DOUBLE) / nc)) / nc)
      |    * 10000 + 0.5) / 10000 AS z
      |FROM g WHERE nt >= 30 AND nc >= 30 ORDER BY brand""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .select(col("p_brand").as("brand"),
        when(col("l_discount") > 0.05, 1).otherwise(0).as("t"),
        floor(col("l_quantity")).cast("long").as("y"))
    val g = b.groupBy("brand").agg(
      sum("t").cast("long").as("nt"),
      sum(lit(1) - col("t")).cast("long").as("nc"),
      sum(col("y") * col("t")).as("st"),
      sum(col("y") * (lit(1) - col("t"))).as("sc"),
      sum(col("y") * col("y") * col("t")).as("qt"),
      sum(col("y") * col("y") * (lit(1) - col("t"))).as("qc"))
    val mt = col("st").cast("double") / col("nt")
    val mc = col("sc").cast("double") / col("nc")
    val vt = (col("qt").cast("double") / col("nt") - mt * mt) / col("nt")
    val vc = (col("qc").cast("double") / col("nc") - mc * mc) / col("nc")
    g.filter(col("nt") >= 30 && col("nc") >= 30)
      .select(col("brand"), col("nt"), col("nc"),
        (floor((mt - mc) * 1000000 + lit(0.5)) / 1000000).as("cate"),
        (floor((mt - mc) / sqrt(vt + vc) * 10000 + lit(0.5)) / 10000).as("z"))
      .orderBy("brand")
  }

  /** pass@k (round 13) — the standard code/reasoning-eval estimator
    * (Chen et al. 2021, "Evaluating Large Language Models Trained on
    * Code", eq. 1): for a problem with n samples of which c pass,
    * the unbiased estimator is 1 − C(n−c, k)/C(n, k), computed in the
    * numerically-stable product form 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i)
    * (never a factorial overflow), with the n−c < k branch pinned to
    * exactly 1. Problems = users, samples = their events, a pass =
    * event_type 'purchase' — the fixture mapping; the ESTIMATOR is the
    * operator. Per k ∈ {1, 5, 10}: problems with n ≥ k, averaged.
    * Pure map + explode over the per-user aggregate — no join of any
    * kind, embarrassingly parallel at any scale; both engines fold the
    * ≤10 product terms left-to-right in the same order. */
  lazy val passAtK: Q = Q(
    "pass_at_k",
    """WITH s AS (SELECT user_id, count(*) AS n,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      |  FROM events GROUP BY user_id),
      |x AS (SELECT k, n, c
      |  FROM s CROSS JOIN (SELECT unnest([1, 5, 10]) AS k) ks
      |  WHERE n >= k),
      |p AS (SELECT k,
      |    CASE WHEN n - c < k THEN 1.0
      |    ELSE 1.0 - list_product(list_transform(range(0, k),
      |      i -> ((n - c - i) / (n - i))))
      |    END AS pass
      |  FROM x)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(count(*) AS BIGINT) AS n_problems,
      |  floor(avg(pass) * 1000000 + 0.5) / 1000000 AS pass_at_k
      |FROM p GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("c"))
    stats
      .select(explode(array(lit(1L), lit(5L), lit(10L))).as("k"),
        col("n"), col("c"))
      .filter(col("n") >= col("k"))
      .withColumn("pass",
        when(col("n") - col("c") < col("k"), lit(1.0))
          .otherwise(lit(1.0) - expr(
            "aggregate(sequence(0, CAST(k AS INT) - 1), CAST(1.0 AS DOUBLE), " +
              "(acc, i) -> acc * ((n - c - i) / (n - i)))")))
      .groupBy("k")
      .agg(count(lit(1)).as("n_problems"),
        (floor(avg(col("pass")) * 1000000 + lit(0.5)) / 1000000)
          .as("pass_at_k"))
      .orderBy("k")
  }

  val all: Seq[Q] =
    Seq(aucRoc, prCurve, ndcgRetrieval, conformalInterval, miFeatures,
      isotonicCalibration, cohenKappa, eceCalibration, mcnemarTest,
      bradleyTerry, cateSegments, brierDecomposition, youdenMcc,
      liftGain, passAtK)

  /** Cumulative gains / lift table: work the corpus from the highest
    * score bin down and report, per depth, the corpus share touched,
    * the positives captured (gain), and the lift over random — the
    * campaign-targeting view pr_curve's per-threshold cells don't
    * give. Ten integer bin rows, suffix sums via a bounded bin×bin
    * cross, exact until the two final divisions per row. */
  lazy val liftGain: Q = Q(
    "lift_gain",
    scoreCte + """,
      |b AS (SELECT least(greatest(
      |      CAST(floor((score / n_tokens + 0.5) * 10) AS BIGINT), 0), 9)
      |      AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM s),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(pos) AS BIGINT) AS p FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n,
      |      CAST(sum(p) AS BIGINT) AS pp FROM g),
      |cumt AS (SELECT a.bin,
      |    CAST(sum(b2.w) AS BIGINT) AS cw, CAST(sum(b2.p) AS BIGINT) AS cp
      |  FROM g a JOIN g b2 ON b2.bin >= a.bin GROUP BY a.bin)
      |SELECT cumt.bin, cumt.cw AS cum_docs, cumt.cp AS cum_pos,
      |  floor(CAST(cumt.cw AS DOUBLE) / tot.n * 1000000 + 0.5) / 1000000
      |    AS depth,
      |  floor(CAST(cumt.cp AS DOUBLE) / tot.pp * 1000000 + 0.5) / 1000000
      |    AS gain,
      |  floor(CAST(cumt.cp AS DOUBLE) * tot.n
      |    / (CAST(cumt.cw AS DOUBLE) * tot.pp) * 1000000 + 0.5) / 1000000
      |    AS lift
      |FROM cumt CROSS JOIN tot ORDER BY cumt.bin""".stripMargin) { (s, d) =>
    val g = scoredDocs(s, d)
      .select(
        least(greatest(
          floor((col("v") + lit(0.5)) * 10).cast("long"), lit(0L)), lit(9L))
          .as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("pos").as("p"))
    val tot = g.agg(sum("w").as("n"), sum("p").as("pp"))
    val cumt = g.as("a")
      .join(g.select(col("bin").as("b2"), col("w").as("w2"),
        col("p").as("p2")), col("b2") >= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(sum("w2").as("cw"), sum("p2").as("cp"))
    cumt.crossJoin(broadcast(tot))
      .select(col("bin"), col("cw").as("cum_docs"), col("cp").as("cum_pos"),
        (floor(col("cw").cast("double") / col("n") * 1000000 + lit(0.5))
          / 1000000).as("depth"),
        (floor(col("cp").cast("double") / col("pp") * 1000000 + lit(0.5))
          / 1000000).as("gain"),
        (floor(col("cp").cast("double") * col("n")
          / (col("cw").cast("double") * col("pp")) * 1000000 + lit(0.5))
          / 1000000).as("lift"))
      .orderBy("bin")
  }

  /** Murphy decomposition of the binned Brier score (reliability −
    * resolution + uncertainty) over ece_calibration's 10 bins — ECE
    * says HOW FAR the bins sit from the diagonal; this splits the
    * total probability loss into blame (miscalibration) vs skill
    * (resolution). Every per-bin numerator is exact integer algebra
    * (((2b+1)w − 20p)², (pN − Pw)²); the ten per-bin terms fold
    * bin-sorted; four final divisions. One binned count scan. */
  lazy val brierDecomposition: Q = Q(
    "brier_decomposition",
    scoreCte + """,
      |b AS (SELECT least(greatest(
      |      CAST(floor((score / n_tokens + 0.5) * 10) AS BIGINT), 0), 9)
      |      AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM s),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(pos) AS BIGINT) AS p FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n,
      |      CAST(sum(p) AS BIGINT) AS pp FROM g),
      |f AS (SELECT n, pp,
      |    list_aggregate(list(
      |      CAST(((2 * bin + 1) * w - 20 * p) AS DOUBLE)
      |        * ((2 * bin + 1) * w - 20 * p) / (400.0 * w)
      |      ORDER BY bin), 'sum') / n AS rel,
      |    list_aggregate(list(
      |      CAST((p * n - pp * w) AS DOUBLE) * (p * n - pp * w)
      |        / (w * CAST(n AS DOUBLE) * n)
      |      ORDER BY bin), 'sum') / n AS res
      |  FROM g CROSS JOIN tot GROUP BY n, pp)
      |SELECT n AS n_docs,
      |  floor(rel * 1000000 + 0.5) / 1000000 AS reliability,
      |  floor(res * 1000000 + 0.5) / 1000000 AS resolution,
      |  floor(CAST(pp AS DOUBLE) * (n - pp) / (CAST(n AS DOUBLE) * n)
      |    * 1000000 + 0.5) / 1000000 AS uncertainty,
      |  floor((rel - res + CAST(pp AS DOUBLE) * (n - pp)
      |    / (CAST(n AS DOUBLE) * n)) * 1000000 + 0.5) / 1000000
      |    AS brier_binned
      |FROM f""".stripMargin) { (s, d) =>
    val g = scoredDocs(s, d)
      .select(
        least(greatest(
          floor((col("v") + lit(0.5)) * 10).cast("long"), lit(0L)), lit(9L))
          .as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("pos").as("p"))
    val t = g.agg(sum("w").as("n"), sum("p").as("pp"))
    val f = g.crossJoin(broadcast(t)).groupBy("n", "pp")
      .agg(
        (expr("aggregate(array_sort(collect_list(struct(bin, " +
          "CAST(((2 * bin + 1) * w - 20 * p) AS DOUBLE) " +
          "* ((2 * bin + 1) * w - 20 * p) / (400.0d * w) AS term))), 0D, " +
          "(acc, x) -> acc + x.term)") / col("n")).as("rel"),
        (expr("aggregate(array_sort(collect_list(struct(bin, " +
          "CAST((p * n - pp * w) AS DOUBLE) * (p * n - pp * w) " +
          "/ (w * CAST(n AS DOUBLE) * n) AS term))), 0D, " +
          "(acc, x) -> acc + x.term)") / col("n")).as("res"))
    val unc = col("pp").cast("double") * (col("n") - col("pp")) /
      (col("n").cast("double") * col("n"))
    f.select(col("n").as("n_docs"),
      (floor(col("rel") * 1000000 + lit(0.5)) / 1000000).as("reliability"),
      (floor(col("res") * 1000000 + lit(0.5)) / 1000000).as("resolution"),
      (floor(unc * 1000000 + lit(0.5)) / 1000000).as("uncertainty"),
      (floor((col("rel") - col("res") + unc) * 1000000 + lit(0.5)) / 1000000)
        .as("brier_binned"))
  }

  /** Operating-point selection: sweep the nine bin-boundary
    * thresholds, report the one maximizing Youden's J (TPR − FPR, the
    * ROC-domain criterion pr_curve's PR sweep doesn't cover) plus the
    * MCC at that point. Confusion cells are exact integer sums of the
    * 10-bin table (90 threshold×bin cells total); J's argmax compares
    * exact rationals via cross-multiplication-safe doubles and ties
    * break toward the lower threshold. */
  lazy val youdenMcc: Q = Q(
    "youden_mcc",
    scoreCte + """,
      |b AS (SELECT least(greatest(
      |      CAST(floor((score / n_tokens + 0.5) * 10) AS BIGINT), 0), 9)
      |      AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM s),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS w,
      |      CAST(sum(pos) AS BIGINT) AS p FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS n,
      |      CAST(sum(p) AS BIGINT) AS pp FROM g),
      |th AS (SELECT unnest(range(1, 10)) AS th),
      |cf AS (SELECT th.th,
      |    CAST(sum(CASE WHEN g.bin >= th.th THEN g.p ELSE 0 END)
      |      AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN g.bin >= th.th THEN g.w - g.p ELSE 0 END)
      |      AS BIGINT) AS fp
      |  FROM th CROSS JOIN g GROUP BY th.th),
      |m AS (SELECT cf.th, tp, fp, tot.pp - tp AS fn,
      |    tot.n - tot.pp - fp AS tn, tot.pp, tot.n,
      |    CAST(tp AS DOUBLE) / tot.pp
      |      - CAST(fp AS DOUBLE) / (tot.n - tot.pp) AS j
      |  FROM cf CROSS JOIN tot)
      |SELECT CAST(th AS DOUBLE) / 10 AS threshold, tp, fp, fn, tn,
      |  floor(j * 1000000 + 0.5) / 1000000 AS youden_j,
      |  floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
      |    / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp)
      |      * (tn + fn)) * 1000000 + 0.5) / 1000000 AS mcc
      |FROM m ORDER BY j DESC, th LIMIT 1""".stripMargin) { (s, d) =>
    val g = scoredDocs(s, d)
      .select(
        least(greatest(
          floor((col("v") + lit(0.5)) * 10).cast("long"), lit(0L)), lit(9L))
          .as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("pos").as("p"))
    val t = g.agg(sum("w").as("n"), sum("p").as("pp"))
    val th = s.range(1, 10).select(col("id").as("th"))
    val cf = th.crossJoin(broadcast(g)).groupBy("th")
      .agg(sum(when(col("bin") >= col("th"), col("p")).otherwise(0L))
        .as("tp"),
        sum(when(col("bin") >= col("th"), col("w") - col("p"))
          .otherwise(0L)).as("fp"))
    val j = col("tp").cast("double") / col("pp") -
      col("fp").cast("double") / (col("n") - col("pp"))
    val fn = col("pp") - col("tp")
    val tn = col("n") - col("pp") - col("fp")
    cf.crossJoin(broadcast(t))
      .select(col("th"), col("tp"), col("fp"), fn.as("fn"), tn.as("tn"),
        j.as("j"))
      .orderBy(col("j").desc, col("th"))
      .limit(1)
      .select((col("th").cast("double") / 10).as("threshold"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        (floor(col("j") * 1000000 + lit(0.5)) / 1000000).as("youden_j"),
        (floor((col("tp").cast("double") * col("tn")
          - col("fp").cast("double") * col("fn"))
          / sqrt((col("tp") + col("fp")).cast("double")
            * (col("tp") + col("fn")) * (col("tn") + col("fp"))
            * (col("tn") + col("fn"))) * 1000000 + lit(0.5)) / 1000000)
          .as("mcc"))
  }
}
