package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Statistical pipeline audits: a distributed Naive-Bayes language
  * classifier (train + apply + confusion matrix in one declared query),
  * a two-sample Kolmogorov–Smirnov distance (distribution drift between
  * corpus slices, on the PrefixScan operator), and the Population
  * Stability Index (the standard production drift monitor).
  *
  * Determinism: every cross-engine double either derives from integer
  * counts by one identical division, or is folded in an explicitly
  * sorted order on both engines (Spark `aggregate ∘ array_sort ∘
  * collect_list` ≡ DuckDB `list_aggregate(list(... ORDER BY ...))`);
  * `ln` parity is established corpus-wide by lm_perplexity /
  * lm_backoff_score. KS's argmax runs on exact INTEGER cross-products
  * (|F1−F2| compared as |cum1·n2 − cum2·n1|), so the max is exact. */
object StatOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Distributed Naive Bayes language identification: train a unigram
    * multinomial NB on a deterministic 80% hash split of `documents`,
    * classify the held-out 20%, emit the confusion matrix. Training is
    * ONE aggregation over the exploded train corpus (per-(lang, word)
    * counts — the scalable "train a text classifier" shape: model size
    * is vocab×langs, corpus crossed once); scoring joins each test
    * doc's distinct words against the model (vocabulary-keyed shuffle,
    * candidate langs broadcast) and folds log-likelihood terms in
    * word-sorted order so both engines add identical doubles in the
    * identical sequence. Argmax ties break by language name. */
  val nbLangid: Q = Q(
    "nb_langid",
    """WITH s AS (SELECT doc_id, lang, text,
      |    ((doc_id & 2147483647) * 1442695041) % 100 < 80 AS is_train
      |  FROM documents),
      |cw AS (SELECT lang, w, count(*) AS c FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w
      |    FROM s WHERE is_train) WHERE w <> '' GROUP BY lang, w),
      |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cw GROUP BY lang),
      |v AS (SELECT count(DISTINCT w) AS vsize FROM cw),
      |pri AS (SELECT lang, count(*) AS ndl FROM s WHERE is_train GROUP BY lang),
      |nd AS (SELECT CAST(sum(ndl) AS BIGINT) AS ndocs FROM pri),
      |dtok AS (SELECT doc_id, true_lang, w, count(*) AS cdw FROM (
      |    SELECT doc_id, lang AS true_lang,
      |      unnest(string_split(text, ' ')) AS w
      |    FROM s WHERE NOT is_train) WHERE w <> ''
      |  GROUP BY doc_id, true_lang, w),
      |terms AS (SELECT d.doc_id, d.true_lang, t.lang AS cand, d.w,
      |    d.cdw * ln((COALESCE(cw.c, 0) + 1.0)
      |               / CAST(t.tot + v.vsize AS DOUBLE)) AS contrib
      |  FROM dtok d CROSS JOIN tot t CROSS JOIN v
      |  LEFT JOIN cw ON cw.lang = t.lang AND cw.w = d.w),
      |score AS (SELECT doc_id, true_lang, cand,
      |    ln(CAST(any_value(pri.ndl) AS DOUBLE) / any_value(nd.ndocs))
      |      + list_aggregate(list(contrib ORDER BY w), 'sum') AS sc
      |  FROM terms JOIN pri ON pri.lang = cand CROSS JOIN nd
      |  GROUP BY doc_id, true_lang, cand),
      |pred AS (SELECT true_lang, cand AS pred_lang,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, cand) AS rn
      |  FROM score)
      |SELECT true_lang, pred_lang, count(*) AS n_docs
      |FROM pred WHERE rn = 1
      |GROUP BY true_lang, pred_lang
      |ORDER BY true_lang, pred_lang""".stripMargin) { (s, d) =>
    val base = docs(s, d).withColumn("is_train",
      (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(1442695041L)) % 100 < 80)
    val cw = base.filter(col("is_train"))
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val tot = cw.groupBy("lang").agg(sum("c").as("tot"))
    val v = cw.agg(countDistinct("w").as("vsize"))
    val pri = base.filter(col("is_train"))
      .groupBy(col("lang").as("plang")).agg(count(lit(1)).as("ndl"))
    val nd = pri.agg(sum("ndl").as("ndocs"))
    val dtok = base.filter(!col("is_train"))
      .select(col("doc_id"), col("lang").as("true_lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "true_lang", "w").agg(count(lit(1)).as("cdw"))
    val terms = dtok
      .crossJoin(broadcast(tot)) // |langs| rows
      .crossJoin(broadcast(v))   // 1 row
      .join(cw.select(col("lang").as("cwlang"), col("w").as("cww"), col("c")),
        col("lang") === col("cwlang") && col("w") === col("cww"), "left")
      .select(col("doc_id"), col("true_lang"), col("lang").as("cand"), col("w"),
        (col("cdw") * log((coalesce(col("c"), lit(0L)) + lit(1.0))
          / (col("tot") + col("vsize")).cast("double"))).as("contrib"))
    terms
      .join(broadcast(pri), col("cand") === col("plang"))
      .crossJoin(broadcast(nd)) // 1 row
      .groupBy("doc_id", "true_lang", "cand")
      .agg((log(first("ndl").cast("double") / first("ndocs"))
        + expr("aggregate(transform(array_sort(collect_list(struct(w, contrib))), " +
          "t -> t.contrib), 0D, (a, x) -> a + x)")).as("sc"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("sc").desc, col("cand"))))
      .filter(col("rn") === 1)
      .groupBy(col("true_lang"), col("cand").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the purchase and
    * click value distributions — "did these two corpus slices come
    * from the same distribution", the drift test behind mixture
    * rebalancing. ECDF differences are compared as EXACT integers
    * (|F1−F2| maximized as |cum1·n2 − cum2·n1| — no float ever enters
    * the argmax), with the cumulative counts produced by the
    * distributed PrefixScan operator (range-partitioned scan; the
    * partition-less `sum() OVER (ORDER BY)` form is banned by the
    * battery sweep as a scale-killer). Output: sample sizes, the KS
    * statistic, and the value where the gap peaks. */
  val ksTest: Q = Q(
    "ks_test",
    """WITH e AS (SELECT value AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |      FROM e GROUP BY v),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2
      |      FROM c),
      |sc AS (SELECT v,
      |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
      |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb FROM c),
      |dd AS (SELECT v, abs(cum_ca * n2 - cum_cb * n1) AS num, n1, n2
      |       FROM sc, n)
      |SELECT n1, n2, v AS at_value,
      |  CAST(floor(CAST(num AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) * 1000000 + 0.5)
      |    / 1000000 AS DOUBLE) AS ks_d
      |FROM dd ORDER BY num DESC, v LIMIT 1""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("purchase", "click"))
      .select(col("value").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("b"))
    val c = e.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      c, Seq(col("v")), Seq("ca", "cb"))
    val (n1, n2) = (totals(0), totals(1))
    scanned
      .select(col("v"),
        abs(col("cum_ca") * n2 - col("cum_cb") * n1).as("num"))
      .orderBy(col("num").desc, col("v")).limit(1)
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("v").as("at_value"),
        (floor(col("num").cast("double") / lit(n1.toDouble * n2.toDouble)
          * 1000000 + lit(0.5)) / 1000000).cast("double").as("ks_d"))
  }

  /** Population Stability Index between the first and second half of
    * the event stream (10 fixed value bins, Laplace-smoothed shares) —
    * the standard "has my feature distribution drifted" monitor run
    * per training batch. Two-phase count aggregate + a 1-row totals
    * broadcast; bin shares are single divisions of exact integers and
    * each bin's PSI term is floor-rounded after the (parity-
    * established) ln. */
  val driftPsi: Q = Q(
    "drift_psi",
    """WITH e AS (SELECT CAST(least(floor(value / 50), 9) AS INT) AS bin,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS h0
      |  FROM events),
      |c AS (SELECT bin,
      |    CAST(sum(h0) AS BIGINT) AS cb,
      |    CAST(sum(1 - h0) AS BIGINT) AS ca
      |  FROM e GROUP BY bin),
      |n AS (SELECT CAST(sum(cb) AS BIGINT) AS nb, CAST(sum(ca) AS BIGINT) AS na
      |      FROM c)
      |SELECT bin,
      |  CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE) AS p_before,
      |  CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE) AS p_after,
      |  CAST(floor((CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)
      |       - CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))
      |    * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE))
      |       / (CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)))
      |    * 1000000 + 0.5) / 1000000 AS DOUBLE) AS psi_term
      |FROM c, n ORDER BY bin""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(
      least(floor(col("value") / 50), lit(9)).cast("int").as("bin"),
      when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"), 1L)
        .otherwise(0L).as("h0"))
    val c = e.groupBy("bin")
      .agg(sum("h0").as("cb"), sum(lit(1L) - col("h0")).as("ca"))
    val n = c.agg(sum("cb").as("nb"), sum("ca").as("na"))
    val p = (col("cb") + 1).cast("double") / (col("nb") + 10).cast("double")
    val q = (col("ca") + 1).cast("double") / (col("na") + 10).cast("double")
    c.crossJoin(broadcast(n)) // 1-row totals
      .select(col("bin"), p.as("p_before"), q.as("p_after"),
        (floor((p - q) * log(p / q) * 1000000 + lit(0.5)) / 1000000)
          .cast("double").as("psi_term"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(nbLangid, ksTest, driftPsi)
}
