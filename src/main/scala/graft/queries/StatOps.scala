package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Winsorized (clipped) per-group mean of lineitem prices — the
    * feature-prep robustifier: clip at the exact p05/p95 (computed
    * through the distributed range-partitioned percentile path, q54's
    * never-buffer-a-group scale story), then average. The clip bounds
    * floor-round to 1e-4 then to whole CENTS, and the clipped values
    * sum as BIGINT cents, so the mean is one double division over
    * exact integers — bit-identical cross-engine. Two percentile
    * passes + one clip-aggregate pass; the 3-row bounds broadcast. */
  val winsorize: Q = Q(
    "q114_winsorize",
    """WITH b AS (SELECT l_returnflag,
      |    CAST(floor(floor(quantile_cont(l_extendedprice, 0.05) * 10000 + 0.5)
      |      / 10000 * 100 + 0.5) AS BIGINT) AS lo_c,
      |    CAST(floor(floor(quantile_cont(l_extendedprice, 0.95) * 10000 + 0.5)
      |      / 10000 * 100 + 0.5) AS BIGINT) AS hi_c
      |  FROM lineitem GROUP BY l_returnflag),
      |c AS (SELECT l.l_returnflag, b.lo_c, b.hi_c,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem l JOIN b USING (l_returnflag))
      |SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN cents < lo_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_lo,
      |  CAST(sum(CASE WHEN cents > hi_c THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_hi,
      |  floor(CAST(sum(LEAST(GREATEST(cents, lo_c), hi_c)) AS DOUBLE)
      |    / count(*) / 100 * 10000 + 0.5) / 10000 AS win_mean
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    // ONE range shuffle serves both clip bounds (exactMulti — the
    // ship_latency lesson; two exact() calls ran the rank pass twice)
    def cents(raw: org.apache.spark.sql.Column) =
      floor(floor(raw * 10000 + lit(0.5)) / 10000 * 100 + lit(0.5)).cast("long")
    val bounds = graft.ops.GroupedPercentile
      .exactMulti(li, "l_returnflag", "l_extendedprice",
        Seq(0.05 -> "raw_lo", 0.95 -> "raw_hi"))
      .select(col("l_returnflag"),
        cents(col("raw_lo")).as("lo_c"), cents(col("raw_hi")).as("hi_c"))
    li.select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .join(broadcast(bounds), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("cents") < col("lo_c"), 1).otherwise(0)).cast("long")
          .as("n_clip_lo"),
        sum(when(col("cents") > col("hi_c"), 1).otherwise(0)).cast("long")
          .as("n_clip_hi"),
        (floor(sum(least(greatest(col("cents"), col("lo_c")), col("hi_c")))
          .cast("double") / count(lit(1)) / 100 * 10000 + lit(0.5)) / 10000)
          .as("win_mean"))
      .orderBy("l_returnflag")
  }

  /** Join-cardinality estimation from a KEY-SAMPLED frequency histogram
    * — the sketch a cost-based optimizer consults before picking a
    * join strategy. |A ⋈ B| on key k is exactly Σ_k a_k·b_k; sampling
    * KEYS (not rows) by hash keeps the estimator unbiased: summing
    * a_k·b_k over the ~10% of keys the split hash selects and
    * scaling by 10 estimates the true size, and the per-key counts
    * within sampled keys stay exact (the hash is the repo's portable
    * multiplicative split hash, identical in both engines). Histograms
    * are one partial-agg
    * groupBy per side at 1/10 shuffle volume; predicted vs actual is
    * reported per join so the error is visible. All-integer output. */
  val joinCardinality: Q = Q(
    "q116_join_cardinality",
    """WITH lh AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
      |  WHERE ((l_orderkey & 2147483647) * 1442695041) % 10 = 0 GROUP BY 1),
      |oh AS (SELECT o_orderkey AS k, count(*) AS c FROM orders
      |  WHERE ((o_orderkey & 2147483647) * 1442695041) % 10 = 0 GROUP BY 1),
      |est1 AS (SELECT CAST(COALESCE(sum(lh.c * oh.c), 0) * 10 AS BIGINT)
      |    AS predicted, CAST(count(*) AS BIGINT) AS sampled_keys
      |  FROM lh JOIN oh USING (k)),
      |act1 AS (SELECT count(*) AS actual
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |lp AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem
      |  WHERE ((l_partkey & 2147483647) * 1442695041) % 10 = 0 GROUP BY 1),
      |pp AS (SELECT p_partkey AS k, count(*) AS c FROM part
      |  WHERE ((p_partkey & 2147483647) * 1442695041) % 10 = 0 GROUP BY 1),
      |est2 AS (SELECT CAST(COALESCE(sum(lp.c * pp.c), 0) * 10 AS BIGINT)
      |    AS predicted, CAST(count(*) AS BIGINT) AS sampled_keys
      |  FROM lp JOIN pp USING (k)),
      |act2 AS (SELECT count(*) AS actual
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT 'lineitem_orders' AS join_name, est1.sampled_keys,
      |  est1.predicted, act1.actual FROM est1 CROSS JOIN act1
      |UNION ALL
      |SELECT 'lineitem_part', est2.sampled_keys, est2.predicted, act2.actual
      |FROM est2 CROSS JOIN act2
      |ORDER BY join_name""".stripMargin) { (s, d) =>
    def one(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      // Portable key-sampling hash (the repo's nb_langid split hash):
      // identical arithmetic in both engines, no engine hash involved.
      def hist(df: DataFrame, k: String) = df
        .filter((col(k).bitwiseAND(lit(2147483647L)) * 1442695041L) % 10 === 0)
        .groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
      val est = hist(left, lk).as("a").join(hist(right, rk).as("b"), "k")
        .agg((coalesce(sum(col("a.c") * col("b.c")), lit(0L)) * 10)
          .cast("long").as("predicted"),
          count(lit(1)).cast("long").as("sampled_keys"))
      val act = left.join(right, col(lk) === col(rk))
        .agg(count(lit(1)).as("actual"))
      est.crossJoin(act)
        .select(lit(name).as("join_name"), col("sampled_keys"),
          col("predicted"), col("actual"))
    }
    val li = Tables.lineitem(s, d)
    one("lineitem_orders", li, "l_orderkey", Tables.orders(s, d), "o_orderkey")
      .unionAll(one("lineitem_part", li, "l_partkey", Tables.part(s, d), "p_partkey"))
      .orderBy("join_name")
  }

  /** Grouped quartiles in ONE aggregation pass — percentile(col,
    * array(...)) computes all three cut points from a single shared
    * per-group buffer instead of three scans (DuckDB replays with
    * three quantile_cont calls; same interpolation recipe as q52/q53
    * so the floor-rounded values agree). The one-pass multi-quantile
    * is the profiling shape used per-column at scale; for groups too
    * big to buffer the q54 range-partitioned path takes over. */
  val multiQuantile: Q = Q(
    "q117_multi_quantile",
    """SELECT l_returnflag,
      | floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) / 10000 AS p25,
      | floor(quantile_cont(l_extendedprice, 0.50) * 10000 + 0.5) / 10000 AS p50,
      | floor(quantile_cont(l_extendedprice, 0.75) * 10000 + 0.5) / 10000 AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))").as("ps"))
        .select(col("l_returnflag"),
          (floor(col("ps").getItem(0) * 10000 + lit(0.5)) / 10000).as("p25"),
          (floor(col("ps").getItem(1) * 10000 + lit(0.5)) / 10000).as("p50"),
          (floor(col("ps").getItem(2) * 10000 + lit(0.5)) / 10000).as("p75"))
        .orderBy("l_returnflag")
  }

  /** Welch's unequal-variance t-test between the purchase and click
    * value distributions — the A/B-test significance primitive. ONE
    * scan: values quantize to exact BIGINT cents and both groups'
    * (n, Σx, Σx²) moments come out of a single conditional aggregate
    * (map-side combined, 1-row output), so at 100 TB this is a full
    * scan plus a 6-long shuffle. Means/variances/t/df are fixed-form
    * double expressions over the exact integer moments — both engines
    * execute the identical IEEE op sequence (Σx² ≤ 3.1e9·n stays far
    * inside BIGINT, and ANSI mode would fail loudly if it ever
    * didn't), so the floor-rounded outputs are bit-identical. */
  val welchTtest: Q = Q(
    "welch_ttest",
    """WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |g AS (SELECT CAST(sum(ia) AS BIGINT) AS n1,
      |    CAST(sum(1 - ia) AS BIGINT) AS n2,
      |    CAST(sum(cents * ia) AS BIGINT) AS s1a,
      |    CAST(sum(cents * cents * ia) AS BIGINT) AS s2a,
      |    CAST(sum(cents * (1 - ia)) AS BIGINT) AS s1b,
      |    CAST(sum(cents * cents * (1 - ia)) AS BIGINT) AS s2b
      |  FROM e),
      |m AS (SELECT n1, n2,
      |    CAST(s1a AS DOUBLE) / n1 AS m1, CAST(s1b AS DOUBLE) / n2 AS m2,
      |    (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / n1)
      |      / (n1 - 1) AS v1,
      |    (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / n2)
      |      / (n2 - 1) AS v2
      |  FROM g),
      |w AS (SELECT n1, n2, m1, m2, v1, v2, v1 / n1 + v2 / n2 AS se2 FROM m)
      |SELECT n1, n2,
      |  floor(m1 / 100 * 10000 + 0.5) / 10000 AS mean_a,
      |  floor(m2 / 100 * 10000 + 0.5) / 10000 AS mean_b,
      |  floor((m1 - m2) / sqrt(se2) * 1000000 + 0.5) / 1000000 AS t_stat,
      |  floor(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
      |    + (v2 / n2) * (v2 / n2) / (n2 - 1)) * 1000000 + 0.5) / 1000000 AS df
      |FROM w""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("purchase", "click"))
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("ia"))
    val g = e.agg(
      sum("ia").as("n1"), sum(lit(1L) - col("ia")).as("n2"),
      sum(col("cents") * col("ia")).as("s1a"),
      sum(col("cents") * col("cents") * col("ia")).as("s2a"),
      sum(col("cents") * (lit(1L) - col("ia"))).as("s1b"),
      sum(col("cents") * col("cents") * (lit(1L) - col("ia"))).as("s2b"))
    val m = g.select(col("n1"), col("n2"),
      (col("s1a").cast("double") / col("n1")).as("m1"),
      (col("s1b").cast("double") / col("n2")).as("m2"),
      ((col("s2a").cast("double")
        - col("s1a").cast("double") * col("s1a").cast("double") / col("n1"))
        / (col("n1") - 1)).as("v1"),
      ((col("s2b").cast("double")
        - col("s1b").cast("double") * col("s1b").cast("double") / col("n2"))
        / (col("n2") - 1)).as("v2"))
    val w = m.withColumn("se2", col("v1") / col("n1") + col("v2") / col("n2"))
    w.select(col("n1"), col("n2"),
      (floor(col("m1") / 100 * 10000 + lit(0.5)) / 10000).as("mean_a"),
      (floor(col("m2") / 100 * 10000 + lit(0.5)) / 10000).as("mean_b"),
      (floor((col("m1") - col("m2")) / sqrt(col("se2")) * 1000000 + lit(0.5))
        / 1000000).as("t_stat"),
      (floor(col("se2") * col("se2")
        / ((col("v1") / col("n1")) * (col("v1") / col("n1")) / (col("n1") - 1)
          + (col("v2") / col("n2")) * (col("v2") / col("n2")) / (col("n2") - 1))
        * 1000000 + lit(0.5)) / 1000000).as("df"))
  }

  /** Benford's-law first-digit audit of order totals — the standard
    * fabricated-data / anomaly screen over a monetary column. Leading
    * digit extracted from the EXACT cents integer's decimal string (no
    * log10 near-boundary hazard), one 9-group aggregate (map-side
    * combined), 1-row total broadcast; expected shares ln(1+1/d)/ln 10
    * and χ² terms are fixed-form doubles over exact counts. Full scan
    * + 9-row shuffle at any scale. */
  val benfordLaw: Q = Q(
    "benford_law",
    """WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |c AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS n_d FROM o GROUP BY 1),
      |t AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM c)
      |SELECT digit, n_d,
      |  floor(CAST(n_d AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS share,
      |  floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000 + 0.5) / 1000000
      |    AS benford_share,
      |  floor((n_d - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
      |      * (n_d - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
      |      / (n * (ln(1.0 + 1.0 / digit) / ln(10.0))) * 10000 + 0.5) / 10000
      |    AS chi2_term
      |FROM c, t ORDER BY digit""".stripMargin) { (s, d) =>
    val c = Tables.orders(s, d)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_d"))
    val t = c.agg(sum("n_d").as("n"))
    val ep = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    val en = col("n") * ep
    c.crossJoin(broadcast(t)) // 1-row total
      .select(col("digit"), col("n_d"),
        (floor(col("n_d").cast("double") / col("n") * 1000000 + lit(0.5))
          / 1000000).as("share"),
        (floor(ep * 1000000 + lit(0.5)) / 1000000).as("benford_share"),
        (floor((col("n_d") - en) * (col("n_d") - en) / en * 10000 + lit(0.5))
          / 10000).as("chi2_term"))
      .orderBy("digit")
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between purchase and click
    * values — the non-parametric complement to welch_ttest (no
    * normality assumption; KS's sibling on ranks). Midranks over the
    * value-grouped counts come from the distributed PrefixScan (its
    * 4th consumer — never a partition-less window); doubling every
    * midrank keeps the tied-rank sum an EXACT integer, so U enters the
    * normal approximation exactly, with the standard tie-corrected
    * variance. Σt³ stays integer (a tie class of t rows contributes
    * t³ ≤ n³ only if everything ties — ANSI overflow would fail
    * loudly, and real value columns are spread). */
  val mannWhitney: Q = Q(
    "mann_whitney",
    """WITH e AS (SELECT value AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |      FROM e GROUP BY v),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2
      |      FROM c),
      |sc AS (SELECT v, ca, cb,
      |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
      |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb FROM c),
      |r AS (SELECT
      |    CAST(sum(ca * (2 * (cum_ca + cum_cb - ca - cb) + (ca + cb + 1)))
      |      AS BIGINT) AS r1x2,
      |    CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT)
      |      AS tie3
      |  FROM sc)
      |SELECT n1, n2,
      |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
      |  floor((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
      |      - CAST(n1 AS DOUBLE) * n2 / 2)
      |    / sqrt(CAST(n1 AS DOUBLE) * n2 / 12 * ((n1 + n2 + 1)
      |      - CAST(tie3 AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
      |    * 1000000 + 0.5) / 1000000 AS z
      |FROM r, n""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type").isin("purchase", "click"))
      .select(col("value").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("b"))
    val c = e.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      c, Seq(col("v")), Seq("ca", "cb"))
    val (n1, n2) = (totals(0), totals(1))
    val t = col("ca") + col("cb")
    val r = scanned.agg(
      sum(col("ca") * ((col("cum_ca") + col("cum_cb") - col("ca") - col("cb"))
        * 2 + (t + 1))).as("r1x2"),
      sum(t * t * t - t).as("tie3"))
    val u1d = (col("r1x2") - lit(n1 * (n1 + 1))).cast("double") / lit(2)
    val mu = lit(n1.toDouble) * lit(n2) / lit(2)
    val sig2 = lit(n1.toDouble) * lit(n2) / lit(12) * (lit(n1 + n2 + 1)
      - col("tie3").cast("double") / (lit((n1 + n2).toDouble) * lit(n1 + n2 - 1)))
    r.select(lit(n1).as("n1"), lit(n2).as("n2"), u1d.as("u1"),
      (floor((u1d - mu) / sqrt(sig2) * 1000000 + lit(0.5)) / 1000000).as("z"))
  }

  /** Gini coefficient of customer spend concentration — the inequality
    * audit behind mixture rebalancing ("is 1% of users 90% of
    * revenue?"). Per-customer totals are exact cents; the global
    * ascending rank comes from the distributed PrefixScan (5th
    * consumer — rank·spend products and all three Gini terms stay
    * EXACT BIGINTs, only the final ratio is a double division), so the
    * full-population sort survives 100 TB as a range shuffle. */
  val giniSpend: Q = Q(
    "gini_spend",
    """WITH cspend AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT cents,
      |    row_number() OVER (ORDER BY cents, o_custkey) AS rk FROM cspend),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT)
      |      AS tot, CAST(sum(rk * cents) AS BIGINT) AS rs FROM r)
      |SELECT n AS n_customers, tot AS total_cents,
      |  floor(CAST(2 * rs - (n + 1) * tot AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * tot) * 1000000 + 0.5) / 1000000 AS gini
      |FROM a""".stripMargin) { (s, d) =>
    val cspend = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
      .withColumn("one", lit(1L))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      cspend, Seq(col("cents"), col("o_custkey")), Seq("one", "cents"))
    val (n, tot) = (totals(0), totals(1))
    scanned.agg(sum(col("cum_one") * col("cents")).as("rs"))
      .select(lit(n).as("n_customers"), lit(tot).as("total_cents"),
        (floor((col("rs") * 2 - lit((n + 1) * tot)).cast("double")
          / (lit(n.toDouble) * lit(tot)) * 1000000 + lit(0.5)) / 1000000)
          .as("gini"))
  }

  /** Herfindahl–Hirschman concentration index of customer revenue per
    * nation — "is this market one whale or many small fish", the
    * per-segment counterpart to gini_spend's global curve. HHI =
    * Σ share² = Σcents² / (Σcents)², computed with the money
    * discipline: Σcents² accumulates in exact DECIMAL(38,0) (HUGEINT
    * in the oracle — cents² ≈ 6·10¹⁶ per customer would overflow a
    * BIGINT sum), so the only doubles are two final conversions of
    * identical exact integers. Two nested aggregates + one 25-group
    * output; scales as a plain two-phase aggregation. */
  val hhiConcentration: Q = Q(
    "hhi_concentration",
    """WITH cust AS (SELECT c.c_nationkey AS nk, o.o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |agg AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_customers,
      |    CAST(sum(cents) AS BIGINT) AS tot,
      |    sum(CAST(cents AS HUGEINT) * cents) AS s2
      |  FROM cust GROUP BY nk)
      |SELECT nk AS nationkey, n_customers, tot AS total_cents,
      |  floor(CAST(s2 AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) * 10000000
      |    + 0.5) / 10000000 AS hhi
      |FROM agg ORDER BY nationkey""".stripMargin) { (s, d) =>
    val cust = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"), col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c0"))
      .groupBy("nk", "o_custkey").agg(sum("c0").as("cents"))
    cust.groupBy("nk")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("tot"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("s2"))
      .select(col("nk").as("nationkey"), col("n_customers"),
        col("tot").as("total_cents"),
        (floor(col("s2").cast("double")
          / (col("tot").cast("double") * col("tot")) * 10000000 + lit(0.5))
          / 10000000).as("hhi"))
      .orderBy("nationkey")
  }

  /** Day-of-week seasonality profile of the event stream — the
    * seasonal index (per-weekday mean over the global mean) consulted
    * before any weekly-pattern correction. Two exact-integer count/sum
    * aggregates, a 1-row global broadcast, and the index is a ratio of
    * two single divisions of exact integers — fixed-form,
    * bit-identical. Weekday convention pinned to Spark's
    * dayofweek (1 = Sunday): the oracle emits dayofweek(ts) + 1. */
  val dowSeasonality: Q = Q(
    "dow_seasonality",
    """WITH e AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |c AS (SELECT dow, count(*) AS n_events,
      |    CAST(sum(cents) AS BIGINT) AS s FROM e GROUP BY dow),
      |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS n,
      |    CAST(sum(s) AS BIGINT) AS st FROM c)
      |SELECT dow, n_events,
      |  floor(CAST(s AS DOUBLE) / n_events / 100 * 10000 + 0.5) / 10000
      |    AS mean_value,
      |  floor((CAST(s AS DOUBLE) / n_events) / (CAST(st AS DOUBLE) / n)
      |    * 1000000 + 0.5) / 1000000 AS seasonal_idx
      |FROM c, t ORDER BY dow""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(dayofweek(col("ts")).as("dow"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val c = e.groupBy("dow").agg(count(lit(1)).as("n_events"),
      sum("cents").as("s"))
    val t = c.agg(sum("n_events").as("n"), sum("s").as("st"))
    c.crossJoin(broadcast(t)) // 1-row global totals
      .select(col("dow"), col("n_events"),
        (floor(col("s").cast("double") / col("n_events") / 100 * 10000
          + lit(0.5)) / 10000).as("mean_value"),
        (floor((col("s").cast("double") / col("n_events"))
          / (col("st").cast("double") / col("n")) * 1000000 + lit(0.5))
          / 1000000).as("seasonal_idx"))
      .orderBy("dow")
  }

  /** Per-group WEIGHTED median (price weighted by quantity) through
    * the distributed PrefixScan — the inventory-math quantile q52/q54
    * cannot express (every unit shipped counts, not every line). Rows
    * collapse to distinct (group, value) with summed weights FIRST, so
    * the scan order is fully deterministic (no intra-tie ambiguity);
    * one global range scan over the composite (group, value) key gives
    * contiguous per-group runs, group offsets come from a 3-row
    * driver-side collapse (bounded traffic), and the lower weighted
    * median is the first value whose doubled local cumulative weight
    * reaches the group total — an EXACT integer comparison. */
  val weightedMedian: Q = Q(
    "weighted_median",
    """WITH b AS (SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(floor(l_quantity) AS BIGINT) AS w FROM lineitem),
      |g AS (SELECT flag, cents, CAST(sum(w) AS BIGINT) AS w
      |      FROM b GROUP BY 1, 2),
      |sc AS (SELECT flag, cents, w,
      |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT)
      |      AS cw FROM g),
      |t AS (SELECT flag, CAST(sum(w) AS BIGINT) AS tw FROM g GROUP BY flag)
      |SELECT sc.flag, t.tw AS total_weight,
      |  CAST(min(CASE WHEN 2 * cw >= t.tw THEN cents END) AS DOUBLE) / 100
      |    AS weighted_median
      |FROM sc JOIN t ON t.flag = sc.flag
      |GROUP BY sc.flag, t.tw ORDER BY sc.flag""".stripMargin) { (s, d) =>
    val g = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"),
        floor(col("l_quantity")).cast("long").as("w0"))
      .groupBy("flag", "cents").agg(sum("w0").as("w"))
    val (scanned, _) = graft.ops.PrefixScan.withCumSums(
      g, Seq(col("flag"), col("cents")), Seq("w"))
    // per-group totals + exclusive offsets: 3 rows through the driver
    val tots = g.groupBy("flag").agg(sum("w").as("tw")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val offs = tots.scanLeft(("", 0L, 0L)) { case ((_, acc, _), (f, tw)) =>
      (f, acc + tw, acc)
    }.drop(1).map { case (f, _, off) => (f, off) }.toMap
    import s.implicits._
    val offDf = tots.map { case (f, tw) => (f, tw, offs(f)) }.toSeq
      .toDF("oflag", "tw", "off")
    scanned.join(broadcast(offDf), col("flag") === col("oflag"))
      .groupBy(col("flag"), col("tw").as("total_weight"))
      .agg((min(when((col("cum_w") - col("off")) * 2 >= col("tw"),
        col("cents"))).cast("double") / 100).as("weighted_median"))
      .orderBy("flag")
  }

  /** Spearman rank correlation between quantity and price — the
    * robust, monotonic-association complement to q80's Pearson matrix
    * (rank-space kills the outlier sensitivity). Tied values take
    * midranks; DOUBLING every midrank (mann_whitney's device) keeps
    * rank arithmetic integer, and the quadratic rank moments
    * accumulate in exact DECIMAL(38,0)/HUGEINT (Σ(2r)² ≈ 8·10¹⁷
    * already grazes BIGINT at sf0.1 — at 100 TB only a wide-decimal
    * sum survives). Midranks come from one PrefixScan per variable
    * over the value-grouped counts (consumers 8–9); ρ is one
    * fixed-form double expression. */
  val spearmanCorr: Q = Q(
    "spearman_corr",
    """WITH b AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |xc AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY x),
      |xr AS (SELECT x, 2 * (CAST(sum(c) OVER (ORDER BY x) AS BIGINT) - c)
      |    + (c + 1) AS rx2 FROM xc),
      |yc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY y),
      |yr AS (SELECT y, 2 * (CAST(sum(c) OVER (ORDER BY y) AS BIGINT) - c)
      |    + (c + 1) AS ry2 FROM yc),
      |j AS (SELECT rx2, ry2 FROM b JOIN xr USING (x) JOIN yr USING (y)),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(rx2) AS BIGINT) AS sx, CAST(sum(ry2) AS BIGINT) AS sy,
      |    sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
      |    sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
      |    sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy FROM j)
      |SELECT n,
      |  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * sx)
      |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * sy)) * 1000000 + 0.5) / 1000000
      |    AS spearman_rho
      |FROM m""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("x"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
    def ranks(v: String, out: String): DataFrame = {
      val c = b.groupBy(v).agg(count(lit(1)).as("c"))
      val (scanned, _) = graft.ops.PrefixScan.withCumSums(
        c, Seq(col(v)), Seq("c"))
      scanned.select(col(v),
        ((col("cum_c") - col("c")) * 2 + (col("c") + 1)).as(out))
    }
    val j = b.join(ranks("x", "rx2"), "x").join(ranks("y", "ry2"), "y")
    val m = j.agg(count(lit(1)).as("n"),
      sum("rx2").as("sx"), sum("ry2").as("sy"),
      sum(col("rx2").cast("decimal(38,0)") * col("rx2")).as("sxx"),
      sum(col("ry2").cast("decimal(38,0)") * col("ry2")).as("syy"),
      sum(col("rx2").cast("decimal(38,0)") * col("ry2")).as("sxy"))
    m.select(col("n"),
      (floor((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy"))
        / sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx"))
          * (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy")))
        * 1000000 + lit(0.5)) / 1000000).as("spearman_rho"))
  }

  /** Neyman optimal allocation of a 1000-row sampling budget across
    * event-type strata — n_h ∝ N_h·σ_h, the survey-sampling rule that
    * beats proportional allocation whenever stratum variances differ.
    * Stratum σ comes from exact BIGINT-cent moments; each N_h·σ_h term
    * floor-rounds to the 1e-6 grid BEFORE the 5-term total, so the sum
    * is a sum of exactly-representable grid points — order-independent
    * — and every allocation is a deterministic integer. */
  val neymanAllocation: Q = Q(
    "neyman_allocation",
    """WITH e AS (SELECT event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
      |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM e GROUP BY event_type),
      |t AS (SELECT event_type, nh,
      |    floor(nh * sqrt((CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nh) / (nh - 1))
      |      * 1000000 + 0.5) / 1000000 AS term
      |  FROM m),
      |tt AS (SELECT CAST(sum(term) AS DOUBLE) AS tot FROM t)
      |SELECT event_type, nh,
      |  floor(term / nh / 100 * 10000 + 0.5) / 10000 AS sigma,
      |  CAST(floor(1000 * term / tot + 0.5) AS BIGINT) AS alloc_n
      |FROM t, tt ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = ev(s, d).select(col("event_type"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    val m = e.groupBy("event_type").agg(count(lit(1)).as("nh"),
      sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
    val t = m.select(col("event_type"), col("nh"),
      (floor(col("nh") * sqrt((col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("nh"))
          / (col("nh") - 1)) * 1000000 + lit(0.5)) / 1000000).as("term"))
    val tt = t.agg(sum("term").cast("double").as("tot"))
    t.crossJoin(broadcast(tt)) // 1-row grid-exact total
      .select(col("event_type"), col("nh"),
        (floor(col("term") / col("nh") / 100 * 10000 + lit(0.5)) / 10000)
          .as("sigma"),
        floor(lit(1000) * col("term") / col("tot") + lit(0.5)).cast("long")
          .as("alloc_n"))
      .orderBy("event_type")
  }

  /** One-way ANOVA F-test of l_quantity across the three return-flag
    * groups — the k-group generalization of welch_ttest (does ANY group
    * mean differ?). Quantities are small integers, so every moment is
    * an exact BIGINT (s2 ≤ 2500·N) and s1² ≤ 2.3e15 < 2^53 stays an
    * exactly-representable double at sf0.1; each group's between-term
    * s1²/n floor-rounds to the 1e-6 grid BEFORE the 3-term sum (grid
    * points ≤ 5e8 are exact, so the sum is order-independent), making
    * F and η² deterministic fixed-form doubles. Past N ≈ 1e8 per group
    * the s1² product needs the DECIMAL(38,0) cross-multiplication
    * (spearman_corr's device). One 3-group map-side-partial collapse
    * is the only shuffle; everything after runs on a 3-row relation. */
  val anovaQuantity: Q = Q(
    "anova_quantity",
    """WITH b AS (SELECT l_returnflag AS f,
      |    CAST(floor(l_quantity) AS BIGINT) AS c FROM lineitem),
      |g AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM b GROUP BY f),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(s1) AS BIGINT) AS s1, CAST(sum(s2) AS BIGINT) AS s2,
      |    CAST(sum(floor(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n
      |      * 1000000 + 0.5) / 1000000) AS DOUBLE) AS tb
      |  FROM g)
      |SELECT n, k,
      |  floor((tb - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (k - 1)
      |    / ((CAST(s2 AS DOUBLE) - tb) / (n - k)) * 1000000 + 0.5) / 1000000
      |    AS f_stat,
      |  floor((tb - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
      |    / (CAST(s2 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
      |    * 1000000 + 0.5) / 1000000 AS eta_sq
      |FROM t""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(col("l_returnflag").as("f"),
      floor(col("l_quantity")).cast("long").as("c"))
    val g = b.groupBy("f").agg(count(lit(1)).as("n"),
      sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
    val t = g.agg(count(lit(1)).as("k"), sum("n").as("n"),
      sum("s1").as("s1"), sum("s2").as("s2"),
      sum(floor(col("s1").cast("double") * col("s1").cast("double")
        / col("n") * 1000000 + lit(0.5)) / 1000000).cast("double").as("tb"))
    val ssb = col("tb") -
      col("s1").cast("double") * col("s1").cast("double") / col("n")
    val sst = col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("n")
    t.select(col("n"), col("k"),
      (floor(ssb / (col("k") - 1)
        / ((col("s2").cast("double") - col("tb")) / (col("n") - col("k")))
        * 1000000 + lit(0.5)) / 1000000).as("f_stat"),
      (floor(ssb / sst * 1000000 + lit(0.5)) / 1000000).as("eta_sq"))
  }

  /** Cramér's V association between market segment and nation — the
    * categorical-categorical effect size q80's Pearson matrix cannot
    * express (chi² alone grows with N; V normalizes it to [0,1]).
    * Observed counts are exact BIGINTs; each of the ≤125 contingency
    * cells' (O−E)²/E term floor-rounds to the 1e-6 grid before the
    * cell sum, so χ² is an order-independent sum of exact grid points.
    * The contingency collapse is the one data-sized shuffle; row/col
    * marginals re-aggregate the ≤125-row cell relation and come back
    * as broadcasts, so the plan never rescans customers. */
  val cramersV: Q = Q(
    "cramers_v",
    """WITH o AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
      |    CAST(count(*) AS BIGINT) AS obs FROM customer GROUP BY 1, 2),
      |r AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY seg),
      |c AS (SELECT nat, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY nat),
      |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
      |    CAST(count(DISTINCT seg) AS BIGINT) AS nr,
      |    CAST(count(DISTINCT nat) AS BIGINT) AS nc FROM o),
      |x AS (SELECT CAST(sum(floor(
      |      (obs - CAST(rt AS DOUBLE) * ct / n)
      |        * (obs - CAST(rt AS DOUBLE) * ct / n)
      |        / (CAST(rt AS DOUBLE) * ct / n) * 1000000 + 0.5) / 1000000)
      |    AS DOUBLE) AS chi2
      |  FROM o JOIN r USING (seg) JOIN c USING (nat) CROSS JOIN t)
      |SELECT n, (nr - 1) * (nc - 1) AS dof,
      |  floor(chi2 * 10000 + 0.5) / 10000 AS chi2,
      |  floor(sqrt(chi2 / (n * least(nr - 1, nc - 1))) * 1000000 + 0.5)
      |    / 1000000 AS cramers_v
      |FROM x CROSS JOIN t""".stripMargin) { (s, d) =>
    val o = Tables.customer(s, d)
      .groupBy(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
      .agg(count(lit(1)).as("obs"))
    val r = o.groupBy("seg").agg(sum("obs").as("rt"))
    val c = o.groupBy("nat").agg(sum("obs").as("ct"))
    val t = o.agg(sum("obs").as("n"), countDistinct("seg").as("nr"),
      countDistinct("nat").as("nc"))
    val e = col("rt").cast("double") * col("ct") / col("n")
    val x = o.join(broadcast(r), "seg").join(broadcast(c), "nat")
      .crossJoin(broadcast(t)) // 1-row total
      .agg(sum(floor((col("obs") - e) * (col("obs") - e) / e
        * 1000000 + lit(0.5)) / 1000000).cast("double").as("chi2"))
    x.crossJoin(broadcast(t)) // 1-row total
      .select(col("n"), ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        (floor(col("chi2") * 10000 + lit(0.5)) / 10000).as("chi2"),
        (floor(sqrt(col("chi2") / (col("n") * least(col("nr") - 1,
          col("nc") - 1))) * 1000000 + lit(0.5)) / 1000000).as("cramers_v"))
  }

  /** Two-feature OLS (order total ~ line count + total quantity) via
    * the normal equations — the MULTIPLE-regression step up from
    * q82's single-feature REGR_* pass. One co-keyed join + one moment
    * scan produces the nine sufficient statistics (all exact BIGINTs
    * except Σy², which needs DECIMAL(38,0)/HUGEINT); the 3×3 Cramer
    * determinants and R² are then FIXED-FORM double expressions over
    * those exact moments — identical parenthesization both engines ⇒
    * bit-identical β̂. No driver hop, no second pass (SSE comes from
    * the normal-equation identity Σy² − β·[Sy,S1y,S2y]). At 100 TB
    * the join shuffle is the only data-sized stage. */
  val multiregNormal: Q = Q(
    "multireg_normal",
    """WITH po AS (SELECT o.o_orderkey,
      |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y,
      |    CAST(count(*) AS BIGINT) AS x1,
      |    CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS x2
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY o.o_orderkey, o.o_totalprice),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
      |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
      |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      |  FROM po),
      |b AS (SELECT n, sy, s1y, s2y, syy,
      |    CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s12)
      |      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s2)
      |      + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
      |        - CAST(s11 AS DOUBLE) * s2) AS dd,
      |    CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s12)
      |      - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s2y)
      |      + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12
      |        - CAST(s11 AS DOUBLE) * s2y) AS d0,
      |    CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s2y)
      |      - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
      |        - CAST(s12 AS DOUBLE) * s2)
      |      + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
      |        - CAST(s1y AS DOUBLE) * s2) AS d1,
      |    CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y
      |        - CAST(s1y AS DOUBLE) * s12)
      |      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
      |        - CAST(s1y AS DOUBLE) * s2)
      |      + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
      |        - CAST(s11 AS DOUBLE) * s2) AS d2
      |  FROM m)
      |SELECT n,
      |  floor(d0 / dd / 100 * 10000 + 0.5) / 10000 AS beta0,
      |  floor(d1 / dd / 100 * 10000 + 0.5) / 10000 AS beta1,
      |  floor(d2 / dd / 100 * 10000 + 0.5) / 10000 AS beta2,
      |  floor((1 - (syy - d0 / dd * sy - d1 / dd * s1y - d2 / dd * s2y)
      |    / (syy - CAST(sy AS DOUBLE) * sy / n)) * 1000000 + 0.5) / 1000000
      |    AS r_sq
      |FROM b""".stripMargin) { (s, d) =>
    val po = Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("y"))
      .agg(count(lit(1)).as("x1"),
        sum(floor(col("l_quantity")).cast("long")).as("x2"))
    val m = po.agg(count(lit(1)).as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y").cast("decimal(38,0)") * col("y")).cast("double").as("syy"))
    def dbl(c: String): Column = col(c).cast("double")
    val dd = dbl("n") * (dbl("s11") * col("s22") - dbl("s12") * col("s12")) -
      dbl("s1") * (dbl("s1") * col("s22") - dbl("s12") * col("s2")) +
      dbl("s2") * (dbl("s1") * col("s12") - dbl("s11") * col("s2"))
    val d0 = dbl("sy") * (dbl("s11") * col("s22") - dbl("s12") * col("s12")) -
      dbl("s1") * (dbl("s1y") * col("s22") - dbl("s12") * col("s2y")) +
      dbl("s2") * (dbl("s1y") * col("s12") - dbl("s11") * col("s2y"))
    val d1 = dbl("n") * (dbl("s1y") * col("s22") - dbl("s12") * col("s2y")) -
      dbl("sy") * (dbl("s1") * col("s22") - dbl("s12") * col("s2")) +
      dbl("s2") * (dbl("s1") * col("s2y") - dbl("s1y") * col("s2"))
    val d2 = dbl("n") * (dbl("s11") * col("s2y") - dbl("s1y") * col("s12")) -
      dbl("s1") * (dbl("s1") * col("s2y") - dbl("s1y") * col("s2")) +
      dbl("sy") * (dbl("s1") * col("s12") - dbl("s11") * col("s2"))
    m.select(col("n"),
      (floor(d0 / dd / 100 * 10000 + lit(0.5)) / 10000).as("beta0"),
      (floor(d1 / dd / 100 * 10000 + lit(0.5)) / 10000).as("beta1"),
      (floor(d2 / dd / 100 * 10000 + lit(0.5)) / 10000).as("beta2"),
      (floor((lit(1) - (col("syy") - d0 / dd * col("sy")
          - d1 / dd * col("s1y") - d2 / dd * col("s2y"))
        / (col("syy") - dbl("sy") * col("sy") / col("n")))
        * 1000000 + lit(0.5)) / 1000000).as("r_sq"))
  }

  /** Poisson bootstrap 80% CI for the mean event value (Chamandy et
    * al. 2012 — THE bootstrap formulation that works on a stream:
    * resampling-with-replacement is infeasible when rows live on 1000
    * executors, but Poisson(1) multiplicities are independent per row,
    * so all 32 replicates ride ONE map pass). Multiplicities come from
    * a portable multiplicative hash of event_id against the exact
    * integer-scaled Poisson(1) CDF (every compare exact; products
    * < 2^53); each replicate's (Σm·x, Σm) is an exact BIGINT pair and
    * its mean ONE division, so the 32 means are bit-identical
    * cross-engine and the CI bounds are PICKED order statistics
    * (4th/29th), not interpolations. Shuffle state: 32 counters. */
  val poissonBootstrap: Q = Q(
    "poisson_bootstrap",
    """WITH x AS (SELECT event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
      |r AS (SELECT t.b, c,
      |    (event_id * 2654435761 + t.b * 2246822519) % 1000003 AS u
      |  FROM x, range(0, 32) t(b)),
      |m AS (SELECT b, c,
      |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
      |         WHEN u < 919699 THEN 2 WHEN u < 980985 THEN 3
      |         WHEN u < 996341 THEN 4 ELSE 5 END AS mult FROM r),
      |rep AS (SELECT b, CAST(sum(mult * c) AS BIGINT) AS s,
      |        CAST(sum(mult) AS BIGINT) AS k FROM m GROUP BY b),
      |means AS (SELECT CAST(s AS DOUBLE) / k / 100 AS mu FROM rep),
      |ci AS (SELECT list(mu ORDER BY mu)[4] AS lo,
      |       list(mu ORDER BY mu)[29] AS hi FROM means),
      |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(c) AS DOUBLE) / count(*) / 100 AS mean FROM x)
      |SELECT n_events,
      |  floor(mean * 10000 + 0.5) / 10000 AS mean,
      |  floor(lo * 10000 + 0.5) / 10000 AS ci_lo,
      |  floor(hi * 10000 + 0.5) / 10000 AS ci_hi
      |FROM pt CROSS JOIN ci""".stripMargin) { (s, d) =>
    val x = ev(s, d).select(col("event_id"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    val r = x.select(col("c"),
      posexplode(array((0 until 32).map(b =>
        (col("event_id") * 2654435761L + b.toLong * 2246822519L)
          % 1000003): _*)).as(Seq("b", "u")))
    val m = r.select(col("b"), col("c"),
      when(col("u") < 367879, 0).when(col("u") < 735759, 1)
        .when(col("u") < 919699, 2).when(col("u") < 980985, 3)
        .when(col("u") < 996341, 4).otherwise(5).as("mult"))
    val rep = m.groupBy("b").agg(sum(col("mult") * col("c")).as("s"),
      sum("mult").as("k"))
    val means = rep.select((col("s").cast("double") / col("k") / 100)
      .as("mu"))
    val ci = means.agg(sort_array(collect_list("mu")).as("ms"))
      .select(element_at(col("ms"), 4).as("lo"),
        element_at(col("ms"), 29).as("hi"))
    val pt = x.agg(count(lit(1)).as("n_events"),
      (sum("c").cast("double") / count(lit(1)) / 100).as("mean"))
    pt.crossJoin(ci) // 1-row x 1-row report join
      .select(col("n_events"),
        (floor(col("mean") * 10000 + lit(0.5)) / 10000).as("mean"),
        (floor(col("lo") * 10000 + lit(0.5)) / 10000).as("ci_lo"),
        (floor(col("hi") * 10000 + lit(0.5)) / 10000).as("ci_hi"))
  }

  /** Lorenz curve deciles of customer spend — the CURVE behind
    * gini_spend's single coefficient (which decile of customers holds
    * what share of revenue): cumulative spend at each decile boundary
    * of the spend-ascending customer ordering. Ranks and cumulative
    * cents come from ONE PrefixScan over (cents, custkey) — customer
    * keys break ties, so every rank is unique and each boundary row is
    * a PICKED element; shares are single divisions of exact BIGINTs.
    * The decile boundary ranks ⌊k·C/10⌋ derive from PrefixScan's
    * grand totals (one bounded driver hop). */
  val lorenzDeciles: Q = Q(
    "lorenz_deciles",
    """WITH sp AS (SELECT c_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey),
      |r AS (SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents, c_custkey) AS BIGINT)
      |      AS rk,
      |    CAST(sum(cents) OVER (ORDER BY cents, c_custkey) AS BIGINT)
      |      AS cum
      |  FROM sp),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS c,
      |        CAST(sum(cents) AS BIGINT) AS t FROM sp),
      |b AS (SELECT CAST(t.k AS INTEGER) AS decile, (c * t.k) // 10 AS brk
      |      FROM tot, range(1, 11) t(k))
      |SELECT decile, brk AS n_customers,
      |  floor(CAST(cum AS DOUBLE) / t * 1000000 + 0.5) / 1000000
      |    AS cum_share
      |FROM b JOIN r ON r.rk = b.brk CROSS JOIN tot
      |ORDER BY decile""".stripMargin) { (s, d) =>
    val sp = Tables.customer(s, d).join(Tables.orders(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
      .select(col("c_custkey"), col("cents"), lit(1L).as("one"))
    val (scanned, tots) = graft.ops.PrefixScan.withCumSums(
      sp, Seq(col("cents"), col("c_custkey")), Seq("cents", "one"))
    val (t, c) = (tots(0), tots(1))
    val bounds = (1 to 10).map(k => c * k / 10)
    import s.implicits._
    val b = (1 to 10).map(k => (k, c * k / 10))
      .toDF("decile", "brk")
    scanned.filter(col("cum_one").isin(bounds: _*))
      .join(broadcast(b), col("cum_one") === col("brk"))
      .select(col("decile"), col("brk").as("n_customers"),
        (floor(col("cum_cents").cast("double") / t * 1000000 + lit(0.5))
          / 1000000).as("cum_share"))
      .orderBy("decile")
  }

  /** RFM segmentation — the classic customer-value grid: quintile each
    * of Recency (last order date), Frequency (order count), Monetary
    * (total cents) and report the biggest R·100+F·10+M segments. All
    * three quintile passes run through graft.ops.DistributedNtile
    * (range-shuffled global rank + SQL-standard bucket formula — q23's
    * operator, so the partition-less `ntile OVER ()` scale-killer
    * never appears); (value, custkey) total orders make every bucket
    * deterministic. Segment stats are exact-integer counts + one
    * division. */
  val rfmSegments: Q = Q(
    "rfm_segments",
    """WITH rfm AS (SELECT c_custkey, max(o_orderdate) AS last_ts,
      |    CAST(count(*) AS BIGINT) AS f,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS m
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey),
      |q AS (SELECT c_custkey, m,
      |    CAST(ntile(5) OVER (ORDER BY last_ts, c_custkey) AS INTEGER)
      |      AS r_q,
      |    CAST(ntile(5) OVER (ORDER BY f, c_custkey) AS INTEGER) AS f_q,
      |    CAST(ntile(5) OVER (ORDER BY m, c_custkey) AS INTEGER) AS m_q
      |  FROM rfm)
      |SELECT r_q * 100 + f_q * 10 + m_q AS segment,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  floor(CAST(sum(m) AS DOUBLE) / count(*) / 100 * 100 + 0.5) / 100
      |    AS avg_spend
      |FROM q GROUP BY 1
      |ORDER BY n_customers DESC, segment LIMIT 15""".stripMargin) { (s, d) =>
    val rfm = Tables.customer(s, d).join(Tables.orders(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(max("o_orderdate").as("last_ts"), count(lit(1)).as("f"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("m"))
    val d1 = graft.ops.DistributedNtile.ntile(rfm,
        Seq(col("last_ts"), col("c_custkey")), 5)
      .withColumnRenamed("bucket", "r_q")
    val d2 = graft.ops.DistributedNtile.ntile(d1,
        Seq(col("f"), col("c_custkey")), 5)
      .withColumnRenamed("bucket", "f_q")
    val d3 = graft.ops.DistributedNtile.ntile(d2,
        Seq(col("m"), col("c_custkey")), 5)
      .withColumnRenamed("bucket", "m_q")
    d3.groupBy((col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
        .as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        (floor(sum("m").cast("double") / count(lit(1)) / 100 * 100
          + lit(0.5)) / 100).as("avg_spend"))
      .orderBy(col("n_customers").desc, col("segment")).limit(15)
  }

  /** ABC inventory classification — Pareto classes over part revenue
    * (A: parts whose PRECEDING cumulative share is under 80%, B under
    * 95%, C the tail): the revenue-descending cumulative rides ONE
    * PrefixScan (sort key = negated cents + partkey tie-break — same
    * total order as `ORDER BY cents DESC`), and each class test is an
    * exact integer cross-multiplication ((cum−rev)·5 < total·4), no
    * share division until the report row. At ~10⁴× this revenue the
    * ×20 products need DECIMAL compares (doc'd). */
  val abcClass: Q = Q(
    "abc_class",
    """WITH rev AS (SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem GROUP BY l_partkey),
      |cum AS (SELECT l_partkey, cents,
      |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey)
      |      AS BIGINT) AS cum
      |  FROM rev),
      |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
      |cls AS (SELECT cents,
      |    CASE WHEN (cum - cents) * 5 < t * 4 THEN 'A'
      |         WHEN (cum - cents) * 20 < t * 19 THEN 'B'
      |         ELSE 'C' END AS abc
      |  FROM cum CROSS JOIN tot)
      |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
      |  floor(CAST(sum(cents) AS DOUBLE) / (SELECT t FROM tot)
      |    * 1000000 + 0.5) / 1000000 AS rev_share
      |FROM cls GROUP BY abc ORDER BY abc""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
      .select(col("l_partkey"), col("cents"), (-col("cents")).as("negc"))
    val (cum, tots) = graft.ops.PrefixScan.withCumSums(
      rev, Seq(col("negc"), col("l_partkey")), Seq("cents"))
    val t = tots(0)
    cum.select(col("cents"),
        when((col("cum_cents") - col("cents")) * 5 < t * 4L, "A")
          .when((col("cum_cents") - col("cents")) * 20 < t * 19L, "B")
          .otherwise("C").as("abc"))
      .groupBy("abc")
      .agg(count(lit(1)).as("n_parts"),
        (floor(sum("cents").cast("double") / t * 1000000 + lit(0.5))
          / 1000000).as("rev_share"))
      .orderBy("abc")
  }

  /** Difference-in-differences estimate over the events stream: a
    * deterministic hash of user_id assigns treatment, the calendar
    * midpoint splits pre/post, and the 2×2 cell means come from ONE
    * conditional-moment scan (welch_ttest's device — exact BIGINT-cent
    * sums, four final divisions). DiD = (T̄post − T̄pre) − (C̄post −
    * C̄pre), a fixed-form combination of the four identical-integer
    * means. The canonical quasi-experimental readout when assignment
    * isn't randomized; scales as a full scan + 1-row aggregate. */
  val didEstimate: Q = Q(
    "did_estimate",
    """WITH e AS (SELECT
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |    CASE WHEN ((user_id & 2147483647) * 2654435761) % 100 < 50
      |         THEN 1 ELSE 0 END AS tr,
      |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
      |      AS post
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (SELECT
      |    CAST(sum(tr * post) AS BIGINT) AS n_tp,
      |    CAST(sum(tr * (1 - post)) AS BIGINT) AS n_ta,
      |    CAST(sum((1 - tr) * post) AS BIGINT) AS n_cp,
      |    CAST(sum((1 - tr) * (1 - post)) AS BIGINT) AS n_ca,
      |    CAST(sum(cents * tr * post) AS BIGINT) AS s_tp,
      |    CAST(sum(cents * tr * (1 - post)) AS BIGINT) AS s_ta,
      |    CAST(sum(cents * (1 - tr) * post) AS BIGINT) AS s_cp,
      |    CAST(sum(cents * (1 - tr) * (1 - post)) AS BIGINT) AS s_ca
      |  FROM e),
      |m AS (SELECT n_tp, n_ta, n_cp, n_ca,
      |    CAST(s_tp AS DOUBLE) / n_tp / 100 AS m_tp,
      |    CAST(s_ta AS DOUBLE) / n_ta / 100 AS m_ta,
      |    CAST(s_cp AS DOUBLE) / n_cp / 100 AS m_cp,
      |    CAST(s_ca AS DOUBLE) / n_ca / 100 AS m_ca
      |  FROM g)
      |SELECT n_tp, n_ta, n_cp, n_ca,
      |  floor(m_tp * 10000 + 0.5) / 10000 AS mean_treat_post,
      |  floor(m_ta * 10000 + 0.5) / 10000 AS mean_treat_pre,
      |  floor(m_cp * 10000 + 0.5) / 10000 AS mean_ctrl_post,
      |  floor(m_ca * 10000 + 0.5) / 10000 AS mean_ctrl_pre,
      |  floor(((m_tp - m_ta) - (m_cp - m_ca)) * 1000000 + 0.5) / 1000000
      |    AS did
      |FROM m""".stripMargin) { (s, d) =>
    val tr = when(
      (col("user_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % 100
        < 50, 1L).otherwise(0L)
    val post = when(
      col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"), 1L)
      .otherwise(0L)
    val e = ev(s, d).filter(col("event_type") === "purchase")
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        tr.as("tr"), post.as("post"))
    val g = e.agg(
      sum(col("tr") * col("post")).as("n_tp"),
      sum(col("tr") * (lit(1L) - col("post"))).as("n_ta"),
      sum((lit(1L) - col("tr")) * col("post")).as("n_cp"),
      sum((lit(1L) - col("tr")) * (lit(1L) - col("post"))).as("n_ca"),
      sum(col("cents") * col("tr") * col("post")).as("s_tp"),
      sum(col("cents") * col("tr") * (lit(1L) - col("post"))).as("s_ta"),
      sum(col("cents") * (lit(1L) - col("tr")) * col("post")).as("s_cp"),
      sum(col("cents") * (lit(1L) - col("tr")) * (lit(1L) - col("post")))
        .as("s_ca"))
    val m = g.select(col("n_tp"), col("n_ta"), col("n_cp"), col("n_ca"),
      (col("s_tp").cast("double") / col("n_tp") / 100).as("m_tp"),
      (col("s_ta").cast("double") / col("n_ta") / 100).as("m_ta"),
      (col("s_cp").cast("double") / col("n_cp") / 100).as("m_cp"),
      (col("s_ca").cast("double") / col("n_ca") / 100).as("m_ca"))
    m.select(col("n_tp"), col("n_ta"), col("n_cp"), col("n_ca"),
      (floor(col("m_tp") * 10000 + lit(0.5)) / 10000).as("mean_treat_post"),
      (floor(col("m_ta") * 10000 + lit(0.5)) / 10000).as("mean_treat_pre"),
      (floor(col("m_cp") * 10000 + lit(0.5)) / 10000).as("mean_ctrl_post"),
      (floor(col("m_ca") * 10000 + lit(0.5)) / 10000).as("mean_ctrl_pre"),
      (floor(((col("m_tp") - col("m_ta")) - (col("m_cp") - col("m_ca")))
        * 1000000 + lit(0.5)) / 1000000).as("did"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — the production A/B
    * trick: regress each user's post-period metric on their pre-period
    * covariate, θ = cov(X,Y)/var(X), and report how much metric
    * variance the adjustment removes (= ρ², the test-sensitivity win).
    * Per-user pre/post cent totals come from ONE conditional aggregate;
    * the five cross-moments are exact BIGINTs (cents² sums — the
    * hhi/welch overflow class, DECIMAL at true 100 TB scale) and θ,
    * var(Y), var(Y−θX) are fixed-form doubles over identical integers.
    * Scales as: scan → per-user aggregate → 1-row moment fold. */
  val cupedAdjust: Q = Q(
    "cuped_adjust",
    """WITH u AS (SELECT user_id,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
      |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
      |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM u),
      |m AS (SELECT n,
      |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n AS cov,
      |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n AS vx,
      |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n AS vy
      |  FROM g)
      |SELECT n AS n_users,
      |  floor(cov / vx * 1000000 + 0.5) / 1000000 AS theta,
      |  floor(vy / 10000 * 100 + 0.5) / 100 AS var_y,
      |  floor((vy - cov * cov / vx) / 10000 * 100 + 0.5) / 100 AS var_adj,
      |  floor(cov * cov / (vx * vy) * 1000000 + 0.5) / 1000000
      |    AS var_reduction
      |FROM m""".stripMargin) { (s, d) =>
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val pre = col("ts") < lit("2024-01-16 00:00:00").cast("timestamp")
    val u = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(when(pre, cents).otherwise(0L)).as("x"),
        sum(when(!pre, cents).otherwise(0L)).as("y"))
    val g = u.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val m = g.select(col("n"),
      ((col("sxy").cast("double") - col("sx").cast("double") * col("sy")
        / col("n")) / col("n")).as("cov"),
      ((col("sxx").cast("double") - col("sx").cast("double") * col("sx")
        / col("n")) / col("n")).as("vx"),
      ((col("syy").cast("double") - col("sy").cast("double") * col("sy")
        / col("n")) / col("n")).as("vy"))
    m.select(col("n").as("n_users"),
      (floor(col("cov") / col("vx") * 1000000 + lit(0.5)) / 1000000)
        .as("theta"),
      (floor(col("vy") / 10000 * 100 + lit(0.5)) / 100).as("var_y"),
      (floor((col("vy") - col("cov") * col("cov") / col("vx"))
        / 10000 * 100 + lit(0.5)) / 100).as("var_adj"),
      (floor(col("cov") * col("cov") / (col("vx") * col("vy"))
        * 1000000 + lit(0.5)) / 1000000).as("var_reduction"))
  }

  /** Two-proportion z-test of per-user conversion between the hash-
    * assigned experiment arms — the A/B readout for RATES, completing
    * the testing family beside welch_ttest (means), mann_whitney
    * (distributions), did/cuped (adjustments) and ab_srm_check (split
    * health). Conversion = "user has ≥1 high-value purchase (≥$150 —
    * a bare purchase is near-universal on this fixture and would
    * collapse the pooled variance)"; one per-user
    * aggregate then ONE conditional 1-row fold gives (n, x) per arm;
    * p̂-pooled z is a fixed-form combination of four exact integers.
    * Scan → user aggregate → 1-row report at any scale. */
  val propZtest: Q = Q(
    "prop_ztest",
    """WITH u AS (SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 150
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |arms AS (SELECT conv,
      |    CASE WHEN ((user_id & 2147483647) * 2654435761) % 100 < 50
      |         THEN 1 ELSE 0 END AS tr FROM u),
      |g AS (SELECT CAST(sum(tr) AS BIGINT) AS n1,
      |    CAST(sum(tr * conv) AS BIGINT) AS x1,
      |    CAST(sum(1 - tr) AS BIGINT) AS n2,
      |    CAST(sum((1 - tr) * conv) AS BIGINT) AS x2 FROM arms),
      |m AS (SELECT n1, x1, n2, x2,
      |    CAST(x1 AS DOUBLE) / n1 AS p1, CAST(x2 AS DOUBLE) / n2 AS p2,
      |    CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS pp FROM g)
      |SELECT n1, x1, n2, x2,
      |  floor(p1 * 1000000 + 0.5) / 1000000 AS p_treat,
      |  floor(p2 * 1000000 + 0.5) / 1000000 AS p_ctrl,
      |  floor((p1 - p2) / sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
      |    * 1000000 + 0.5) / 1000000 AS z
      |FROM m""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150,
        1L).otherwise(0L)).as("conv"))
    val tr = when(
      (col("user_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % 100
        < 50, 1L).otherwise(0L)
    val g = u.select(col("conv"), tr.as("tr")).agg(
      sum("tr").as("n1"), sum(col("tr") * col("conv")).as("x1"),
      sum(lit(1L) - col("tr")).as("n2"),
      sum((lit(1L) - col("tr")) * col("conv")).as("x2"))
    val m = g.select(col("n1"), col("x1"), col("n2"), col("x2"),
      (col("x1").cast("double") / col("n1")).as("p1"),
      (col("x2").cast("double") / col("n2")).as("p2"),
      ((col("x1") + col("x2")).cast("double") / (col("n1") + col("n2")))
        .as("pp"))
    m.select(col("n1"), col("x1"), col("n2"), col("x2"),
      (floor(col("p1") * 1000000 + lit(0.5)) / 1000000).as("p_treat"),
      (floor(col("p2") * 1000000 + lit(0.5)) / 1000000).as("p_ctrl"),
      (floor((col("p1") - col("p2"))
        / sqrt(col("pp") * (lit(1) - col("pp"))
          * (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
        * 1000000 + lit(0.5)) / 1000000).as("z"))
  }

  /** A/B power analysis: the minimum detectable effect (MDE) of the
    * conversion experiment at α=0.05 two-sided / 80% power, the number
    * every experiment review asks for BEFORE the test ships. Uses
    * prop_ztest's arms and conversion; MDE = (z_{α/2}+z_β)·SE with the
    * standard normal quantiles as exact literals (1.959964, 0.841621)
    * and SE = √(p̂(1−p̂)(1/n₁+1/n₂)) a fixed-form combination of four
    * exact integers. Relative MDE divides by the pooled rate. One
    * per-user aggregate + a 1-row report at any scale. */
  val abPowerMde: Q = Q(
    "ab_power_mde",
    """WITH u AS (SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 150
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |arms AS (SELECT conv,
      |    CASE WHEN ((user_id & 2147483647) * 2654435761) % 100 < 50
      |         THEN 1 ELSE 0 END AS tr FROM u),
      |g AS (SELECT CAST(sum(tr) AS BIGINT) AS n1,
      |    CAST(sum(1 - tr) AS BIGINT) AS n2,
      |    CAST(sum(conv) AS BIGINT) AS x FROM arms),
      |m AS (SELECT n1, n2, CAST(x AS DOUBLE) / (n1 + n2) AS pp FROM g),
      |e AS (SELECT n1, n2, pp,
      |    sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2)) AS se FROM m)
      |SELECT n1, n2,
      |  floor(pp * 1000000 + 0.5) / 1000000 AS pooled_rate,
      |  floor(se * 1000000 + 0.5) / 1000000 AS std_err,
      |  floor((1.959964 + 0.841621) * se * 1000000 + 0.5) / 1000000
      |    AS mde_abs,
      |  floor((1.959964 + 0.841621) * se / pp * 1000000 + 0.5) / 1000000
      |    AS mde_rel
      |FROM e""".stripMargin) { (s, d) =>
    val u = ev(s, d).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150,
        1L).otherwise(0L)).as("conv"))
    val tr = when(
      (col("user_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % 100
        < 50, 1L).otherwise(0L)
    val g = u.select(col("conv"), tr.as("tr")).agg(
      sum("tr").as("n1"), sum(lit(1L) - col("tr")).as("n2"),
      sum("conv").as("x"))
    val m = g.select(col("n1"), col("n2"),
      (col("x").cast("double") / (col("n1") + col("n2"))).as("pp"))
    val e = m.withColumn("se",
      sqrt(col("pp") * (lit(1) - col("pp"))
        * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))))
    e.select(col("n1"), col("n2"),
      (floor(col("pp") * 1000000 + lit(0.5)) / 1000000).as("pooled_rate"),
      (floor(col("se") * 1000000 + lit(0.5)) / 1000000).as("std_err"),
      (floor((lit(1.959964) + 0.841621) * col("se") * 1000000 + lit(0.5))
        / 1000000).as("mde_abs"),
      (floor((lit(1.959964) + 0.841621) * col("se") / col("pp") * 1000000
        + lit(0.5)) / 1000000).as("mde_rel"))
  }

  /** Benjamini–Hochberg FDR screening over 25 per-brand independence
    * tests (is a brand's return-flag mix different from the global
    * one?) — the multiple-testing correction any per-segment anomaly
    * scan needs before alerting on 10,000 segments. Each brand's χ²
    * (2 dof) is built from EXACT integer cells as Σ (o·N − n_b·g)² /
    * (n_b·g·N); with 2 dof the p-value is exp(−χ²/2), so the BH
    * step-up condition p_(k) ≤ αk/m is evaluated on the χ² scale as
    * χ²_(k) ≥ −2·ln(αk/m) — `ln` of identical exact rationals on both
    * engines, never `exp`. Scale: one brand-keyed count pass; the
    * step-up runs on the bounded 25-row test table collapsed to a
    * single sorted array (no partition-less window). α = 0.1. */
  val bhFdr: Q = Q(
    "bh_fdr",
    """WITH l AS (SELECT p.p_brand AS brand, li.l_returnflag AS flag
      |  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey),
      |cells AS (SELECT brand, flag, CAST(count(*) AS BIGINT) AS o
      |          FROM l GROUP BY 1, 2),
      |gf AS (SELECT flag, CAST(count(*) AS BIGINT) AS g FROM l GROUP BY 1),
      |bt AS (SELECT brand, CAST(count(*) AS BIGINT) AS nb FROM l GROUP BY 1),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn FROM gf),
      |terms AS (SELECT bt.brand, gf.flag,
      |    CAST(COALESCE(c.o, 0) * nn - bt.nb * gf.g AS DOUBLE)
      |      * CAST(COALESCE(c.o, 0) * nn - bt.nb * gf.g AS DOUBLE)
      |      / CAST(bt.nb * gf.g * nn AS DOUBLE) AS term
      |  FROM bt CROSS JOIN gf CROSS JOIN tot
      |  LEFT JOIN cells c ON c.brand = bt.brand AND c.flag = gf.flag),
      |chis AS (SELECT brand,
      |    list_aggregate(list(term ORDER BY flag), 'sum') AS chi2
      |  FROM terms GROUP BY brand),
      |ranked AS (SELECT brand, chi2,
      |    CAST(row_number() OVER (ORDER BY chi2 DESC, brand) AS BIGINT)
      |      AS rank,
      |    CAST(count(*) OVER () AS BIGINT) AS m FROM chis),
      |ks AS (SELECT max(CASE WHEN chi2 >= -2.0 * ln(0.1 * rank / m)
      |    THEN rank ELSE 0 END) AS kstar FROM ranked)
      |SELECT brand, floor(chi2 * 1000000 + 0.5) / 1000000 AS chi2, rank,
      |  floor(-2.0 * ln(0.1 * rank / m) * 1000000 + 0.5) / 1000000
      |    AS bh_thresh,
      |  rank <= kstar AS discovery
      |FROM ranked CROSS JOIN ks ORDER BY rank""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_returnflag").as("flag"))
    val cells = l.groupBy("brand", "flag").agg(count(lit(1)).as("o"))
    val gf = l.groupBy("flag").agg(count(lit(1)).as("g"))
    val bt = l.groupBy("brand").agg(count(lit(1)).as("nb"))
    val tot = gf.agg(sum("g").as("nn"))
    val terms = bt.crossJoin(broadcast(gf)) // 3-flag domain grid
      .crossJoin(broadcast(tot))            // 1-row corpus total
      .join(cells, Seq("brand", "flag"), "left")
      .select(col("brand"), col("flag"),
        ((coalesce(col("o"), lit(0L)) * col("nn") - col("nb") * col("g"))
          .cast("double")
          * (coalesce(col("o"), lit(0L)) * col("nn") - col("nb") * col("g"))
            .cast("double")
          / (col("nb") * col("g") * col("nn")).cast("double")).as("term"))
    terms.groupBy("brand")
      .agg(expr("aggregate(transform(array_sort(collect_list(" +
        "struct(flag, term))), t -> t.term), 0D, (a, x) -> a + x)")
        .as("chi2"))
      .agg(expr("array_sort(collect_list(struct(-chi2 AS nc, brand)))")
        .as("sorted"))
      .withColumn("m", expr("size(sorted)"))
      .withColumn("kstar", expr("aggregate(sequence(1, m), 0, (acc, k) -> " +
        "IF(-sorted[k-1].nc >= -2.0D * ln(0.1D * k / m), k, acc))"))
      .select(col("m"), col("kstar"), posexplode(col("sorted")).as(Seq("k0", "t")))
      .select(col("t.brand").as("brand"),
        (floor(-col("t.nc") * 1000000 + lit(0.5)) / 1000000).as("chi2"),
        (col("k0") + 1).cast("long").as("rank"),
        (floor(lit(-2.0) * log(lit(0.1) * (col("k0") + 1) / col("m"))
          * 1000000 + lit(0.5)) / 1000000).as("bh_thresh"),
        ((col("k0") + 1) <= col("kstar")).as("discovery"))
      .orderBy("rank")
  }

  /** Matched-pairs treatment-effect estimate (1-NN covariate matching
    * — the propensity-matching shape): BUILDING-segment customers are
    * "treated", each matched to its nearest non-BUILDING control by
    * account balance, and ATT = mean(treated spend − matched control
    * spend). Matching is the SCALABLE banded 1-NN: controls fan out
    * to ±1 balance bands (a bounded ×3 explode), the candidate join
    * is a plain band equi-join (any control within one band width is
    * guaranteed a candidate; farther-only treated stay unmatched and
    * are counted), and the winner is a treated-partitioned window
    * with a deterministic (|Δ|, control-key) order. All money in
    * exact cents; the two final divisions are single double ops. */
  val psMatch: Q = Q(
    "ps_match",
    """WITH spend AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |cs AS (SELECT c_custkey AS ck, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS score,
      |    COALESCE(sp.cents, 0) AS outcome
      |  FROM customer LEFT JOIN spend sp ON sp.o_custkey = c_custkey),
      |t AS (SELECT ck, score, outcome,
      |    CAST(floor(score / 2000.0) AS BIGINT) AS b
      |  FROM cs WHERE seg = 'BUILDING'),
      |c0 AS (SELECT ck AS cck, score AS cscore, outcome AS cout,
      |    CAST(floor(score / 2000.0) AS BIGINT) AS b0
      |  FROM cs WHERE seg <> 'BUILDING'),
      |c1 AS (SELECT cck, cscore, cout, b0 + o AS b
      |  FROM c0 CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o)),
      |best AS (SELECT t.ck AS mck, c1.cout,
      |    abs(t.score - c1.cscore) AS adiff,
      |    row_number() OVER (PARTITION BY t.ck
      |      ORDER BY abs(t.score - c1.cscore), c1.cck) AS rn
      |  FROM t JOIN c1 ON c1.b = t.b)
      |SELECT CAST(count(*) AS BIGINT) AS n_treated,
      |  CAST(count(m.mck) AS BIGINT) AS n_matched,
      |  floor(CAST(sum(CASE WHEN m.mck IS NOT NULL
      |      THEN t.outcome - m.cout END) AS DOUBLE)
      |    / count(m.mck) / 100 * 10000 + 0.5) / 10000 AS att,
      |  floor(CAST(sum(m.adiff) AS DOUBLE) / count(m.mck) / 100
      |    * 10000 + 0.5) / 10000 AS mean_gap
      |FROM t LEFT JOIN (SELECT mck, cout, adiff FROM best WHERE rn = 1) m
      |  ON m.mck = t.ck""".stripMargin) { (s, d) =>
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    val cs = Tables.customer(s, d)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("score"))
      .join(spend, col("ck") === col("o_custkey"), "left")
      .select(col("ck"), col("seg"), col("score"),
        coalesce(col("cents"), lit(0L)).as("outcome"))
    val treated = cs.filter(col("seg") === "BUILDING")
      .select(col("ck"), col("score"), col("outcome"),
        floor(col("score") / lit(2000.0)).cast("long").as("b"))
    val control = cs.filter(col("seg") =!= "BUILDING")
      .select(col("ck").as("cck"), col("score").as("cscore"),
        col("outcome").as("cout"),
        floor(col("score") / lit(2000.0)).cast("long").as("b0"))
      .select(col("cck"), col("cscore"), col("cout"),
        explode(expr("array(b0 - 1, b0, b0 + 1)")).as("b"))
    val best = treated.join(control, Seq("b"))
      .withColumn("adiff", abs(col("score") - col("cscore")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("ck")
          .orderBy(col("adiff"), col("cck"))))
      .filter(col("rn") === 1)
      .select(col("ck").as("mck"), col("cout"), col("adiff"))
    treated.join(best, col("ck") === col("mck"), "left")
      .agg(count(lit(1)).as("n_treated"),
        count(col("mck")).as("n_matched"),
        (floor(sum(when(col("mck").isNotNull, col("outcome") - col("cout")))
          .cast("double") / count(col("mck")) / 100 * 10000 + lit(0.5))
          / 10000).as("att"),
        (floor(sum(col("adiff")).cast("double") / count(col("mck")) / 100
          * 10000 + lit(0.5)) / 10000).as("mean_gap"))
  }

  /** Instrumental-variable estimation (two-stage least squares with a
    * single instrument, in its closed Wald form β_IV = cov(z,y)/
    * cov(z,x)) — the causal answer when the treatment is endogenous:
    * does discount (x) CAUSE quantity (y), instrumenting with part
    * size (z, set at manufacture, plausibly exogenous to demand
    * shocks)? Reported next to the naive OLS slope and the
    * first-stage slope (the weak-instrument check). ONE aggregate
    * scan collects all co-moments as exact BIGINTs (the
    * n·Σab − Σa·Σb forms stay < 2⁶³ through sf1); each estimate is a
    * single double division, identical on both engines. */
  val iv2sls: Q = Q(
    "iv_2sls",
    """WITH b AS (SELECT CAST(p.p_size AS BIGINT) AS z,
      |    CAST(floor(li.l_discount * 100 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(li.l_quantity + 0.5) AS BIGINT) AS y
      |  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(z) AS BIGINT) AS sz, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(z * x) AS BIGINT) AS szx,
      |    CAST(sum(z * y) AS BIGINT) AS szy,
      |    CAST(sum(z * z) AS BIGINT) AS szz,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM b)
      |SELECT n,
      |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) / 1000000
      |    AS beta_ols,
      |  floor(CAST(n * szy - sz * sy AS DOUBLE)
      |    / CAST(n * szx - sz * sx AS DOUBLE) * 1000000 + 0.5) / 1000000
      |    AS beta_iv,
      |  floor(CAST(n * szx - sz * sx AS DOUBLE)
      |    / CAST(n * szz - sz * sz AS DOUBLE) * 1000000 + 0.5) / 1000000
      |    AS first_stage
      |FROM m""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_size").cast("long").as("z"),
        floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("x"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("z").as("sz"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("z") * col("x")).as("szx"),
        sum(col("z") * col("y")).as("szy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        (floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
          * 1000000 + lit(0.5)) / 1000000).as("beta_ols"),
        (floor((col("n") * col("szy") - col("sz") * col("sy")).cast("double")
          / (col("n") * col("szx") - col("sz") * col("sx")).cast("double")
          * 1000000 + lit(0.5)) / 1000000).as("beta_iv"),
        (floor((col("n") * col("szx") - col("sz") * col("sx")).cast("double")
          / (col("n") * col("szz") - col("sz") * col("sz")).cast("double")
          * 1000000 + lit(0.5)) / 1000000).as("first_stage"))
  }

  /** Sequential probability ratio test (Wald 1945) monitoring the
    * purchase rate day by day — the always-valid sequential A/B
    * monitor that stops the moment the evidence crosses a boundary,
    * instead of peeking a fixed-horizon test. H₀: p = 0.15 vs H₁:
    * p = 0.22, α = β = 0.05 (boundaries ±ln 19). The cumulative LLR
    * is kept EXACT until the last step: daily (trials, conversions)
    * cumulate as integers through the distributed PrefixScan, and
    * LLR_t = cumConv·ln(p₁/p₀) + cumNon·ln((1−p₁)/(1−p₀)) is two
    * integer×literal products per row (`ln` of identical literals —
    * corpus-wide parity established). Emits the monitoring trace up
    * to and including the first boundary crossing. */
  val sprtMonitor: Q = Q(
    "sprt_monitor",
    """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d')
      |      AS day,
      |    CAST(count(*) AS BIGINT) AS trials,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM events GROUP BY 1),
      |cum AS (SELECT day, trials, conv,
      |    CAST(sum(trials) OVER (ORDER BY day) AS BIGINT) AS ct,
      |    CAST(sum(conv) OVER (ORDER BY day) AS BIGINT) AS cc
      |  FROM daily),
      |llr AS (SELECT day, trials, conv,
      |    cc * ln(0.22 / 0.15) + (ct - cc) * ln(0.78 / 0.85) AS llr
      |  FROM cum),
      |cross_day AS (SELECT min(day) AS cd FROM llr
      |  WHERE llr >= ln(19.0) OR llr <= -ln(19.0))
      |SELECT day, trials, conv,
      |  floor(llr * 10000 + 0.5) / 10000 AS llr,
      |  CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
      |       WHEN llr <= -ln(19.0) THEN 'accept_h0'
      |       ELSE 'continue' END AS state
      |FROM llr CROSS JOIN cross_day
      |WHERE cd IS NULL OR day <= cd
      |ORDER BY day""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(count(lit(1)).as("trials"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val (scanned, _) = graft.ops.PrefixScan.withCumSums(
      daily, Seq(col("day")), Seq("trials", "conv"))
    val llr = scanned.select(col("day"), col("trials"), col("conv"),
      (col("cum_conv") * log(lit(0.22) / 0.15)
        + (col("cum_trials") - col("cum_conv")) * log(lit(0.78) / 0.85))
        .as("llr"))
    val crossDay = llr
      .filter(col("llr") >= log(lit(19.0)) || col("llr") <= -log(lit(19.0)))
      .agg(min("day").as("cd"))
    llr.crossJoin(broadcast(crossDay)) // 1-row first-crossing day
      .filter(col("cd").isNull || col("day") <= col("cd"))
      .select(col("day"), col("trials"), col("conv"),
        (floor(col("llr") * 10000 + lit(0.5)) / 10000).as("llr"),
        when(col("llr") >= log(lit(19.0)), "accept_h1")
          .when(col("llr") <= -log(lit(19.0)), "accept_h0")
          .otherwise("continue").as("state"))
      .orderBy("day")
  }

  /** Wilson score confidence intervals (Wilson 1927) for each
    * nation's completed-order rate — the interval that behaves at
    * small n and extreme rates where the naive Wald CI collapses;
    * the per-segment dashboard primitive. Each row is exact integer
    * (k, n) plus one fixed-form double evaluation mirrored textually
    * on both engines (`sqrt` is IEEE-correctly-rounded); z = 1.96's
    * full-precision quantile 1.959964. One grouped count scan. */
  val wilsonCi: Q = Q(
    "wilson_ci",
    """WITH g AS (SELECT c.c_nationkey AS nation,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1)
      |SELECT nation, n, k,
      |  floor(CAST(k AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS rate,
      |  floor(((CAST(k AS DOUBLE) / n + 1.959964e0 * 1.959964e0 / (2 * n)
      |    - 1.959964e0 * sqrt(CAST(k AS DOUBLE) / n
      |      * (1 - CAST(k AS DOUBLE) / n) / n
      |      + 1.959964e0 * 1.959964e0 / (4.0e0 * n * n)))
      |    / (1 + 1.959964e0 * 1.959964e0 / n)) * 1000000 + 0.5) / 1000000
      |    AS lo,
      |  floor(((CAST(k AS DOUBLE) / n + 1.959964e0 * 1.959964e0 / (2 * n)
      |    + 1.959964e0 * sqrt(CAST(k AS DOUBLE) / n
      |      * (1 - CAST(k AS DOUBLE) / n) / n
      |      + 1.959964e0 * 1.959964e0 / (4.0e0 * n * n)))
      |    / (1 + 1.959964e0 * 1.959964e0 / n)) * 1000000 + 0.5) / 1000000
      |    AS hi
      |FROM g ORDER BY nation""".stripMargin) { (s, d) =>
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
    val p = col("k").cast("double") / col("n")
    val z2 = lit(1.959964) * 1.959964
    val rad = sqrt(p * (lit(1) - p) / col("n")
      + z2 / (lit(4.0) * col("n") * col("n")))
    val den = lit(1) + z2 / col("n")
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000 + lit(0.5)) / 1000000
    g.select(col("nation"), col("n"), col("k"), r6(p).as("rate"),
        r6((p + z2 / (lit(2) * col("n")) - lit(1.959964) * rad) / den)
          .as("lo"),
        r6((p + z2 / (lit(2) * col("n")) + lit(1.959964) * rad) / den)
          .as("hi"))
      .orderBy("nation")
  }

  /** Brown–Forsythe robust variance-homogeneity test (Levene's test
    * with group MEDIANS — the recommended form under non-normality):
    * are quantity spreads equal across return-flag groups? The
    * assumption check that gates anova_quantity's pooled-variance F.
    * Group medians come from the distributed GroupedPercentile rank
    * path; absolute deviations stay EXACT integers via the ×2 device
    * (|2q − 2·med| — an integer even when the median interpolates to
    * .5), and the one-way F over deviations is fixed-form double
    * algebra on exact BIGINT moments. */
  val leveneTest: Q = Q(
    "levene_test",
    """WITH q AS (SELECT l_returnflag AS g,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS y FROM lineitem),
      |med AS (SELECT g, CAST(2 * quantile_cont(y, 0.50) AS BIGINT) AS m2
      |        FROM (SELECT g, CAST(y AS DOUBLE) AS y FROM q) GROUP BY g),
      |dv AS (SELECT q.g, abs(2 * q.y - med.m2) AS d
      |       FROM q JOIN med ON med.g = q.g),
      |gm AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(d) AS BIGINT) AS s,
      |    CAST(sum(d * d) AS BIGINT) AS ss FROM dv GROUP BY g),
      |tot0 AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(s) AS BIGINT) AS st,
      |    CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(ss) AS BIGINT) AS sst,
      |    list(s ORDER BY g) AS sl, list(n ORDER BY g) AS nl
      |  FROM gm),
      |tot AS (SELECT nn, st, k, sst,
      |    list_aggregate(list_transform(range(1, len(sl) + 1),
      |      i -> CAST(sl[i] AS DOUBLE) * sl[i] / nl[i]), 'sum') AS sb
      |  FROM tot0)
      |SELECT k AS n_groups, nn AS n_rows,
      |  floor((sb - CAST(st AS DOUBLE) * st / nn) * 10000 + 0.5) / 10000
      |    AS ss_between,
      |  floor((sst - sb) * 10000 + 0.5) / 10000 AS ss_within,
      |  floor(((sb - CAST(st AS DOUBLE) * st / nn) / (k - 1))
      |    / ((sst - sb) / (nn - k)) * 1000000 + 0.5) / 1000000 AS f_stat
      |FROM tot""".stripMargin) { (s, d) =>
    val q = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("g"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("y"))
    val med = graft.ops.GroupedPercentile.exact(q, "g", "y", 0.5, "med")
      .select(col("g"), (lit(2) * col("med")).cast("long").as("m2"))
    val gm = q.join(med, "g")
      .select(col("g"), abs(lit(2) * col("y") - col("m2")).as("d"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("d").as("s"),
        sum(col("d") * col("d")).as("ss"))
    val tot = gm.agg(sum("n").as("nn"), sum("s").as("st"),
      count(lit(1)).as("k"), sum("ss").as("sst"),
      expr("aggregate(array_sort(collect_list(struct(g, s, n))), 0D, " +
        "(a, t) -> a + CAST(t.s AS DOUBLE) * t.s / t.n)").as("sb"))
    tot.select(col("k").as("n_groups"), col("nn").as("n_rows"),
      (floor((col("sb") - col("st").cast("double") * col("st") / col("nn"))
        * 10000 + lit(0.5)) / 10000).as("ss_between"),
      (floor((col("sst") - col("sb")) * 10000 + lit(0.5)) / 10000)
        .as("ss_within"),
      (floor(((col("sb") - col("st").cast("double") * col("st") / col("nn"))
        / (col("k") - 1)) / ((col("sst") - col("sb")) / (col("nn") - col("k")))
        * 1000000 + lit(0.5)) / 1000000).as("f_stat"))
  }

  /** Grubbs-style maximum-studentized-deviation outlier scan (Grubbs
    * 1950) over the daily revenue series: which single day deviates
    * most from the mean, in standard-deviation units? The ARGMAX runs
    * on exact integers (|n·y − S| — no float ever picks the day; ties
    * break to the earliest day), and G = (dev/n)/s is assembled from
    * exact BIGINT moments with mirrored double steps. Flagged at the
    * conventional G > 3 screen. */
  val grubbsTest: Q = Q(
    "grubbs_test",
    """WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE)
      |      AS day,
      |    CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      / 100) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s,
      |    CAST(sum(y * y) AS BIGINT) AS ss FROM daily),
      |dev AS (SELECT day, y, n, s, ss, abs(n * y - s) AS d
      |        FROM daily CROSS JOIN tot),
      |top AS (SELECT day, y, n, s, ss, d FROM dev
      |        ORDER BY d DESC, day LIMIT 1)
      |SELECT n AS n_days, strftime(day, '%Y-%m-%d') AS outlier_day, y AS value,
      |  floor((CAST(d AS DOUBLE) / n)
      |    / sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1))
      |    * 10000 + 0.5) / 10000 AS g_stat,
      |  (CAST(d AS DOUBLE) / n)
      |    / sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) > 3.0
      |    AS flagged
      |FROM top""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(floor(sum(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("y"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("y").as("s"),
      sum(col("y") * col("y")).as("ss"))
    val top = daily.crossJoin(broadcast(tot)) // 1-row moments broadcast
      .withColumn("d", abs(col("n") * col("y") - col("s")))
      .orderBy(col("d").desc, col("day")).limit(1)
    val g = (col("d").cast("double") / col("n")) /
      sqrt((col("ss") - col("s").cast("double") * col("s") / col("n")) /
        (col("n") - 1))
    top.select(col("n").as("n_days"),
      date_format(col("day"), "yyyy-MM-dd").as("outlier_day"),
      col("y").as("value"),
      (floor(g * 10000 + lit(0.5)) / 10000).as("g_stat"),
      (g > 3.0).as("flagged"))
  }

  /** Partial correlation r_xy·z — does quantity correlate with line
    * revenue once part size is controlled for? The confounder check
    * behind every "X drives Y" dashboard claim. All three pairwise
    * correlations come from ONE exact-integer co-moment scan
    * (n·Σab − Σa·Σb forms), then
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) is a single
    * mirrored double expression. */
  val partialCorr: Q = Q(
    "partial_corr",
    """WITH b AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y,
      |    CAST(p.p_size AS BIGINT) AS z
      |  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(z) AS BIGINT) AS sz,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * z) AS BIGINT) AS sxz,
      |    CAST(sum(y * z) AS BIGINT) AS syz,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(z * z) AS BIGINT) AS szz FROM b),
      |r AS (SELECT n,
      |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |             * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
      |      AS rxy,
      |    (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
      |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |             * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
      |      AS rxz,
      |    (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
      |      / sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
      |             * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
      |      AS ryz
      |  FROM m)
      |SELECT n AS n_rows,
      |  floor(rxy * 1000000 + 0.5) / 1000000 AS r_xy,
      |  floor(rxz * 1000000 + 0.5) / 1000000 AS r_xz,
      |  floor(ryz * 1000000 + 0.5) / 1000000 AS r_yz,
      |  floor((rxy - rxz * ryz)
      |    / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) * 1000000 + 0.5)
      |    / 1000000 AS r_xy_given_z
      |FROM r""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .select(floor(col("l_quantity") + lit(0.5)).cast("long").as("x"),
        floor(col("l_extendedprice") + lit(0.5)).cast("long").as("y"),
        col("p_size").cast("long").as("z"))
    val m = b.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"))
    def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      (col("n").cast("double") * col(sab)
        - col(sa).cast("double") * col(sb)) /
        sqrt((col("n").cast("double") * col(saa)
            - col(sa).cast("double") * col(sa))
          * (col("n").cast("double") * col(sbb)
            - col(sb).cast("double") * col(sb)))
    val rxy = r("sxy", "sx", "sy", "sxx", "syy")
    val rxz = r("sxz", "sx", "sz", "sxx", "szz")
    val ryz = r("syz", "sy", "sz", "syy", "szz")
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000 + lit(0.5)) / 1000000
    m.select(col("n").as("n_rows"), r6(rxy).as("r_xy"), r6(rxz).as("r_xz"),
      r6(ryz).as("r_yz"),
      r6((rxy - rxz * ryz)
        / sqrt((lit(1) - rxz * rxz) * (lit(1) - ryz * ryz)))
        .as("r_xy_given_z"))
  }

  /** Lincoln–Petersen capture–recapture estimate (the mark-recapture
    * estimator ecology and dedup-coverage audits share): customers
    * "captured" by 1996 orders, "recaptured" by 1997 orders, and the
    * implied total active population N̂ = n₁n₂/m (Chapman's
    * bias-corrected form alongside), compared against the directly
    * counted truth — the estimator-validation row. Three semi-join
    * counts + exact-integer arithmetic. */
  val captureRecapture: Q = Q(
    "capture_recapture",
    """WITH c1 AS (SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      |c2 AS (SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |truth AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS nt
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |m AS (SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM c1) AS n1,
      |    (SELECT CAST(count(*) AS BIGINT) FROM c2) AS n2,
      |    (SELECT CAST(count(*) AS BIGINT) FROM c1 JOIN c2 USING (k))
      |      AS mm)
      |SELECT n1, n2, mm AS n_both,
      |  floor(CAST(n1 AS DOUBLE) * n2 / mm * 100 + 0.5) / 100
      |    AS lp_estimate,
      |  floor((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (mm + 1) - 1)
      |    * 100 + 0.5) / 100 AS chapman_estimate,
      |  nt AS true_population
      |FROM m CROSS JOIN truth""".stripMargin) { (s, d) =>
    def yr(a: String, b: String) = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(a).cast("timestamp")
        && col("o_orderdate") < lit(b).cast("timestamp"))
      .select(col("o_custkey").as("k")).distinct()
    val c1 = yr("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    val c2 = yr("1997-01-01 00:00:00", "1998-01-01 00:00:00")
    val truth = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00")
        .cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01 00:00:00")
          .cast("timestamp"))
      .agg(countDistinct("o_custkey").as("nt"))
    c1.agg(count(lit(1)).as("n1"))
      .crossJoin(broadcast(c2.agg(count(lit(1)).as("n2"))))
      .crossJoin(broadcast(
        c1.join(c2, "k").agg(count(lit(1)).as("mm"))))
      .crossJoin(broadcast(truth)) // three 1-row capture counts
      .select(col("n1"), col("n2"), col("mm").as("n_both"),
        (floor(col("n1").cast("double") * col("n2") / col("mm") * 100
          + lit(0.5)) / 100).as("lp_estimate"),
        (floor(((col("n1") + 1).cast("double") * (col("n2") + 1)
          / (col("mm") + 1) - 1) * 100 + lit(0.5)) / 100)
          .as("chapman_estimate"),
        col("nt").as("true_population"))
  }

  /** Shannon diversity + Pielou evenness of each nation's brand mix —
    * the assortment-concentration view hhi_concentration's
    * squared-share index flattens (two nations with equal HHI can
    * have very different tail richness). Exact (nation, brand) counts
    * feed H = −Σ p ln p with the ≤25 terms per nation folded
    * brand-sorted; evenness J = H/ln(k) is one more division.
    * One fact collapse; 25-row finals. */
  val brandDiversity: Q = Q(
    "brand_diversity",
    """WITH nb AS (SELECT c.c_nationkey AS nation, p.p_brand AS brand,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem li
      |  JOIN orders o ON o.o_orderkey = li.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN part p ON p.p_partkey = li.l_partkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT nation, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS k,
      |    list(c ORDER BY brand) AS cs
      |  FROM nb GROUP BY nation),
      |f AS (SELECT nation, n, k,
      |    -list_aggregate(list_transform(range(1, len(cs) + 1), i ->
      |      (CAST(cs[i] AS DOUBLE) / n) * ln(CAST(cs[i] AS DOUBLE) / n)),
      |      'sum') AS h
      |  FROM tot)
      |SELECT nation, n AS n_lines, k AS n_brands,
      |  floor(h * 1000000 + 0.5) / 1000000 AS shannon_h,
      |  floor(h / ln(CAST(k AS DOUBLE)) * 1000000 + 0.5) / 1000000
      |    AS evenness
      |FROM f ORDER BY nation""".stripMargin) { (s, d) =>
    val nb = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("c_nationkey").as("nation"), col("p_brand").as("brand"))
      .agg(count(lit(1)).as("c"))
    nb.groupBy("nation")
      .agg(sum("c").as("n"), count(lit(1)).as("k"),
        expr("array_sort(collect_list(struct(brand, c)))").as("cl"))
      .withColumn("h", expr("-aggregate(cl, 0D, (a, t) -> " +
        "a + (CAST(t.c AS DOUBLE) / n) * ln(CAST(t.c AS DOUBLE) / n))"))
      .select(col("nation"), col("n").as("n_lines"), col("k").as("n_brands"),
        (floor(col("h") * 1000000 + lit(0.5)) / 1000000).as("shannon_h"),
        (floor(col("h") / log(col("k").cast("double")) * 1000000
          + lit(0.5)) / 1000000).as("evenness"))
      .orderBy("nation")
  }

  /** Tukey–Kramer HSD post-hoc pairwise comparisons — the step AFTER
    * anova_quantity rejects: which group pairs actually differ?
    * q_ij = |x̄_i − x̄_j| / √(MSW/2 · (1/n_i + 1/n_j)) with MSW the
    * pooled within-group mean square, computed from the SAME exact
    * BIGINT group moments (and the same 1e-6-grid between-sum trick)
    * as the ANOVA — zero extra passes over data: one grouped
    * aggregate, a k-row pair cross of group stats, and a 1-row MSW
    * broadcast. k(k−1)/2 output rows regardless of data size. */
  val tukeyHsd: Q = Q(
    "tukey_hsd",
    """WITH b AS (SELECT l_returnflag AS f,
      |    CAST(floor(l_quantity) AS BIGINT) AS c FROM lineitem),
      |g AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM b GROUP BY f),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(s2) AS BIGINT) AS s2,
      |    CAST(sum(floor(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n
      |      * 1000000 + 0.5) / 1000000) AS DOUBLE) AS tb
      |  FROM g),
      |m AS (SELECT (CAST(s2 AS DOUBLE) - tb) / (n - k) AS msw FROM t)
      |SELECT g1.f AS f1, g2.f AS f2,
      |  floor((CAST(g1.s1 AS DOUBLE) / g1.n
      |       - CAST(g2.s1 AS DOUBLE) / g2.n) * 1000000 + 0.5) / 1000000
      |    AS mean_diff,
      |  floor(abs(CAST(g1.s1 AS DOUBLE) / g1.n
      |          - CAST(g2.s1 AS DOUBLE) / g2.n)
      |    / sqrt(m.msw / 2 * (1.0 / g1.n + 1.0 / g2.n))
      |    * 1000000 + 0.5) / 1000000 AS q_stat
      |FROM g g1 JOIN g g2 ON g1.f < g2.f CROSS JOIN m
      |ORDER BY f1, f2""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(col("l_returnflag").as("f"),
      floor(col("l_quantity")).cast("long").as("c"))
    val g = b.groupBy("f").agg(count(lit(1)).as("n"),
      sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
    val t = g.agg(count(lit(1)).as("k"), sum("n").as("n"),
      sum("s2").as("s2"),
      sum(floor(col("s1").cast("double") * col("s1").cast("double")
        / col("n") * 1000000 + lit(0.5)) / 1000000).cast("double").as("tb"))
    val m = t.select(((col("s2").cast("double") - col("tb"))
      / (col("n") - col("k"))).as("msw"))
    val diff = col("g1.s1").cast("double") / col("g1.n") -
      col("g2.s1").cast("double") / col("g2.n")
    g.as("g1").join(g.as("g2"), col("g1.f") < col("g2.f"))
      .crossJoin(broadcast(m))
      .select(col("g1.f").as("f1"), col("g2.f").as("f2"),
        (floor(diff * 1000000 + lit(0.5)) / 1000000).as("mean_diff"),
        (floor(abs(diff)
          / sqrt(col("msw") / 2 * (lit(1.0) / col("g1.n") + lit(1.0) / col("g2.n")))
          * 1000000 + lit(0.5)) / 1000000).as("q_stat"))
      .orderBy("f1", "f2")
  }

  /** Robust regression: ONE Huber IRLS step past OLS (Huber 1964) for
    * price-vs-quantity — outliers get down-weighted by w = min(1,
    * k·s/|r|) (k = 1.345, s = the mean absolute residual) and the
    * weighted normal equations re-solve. Cross-engine exactness
    * discipline: both passes are EXACT BIGINT sums — residual
    * magnitudes quantize to the 1e-4 grid as LONGs before summing
    * (order-independent), weights to a 1e-4 grid so every weighted
    * moment (w·x·y ≤ 5e10/row) stays integer — and the only doubles
    * are the closed-form divisions, identical expression shape on
    * both sides. Plan: two scans + two 1-row broadcasts, no shuffle
    * beyond the partial aggregates. */
  val huberIrls: Q = Q(
    "huber_irls",
    """WITH b AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice / 100) AS BIGINT) AS y FROM lineitem),
      |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx FROM b),
      |ols AS (SELECT n, sx, sy,
      |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b1
      |  FROM m1),
      |ols2 AS (SELECT n, b1, (CAST(sy AS DOUBLE) - b1 * sx) / n AS a1
      |  FROM ols),
      |sc AS (SELECT CAST(sum(CAST(floor(
      |      abs(CAST(y AS DOUBLE) - (a1 + b1 * x)) * 10000 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS sr4
      |  FROM b CROSS JOIN ols2),
      |s0 AS (SELECT ols2.a1, ols2.b1,
      |    CAST(sc.sr4 AS DOUBLE) / 10000 / ols2.n AS scale
      |  FROM ols2 CROSS JOIN sc),
      |w AS (SELECT x, y, CAST(floor(least(1.0,
      |      1.345 * s0.scale
      |        / greatest(abs(CAST(y AS DOUBLE) - (s0.a1 + s0.b1 * x)),
      |                   0.000000001)) * 10000 + 0.5) AS BIGINT) AS wm
      |  FROM b CROSS JOIN s0),
      |m2 AS (SELECT CAST(sum(wm) AS BIGINT) AS sw,
      |    CAST(sum(wm * x) AS BIGINT) AS swx,
      |    CAST(sum(wm * y) AS BIGINT) AS swy,
      |    CAST(sum(wm * x * y) AS BIGINT) AS swxy,
      |    CAST(sum(wm * x * x) AS BIGINT) AS swxx,
      |    CAST(sum(CASE WHEN wm < 10000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_down
      |  FROM w),
      |fin AS (SELECT s0.a1, s0.b1, s0.scale, m2.n_down,
      |    (CAST(m2.sw AS DOUBLE) * m2.swxy
      |      - CAST(m2.swx AS DOUBLE) * m2.swy)
      |      / (CAST(m2.sw AS DOUBLE) * m2.swxx
      |      - CAST(m2.swx AS DOUBLE) * m2.swx) AS b2,
      |    m2.sw, m2.swx, m2.swy
      |  FROM m2 CROSS JOIN s0)
      |SELECT floor(b1 * 1000000 + 0.5) / 1000000 AS slope_ols,
      |  floor(a1 * 1000000 + 0.5) / 1000000 AS icept_ols,
      |  floor(scale * 1000000 + 0.5) / 1000000 AS scale_mar,
      |  floor(b2 * 1000000 + 0.5) / 1000000 AS slope_huber,
      |  floor((CAST(swy AS DOUBLE) - b2 * swx) / sw * 1000000 + 0.5)
      |    / 1000000 AS icept_huber,
      |  n_down
      |FROM fin""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(
      floor(col("l_quantity")).cast("long").as("x"),
      floor(col("l_extendedprice") / 100).cast("long").as("y"))
    val m1 = b.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val ols = m1.select(col("n"), col("sx"), col("sy"),
      ((col("n").cast("double") * col("sxy")
        - col("sx").cast("double") * col("sy"))
        / (col("n").cast("double") * col("sxx")
          - col("sx").cast("double") * col("sx"))).as("b1"))
    val ols2 = ols.select(col("n"), col("b1"),
      ((col("sy").cast("double") - col("b1") * col("sx")) / col("n")).as("a1"))
    val resid = col("y").cast("double") - (col("a1") + col("b1") * col("x"))
    val sc = b.crossJoin(broadcast(ols2))
      .agg(sum(floor(abs(resid) * 10000 + lit(0.5)).cast("long")).as("sr4"))
    val s0 = ols2.crossJoin(broadcast(sc))
      .select(col("a1"), col("b1"),
        (col("sr4").cast("double") / 10000 / col("n")).as("scale"))
    val w = b.crossJoin(broadcast(s0))
      .select(col("x"), col("y"), col("a1"), col("b1"), col("scale"),
        floor(least(lit(1.0),
          lit(1.345) * col("scale") / greatest(abs(resid), lit(0.000000001)))
          * 10000 + lit(0.5)).cast("long").as("wm"))
    val m2 = w.agg(sum("wm").as("sw"), sum(col("wm") * col("x")).as("swx"),
      sum(col("wm") * col("y")).as("swy"),
      sum(col("wm") * col("x") * col("y")).as("swxy"),
      sum(col("wm") * col("x") * col("x")).as("swxx"),
      sum(when(col("wm") < 10000, 1).otherwise(0)).cast("long").as("n_down"))
    val fin = m2.crossJoin(broadcast(s0))
      .select(col("a1"), col("b1"), col("scale"), col("n_down"),
        ((col("sw").cast("double") * col("swxy")
          - col("swx").cast("double") * col("swy"))
          / (col("sw").cast("double") * col("swxx")
            - col("swx").cast("double") * col("swx"))).as("b2"),
        col("sw"), col("swx"), col("swy"))
    fin.select(
      (floor(col("b1") * 1000000 + lit(0.5)) / 1000000).as("slope_ols"),
      (floor(col("a1") * 1000000 + lit(0.5)) / 1000000).as("icept_ols"),
      (floor(col("scale") * 1000000 + lit(0.5)) / 1000000).as("scale_mar"),
      (floor(col("b2") * 1000000 + lit(0.5)) / 1000000).as("slope_huber"),
      (floor((col("swy").cast("double") - col("b2") * col("swx")) / col("sw")
        * 1000000 + lit(0.5)) / 1000000).as("icept_huber"),
      col("n_down"))
  }

  val all: Seq[Q] =
    Seq(nbLangid, ksTest, driftPsi, winsorize, joinCardinality, multiQuantile,
      welchTtest, benfordLaw, mannWhitney, giniSpend, hhiConcentration,
      dowSeasonality, weightedMedian, spearmanCorr, neymanAllocation,
      anovaQuantity, cramersV, multiregNormal, poissonBootstrap,
      lorenzDeciles, rfmSegments, abcClass, didEstimate, cupedAdjust,
      propZtest, abPowerMde, jamesStein, simpsonCheck, bhFdr, psMatch,
      iv2sls, sprtMonitor, wilsonCi, leveneTest, grubbsTest, partialCorr,
      captureRecapture, brandDiversity, tukeyHsd, huberIrls, groupwiseOls,
      robustScaler, kruskalWallis, fisherExact, cohensD, cliffsDelta,
      wasserstein1d, durbinWatson, kendallsW, cochranQ, friedmanTest,
      boxcoxGrid, medianPolish, cvmTest)

  /** One full Tukey median-polish sweep over the complete
    * brand × year (1996–98) revenue grid — the robust two-way
    * decomposition (grand + brand effect + year effect + residual)
    * that a mean-based ANOVA table can't give under heavy-tailed
    * cells. Exact integer algebra end to end: the 3-value row median
    * is Σ − max − min, the 25-value column/overall medians are the
    * 13th order statistic from a bounded 25×25 rank join, and
    * residuals stay BIGINT cents until the final dollar rounding. */
  lazy val medianPolish: Q = Q(
    "median_polish",
    """WITH cell AS (SELECT p.p_brand AS b,
      |    CAST(year(l.l_shipdate) AS BIGINT) AS y,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS r
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  WHERE year(l.l_shipdate) BETWEEN 1996 AND 1998
      |  GROUP BY b, y),
      |rm AS (SELECT b, CAST(sum(r) - max(r) - min(r) AS BIGINT) AS m
      |  FROM cell GROUP BY b),
      |e AS (SELECT cell.b, cell.y, cell.r - rm.m AS e
      |  FROM cell JOIN rm ON rm.b = cell.b),
      |cm AS (SELECT a.y, min(a.e) AS c FROM (
      |    SELECT e1.y, e1.e, (SELECT count(*) FROM e e2
      |      WHERE e2.y = e1.y AND (e2.e < e1.e
      |        OR (e2.e = e1.e AND e2.b <= e1.b))) AS rk
      |    FROM e e1) a
      |  WHERE a.rk >= 13 GROUP BY a.y),
      |ov AS (SELECT min(m) AS o FROM (
      |    SELECT r1.m, (SELECT count(*) FROM rm r2
      |      WHERE r2.m < r1.m OR (r2.m = r1.m AND r2.b <= r1.b)) AS rk
      |    FROM rm r1) t WHERE rk >= 13),
      |res AS (SELECT max(abs(e.e - cm.c)) AS mr FROM e
      |  JOIN cm ON cm.y = e.y),
      |cy AS (SELECT
      |    max(CASE WHEN y = 1996 THEN c END) AS c96,
      |    max(CASE WHEN y = 1997 THEN c END) AS c97,
      |    max(CASE WHEN y = 1998 THEN c END) AS c98 FROM cm)
      |SELECT rm.b AS brand,
      |  floor(CAST(rm.m - ov.o AS DOUBLE) / 100 * 100 + 0.5) / 100
      |    AS brand_effect,
      |  floor(CAST(ov.o AS DOUBLE) / 100 * 100 + 0.5) / 100 AS overall,
      |  floor(CAST(cy.c96 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS y1996,
      |  floor(CAST(cy.c97 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS y1997,
      |  floor(CAST(cy.c98 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS y1998,
      |  floor(CAST(res.mr AS DOUBLE) / 100 * 100 + 0.5) / 100
      |    AS max_abs_resid
      |FROM rm CROSS JOIN ov CROSS JOIN cy CROSS JOIN res
      |ORDER BY brand""".stripMargin) { (s, d) =>
    val cell = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("b"),
        year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("r"))
    val rm = cell.groupBy("b")
      .agg((sum("r") - max("r") - min("r")).as("m"))
    val e = cell.join(rm, "b").select(col("b"), col("y"),
      (col("r") - col("m")).as("e"))
    // 13th order statistic of 25 values via a bounded rank join
    def med25(df: DataFrame, part: Option[String], v: String,
        tie: String, out: String): DataFrame = {
      val l = df.as("l")
      val r = df.select((part.toSeq :+ v :+ tie)
        .map(c => col(c).as(c + "2")): _*)
      val cond = part.map(p => col(p + "2") === col(s"l.$p"))
        .getOrElse(lit(true)) &&
        (col(v + "2") < col(s"l.$v") ||
          (col(v + "2") === col(s"l.$v") && col(tie + "2") <= col(s"l.$tie")))
      val ranked = l.join(r, cond)
        .groupBy((part.toSeq :+ v :+ tie).map(c => col(s"l.$c")): _*)
        .agg(count(lit(1)).as("rk"))
      ranked.filter(col("rk") >= 13)
        .groupBy(part.toSeq.map(c => col(s"l.$c")): _*)
        .agg(min(col(s"l.$v")).as(out))
    }
    val cm = med25(e.select(col("y"), col("e"), col("b")), Some("y"),
      "e", "b", "c").select(col("l.y").as("y"), col("c"))
    val ov = med25(rm.select(col("m"), col("b")), None, "m", "b", "o")
    val res = e.join(broadcast(cm), "y")
      .agg(max(abs(col("e") - col("c"))).as("mr"))
    val cy = cm.agg(
      max(when(col("y") === 1996, col("c"))).as("c96"),
      max(when(col("y") === 1997, col("c"))).as("c97"),
      max(when(col("y") === 1998, col("c"))).as("c98"))
    def dollars(c: Column): Column =
      floor(c.cast("double") / 100 * 100 + lit(0.5)) / 100
    rm.crossJoin(broadcast(ov)).crossJoin(broadcast(cy))
      .crossJoin(broadcast(res))
      .select(col("b").as("brand"),
        dollars(col("m") - col("o")).as("brand_effect"),
        dollars(col("o")).as("overall"),
        dollars(col("c96")).as("y1996"),
        dollars(col("c97")).as("y1997"),
        dollars(col("c98")).as("y1998"),
        dollars(col("mr")).as("max_abs_resid"))
      .orderBy("brand")
  }

  /** Two-sample Cramér–von Mises statistic between the A and R
    * quantity distributions — the QUADRATIC ECDF functional that
    * weighs every gap, completing the trio with ks_test (max gap) and
    * wasserstein_1d (mass moved). Computed in the atom-weighted ECDF
    * form over the ≤50-value count table: T = mn/(m+n)² ·
    * Σ_v (c1+c2)·ΔF(v)², with ΔF's numerator the exact BIGINT
    * cum1·n2 − cum2·n1 and the ≤50 squared terms folded value-sorted.
    * Reject line = the 0.461 asymptotic 5% point. */
  lazy val cvmTest: Q = Q(
    "cvm_test",
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem
      |  WHERE l_returnflag IN ('A', 'R')),
      |c AS (SELECT q,
      |    CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(sum(CASE WHEN grp = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c2
      |  FROM b GROUP BY q),
      |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c2) AS BIGINT) AS n2 FROM c),
      |cum AS (SELECT a.q, any_value(a.c1) AS c1, any_value(a.c2) AS c2,
      |    CAST(sum(b2.c1) AS BIGINT) AS k1, CAST(sum(b2.c2) AS BIGINT)
      |      AS k2
      |  FROM c a JOIN c b2 ON b2.q <= a.q GROUP BY a.q),
      |t AS (SELECT
      |    list_aggregate(list((c1 + c2)
      |      * (CAST(k1 AS DOUBLE) * n.n2 - CAST(k2 AS DOUBLE) * n.n1)
      |      * (CAST(k1 AS DOUBLE) * n.n2 - CAST(k2 AS DOUBLE) * n.n1)
      |      ORDER BY q), 'sum')
      |    / (CAST(n.n1 AS DOUBLE) * n.n1 * n.n2 * n.n2)
      |    * (CAST(n.n1 AS DOUBLE) * n.n2
      |      / ((n.n1 + n.n2) * CAST(n.n1 + n.n2 AS DOUBLE))) AS t
      |  FROM cum CROSS JOIN n GROUP BY n.n1, n.n2)
      |SELECT n.n1, n.n2, floor(t.t * 1000000 + 0.5) / 1000000 AS t_stat,
      |  t.t > 0.461 AS reject
      |FROM t CROSS JOIN n""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("grp"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("q")
      .agg(sum(when(col("grp") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("grp") === "R", 1L).otherwise(0L)).as("c2"))
    val n = c.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val cum = c.as("a")
      .join(c.select(col("q").as("q2"), col("c1").as("d1"),
        col("c2").as("d2")), col("q2") <= col("a.q"))
      .groupBy(col("a.q").as("q"))
      .agg(first("c1").as("c1"), first("c2").as("c2"),
        sum("d1").as("k1"), sum("d2").as("k2"))
    val t = cum.crossJoin(broadcast(n)).groupBy("n1", "n2")
      .agg((expr("aggregate(array_sort(collect_list(struct(q, " +
        "(c1 + c2) * (CAST(k1 AS DOUBLE) * n2 - CAST(k2 AS DOUBLE) * n1) " +
        "* (CAST(k1 AS DOUBLE) * n2 - CAST(k2 AS DOUBLE) * n1) AS v))), " +
        "0D, (acc, x) -> acc + x.v)")
        / (col("n1").cast("double") * col("n1") * col("n2") * col("n2"))
        * (col("n1").cast("double") * col("n2")
          / ((col("n1") + col("n2"))
            * (col("n1") + col("n2")).cast("double")))).as("t"))
    t.select(col("n1"), col("n2"),
      (floor(col("t") * 1000000 + lit(0.5)) / 1000000).as("t_stat"),
      (col("t") > 0.461).as("reject"))
  }

  /** Box–Cox profile log-likelihood over the λ grid
    * {−1, −½, 0, ½, 1} for daily revenue — "which power transform
    * makes this series most Gaussian". Every λ's transform is spelled
    * with correctly-rounded primitives only (1/x, 1/√x, ln, √x —
    * fractional pow deliberately avoided: its libm rounding is not a
    * cross-engine contract), ℓ(λ) = −n/2·ln(σ̂²_λ) + (λ−1)Σln x with
    * every Σ folded day-sorted, and the winner compares identical
    * doubles with a smaller-λ tie-break. 5×days bounded fan. */
  lazy val boxcoxGrid: Q = Q(
    "boxcox_grid",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) AS t,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      // 100 AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1 HAVING sum(l_extendedprice) > 0),
      |lam AS (SELECT unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS lam),
      |y AS (SELECT lam.lam, d.t, CAST(d.x AS DOUBLE) AS x,
      |    CASE WHEN lam.lam = 1.0 THEN CAST(d.x AS DOUBLE) - 1
      |      WHEN lam.lam = 0.5 THEN 2 * (sqrt(CAST(d.x AS DOUBLE)) - 1)
      |      WHEN lam.lam = 0.0 THEN ln(CAST(d.x AS DOUBLE))
      |      WHEN lam.lam = -0.5 THEN
      |        2 * (1 - 1 / sqrt(CAST(d.x AS DOUBLE)))
      |      ELSE 1 - 1 / CAST(d.x AS DOUBLE) END AS y
      |  FROM lam CROSS JOIN daily d),
      |f AS (SELECT lam, CAST(count(*) AS BIGINT) AS n,
      |    list_aggregate(list(y ORDER BY t), 'sum') AS sy,
      |    list_aggregate(list(y * y ORDER BY t), 'sum') AS syy,
      |    list_aggregate(list(ln(x) ORDER BY t), 'sum') AS slx
      |  FROM y GROUP BY lam),
      |ll AS (SELECT lam, n,
      |    -(n / 2.0) * ln((syy - sy * sy / n) / n) + (lam - 1) * slx
      |      AS loglik
      |  FROM f),
      |mx AS (SELECT max(loglik) AS m FROM ll)
      |SELECT ll.lam AS lambda,
      |  floor(ll.loglik * 10000 + 0.5) / 10000 AS loglik,
      |  ll.loglik = mx.m AS is_best
      |FROM ll CROSS JOIN mx ORDER BY lambda""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .groupBy(datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(floor(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("x"))
      .filter(col("x") > 0)
    val lam = s.createDataFrame(Seq(Tuple1(-1.0), Tuple1(-0.5), Tuple1(0.0),
      Tuple1(0.5), Tuple1(1.0))).toDF("lam")
    val xd = col("x").cast("double")
    val y = lam.crossJoin(daily)
      .select(col("lam"), col("t"), xd.as("x"),
        when(col("lam") === 1.0, xd - 1)
          .when(col("lam") === 0.5, lit(2) * (sqrt(xd) - 1))
          .when(col("lam") === 0.0, log(xd))
          .when(col("lam") === -0.5, lit(2) * (lit(1) - lit(1) / sqrt(xd)))
          .otherwise(lit(1) - lit(1) / xd).as("y"))
    val f = y.groupBy("lam")
      .agg(count(lit(1)).as("n"),
        expr("aggregate(array_sort(collect_list(struct(t, y AS v))), 0D, " +
          "(acc, x) -> acc + x.v)").as("sy"),
        expr("aggregate(array_sort(collect_list(struct(t, y * y AS v))), " +
          "0D, (acc, x) -> acc + x.v)").as("syy"),
        expr("aggregate(array_sort(collect_list(struct(t, ln(x) AS v))), " +
          "0D, (acc, x) -> acc + x.v)").as("slx"))
    val ll = f.select(col("lam"), col("n"),
      (-(col("n") / 2.0) * log((col("syy") - col("sy") * col("sy")
        / col("n")) / col("n")) + (col("lam") - 1) * col("slx"))
        .as("loglik"))
    val mx = ll.agg(max("loglik").as("m"))
    ll.crossJoin(broadcast(mx))
      .select(col("lam").as("lambda"),
        (floor(col("loglik") * 10000 + lit(0.5)) / 10000).as("loglik"),
        (col("loglik") === col("m")).as("is_best"))
      .orderBy("lambda")
  }

  /** Robust (median/IQR) scaling per group + the outlier census it
    * exists for: |x − med| > 3·IQR flags per return flag. Pass 1 is
    * the exact interpolated multi-quantile per group (q117's
    * machinery); pass 2 re-scans with the k-row stats broadcast. Both
    * engines compare against the SAME 1e-4-rounded med/IQR, so the
    * boundary is a shared grid point, not an ulp race. */
  lazy val robustScaler: Q = Q(
    "robust_scaler",
    """WITH g AS (SELECT l_returnflag AS f,
      |    floor(quantile_cont(l_extendedprice, 0.50) * 10000 + 0.5) / 10000
      |      AS med,
      |    floor((quantile_cont(l_extendedprice, 0.75)
      |         - quantile_cont(l_extendedprice, 0.25)) * 10000 + 0.5) / 10000
      |      AS iqr
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT g.f, g.med, g.iqr,
      |  CAST(sum(CASE WHEN abs(l.l_extendedprice - g.med) > 3 * g.iqr
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem l JOIN g ON g.f = l.l_returnflag
      |GROUP BY g.f, g.med, g.iqr ORDER BY g.f""".stripMargin) { (s, d) =>
    val g = Tables.lineitem(s, d).groupBy(col("l_returnflag").as("f"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))")
        .as("ps"))
      .select(col("f"),
        (floor(col("ps").getItem(1) * 10000 + lit(0.5)) / 10000).as("med"),
        (floor((col("ps").getItem(2) - col("ps").getItem(0)) * 10000
          + lit(0.5)) / 10000).as("iqr"))
    Tables.lineitem(s, d)
      .join(broadcast(g), col("l_returnflag") === col("f"))
      .groupBy("f", "med", "iqr")
      .agg(sum(when(abs(col("l_extendedprice") - col("med"))
          > lit(3) * col("iqr"), 1).otherwise(0)).cast("long")
        .as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy("f")
  }

  /** Per-group simple regression — price-vs-quantity slope for every
    * return flag in ONE grouped aggregate (the per-segment elasticity
    * sweep; multireg_normal is the single global fit). All five
    * moments are exact BIGINTs per group; slope/intercept/r² are
    * fixed-form double expressions over them, so the gate is
    * bit-deterministic. Map-side partial aggregation makes this a
    * full scan + k-row shuffle at any scale. */
  lazy val groupwiseOls: Q = Q(
    "groupwise_ols",
    """WITH b AS (SELECT l_returnflag AS f,
      |    CAST(floor(l_quantity) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice / 100) AS BIGINT) AS y FROM lineitem),
      |g AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM b GROUP BY f)
      |SELECT f, n,
      |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * 1000000 + 0.5) / 1000000 AS slope,
      |  floor((CAST(sy AS DOUBLE)
      |      - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
      |    / n * 1000000 + 0.5) / 1000000 AS icept,
      |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
      |    * 1000000 + 0.5) / 1000000 AS r2
      |FROM g ORDER BY f""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(col("l_returnflag").as("f"),
      floor(col("l_quantity")).cast("long").as("x"),
      floor(col("l_extendedprice") / 100).cast("long").as("y"))
    val g = b.groupBy("f").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")
    val denx = col("n").cast("double") * col("sxx") -
      col("sx").cast("double") * col("sx")
    val deny = col("n").cast("double") * col("syy") -
      col("sy").cast("double") * col("sy")
    g.select(col("f"), col("n"),
      (floor(num / denx * 1000000 + lit(0.5)) / 1000000).as("slope"),
      (floor((col("sy").cast("double") - num / denx * col("sx")) / col("n")
        * 1000000 + lit(0.5)) / 1000000).as("icept"),
      (floor(num * num / (denx * deny) * 1000000 + lit(0.5)) / 1000000)
        .as("r2"))
      .orderBy("f")
  }

  /** James–Stein shrinkage of the 25 per-nation mean order values
    * toward the grand mean (James & Stein 1961; the empirical-Bayes
    * fix for the winner's curse in per-segment dashboards — small
    * segments' extreme means are pulled in hardest). Estimator:
    * js_i = μ̂ + (1 − c)·(x̄_i − μ̂) with c = (k−3)·σ̄²/Σ(x̄_i − μ̂)²,
    * σ̄² = the mean sampling variance of the group means (pooled
    * within-group variance / n_i, averaged). Group moments are exact
    * BIGINT cents; μ̂, σ̄², and the spread fold NATION-SORTED over the
    * 25-row group relation, and c broadcasts back as one row. Shapes:
    * two grouped aggregates + a 25-row fold + a broadcast join. */
  lazy val jamesStein: Q = Q(
    "james_stein_shrink",
    """WITH g AS (SELECT c.c_nationkey AS nk,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s1,
      |    sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |      AS HUGEINT) * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS s2
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |m AS (SELECT nk, n, CAST(s1 AS DOUBLE) / n AS xbar,
      |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) / n
      |      AS sv
      |  FROM g),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |    list_aggregate(list(xbar ORDER BY nk), 'sum') / count(*) AS mu,
      |    list_aggregate(list(sv ORDER BY nk), 'sum') / count(*) AS svbar
      |  FROM m),
      |sp AS (SELECT k, mu, svbar,
      |    list_aggregate(list((xbar - mu) * (xbar - mu) ORDER BY nk), 'sum')
      |      AS spread
      |  FROM m CROSS JOIN f GROUP BY k, mu, svbar),
      |c AS (SELECT k, mu, (k - 3) * svbar / spread AS shrink FROM sp)
      |SELECT nk AS nationkey, n,
      |  floor(xbar / 100 * 100 + 0.5) / 100 AS raw_mean,
      |  floor((mu + (1 - shrink) * (xbar - mu)) / 100 * 100 + 0.5) / 100
      |    AS js_mean,
      |  floor(shrink * 1000000 + 0.5) / 1000000 AS shrink_factor
      |FROM m CROSS JOIN c ORDER BY nationkey""".stripMargin) { (s, d) =>
    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"), cents.as("v"))
      .groupBy("nk")
      .agg(count(lit(1)).as("n"), sum("v").as("s1"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
    val m = g.select(col("nk"), col("n"),
      (col("s1").cast("double") / col("n")).as("xbar"),
      ((col("s2").cast("double") - col("s1").cast("double") * col("s1")
        / col("n")) / (col("n") - 1) / col("n")).as("sv"))
    def nkFold(field: String): org.apache.spark.sql.Column =
      expr(s"aggregate(transform(array_sort(collect_list(struct(nk, $field))), " +
        s"t -> t.$field), 0D, (a, x) -> a + x)")
    val f = m.agg(count(lit(1)).as("k"), nkFold("xbar").as("sx"),
        nkFold("sv").as("ssv"))
      .select(col("k"), (col("sx") / col("k")).as("mu"),
        (col("ssv") / col("k")).as("svbar"))
    val withMu = m.crossJoin(broadcast(f)) // 1-row grand-mean broadcast
      .withColumn("dev2", (col("xbar") - col("mu")) * (col("xbar") - col("mu")))
    val sp = withMu.groupBy("k", "mu", "svbar")
      .agg(nkFold("dev2").as("spread"))
    val cdf = sp.select(col("k"), col("mu"),
      ((col("k") - 3) * col("svbar") / col("spread")).as("shrink"))
    m.crossJoin(broadcast(cdf)) // 1-row shrink-factor broadcast
      .select(col("nk").as("nationkey"), col("n"),
        (floor(col("xbar") / 100 * 100 + lit(0.5)) / 100).as("raw_mean"),
        (floor((col("mu") + (lit(1) - col("shrink"))
          * (col("xbar") - col("mu"))) / 100 * 100 + lit(0.5)) / 100)
          .as("js_mean"),
        (floor(col("shrink") * 1000000 + lit(0.5)) / 1000000)
          .as("shrink_factor"))
      .orderBy("nationkey")
  }

  /** Simpson's-paradox detector — the aggregation-audit every segment
    * dashboard needs: does the POOLED association between discount and
    * quantity keep its sign inside every return-flag segment?
    * Per-group and pooled regression slopes come from exact integer
    * co-moments (discount scaled ×100, quantity rounded — q82's
    * REGR_* algebra), so the covariance NUMERATOR n·Σxy − Σx·Σy is an
    * exact BIGINT and the flip test is pure SIGN LOGIC on those
    * integers (kendall_tau's device — the num·pnum product overflows
    * int64 at sf0.1). Output: one row per segment + the pooled
    * row, with slope and a flipped flag. */
  lazy val simpsonCheck: Q = Q(
    "simpson_check",
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM b GROUP BY grp),
      |p AS (SELECT 'ALL' AS grp, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT) AS sy,
      |    CAST(sum(sxy) AS BIGINT) AS sxy,
      |    CAST(sum(sxx) AS BIGINT) AS sxx FROM g),
      |ps AS (SELECT n * sxy - sx * sy AS pnum FROM p),
      |u AS (SELECT * FROM g UNION ALL SELECT * FROM p)
      |SELECT grp, n,
      |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * 1000000 + 0.5) / 1000000 AS slope,
      |  CASE WHEN ((n * sxy - sx * sy) < 0 AND pnum > 0)
      |         OR ((n * sxy - sx * sy) > 0 AND pnum < 0) THEN 1 ELSE 0 END
      |    AS flipped
      |FROM u CROSS JOIN ps ORDER BY grp""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(
      col("l_returnflag").as("grp"),
      floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("x"),
      floor(col("l_quantity") + lit(0.5)).cast("long").as("y"))
    val g = b.groupBy("grp").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val p = g.agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
      sum("sxy").as("sxy"), sum("sxx").as("sxx"))
      .select(lit("ALL").as("grp"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"))
    val ps = p.select((col("n") * col("sxy") - col("sx") * col("sy"))
      .as("pnum"))
    val u = g.select("grp", "n", "sx", "sy", "sxy", "sxx").unionAll(p)
    u.crossJoin(broadcast(ps)) // 1-row pooled-sign broadcast
      .select(col("grp"), col("n"),
        (floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx"))
          * 1000000 + lit(0.5)) / 1000000).as("slope"),
        when(((col("n") * col("sxy") - col("sx") * col("sy")) < 0
            && col("pnum") > 0)
          || ((col("n") * col("sxy") - col("sx") * col("sy")) > 0
            && col("pnum") < 0), 1).otherwise(0).as("flipped"))
      .orderBy("grp")
  }

  /** Kruskal–Wallis H (rank one-way ANOVA): does quantity's
    * DISTRIBUTION differ across return flags, without anova_quantity's
    * normality assumption? Quantity is a 50-value discrete column, so
    * mid-ranks are exact integers on the doubled grid (m2 = 2·ranks):
    * per-(flag,value) counts collapse the 600k-row scan to ≤150 cells,
    * the cumulative-below table is a 50×50 bounded self-join (no
    * partition-less window), and H folds the 3 per-group R²/n terms in
    * group-sorted order. Everything is BIGINT until the final 3
    * divisions; the tie-corrected divisor uses Σ(t³−t) exactly. At
    * 100 TB the only full-scan shuffle is the ≤150-cell partial agg. */
  lazy val kruskalWallis: Q = Q(
    "kruskal_wallis",
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem),
      |cgq AS (SELECT grp, q, CAST(count(*) AS BIGINT) AS c FROM b
      |  GROUP BY grp, q),
      |cq AS (SELECT q, CAST(sum(c) AS BIGINT) AS cv FROM cgq GROUP BY q),
      |cum AS (SELECT a.q, any_value(a.cv) AS cv,
      |    CAST(COALESCE(sum(b2.cv), 0) AS BIGINT) AS cb
      |  FROM cq a LEFT JOIN cq b2 ON b2.q < a.q GROUP BY a.q),
      |g AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
      |    CAST(sum(c * (2 * cum.cb + cum.cv + 1)) AS BIGINT) AS r2
      |  FROM cgq JOIN cum ON cum.q = cgq.q GROUP BY grp),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS k FROM g),
      |tie AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS t FROM cq),
      |h AS (SELECT n, k, t,
      |    12.0 / (CAST(n AS DOUBLE) * (n + 1))
      |      * list_aggregate(list(CAST(r2 AS DOUBLE) * r2
      |          / (4.0 * n_g) ORDER BY grp), 'sum')
      |      - 3.0 * (n + 1) AS hraw
      |  FROM g CROSS JOIN tot CROSS JOIN tie
      |  GROUP BY n, k, t),
      |hc AS (SELECT n, k,
      |    hraw / (1.0 - CAST(t AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n * n - n)) AS h FROM h)
      |SELECT g.grp, g.n_g,
      |  floor(CAST(g.r2 AS DOUBLE) / (2.0 * g.n_g) * 10000 + 0.5) / 10000
      |    AS mean_rank,
      |  floor(hc.h * 1000000 + 0.5) / 1000000 AS h_corr,
      |  hc.h > 5.991465 AS reject
      |FROM g CROSS JOIN hc ORDER BY g.grp""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(col("l_returnflag").as("grp"),
      floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
    val cgq = b.groupBy("grp", "q").agg(count(lit(1)).as("c"))
    val cq = cgq.groupBy("q").agg(sum("c").as("cv"))
    val cum = cq.as("a")
      .join(cq.select(col("q").as("q2"), col("cv").as("cv2")),
        col("q2") < col("a.q"), "left_outer")
      .groupBy(col("a.q").as("q")).agg(first("cv").as("cv"),
        coalesce(sum("cv2"), lit(0L)).as("cb"))
    val g = cgq.join(broadcast(cum), "q")
      .groupBy("grp").agg(sum("c").as("n_g"),
        sum(col("c") * (lit(2) * col("cb") + col("cv") + 1)).as("r2"))
    val tot = g.agg(sum("n_g").as("n"), count(lit(1)).as("k"))
    val tie = cq.agg(sum(col("cv") * col("cv") * col("cv") - col("cv"))
      .as("t"))
    // 3-term R²/n fold in group-sorted order: both engines add the
    // identical doubles in the identical sequence.
    val h = g.crossJoin(broadcast(tot)).crossJoin(broadcast(tie))
      .groupBy("n", "k", "t")
      .agg(expr("aggregate(array_sort(collect_list(struct(grp, " +
        "CAST(r2 AS DOUBLE) * r2 / (4.0 * n_g) AS term))), 0D, " +
        "(acc, x) -> acc + x.term)").as("s2"))
      .select(col("n"), col("k"),
        ((lit(12.0) / (col("n").cast("double") * (col("n") + 1)) * col("s2")
          - lit(3.0) * (col("n") + 1))
          / (lit(1.0) - col("t").cast("double")
            / (col("n").cast("double") * col("n") * col("n") - col("n"))))
          .as("h"))
    g.crossJoin(broadcast(h))
      .select(col("grp"), col("n_g"),
        (floor(col("r2").cast("double") / (lit(2.0) * col("n_g")) * 10000
          + lit(0.5)) / 10000).as("mean_rank"),
        (floor(col("h") * 1000000 + lit(0.5)) / 1000000).as("h_corr"),
        (col("h") > 5.991465).as("reject"))
      .orderBy("grp")
  }

  /** Fisher's exact test on the Brand#4 × large-size 2×2 over `part`
    * — the small-margin independence test chi² can't justify when a
    * cell is sparse. The hypergeometric support is bounded by the
    * SMALLER margin (≈800 at sf0.1): log-weights come from the exact
    * product recurrence lnw(k+1) = lnw(k) + ln((r1−k)(c1−k)) −
    * ln((k+1)(N−r1−c1+k+1)) folded in ascending k on one collapsed
    * row (O(s²) double-ops, margin-bounded — at 100 TB margins this
    * size keep it sub-second; for huge margins the χ²/z tests are the
    * right tool and already exist). Two-sided p sums exp(lnw−max) for
    * every table at-or-below the observed weight (1e-9 log-space
    * slack); ln/exp parity is the corpus-wide discipline
    * (lm_perplexity, bh_fdr). */
  lazy val fisherExact: Q = Q(
    "fisher_exact",
    """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN p_brand = 'Brand#4' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r1,
      |    CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN p_brand = 'Brand#4' AND p_size > 25
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a FROM part),
      |k AS (SELECT *, greatest(0, r1 + c1 - n) AS kmin,
      |    least(r1, c1) AS kmax FROM m),
      |lw AS (SELECT k.*, list_transform(generate_series(kmin, kmax),
      |    kk -> COALESCE(list_aggregate(list_transform(
      |        list_filter(generate_series(kmin, kmax - 1), j -> j < kk),
      |        j -> ln(CAST((r1 - j) * (c1 - j) AS DOUBLE))
      |           - ln(CAST((j + 1) * (n - r1 - c1 + j + 1) AS DOUBLE))),
      |      'sum'), 0.0)) AS lnw FROM k),
      |st AS (SELECT lw.*, list_aggregate(lnw, 'max') AS mx,
      |    lnw[CAST(a - kmin + 1 AS INTEGER)] AS lna FROM lw),
      |pp AS (SELECT n, r1, c1, a, kmax - kmin + 1 AS n_tables,
      |    CAST(len(list_filter(lnw, x -> x <= lna + 1e-9)) AS BIGINT)
      |      AS tail_tables,
      |    list_aggregate(list_transform(
      |      list_filter(lnw, x -> x <= lna + 1e-9),
      |      x -> exp(x - mx)), 'sum')
      |    / list_aggregate(list_transform(lnw, x -> exp(x - mx)), 'sum')
      |      AS p FROM st)
      |SELECT n, r1, c1, a AS a_obs, n_tables, tail_tables,
      |  floor(p * 1000000 + 0.5) / 1000000 AS p_two_sided,
      |  floor(CAST(a AS DOUBLE) * (n - r1 - c1 + a)
      |    / ((r1 - a) * (c1 - a)) * 1000000 + 0.5) / 1000000
      |    AS odds_ratio
      |FROM pp""".stripMargin) { (s, d) =>
    val m = Tables.part(s, d).agg(count(lit(1)).as("n"),
      sum(when(col("p_brand") === "Brand#4", 1L).otherwise(0L)).as("r1"),
      sum(when(col("p_size") > 25, 1L).otherwise(0L)).as("c1"),
      sum(when(col("p_brand") === "Brand#4" && col("p_size") > 25, 1L)
        .otherwise(0L)).as("a"))
    m.withColumn("kmin", greatest(lit(0L), col("r1") + col("c1") - col("n")))
      .withColumn("kmax", least(col("r1"), col("c1")))
      .withColumn("lnw", expr(
        "transform(sequence(kmin, kmax), kk -> " +
          "aggregate(filter(sequence(kmin, kmax - 1), j -> j < kk), 0D, " +
          "(acc, j) -> acc + ln(CAST((r1 - j) * (c1 - j) AS DOUBLE)) " +
          "- ln(CAST((j + 1) * (n - r1 - c1 + j + 1) AS DOUBLE))))"))
      .withColumn("mx", expr("array_max(lnw)"))
      .withColumn("lna", expr("element_at(lnw, CAST(a - kmin + 1 AS INT))"))
      .select(col("n"), col("r1"), col("c1"), col("a").as("a_obs"),
        (col("kmax") - col("kmin") + 1).as("n_tables"),
        expr("CAST(size(filter(lnw, x -> x <= lna + 1e-9)) AS BIGINT)")
          .as("tail_tables"),
        (floor(expr("aggregate(transform(filter(lnw, x -> x <= lna + 1e-9), " +
          "x -> exp(x - mx)), 0D, (acc, x) -> acc + x)")
          / expr("aggregate(transform(lnw, x -> exp(x - mx)), 0D, " +
            "(acc, x) -> acc + x)") * 1000000 + lit(0.5)) / 1000000)
          .as("p_two_sided"),
        (floor(col("a").cast("double")
          * (col("n") - col("r1") - col("c1") + col("a"))
          / ((col("r1") - col("a")) * (col("c1") - col("a")))
          * 1000000 + lit(0.5)) / 1000000).as("odds_ratio"))
  }

  /** Cohen's d / Hedges' g effect size for the A-vs-R quantity gap —
    * the "is it LARGE, not just significant" companion to
    * welch_ttest. One conditional-aggregate scan (map-side combined,
    * 1-row result); every moment is BIGINT and d/g are fixed
    * closed-form double expressions over them, so both engines emit
    * bit-identical values before the shared 1e-6 grid. */
  lazy val cohensD: Q = Q(
    "cohens_d",
    """WITH m AS (SELECT
      |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'A'
      |      THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN l_returnflag = 'A'
      |      THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
      |         * CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS ss1,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN l_returnflag = 'R'
      |      THEN CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS s2,
      |    CAST(sum(CASE WHEN l_returnflag = 'R'
      |      THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
      |         * CAST(floor(l_quantity + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS ss2
      |  FROM lineitem),
      |e AS (SELECT n1, n2,
      |    (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
      |    / sqrt(((ss1 - CAST(s1 AS DOUBLE) * s1 / n1)
      |          + (ss2 - CAST(s2 AS DOUBLE) * s2 / n2))
      |        / (n1 + n2 - 2)) AS d FROM m)
      |SELECT n1, n2, floor(d * 1000000 + 0.5) / 1000000 AS cohens_d,
      |  floor(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9)) * 1000000 + 0.5)
      |    / 1000000 AS hedges_g,
      |  CASE WHEN abs(d) < 0.2 THEN 'negligible'
      |    WHEN abs(d) < 0.5 THEN 'small'
      |    WHEN abs(d) < 0.8 THEN 'medium' ELSE 'large' END AS magnitude
      |FROM e""".stripMargin) { (s, d) =>
    val q = floor(col("l_quantity") + lit(0.5)).cast("long")
    def side(f: String, e: Column): Column =
      sum(when(col("l_returnflag") === f, e).otherwise(0L))
    val m = Tables.lineitem(s, d).agg(
      side("A", lit(1L)).as("n1"), side("A", q).as("s1"),
      side("A", q * q).as("ss1"),
      side("R", lit(1L)).as("n2"), side("R", q).as("s2"),
      side("R", q * q).as("ss2"))
    val dd = (col("s1").cast("double") / col("n1")
      - col("s2").cast("double") / col("n2")) /
      sqrt(((col("ss1") - col("s1").cast("double") * col("s1") / col("n1"))
        + (col("ss2") - col("s2").cast("double") * col("s2") / col("n2")))
        / (col("n1") + col("n2") - 2))
    m.select(col("n1"), col("n2"),
      (floor(dd * 1000000 + lit(0.5)) / 1000000).as("cohens_d"),
      (floor(dd * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n1") + col("n2"))
        - 9)) * 1000000 + lit(0.5)) / 1000000).as("hedges_g"),
      when(abs(dd) < 0.2, "negligible").when(abs(dd) < 0.5, "small")
        .when(abs(dd) < 0.8, "medium").otherwise("large").as("magnitude"))
  }

  /** Cliff's delta — the ordinal effect size P(X>Y) − P(X<Y) for the
    * same A-vs-R contrast, EXACT without the O(n²) pair walk: quantity
    * has ≤50 distinct values, so the dominance sums ride a 50×50
    * value-count cross (integer products, one division at the end).
    * The full-scan work is one ≤100-cell partial aggregate; the pair
    * logic never touches row-level data — the shape that survives any
    * scale as long as the value domain stays bounded. */
  lazy val cliffsDelta: Q = Q(
    "cliffs_delta",
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem
      |  WHERE l_returnflag IN ('A', 'R')),
      |c AS (SELECT grp, q, CAST(count(*) AS BIGINT) AS c FROM b
      |  GROUP BY grp, q),
      |x AS (SELECT q, c FROM c WHERE grp = 'A'),
      |y AS (SELECT q, c FROM c WHERE grp = 'R'),
      |n AS (SELECT (SELECT sum(c) FROM x) AS n1,
      |    (SELECT sum(c) FROM y) AS n2),
      |dom AS (SELECT
      |    CAST(sum(CASE WHEN x.q > y.q THEN x.c * y.c ELSE 0 END)
      |      AS BIGINT) AS gt,
      |    CAST(sum(CASE WHEN x.q < y.q THEN x.c * y.c ELSE 0 END)
      |      AS BIGINT) AS lt
      |  FROM x CROSS JOIN y)
      |SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
      |  dom.gt, dom.lt,
      |  floor((CAST(dom.gt AS DOUBLE) - dom.lt)
      |    / (CAST(n.n1 AS DOUBLE) * n.n2) * 1000000 + 0.5) / 1000000
      |    AS delta,
      |  CASE WHEN abs((CAST(dom.gt AS DOUBLE) - dom.lt)
      |      / (CAST(n.n1 AS DOUBLE) * n.n2)) < 0.147 THEN 'negligible'
      |    WHEN abs((CAST(dom.gt AS DOUBLE) - dom.lt)
      |      / (CAST(n.n1 AS DOUBLE) * n.n2)) < 0.33 THEN 'small'
      |    WHEN abs((CAST(dom.gt AS DOUBLE) - dom.lt)
      |      / (CAST(n.n1 AS DOUBLE) * n.n2)) < 0.474 THEN 'medium'
      |    ELSE 'large' END AS magnitude
      |FROM dom CROSS JOIN n""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("grp"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("grp", "q").agg(count(lit(1)).as("c"))
    val x = c.filter(col("grp") === "A").select(col("q").as("qx"),
      col("c").as("cx"))
    val y = c.filter(col("grp") === "R").select(col("q").as("qy"),
      col("c").as("cy"))
    val n = x.agg(sum("cx").as("n1"))
      .crossJoin(y.agg(sum("cy").as("n2"))) // 1-row × 1-row
    val dom = x.crossJoin(broadcast(y)) // ≤50 × ≤50 value cells
      .agg(sum(when(col("qx") > col("qy"), col("cx") * col("cy"))
        .otherwise(0L)).as("gt"),
        sum(when(col("qx") < col("qy"), col("cx") * col("cy"))
          .otherwise(0L)).as("lt"))
    val delta = (col("gt").cast("double") - col("lt")) /
      (col("n1").cast("double") * col("n2"))
    dom.crossJoin(broadcast(n)) // 1-row stats
      .select(col("n1"), col("n2"), col("gt"), col("lt"),
        (floor(delta * 1000000 + lit(0.5)) / 1000000).as("delta"),
        when(abs(delta) < 0.147, "negligible")
          .when(abs(delta) < 0.33, "small")
          .when(abs(delta) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
  }

  /** Exact 1-D Wasserstein (earth-mover) distance between quantity
    * distributions for every return-flag pair — the drift metric that,
    * unlike KS, weighs HOW FAR mass moved, not just the largest gap.
    * W1 = Σ |F1−F2| Δx over the merged support: with ≤50 distinct
    * values everything after the ≤150-cell count collapse is bounded
    * joins of value tables, and |F1·n2 − F2·n1|·Δx keeps the sum in
    * exact BIGINT until the single final division per pair. */
  lazy val wasserstein1d: Q = Q(
    "wasserstein_1d",
    """WITH b AS (SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q FROM lineitem),
      |c AS (SELECT grp, q, CAST(count(*) AS BIGINT) AS c FROM b
      |  GROUP BY grp, q),
      |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY grp),
      |v AS (SELECT DISTINCT q FROM c),
      |nx AS (SELECT a.q, min(b2.q) AS qn FROM v a JOIN v b2
      |  ON b2.q > a.q GROUP BY a.q),
      |pr AS (SELECT a.grp AS g1, b2.grp AS g2 FROM n a JOIN n b2
      |  ON a.grp < b2.grp),
      |cum AS (SELECT n.grp, v.q, CAST(COALESCE(sum(c.c), 0) AS BIGINT)
      |    AS cum
      |  FROM n CROSS JOIN v LEFT JOIN c
      |    ON c.grp = n.grp AND c.q <= v.q
      |  GROUP BY n.grp, v.q),
      |t AS (SELECT pr.g1, pr.g2,
      |    CAST(sum(abs(c1.cum * n2.n - c2.cum * n1.n) * (nx.qn - nx.q))
      |      AS BIGINT) AS num
      |  FROM pr JOIN nx ON TRUE
      |    JOIN cum c1 ON c1.grp = pr.g1 AND c1.q = nx.q
      |    JOIN cum c2 ON c2.grp = pr.g2 AND c2.q = nx.q
      |    JOIN n n1 ON n1.grp = pr.g1 JOIN n n2 ON n2.grp = pr.g2
      |  GROUP BY pr.g1, pr.g2)
      |SELECT t.g1, t.g2, n1.n AS n1, n2.n AS n2,
      |  floor(CAST(t.num AS DOUBLE) / (CAST(n1.n AS DOUBLE) * n2.n)
      |    * 1000000 + 0.5) / 1000000 AS w1
      |FROM t JOIN n n1 ON n1.grp = t.g1 JOIN n n2 ON n2.grp = t.g2
      |ORDER BY t.g1, t.g2""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("grp", "q").agg(count(lit(1)).as("c"))
    val n = c.groupBy("grp").agg(sum("c").as("n"))
    val v = c.select("q").distinct()
    val nx = v.as("a")
      .join(v.select(col("q").as("q2")), col("q2") > col("a.q"))
      .groupBy(col("a.q").as("q")).agg(min("q2").as("qn"))
    val pr = n.select(col("grp").as("g1"))
      .join(n.select(col("grp").as("g2")), col("g1") < col("g2"))
    val cum = n.select(col("grp")).crossJoin(broadcast(v))
      .join(c.select(col("grp").as("cg"), col("q").as("cq"),
        col("c").as("cc")),
        col("cg") === col("grp") && col("cq") <= col("q"), "left_outer")
      .groupBy("grp", "q").agg(coalesce(sum("cc"), lit(0L)).as("cum"))
    val nn1 = n.select(col("grp").as("g1"), col("n").as("n1"))
    val nn2 = n.select(col("grp").as("g2"), col("n").as("n2"))
    val t = pr.crossJoin(broadcast(nx))
      .join(cum.select(col("grp").as("g1"), col("q"), col("cum").as("cum1")),
        Seq("g1", "q"))
      .join(cum.select(col("grp").as("g2"), col("q"), col("cum").as("cum2")),
        Seq("g2", "q"))
      .join(broadcast(nn1), "g1").join(broadcast(nn2), "g2")
      .groupBy("g1", "g2")
      .agg(sum(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
        * (col("qn") - col("q"))).as("num"))
    t.join(broadcast(nn1), "g1").join(broadcast(nn2), "g2")
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        (floor(col("num").cast("double")
          / (col("n1").cast("double") * col("n2")) * 1000000 + lit(0.5))
          / 1000000).as("w1"))
      .orderBy("g1", "g2")
  }

  /** Durbin–Watson serial-correlation statistic on the residuals of
    * the daily-order-count trend line — "is what the trend leaves
    * behind still autocorrelated?" (the classic regression-diagnostic
    * companion to q109_acf, which works on the raw series). OLS
    * coefficients are exact rationals over BIGINT sums; residuals are
    * one shared double expression; both quadratic forms fold in
    * day-sorted order via sorted-list aggregation, and consecutive
    * pairing is a calendar-bounded next-observed-day self-join (no
    * partition-less window, ~2.4k days regardless of SF). */
  lazy val durbinWatson: Q = Q(
    "durbin_watson",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS t,
      |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(t * t) AS BIGINT) AS stt,
      |    CAST(sum(t * y) AS BIGINT) AS sty FROM daily),
      |cf AS (SELECT n,
      |    CAST(n * sty - st * sy AS DOUBLE)
      |      / (n * stt - st * st) AS b,
      |    (sy - CAST(n * sty - st * sy AS DOUBLE)
      |      / (n * stt - st * st) * st) / n AS a FROM m),
      |e AS (SELECT d.t, d.y - cf.a - cf.b * d.t AS e
      |  FROM daily d CROSS JOIN cf),
      |nxt AS (SELECT a.t, min(b2.t) AS tn FROM daily a JOIN daily b2
      |  ON b2.t > a.t GROUP BY a.t),
      |den AS (SELECT list_aggregate(list(e * e ORDER BY t), 'sum')
      |    AS den FROM e),
      |num AS (SELECT list_aggregate(list((e2.e - e1.e) * (e2.e - e1.e)
      |      ORDER BY e1.t), 'sum') AS num
      |  FROM nxt JOIN e e1 ON e1.t = nxt.t JOIN e e2 ON e2.t = nxt.tn)
      |SELECT cf.n AS n_days,
      |  floor(num.num / den.den * 1000000 + 0.5) / 1000000 AS dw,
      |  floor((1.0 - num.num / den.den / 2.0) * 1000000 + 0.5) / 1000000
      |    AS rho_approx,
      |  CASE WHEN num.num / den.den < 1.5 THEN 'positive'
      |    WHEN num.num / den.den > 2.5 THEN 'negative'
      |    ELSE 'none' END AS serial_corr
      |FROM num CROSS JOIN den CROSS JOIN cf""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y"))
    val m = daily.agg(count(lit(1)).as("n"), sum("t").as("st"),
      sum("y").as("sy"), sum(col("t") * col("t")).as("stt"),
      sum(col("t") * col("y")).as("sty"))
    val bC = (col("n") * col("sty") - col("st") * col("sy")).cast("double") /
      (col("n") * col("stt") - col("st") * col("st"))
    val cf = m.select(col("n"), bC.as("b"),
      ((col("sy") - bC * col("st")) / col("n")).as("a"))
    val e = daily.crossJoin(broadcast(cf))
      .select(col("t"), col("n"),
        (col("y") - col("a") - col("b") * col("t")).as("e"))
    val nxt = daily.as("a")
      .join(daily.select(col("t").as("t2")), col("t2") > col("a.t"))
      .groupBy(col("a.t").as("t")).agg(min("t2").as("tn"))
    // day-sorted double folds: identical accumulation order on both
    // engines (the kleinberg/durbin discipline)
    val den = e.agg(expr("aggregate(array_sort(collect_list(struct(t, " +
      "e * e AS s))), 0D, (acc, x) -> acc + x.s)").as("den"))
    val num = nxt
      .join(e.select(col("t"), col("e").as("e1")), "t")
      .join(e.select(col("t").as("tn"), col("e").as("e2")), "tn")
      .agg(expr("aggregate(array_sort(collect_list(struct(t, " +
        "(e2 - e1) * (e2 - e1) AS s))), 0D, (acc, x) -> acc + x.s)")
        .as("num"))
    num.crossJoin(broadcast(den)).crossJoin(broadcast(cf.select("n")))
      .select(col("n").as("n_days"),
        (floor(col("num") / col("den") * 1000000 + lit(0.5)) / 1000000)
          .as("dw"),
        (floor((lit(1.0) - col("num") / col("den") / 2.0) * 1000000
          + lit(0.5)) / 1000000).as("rho_approx"),
        when(col("num") / col("den") < 1.5, "positive")
          .when(col("num") / col("den") > 2.5, "negative")
          .otherwise("none").as("serial_corr"))
  }

  /** Kendall's W — concordance of the brand revenue RANKINGS across
    * 1996/1997/1998: did the same brands win every year? Ranks are
    * competition ranks with a deterministic brand tie-break (exact-
    * cent revenue ties are practically impossible and the tie-break is
    * identical on both engines), assigned by a bounded 25×25 per-year
    * self-join — never a partition-less window. W and the χ²
    * approximation are exact integer ratios until two final
    * divisions. */
  lazy val kendallsW: Q = Q(
    "kendalls_w",
    """WITH cell AS (SELECT p.p_brand AS brand,
      |    CAST(year(l.l_shipdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  WHERE year(l.l_shipdate) BETWEEN 1996 AND 1998
      |  GROUP BY brand, yr),
      |rk AS (SELECT a.brand, a.yr,
      |    1 + CAST(COALESCE(sum(CASE WHEN b2.rev > a.rev
      |      OR (b2.rev = a.rev AND b2.brand < a.brand) THEN 1 ELSE 0 END),
      |      0) AS BIGINT) AS rnk
      |  FROM cell a LEFT JOIN cell b2
      |    ON b2.yr = a.yr AND b2.brand <> a.brand
      |  GROUP BY a.brand, a.yr, a.rev),
      |rs AS (SELECT brand, CAST(sum(rnk) AS BIGINT) AS r,
      |    CAST(count(*) AS BIGINT) AS m FROM rk GROUP BY brand),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(any_value(m) AS BIGINT) AS mm FROM rs),
      |sdev AS (SELECT CAST(sum((2 * r - n.mm * (n.n + 1))
      |      * (2 * r - n.mm * (n.n + 1))) AS BIGINT) AS s4
      |  FROM rs CROSS JOIN n)
      |SELECT n.n AS n_brands, n.mm AS m_years,
      |  floor(3.0 * s4 / (CAST(n.mm AS DOUBLE) * n.mm * (n.n * n.n * n.n
      |    - n.n)) * 1000000 + 0.5) / 1000000 AS w,
      |  floor(CAST(n.mm AS DOUBLE) * (n.n - 1) * (3.0 * s4
      |    / (CAST(n.mm AS DOUBLE) * n.mm * (n.n * n.n * n.n - n.n)))
      |    * 10000 + 0.5) / 10000 AS chi2,
      |  CAST(n.mm AS DOUBLE) * (n.n - 1) * (3.0 * s4
      |    / (CAST(n.mm AS DOUBLE) * n.mm * (n.n * n.n * n.n - n.n)))
      |    > 36.415028 AS significant
      |FROM sdev CROSS JOIN n""".stripMargin) { (s, d) =>
    val cell = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val rk = cell.as("a")
      .join(cell.select(col("brand").as("b2"), col("yr").as("y2"),
        col("rev").as("r2")),
        col("y2") === col("a.yr") && col("b2") =!= col("a.brand"),
        "left_outer")
      .groupBy(col("a.brand").as("brand"), col("a.yr").as("yr"))
      .agg((lit(1) + coalesce(sum(when(col("r2") > col("a.rev")
        || (col("r2") === col("a.rev") && col("b2") < col("a.brand")), 1L)
        .otherwise(0L)), lit(0L))).as("rnk"))
    val rs = rk.groupBy("brand")
      .agg(sum("rnk").as("r"), count(lit(1)).as("m"))
    val n = rs.agg(count(lit(1)).as("n"), first("m").as("my"))
    // S in quarter units: Σ(2R − m(n+1))² = 4·Σ(R − m(n+1)/2)²
    val sdev = rs.crossJoin(broadcast(n))
      .agg(sum((lit(2) * col("r") - col("my") * (col("n") + 1))
        * (lit(2) * col("r") - col("my") * (col("n") + 1))).as("s4"))
    val w = lit(3.0) * col("s4") / (col("my").cast("double") * col("my")
      * (col("n") * col("n") * col("n") - col("n")))
    val chi2 = col("my").cast("double") * (col("n") - 1) * w
    sdev.crossJoin(broadcast(n))
      .select(col("n").as("n_brands"), col("my").as("m_years"),
        (floor(w * 1000000 + lit(0.5)) / 1000000).as("w"),
        (floor(chi2 * 10000 + lit(0.5)) / 10000).as("chi2"),
        (chi2 > 36.415028).as("significant"))
  }

  /** Cochran's Q — did part availability (≥1 sale) CHANGE across
    * 1996/1997/1998? The binary repeated-measures test (k = 3
    * correlated proportions over the same subjects). All-zero and
    * all-one subject rows provably cancel in both numerator margins
    * and denominator (kR − R² = 0 at R ∈ {0, k}), so the per-part
    * flag table needs only parts that sold at all. Exact integers,
    * one division; χ²₂ 5% bound. */
  lazy val cochranQ: Q = Q(
    "cochran_q",
    """WITH f AS (SELECT l_partkey,
      |    max(CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END) AS x1,
      |    max(CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END) AS x2,
      |    max(CASE WHEN year(l_shipdate) = 1998 THEN 1 ELSE 0 END) AS x3
      |  FROM lineitem WHERE year(l_shipdate) BETWEEN 1996 AND 1998
      |  GROUP BY l_partkey),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |    CAST(sum(x1) AS BIGINT) AS c1, CAST(sum(x2) AS BIGINT) AS c2,
      |    CAST(sum(x3) AS BIGINT) AS c3,
      |    CAST(sum(3 * (x1 + x2 + x3) - (x1 + x2 + x3) * (x1 + x2 + x3))
      |      AS BIGINT) AS den FROM f)
      |SELECT np AS n_parts, c1 AS c_1996, c2 AS c_1997, c3 AS c_1998,
      |  floor(2.0 * (3 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
      |      + CAST(c3 AS DOUBLE) * c3)
      |    - CAST(c1 + c2 + c3 AS DOUBLE) * (c1 + c2 + c3)) / den
      |    * 10000 + 0.5) / 10000 AS q,
      |  2.0 * (3 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
      |      + CAST(c3 AS DOUBLE) * c3)
      |    - CAST(c1 + c2 + c3 AS DOUBLE) * (c1 + c2 + c3)) / den
      |    > 5.991465 AS significant
      |FROM m""".stripMargin) { (s, d) =>
    def flag(y: Int): Column =
      max(when(year(col("l_shipdate")) === y, 1L).otherwise(0L))
    val f = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .groupBy("l_partkey")
      .agg(flag(1996).as("x1"), flag(1997).as("x2"), flag(1998).as("x3"))
    val r = col("x1") + col("x2") + col("x3")
    val m = f.agg(count(lit(1)).as("np"), sum("x1").as("c1"),
      sum("x2").as("c2"), sum("x3").as("c3"),
      sum(lit(3) * r - r * r).as("den"))
    val num = lit(3) * (col("c1").cast("double") * col("c1")
      + col("c2").cast("double") * col("c2")
      + col("c3").cast("double") * col("c3")) -
      (col("c1") + col("c2") + col("c3")).cast("double") *
        (col("c1") + col("c2") + col("c3"))
    val q = lit(2.0) * num / col("den")
    m.select(col("np").as("n_parts"), col("c1").as("c_1996"),
      col("c2").as("c_1997"), col("c3").as("c_1998"),
      (floor(q * 10000 + lit(0.5)) / 10000).as("q"),
      (q > 5.991465).as("significant"))
  }

  /** Friedman's rank test for a weekday effect in daily order volume:
    * blocks = complete epoch-weeks (all 7 days observed), treatments =
    * day-of-week, values midranked WITHIN each block on the doubled
    * grid (2·below + eq + 1 — exact under ties) via a 7×7 per-week
    * self-join. The tie-robust Conover form collapses to pure integer
    * algebra: χ² = 6·Σ_j(R2_j − 8b)² / (Σm2² − 448b), one division.
    * Complements dow_seasonality (which reports the means; this tests
    * the ranking). */
  lazy val friedmanTest: Q = Q(
    "friedman_test",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS t,
      |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      |wk AS (SELECT t // 7 AS w, t % 7 AS dow, y FROM daily),
      |fullw AS (SELECT w FROM wk GROUP BY w HAVING count(*) = 7),
      |b AS (SELECT wk.w, wk.dow, wk.y FROM wk JOIN fullw
      |  ON fullw.w = wk.w),
      |m2 AS (SELECT a.w, a.dow,
      |    CAST(2 * sum(CASE WHEN b2.y < a.y THEN 1 ELSE 0 END)
      |      + sum(CASE WHEN b2.y = a.y THEN 1 ELSE 0 END) + 2 AS BIGINT)
      |      AS m2
      |  FROM b a JOIN b b2 ON b2.w = a.w AND b2.dow <> a.dow
      |  GROUP BY a.w, a.dow, a.y),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM fullw),
      |rj AS (SELECT dow, CAST(sum(m2) AS BIGINT) AS r2 FROM m2
      |  GROUP BY dow),
      |den AS (SELECT CAST(sum(m2 * m2) AS BIGINT) AS sm2 FROM m2),
      |s2 AS (SELECT CAST(sum((r2 - 8 * nb.b) * (r2 - 8 * nb.b))
      |      AS BIGINT) AS s2, any_value(nb.b) AS b
      |  FROM rj CROSS JOIN nb),
      |chi AS (SELECT 6.0 * s2.s2 / (den.sm2 - 448 * s2.b) AS chi2,
      |    s2.b AS b
      |  FROM s2 CROSS JOIN den)
      |SELECT rj.dow, rj.r2,
      |  floor(CAST(rj.r2 AS DOUBLE) / (2 * chi.b) * 10000 + 0.5) / 10000
      |    AS mean_rank,
      |  chi.b AS n_weeks,
      |  floor(chi.chi2 * 10000 + 0.5) / 10000 AS chi2,
      |  chi.chi2 > 12.591587 AS significant
      |FROM rj CROSS JOIN chi ORDER BY rj.dow""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y"))
    val wk = daily.select(floor(col("t") / 7).cast("long").as("w"),
      pmod(col("t"), lit(7)).cast("long").as("dow"), col("y"))
    val fullw = wk.groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") === 7).select("w")
    val b = wk.join(broadcast(fullw), "w")
    val m2 = b.as("a")
      .join(b.select(col("w"), col("dow").as("d2"), col("y").as("y2")),
        Seq("w"))
      .filter(col("d2") =!= col("dow"))
      .groupBy(col("w"), col("dow"), col("y"))
      .agg((lit(2) * sum(when(col("y2") < col("y"), 1L).otherwise(0L))
        + sum(when(col("y2") === col("y"), 1L).otherwise(0L)) + 2)
        .as("m2"))
    val nb = fullw.agg(count(lit(1)).as("b"))
    val rj = m2.groupBy("dow").agg(sum("m2").as("r2"))
    val den = m2.agg(sum(col("m2") * col("m2")).as("sm2"))
    val s2 = rj.crossJoin(broadcast(nb))
      .agg(sum((col("r2") - lit(8) * col("b"))
        * (col("r2") - lit(8) * col("b"))).as("s2"),
        first("b").as("b"))
    val chi = s2.crossJoin(broadcast(den))
      .select((lit(6.0) * col("s2")
        / (col("sm2") - lit(448) * col("b"))).as("chi2"), col("b"))
    rj.crossJoin(broadcast(chi))
      .select(col("dow"), col("r2"),
        (floor(col("r2").cast("double") / (lit(2) * col("b")) * 10000
          + lit(0.5)) / 10000).as("mean_rank"),
        col("b").as("n_weeks"),
        (floor(col("chi2") * 10000 + lit(0.5)) / 10000).as("chi2"),
        (col("chi2") > 12.591587).as("significant"))
      .orderBy("dow")
  }
}
