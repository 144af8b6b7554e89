package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Feature-engineering + survival analytics: leave-one-out target
  * encoding (the mean-encoding trick with its leakage correction),
  * weight-of-evidence / information-value binning (the credit-scoring
  * feature screen), and a Kaplan–Meier survival curve over customer
  * order lifetimes.
  *
  * Cross-engine determinism: every statistic is built from exact
  * integer counts/cents; divisions are single fixed-form operations on
  * identical integers; the only libm call is woe's `ln` (corpus-wide
  * parity established by lm_perplexity); Kaplan–Meier needs NO libm at
  * all — the survival product is a t-ordered sequential fold of exact
  * integer-ratio doubles on both engines (Spark `aggregate`, DuckDB
  * `list_aggregate(..., 'product')`), so a ratio of 0 collapses the
  * curve exactly rather than through ln/exp of a boundary value. */
object FeatureOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Leave-one-out target encoding of c_mktsegment by customer spend —
    * the standard high-cardinality categorical encoding, shipped with
    * its leakage audit: for each customer, the segment's mean spend
    * computed WITHOUT that customer, (Σ_g − y_i)/(n_g − 1), next to the
    * naive all-rows mean; the output surfaces the 15 rows where naive
    * encoding leaks the most (|naive − loo|) — exactly the rows that
    * overfit a downstream model. Shapes: one per-customer cents
    * aggregate, an equi-join to the 5-row broadcast segment stats, and
    * a TakeOrdered top-15; everything exact integers until the two
    * division-by-count encodings. */
  val targetEncodeLoo: Q = Q(
    "target_encode_loo",
    """WITH spend AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_custkey),
      |j AS (SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
      |        s.cents
      |      FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey),
      |seg AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
      |        CAST(sum(cents) AS BIGINT) AS sum_g
      |      FROM j GROUP BY segment),
      |enc AS (SELECT j.custkey, j.segment, j.cents,
      |    CAST(sum_g AS DOUBLE) / n_g AS naive_enc,
      |    CASE WHEN n_g > 1
      |         THEN CAST(sum_g - cents AS DOUBLE) / (n_g - 1) END AS loo_enc
      |  FROM j JOIN seg ON seg.segment = j.segment)
      |SELECT custkey, segment, cents AS spend_cents,
      |  floor(naive_enc * 10000 + 0.5) / 10000 AS naive_enc,
      |  floor(loo_enc * 10000 + 0.5) / 10000 AS loo_enc,
      |  floor(abs(naive_enc - loo_enc) * 10000 + 0.5) / 10000 AS leak
      |FROM enc
      |ORDER BY abs(naive_enc - loo_enc) DESC, custkey LIMIT 15""".stripMargin) {
    (s, d) =>
    val spend = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val j = spend.join(Tables.customer(s, d),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"), col("cents"))
    val seg = j.groupBy("segment")
      .agg(count(lit(1)).as("n_g"), sum("cents").as("sum_g"))
    val enc = j.join(broadcast(seg), "segment")
      .select(col("custkey"), col("segment"), col("cents"),
        (col("sum_g").cast("double") / col("n_g")).as("naive_enc"),
        when(col("n_g") > 1,
          (col("sum_g") - col("cents")).cast("double") / (col("n_g") - 1))
          .as("loo_enc"))
    enc
      .orderBy(abs(col("naive_enc") - col("loo_enc")).desc, col("custkey"))
      .limit(15)
      .select(col("custkey"), col("segment"), col("cents").as("spend_cents"),
        (floor(col("naive_enc") * 10000 + lit(0.5)) / 10000).as("naive_enc"),
        (floor(col("loo_enc") * 10000 + lit(0.5)) / 10000).as("loo_enc"),
        (floor(abs(col("naive_enc") - col("loo_enc")) * 10000 + lit(0.5))
          / 10000).as("leak"))
      .orderBy(col("leak").desc, col("custkey"))
  }

  /** Weight-of-evidence / information value of document length vs the
    * 'en' label — the classic supervised binning screen ("does this
    * feature separate the classes, bin by bin?"). Deciles of n_chars
    * come from the distributed two-pass ntile (q23's operator — never a
    * partition-less window); per-bin good/bad counts are exact, shares
    * are Laplace-smoothed (+0.5 per bin) single divisions, and
    * WoE = ln(gs/bs) enters through the established ln parity. IV terms
    * are per-bin so the gate pins each contribution, not just the sum.
    * One range shuffle + a 10-group aggregate + a 1-row totals
    * broadcast. */
  val woeIv: Q = Q(
    "woe_iv",
    """WITH b AS (SELECT
      |    CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS good
      |  FROM documents),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(good) AS BIGINT) AS n_good,
      |    CAST(count(*) - sum(good) AS BIGINT) AS n_bad
      |  FROM b GROUP BY bin),
      |t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tot_good,
      |      CAST(sum(n_bad) AS BIGINT) AS tot_bad FROM g),
      |w AS (SELECT bin, n_docs, n_good, n_bad,
      |    (n_good + 0.5) / (tot_good + 5.0) AS gs,
      |    (n_bad + 0.5) / (tot_bad + 5.0) AS bs
      |  FROM g CROSS JOIN t)
      |SELECT bin, n_docs, n_good, n_bad,
      |  floor(ln(gs / bs) * 1000000 + 0.5) / 1000000 AS woe,
      |  floor((gs - bs) * ln(gs / bs) * 1000000 + 0.5) / 1000000 AS iv_term
      |FROM w ORDER BY bin""".stripMargin) { (s, d) =>
    val binned = graft.ops.DistributedNtile.ntile(
      docs(s, d).select(col("doc_id"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("good")),
      Seq(col("n_chars"), col("doc_id")), 10)
    val g = binned.groupBy(col("bucket").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("good").as("n_good"),
        (count(lit(1)) - sum("good")).as("n_bad"))
    val t = g.agg(sum("n_good").as("tot_good"), sum("n_bad").as("tot_bad"))
    val w = g.crossJoin(broadcast(t)) // 1-row class totals
      .select(col("bin").cast("long").as("bin"), col("n_docs"),
        col("n_good"), col("n_bad"),
        ((col("n_good") + 0.5) / (col("tot_good") + 5.0)).as("gs"),
        ((col("n_bad") + 0.5) / (col("tot_bad") + 5.0)).as("bs"))
    w.select(col("bin"), col("n_docs"), col("n_good"), col("n_bad"),
      (floor(log(col("gs") / col("bs")) * 1000000 + lit(0.5)) / 1000000)
        .as("woe"),
      (floor((col("gs") - col("bs")) * log(col("gs") / col("bs"))
        * 1000000 + lit(0.5)) / 1000000).as("iv_term"))
      .orderBy("bin")
  }

  /** Kaplan–Meier survival curve of customer order lifetimes (duration
    * = last − first order day; a customer whose last order is ≥90 days
    * before the corpus max date is an observed churn "death", else
    * censored). S(h) = Π_{t≤h} (n_t − d_t)/n_t at horizons 30..300
    * days. Risk sets n_t come from the distributed PrefixScan over the
    * duration-grouped counts (never a partition-less window); each
    * ratio is one exact integer division, and the product folds in
    * t-order on both engines — NO ln/exp, so a fully-depleted risk set
    * yields exactly 0. Each duration term fans out map-side only to the
    * horizons it affects (≤10 rows/term). Scales as: one per-customer
    * aggregate, one range shuffle over ≤calendar-bounded distinct
    * durations, a ≤10-group final. */
  val kaplanMeier: Q = Q(
    "kaplan_meier",
    """WITH cust AS (SELECT o_custkey,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS last_d
      |  FROM orders GROUP BY o_custkey),
      |mx AS (SELECT max(last_d) AS mx FROM cust),
      |c2 AS (SELECT CAST(last_d - first_d AS BIGINT) AS t,
      |    CASE WHEN mx - last_d >= 90 THEN 1 ELSE 0 END AS death
      |  FROM cust CROSS JOIN mx),
      |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(death) AS BIGINT) AS d FROM c2 GROUP BY t),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM byt),
      |sc AS (SELECT t, cnt, d,
      |       CAST(sum(cnt) OVER (ORDER BY t) AS BIGINT) AS cum FROM byt),
      |terms AS (SELECT t, d,
      |    CAST(n - (cum - cnt) - d AS DOUBLE)
      |      / CAST(n - (cum - cnt) AS DOUBLE) AS ratio
      |  FROM sc CROSS JOIN n WHERE t <= 300),
      |fan AS (SELECT t, d, ratio,
      |    unnest(range(greatest(CAST(ceil(t / 30.0) AS BIGINT), 1), 11))
      |      AS k
      |  FROM terms),
      |km AS (SELECT k, CAST(sum(d) AS BIGINT) AS events,
      |    list_aggregate(list(ratio ORDER BY t), 'product') AS surv_raw
      |  FROM fan GROUP BY k)
      |SELECT CAST(k * 30 AS INTEGER) AS horizon_days, events,
      |  floor(surv_raw * 1000000 + 0.5) / 1000000 AS survival
      |FROM km ORDER BY horizon_days""".stripMargin) { (s, d) =>
    val day = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
    val cust = Tables.orders(s, d).groupBy("o_custkey")
      .agg(min(day).as("first_d"), max(day).as("last_d"))
    val mx = cust.agg(max("last_d").as("mx"))
    val c2 = cust.crossJoin(broadcast(mx)) // 1-row corpus max date
      .select((col("last_d") - col("first_d")).cast("long").as("t"),
        when(col("mx") - col("last_d") >= 90, 1L).otherwise(0L).as("death"))
    val byT = c2.groupBy("t")
      .agg(count(lit(1)).as("cnt"), sum("death").as("d"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      byT, Seq(col("t")), Seq("cnt", "d"))
    val n = totals(0)
    val atRisk = lit(n) - (col("cum_cnt") - col("cnt"))
    val terms = scanned.filter(col("t") <= 300)
      .select(col("t"), col("d"),
        ((atRisk - col("d")).cast("double") / atRisk.cast("double"))
          .as("ratio"))
    val fan = terms.select(col("t"), col("d"), col("ratio"),
      explode(sequence(
        greatest(ceil(col("t") / lit(30.0)).cast("int"), lit(1)),
        lit(10))).as("k"))
    fan.groupBy("k")
      .agg(sum("d").as("events"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "struct(t, ratio))), x -> x.ratio), 1.0D, (a, x) -> a * x)")
          .as("surv_raw"))
      .select((col("k") * 30).cast("int").as("horizon_days"), col("events"),
        (floor(col("surv_raw") * 1000000 + lit(0.5)) / 1000000)
          .as("survival"))
      .orderBy("horizon_days")
  }

  /** Quantile normalization of the per-source quality-score
    * distributions onto the pooled reference distribution — the
    * cross-source calibration transform (a microarray-era classic that
    * LLM data pipelines reuse to make scores comparable across crawls
    * before mixing): a doc at within-source rank r in a source of
    * size n_s maps to the GLOBAL order statistic at ⌈r·N/n_s⌉. The
    * query reports the mapping at each source's inner deciles:
    * before = the source's own decile value (rank picked by a
    * source-PARTITIONED window — scale-safe), after = the pooled
    * decile value (picked by the PrefixScan global cum-count, never a
    * partition-less window); the 20×9 pick spec broadcasts. Scores are
    * score_calibration's bit-identical doubles. */
  val quantileNormalize: Q = Q(
    "quantile_normalize",
    """WITH t AS (SELECT doc_id, source,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
      |  FROM documents),
      |s AS (SELECT doc_id, source, CAST(len(ts) AS INTEGER) AS n_tokens,
      |  list_sum(list_transform(ts, tok ->
      |    ((((list_sum(list_transform(
      |          range(0, CAST(least(length(tok), 8) AS BIGINT)),
      |          j -> ascii(substring(tok, CAST(j + 1 AS INTEGER), 1))
      |               * CAST(pow(31, j) AS BIGINT))) % 1024)
      |       * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS score
      |  FROM t WHERE len(ts) > 0),
      |v AS (SELECT doc_id, source, score / n_tokens AS v FROM s),
      |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM v
      |        GROUP BY source),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |spec AS (SELECT source, ns, k,
      |    CAST(ceil(k * ns / 10.0) AS BIGINT) AS rk,
      |    CAST(ceil(CAST(ceil(k * ns / 10.0) AS BIGINT) * n
      |      / CAST(ns AS DOUBLE)) AS BIGINT) AS gp
      |  FROM cnt CROSS JOIN n
      |  CROSS JOIN (SELECT unnest(range(1, 10)) AS k)),
      |sr AS (SELECT source, v,
      |    row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
      |      AS rk FROM v),
      |gr AS (SELECT v, row_number() OVER (ORDER BY v, doc_id) AS gp
      |       FROM v),
      |bef AS (SELECT spec.source, spec.k, spec.gp, sr.v AS before_v
      |  FROM spec JOIN sr ON sr.source = spec.source AND sr.rk = spec.rk)
      |SELECT b.source, CAST(b.k AS INTEGER) AS decile,
      |  floor(b.before_v * 1000000 + 0.5) / 1000000 AS before_v,
      |  floor(g.v * 1000000 + 0.5) / 1000000 AS after_v
      |FROM bef b JOIN gr g ON g.gp = b.gp
      |ORDER BY b.source, decile""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val v = docs(s, d)
      .select(col("doc_id"), col("source"), size(ts).as("n_tokens"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("source"),
        (col("raw") / col("n_tokens")).as("v"))
    val cnt = v.groupBy("source").agg(count(lit(1)).as("ns"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      v.withColumn("one", lit(1L)), Seq(col("v"), col("doc_id")),
      Seq("one"))
    val n = totals(0)
    val spec = cnt
      .select(col("source"), col("ns"),
        explode(sequence(lit(1), lit(9))).as("k"))
      .select(col("source").as("ss"), col("k"),
        ceil(col("k") * col("ns") / lit(10.0)).cast("long").as("rk"),
        ceil(ceil(col("k") * col("ns") / lit(10.0)).cast("long") * lit(n)
          / col("ns").cast("double")).cast("long").as("gp"))
    val sr = v.withColumn("rk", row_number().over(
      Window.partitionBy("source").orderBy(col("v"), col("doc_id"))))
    val bef = sr.join(broadcast(spec),
      col("source") === col("ss") && sr("rk") === spec("rk"))
      .select(col("source"), col("k"), col("gp"), col("v").as("before_v"))
    val aft = scanned.join(broadcast(spec.select(col("gp")).distinct()),
        col("cum_one") === col("gp"), "left_semi")
      .select(col("cum_one").as("agp"), col("v").as("after_v"))
    bef.join(aft, col("gp") === col("agp"))
      .select(col("source"), col("k").cast("int").as("decile"),
        (floor(col("before_v") * 1000000 + lit(0.5)) / 1000000)
          .as("before_v"),
        (floor(col("after_v") * 1000000 + lit(0.5)) / 1000000)
          .as("after_v"))
      .orderBy("source", "decile")
  }

  /** Log-rank test (Mantel 1966) comparing kaplan_meier's survival
    * curve between BUILDING-segment customers and the rest — "do the
    * two segments churn at the same rate", the two-sample question KM
    * alone can't answer. Same duration/censoring protocol as
    * kaplan_meier; per-group risk sets come from a GROUP-partitioned
    * cumulative window over the zero-filled (t × group) grid (bands
    * bounded by the calendar), the O−E and variance terms are exact
    * rationals per event time, and their sums fold t-sorted on one
    * collapsed row. χ² at the 5% bound 3.841459. */
  val logRank: Q = Q(
    "log_rank",
    """WITH cust AS (SELECT o.o_custkey,
      |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS last_d
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |mx AS (SELECT max(last_d) AS mx FROM cust),
      |c2 AS (SELECT g, CAST(last_d - first_d AS BIGINT) AS t,
      |    CASE WHEN mx - last_d >= 90 THEN 1 ELSE 0 END AS death
      |  FROM cust CROSS JOIN mx),
      |byt AS (SELECT g, t, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(death) AS BIGINT) AS d FROM c2 GROUP BY g, t),
      |ts AS (SELECT DISTINCT t FROM byt),
      |grid AS (SELECT gg.g, ts.t, COALESCE(byt.cnt, 0) AS cnt,
      |    COALESCE(byt.d, 0) AS d
      |  FROM ts CROSS JOIN (SELECT unnest([0, 1]) AS g) gg
      |  LEFT JOIN byt ON byt.g = gg.g AND byt.t = ts.t),
      |cum AS (SELECT g, t, cnt, d,
      |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY t) AS BIGINT)
      |      AS cumc,
      |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS ng
      |  FROM grid),
      |att AS (SELECT t,
      |    CAST(sum(CASE WHEN g = 1 THEN ng - (cumc - cnt) END) AS BIGINT)
      |      AS n1,
      |    CAST(sum(CASE WHEN g = 1 THEN d END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN g = 0 THEN ng - (cumc - cnt) END) AS BIGINT)
      |      AS n0,
      |    CAST(sum(CASE WHEN g = 0 THEN d END) AS BIGINT) AS d0
      |  FROM cum GROUP BY t),
      |terms AS (SELECT t, d1,
      |    (d1 + d0) * (CAST(n1 AS DOUBLE) / (n1 + n0)) AS e1,
      |    (d1 + d0) * (CAST(n1 AS DOUBLE) / (n1 + n0))
      |      * (CAST(n0 AS DOUBLE) / (n1 + n0))
      |      * (n1 + n0 - (d1 + d0)) / (n1 + n0 - 1) AS v
      |  FROM att WHERE d1 + d0 > 0 AND n1 + n0 > 1),
      |one AS (SELECT list(d1 - e1 ORDER BY t) AS oes,
      |    list(v ORDER BY t) AS vs FROM terms),
      |f AS (SELECT list_aggregate(oes, 'sum') AS oe,
      |    list_aggregate(vs, 'sum') AS vv FROM one),
      |meta AS (SELECT
      |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN g = 1 THEN death ELSE 0 END) AS BIGINT)
      |      AS e1,
      |    CAST(sum(CASE WHEN g = 0 THEN death ELSE 0 END) AS BIGINT)
      |      AS e0
      |  FROM c2)
      |SELECT meta.n1 AS n_building, meta.n0 AS n_other,
      |  meta.e1 AS events_building, meta.e0 AS events_other,
      |  floor(f.oe * f.oe / f.vv * 10000 + 0.5) / 10000 AS chi2,
      |  f.oe * f.oe / f.vv > 3.841459 AS significant
      |FROM f CROSS JOIN meta""".stripMargin) { (s, d) =>
    val day = datediff(to_date(col("o_orderdate")),
      to_date(lit("1970-01-01")))
    val cust = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("o_custkey"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g"))
      .agg(min(day).as("first_d"), max(day).as("last_d"))
    val mx = cust.agg(max("last_d").as("mx"))
    val c2 = cust.crossJoin(broadcast(mx)) // 1-row corpus max date
      .select(col("g"), (col("last_d") - col("first_d")).cast("long")
        .as("t"),
        when(col("mx") - col("last_d") >= 90, 1L).otherwise(0L).as("death"))
    val byt = c2.groupBy("g", "t")
      .agg(count(lit(1)).as("cnt"), sum("death").as("d"))
    val grid = byt.select("t").distinct()
      .crossJoin(broadcast(s.range(2).select(col("id").as("g"))))
      .join(byt, Seq("g", "t"), "left")
      .select(col("g"), col("t"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("d"), lit(0L)).as("d"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val cum = grid
      .withColumn("cumc", sum("cnt").over(wG.orderBy("t")))
      .withColumn("ng", sum("cnt").over(wG))
    val att = cum.groupBy("t")
      .agg(sum(when(col("g") === 1, col("ng") - (col("cumc") - col("cnt"))))
        .as("n1"),
        sum(when(col("g") === 1, col("d"))).as("d1"),
        sum(when(col("g") === 0, col("ng") - (col("cumc") - col("cnt"))))
          .as("n0"),
        sum(when(col("g") === 0, col("d"))).as("d0"))
    val nt = col("n1") + col("n0")
    val dt = col("d1") + col("d0")
    val terms = att.filter(dt > 0 && nt > 1)
      .select(col("t"), col("d1"),
        (dt * (col("n1").cast("double") / nt)).as("e1"),
        (dt * (col("n1").cast("double") / nt)
          * (col("n0").cast("double") / nt)
          * (nt - dt) / (nt - 1)).as("v"))
    val f = terms.agg(
      expr("aggregate(transform(array_sort(collect_list(" +
        "struct(t, d1 - e1 AS oe))), x -> x.oe), 0D, (a, x) -> a + x)")
        .as("oe"),
      expr("aggregate(transform(array_sort(collect_list(" +
        "struct(t, v))), x -> x.v), 0D, (a, x) -> a + x)").as("vv"))
    val meta = c2.agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("g") === 0, 1L).otherwise(0L)).as("no"),
      sum(when(col("g") === 1, col("death")).otherwise(0L)).as("eb"),
      sum(when(col("g") === 0, col("death")).otherwise(0L)).as("eo"))
    f.crossJoin(broadcast(meta)) // 1-row cohort summary
      .select(col("nb").as("n_building"), col("no").as("n_other"),
        col("eb").as("events_building"), col("eo").as("events_other"),
        (floor(col("oe") * col("oe") / col("vv") * 10000 + lit(0.5))
          / 10000).as("chi2"),
        (col("oe") * col("oe") / col("vv") > 3.841459).as("significant"))
  }

  /** RFM segmentation — the classic customer-value grid: per customer,
    * recency (days from their last order to the corpus max order
    * date), frequency (order count), monetary (exact cents), each
    * scored into quintiles over a TOTAL order (metric, custkey — ties
    * can never float between engines) by the distributed ntile
    * operator, then a first-match CASE ladder names the segment
    * (champions / loyal / big_spender / at_risk / hibernating /
    * regular). Output: per segment, customer count and exact mean
    * scores (1e-6 floor rounding on the single division). Three
    * global rank passes over the |customers| relation — each the
    * range-shuffle rank, never a partition-less window. */
  val rfmSegments: Q = Q(
    "rfm_segments",
    """WITH cust AS (SELECT o_custkey AS ck,
      |    date_diff('day', max(o_orderdate),
      |      (SELECT max(o_orderdate) FROM orders)) AS rec,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS mon
      |  FROM orders GROUP BY o_custkey),
      |sc AS (SELECT ck,
      |    CAST(ntile(5) OVER (ORDER BY rec DESC, ck) AS INTEGER) AS r_score,
      |    CAST(ntile(5) OVER (ORDER BY freq, ck) AS INTEGER) AS f_score,
      |    CAST(ntile(5) OVER (ORDER BY mon, ck) AS INTEGER) AS m_score
      |  FROM cust),
      |seg AS (SELECT ck, r_score, f_score, m_score,
      |    CASE
      |      WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |        THEN 'champions'
      |      WHEN f_score >= 4 THEN 'loyal'
      |      WHEN m_score >= 4 THEN 'big_spender'
      |      WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |      WHEN r_score <= 2 THEN 'hibernating'
      |      ELSE 'regular'
      |    END AS segment
      |  FROM sc)
      |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
      |  floor(CAST(sum(r_score) AS DOUBLE) / count(*) * 1000000 + 0.5)
      |    / 1000000 AS avg_r,
      |  floor(CAST(sum(f_score) AS DOUBLE) / count(*) * 1000000 + 0.5)
      |    / 1000000 AS avg_f,
      |  floor(CAST(sum(m_score) AS DOUBLE) / count(*) * 1000000 + 0.5)
      |    / 1000000 AS avg_m
      |FROM seg GROUP BY segment ORDER BY segment""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val maxDate = o.agg(max("o_orderdate").as("mx"))
    val cust = o.crossJoin(broadcast(maxDate)) // 1-row corpus max
      .groupBy(col("o_custkey").as("ck"))
      .agg(datediff(first("mx"), max("o_orderdate")).cast("long").as("rec"),
        count(lit(1)).as("freq"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("mon"))
    def score(df: DataFrame, metric: Column, name: String,
        desc: Boolean): DataFrame = {
      val keys = if (desc) Seq(metric.desc, col("ck")) else
        Seq(metric, col("ck"))
      graft.ops.DistributedNtile.ntile(df, keys, 5)
        .withColumnRenamed("bucket", name)
    }
    val sc0 = score(cust, col("rec"), "r_score", desc = true)
    val sc1 = score(sc0, col("freq"), "f_score", desc = false)
    val sc2 = score(sc1, col("mon"), "m_score", desc = false)
    val seg = sc2.withColumn("segment", expr(
      """CASE
        |  WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |    THEN 'champions'
        |  WHEN f_score >= 4 THEN 'loyal'
        |  WHEN m_score >= 4 THEN 'big_spender'
        |  WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |  WHEN r_score <= 2 THEN 'hibernating'
        |  ELSE 'regular'
        |END""".stripMargin))
    def avg6(c: String) =
      floor(sum(col(c)).cast("double") / count(lit(1)) * 1000000 + lit(0.5)) / 1000000
    seg.groupBy("segment")
      .agg(count(lit(1)).as("n_customers"), avg6("r_score").as("avg_r"),
        avg6("f_score").as("avg_f"), avg6("m_score").as("avg_m"))
      .orderBy("segment")
  }

  /** Market-basket association rules over order baskets at the BRAND
    * level (25-value alphabet keeps the pair grid bounded): for each
    * unordered brand pair, co-occurrence count across baskets, support,
    * the stronger-direction confidence, and lift = N·co/(n_a·n_b) —
    * the shelf-placement / cross-sell screen every transactional
    * dataset runs. The basket relation is one distinct projection;
    * the pair count is a basket-keyed self-join bounded by C(25,2)
    * per basket; all ratios are single divisions of exact integers
    * (1e-6 floor rounding). Top 20 by lift, deterministic ties. */
  val basketRules: Q = Q(
    "basket_rules",
    """WITH b AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      |           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b),
      |cnt AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM b
      |        GROUP BY brand),
      |co AS (SELECT a.brand AS brand_a, c.brand AS brand_b,
      |    CAST(count(*) AS BIGINT) AS n_co
      |  FROM b a JOIN b c ON a.ok = c.ok AND a.brand < c.brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_co,
      |  floor(CAST(n_co AS DOUBLE) / nb.n * 1000000 + 0.5) / 1000000
      |    AS support,
      |  floor(CAST(n_co AS DOUBLE) / least(ca.c, cb.c) * 1000000 + 0.5)
      |    / 1000000 AS confidence,
      |  floor(CAST(n_co AS DOUBLE) * nb.n / (ca.c * cb.c) * 1000000 + 0.5)
      |    / 1000000 AS lift
      |FROM co JOIN cnt ca ON ca.brand = co.brand_a
      |        JOIN cnt cb ON cb.brand = co.brand_b
      |        CROSS JOIN nb
      |ORDER BY lift DESC, brand_a, brand_b LIMIT 20""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"),
        col("l_partkey"))
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand").as("brand"))),
        col("p_partkey") === col("l_partkey"))
      .select(col("ok"), col("brand")).distinct()
    val nb = b.agg(countDistinct("ok").as("n"))
    val cnt = b.groupBy("brand").agg(count(lit(1)).as("c"))
    val co = b.as("x").join(b.as("y"),
        col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
      .groupBy(col("x.brand").as("brand_a"), col("y.brand").as("brand_b"))
      .agg(count(lit(1)).as("n_co"))
    def r6(c: Column) = floor(c * 1000000 + lit(0.5)) / 1000000
    co.join(broadcast(cnt.select(col("brand").as("brand_a"),
        col("c").as("ca"))), "brand_a")
      .join(broadcast(cnt.select(col("brand").as("brand_b"),
        col("c").as("cb"))), "brand_b")
      .crossJoin(broadcast(nb)) // 1-row basket total
      .select(col("brand_a"), col("brand_b"), col("n_co"),
        r6(col("n_co").cast("double") / col("n")).as("support"),
        r6(col("n_co").cast("double") / least(col("ca"), col("cb")))
          .as("confidence"),
        r6(col("n_co").cast("double") * col("n") / (col("ca") * col("cb")))
          .as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(20)
  }

  /** Revenue concentration: exact Gini coefficient + Lorenz top-decile
    * share over per-customer revenue. G = Σ(2i − n − 1)·x_i / (n·Σx)
    * with i the global rank by (cents, custkey) from the distributed
    * rank operator; the weighted sum accumulates in DECIMAL(38,0)
    * (n·x_i products reach ~2e16 at sf0.1 and grow linearly — BIGINT
    * would wrap near sf100), and the only doubles are the two final
    * ratio roundings. Top-decile share counts the highest-ranked
    * ceil(n/10) customers' exact cents. */
  val revenueGini: Q = Q(
    "revenue_gini",
    """WITH cust AS (SELECT o_custkey AS ck,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |rk AS (SELECT ck, cents,
      |    CAST(row_number() OVER (ORDER BY cents, ck) AS BIGINT) AS i
      |  FROM cust),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(cents) AS BIGINT) AS tot FROM cust),
      |g AS (SELECT CAST(sum(CAST((2 * i - nn.n - 1) AS HUGEINT) * cents)
      |        AS HUGEINT) AS num
      |  FROM rk CROSS JOIN n nn),
      |topd AS (SELECT CAST(sum(cents) AS BIGINT) AS top_cents
      |  FROM rk CROSS JOIN n nn WHERE i > nn.n - (nn.n + 9) // 10)
      |SELECT n.n AS n_customers, n.tot AS total_cents,
      |  floor(CAST(g.num AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.tot)
      |    * 1000000 + 0.5) / 1000000 AS gini,
      |  floor(CAST(topd.top_cents AS DOUBLE) / n.tot * 1000000 + 0.5)
      |    / 1000000 AS top_decile_share
      |FROM n CROSS JOIN g CROSS JOIN topd""".stripMargin) { (s, d) =>
    val cust = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    val rk = graft.ops.DistributedNtile.withGlobalRank(
      cust, Seq(col("cents"), col("ck")))
      .withColumnRenamed("global_rank", "i")
    val n = cust.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
    val withN = rk.crossJoin(broadcast(n)) // 1-row totals
    val g = withN.agg(sum((lit(2) * col("i") - col("n") - 1)
      .cast("decimal(38,0)") * col("cents")).as("num"))
    val topd = withN.filter(col("i") > expr("n - (n + 9) DIV 10"))
      .agg(sum("cents").as("top_cents"))
    n.crossJoin(broadcast(g)).crossJoin(broadcast(topd))
      .select(col("n").as("n_customers"), col("tot").as("total_cents"),
        (floor(col("num").cast("double")
          / (col("n").cast("double") * col("tot")) * 1000000 + lit(0.5))
          / 1000000).as("gini"),
        (floor(col("top_cents").cast("double") / col("tot") * 1000000
          + lit(0.5)) / 1000000).as("top_decile_share"))
  }

  /** 2-D skyline (Pareto frontier) over parts, maximizing
    * (p_size, price-cents) — the classic "best tradeoffs" operator
    * (Börzsönyi et al. 2001, "The Skyline Operator"). The naive form
    * is the O(n²) dominance anti-join the oracle runs; the engine
    * exploits the 2-D structure: after `max(cents) GROUP BY size`
    * (one map-side-combinable shuffle, output ≤ |distinct sizes|), a
    * point is on the skyline iff its size-group max beats the prefix
    * max over all STRICTLY LARGER sizes — a distributed exclusive
    * prefix-max (the PrefixScan operator, size-descending), never a
    * pairwise comparison. Joining the qualifying (size, cmax) pairs
    * back to the full relation restores coordinate-duplicate points
    * (mutual non-domination keeps them all, matching the NOT EXISTS
    * semantics bit-for-bit — prices are exact cents). At 100 TB: one
    * agg shuffle + one prefix scan over the group relation + one
    * equi-join; nothing quadratic anywhere. */
  val skylinePareto: Q = Q(
    "skyline_pareto",
    """WITH pts AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM part)
      |SELECT p.p_partkey, p.p_size, p.cents FROM pts p
      |WHERE NOT EXISTS (SELECT 1 FROM pts q
      |  WHERE q.p_size >= p.p_size AND q.cents >= p.cents
      |    AND (q.p_size > p.p_size OR q.cents > p.cents))
      |ORDER BY p.p_size DESC, p.p_partkey""".stripMargin) { (s, d) =>
    val pts = Tables.part(s, d).select(col("p_partkey"),
      col("p_size").cast("long").as("p_size"),
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val bySize = pts.groupBy("p_size").agg(max("cents").as("cmax"))
    val (scanned, _) = graft.ops.PrefixScan.withCumMaxs(
      bySize, Seq(col("p_size").desc), Seq("cmax"), exclusive = true)
    val sky = scanned.filter(col("cmax") > col("cummax_cmax"))
      .select(col("p_size").as("sk_size"), col("cmax"))
    pts.join(sky, col("p_size") === col("sk_size")
        && col("cents") === col("cmax"))
      .select("p_partkey", "p_size", "cents")
      .orderBy(col("p_size").desc, col("p_partkey"))
  }

  val all: Seq[Q] = Seq(targetEncodeLoo, woeIv, kaplanMeier,
    quantileNormalize, logRank, nelsonAalen, kneedlePareto,
    rfmSegments, basketRules, revenueGini, skylinePareto)

  /** Nelson–Aalen cumulative hazard over kaplan_meier's exact
    * protocol — the additive estimator (Σ d/n) whose variance and
    * large-sample behavior survival texts prefer for inference, where
    * KM's product gives the curve. Each hazard term is quantized to
    * the 1e-9 integer grid (bradley_terry's device), so the per-
    * horizon accumulations are ORDER-INDEPENDENT BIGINT sums — no
    * ordered fold needed at all, unlike KM's product. Risk sets ride
    * the same distributed PrefixScan; exp(−H) is the one shared
    * transcendental at the end. */
  lazy val nelsonAalen: Q = Q(
    "nelson_aalen",
    """WITH cust AS (SELECT o_custkey,
      |    min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS first_d,
      |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |      AS last_d
      |  FROM orders GROUP BY o_custkey),
      |mx AS (SELECT max(last_d) AS mx FROM cust),
      |c2 AS (SELECT CAST(last_d - first_d AS BIGINT) AS t,
      |    CASE WHEN mx - last_d >= 90 THEN 1 ELSE 0 END AS death
      |  FROM cust CROSS JOIN mx),
      |g AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(death) AS BIGINT) AS d FROM c2 GROUP BY t),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g),
      |sc AS (SELECT t, cnt, d,
      |       CAST(sum(cnt) OVER (ORDER BY t) AS BIGINT) AS cum FROM g),
      |terms AS (SELECT t, d,
      |    CAST(floor(CAST(d AS DOUBLE) * 1000000000
      |      / (n - (cum - cnt)) + 0.5) AS BIGINT) AS h9,
      |    CAST(floor(CAST(d AS DOUBLE) * 1000000000
      |      / ((n - (cum - cnt)) * CAST(n - (cum - cnt) AS DOUBLE)) + 0.5)
      |      AS BIGINT) AS v9
      |  FROM sc CROSS JOIN n WHERE t <= 300),
      |fan AS (SELECT t, d, h9, v9,
      |    unnest(range(greatest(CAST(ceil(t / 30.0) AS BIGINT), 1), 11))
      |      AS k
      |  FROM terms),
      |na AS (SELECT k, CAST(sum(d) AS BIGINT) AS events,
      |    CAST(sum(h9) AS BIGINT) AS hh, CAST(sum(v9) AS BIGINT) AS vv
      |  FROM fan GROUP BY k)
      |SELECT CAST(k * 30 AS INTEGER) AS horizon_days, events,
      |  floor(hh / 1000000000.0 * 1000000 + 0.5) / 1000000 AS cum_hazard,
      |  floor(vv / 1000000000.0 * 1000000 + 0.5) / 1000000 AS variance,
      |  floor(exp(-(hh / 1000000000.0)) * 1000000 + 0.5) / 1000000
      |    AS survival_fh
      |FROM na ORDER BY horizon_days""".stripMargin) { (s, d) =>
    val day = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
    val cust = Tables.orders(s, d).groupBy("o_custkey")
      .agg(min(day).as("first_d"), max(day).as("last_d"))
    val mx = cust.agg(max("last_d").as("mx"))
    val c2 = cust.crossJoin(broadcast(mx))
      .select((col("last_d") - col("first_d")).cast("long").as("t"),
        when(col("mx") - col("last_d") >= 90, 1L).otherwise(0L).as("death"))
    val byT = c2.groupBy("t")
      .agg(count(lit(1)).as("cnt"), sum("death").as("d"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      byT, Seq(col("t")), Seq("cnt", "d"))
    val n = totals(0)
    val atRisk = lit(n) - (col("cum_cnt") - col("cnt"))
    val terms = scanned.filter(col("t") <= 300)
      .select(col("t"), col("d"),
        floor(col("d").cast("double") * 1000000000L / atRisk + lit(0.5))
          .cast("long").as("h9"),
        floor(col("d").cast("double") * 1000000000L
          / (atRisk * atRisk.cast("double")) + lit(0.5))
          .cast("long").as("v9"))
    val fan = terms.select(col("t"), col("d"), col("h9"), col("v9"),
      explode(sequence(
        greatest(ceil(col("t") / lit(30.0)).cast("int"), lit(1)),
        lit(10))).as("k"))
    fan.groupBy("k")
      .agg(sum("d").as("events"), sum("h9").as("hh"), sum("v9").as("vv"))
      .select((col("k") * 30).cast("int").as("horizon_days"), col("events"),
        (floor(col("hh") / 1000000000.0 * 1000000 + lit(0.5)) / 1000000)
          .as("cum_hazard"),
        (floor(col("vv") / 1000000000.0 * 1000000 + lit(0.5)) / 1000000)
          .as("variance"),
        (floor(exp(-(col("hh") / 1000000000.0)) * 1000000 + lit(0.5))
          / 1000000).as("survival_fh"))
      .orderBy("horizon_days")
  }

  /** Kneedle knee point of the part-revenue Pareto curve: the rank r*
    * maximizing cumshare(r) − r/n — "how deep is the head worth
    * chasing", the quantitative cut abc_class's fixed 80/15/5 bands
    * assume. Parts are range-ranked by (revenue desc, key) through
    * the distributed PrefixScan (never a partition-less window) and
    * the knee argmax compares the exact BIGINT cross-product
    * cum·n − rank·total. */
  lazy val kneedlePareto: Q = Q(
    "kneedle_pareto",
    """WITH pr AS (SELECT l_partkey AS pk,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(rev) AS BIGINT) AS t FROM pr),
      |sc AS (SELECT pk, rev,
      |    CAST(sum(rev) OVER (ORDER BY rev DESC, pk) AS BIGINT) AS cum,
      |    CAST(row_number() OVER (ORDER BY rev DESC, pk) AS BIGINT) AS r
      |  FROM pr),
      |best AS (SELECT sc.r, sc.cum FROM sc CROSS JOIN tot
      |  ORDER BY sc.cum * tot.n - sc.r * tot.t DESC, sc.r LIMIT 1)
      |SELECT tot.n AS n_parts, best.r AS knee_rank,
      |  floor(CAST(best.r AS DOUBLE) / tot.n * 1000000 + 0.5) / 1000000
      |    AS rank_share,
      |  floor(CAST(best.cum AS DOUBLE) / tot.t * 1000000 + 0.5) / 1000000
      |    AS revenue_share
      |FROM best CROSS JOIN tot""".stripMargin) { (s, d) =>
    val pr = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
      .withColumn("one", lit(1L))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      pr, Seq(col("rev").desc, col("pk")), Seq("rev", "one"))
    val (t, n) = (totals(0), totals(1))
    val best = scanned
      .select(col("cum_one").as("r"), col("cum_rev").as("cum"))
      .orderBy((col("cum") * n - col("r") * t).desc, col("r"))
      .limit(1)
    best.select(lit(n).as("n_parts"), col("r").as("knee_rank"),
      (floor(col("r").cast("double") / n * 1000000 + lit(0.5)) / 1000000)
        .as("rank_share"),
      (floor(col("cum").cast("double") / t * 1000000 + lit(0.5)) / 1000000)
        .as("revenue_share"))
  }
}
