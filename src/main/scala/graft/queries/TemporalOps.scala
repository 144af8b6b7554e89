package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Tables

/** Temporal / event-stream analytics: interval coalescing
  * (gaps-and-islands), sweep-line max concurrency, last-touch
  * attribution, autocorrelation of a daily series, and rolling z-score
  * anomaly detection. These are the event-log workhorses a pipeline
  * runs next to sessionization (q45) and funnels (q55).
  *
  * Scale shape shared by all five: every window partitions by a
  * high-cardinality key (user_id) or reduces to key-partitioned
  * equi-joins — one user-keyed shuffle each, no partition-less windows,
  * no driver-side state. Determinism: all interval/sweep/rolling math
  * runs on BIGINT epoch-seconds / value-cents; the only doubles are
  * single fixed-form expressions over those integer aggregates (both
  * engines evaluate the identical IEEE expression once per row), with
  * the final rounding via the repo's floor(x·1e6+0.5)/1e6 recipe which
  * is sign-stable (plain round() half-away ties differ per engine).
  */
object TemporalOps {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** Events as half-open intervals [st, st+value seconds) per user. */
  private val ivSql =
    """iv AS (SELECT user_id, event_id,
      |    epoch(date_trunc('second', ts)) AS st,
      |    epoch(date_trunc('second', ts)) + CAST(floor(value) AS BIGINT) AS en
      |  FROM events)""".stripMargin

  private def ivDf(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("st"),
      (unix_timestamp(col("ts")) + floor(col("value")).cast("long")).as("en"))

  /** Interval coalescing (gaps-and-islands): merge each user's
    * overlapping event intervals into maximal islands, report island
    * count, total covered seconds, and longest island. The classic
    * formulation — a running max of interval ends over preceding rows
    * marks island starts; a running sum of those marks numbers the
    * islands — costs exactly ONE user-keyed shuffle (all three windows
    * and the final groupBy share the user_id hash partitioning, and
    * within a partition Spark sorts once for all of them). At 100 TB
    * the per-user row set is what a single task must sort — bounded by
    * the busiest user, the same constraint sessionize carries. */
  val intervalMerge: Q = Q(
    "q106_interval_merge",
    s"""WITH $ivSql,
      |m AS (SELECT user_id, st, en,
      |    max(en) OVER (PARTITION BY user_id ORDER BY st, en, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_en
      |  FROM iv),
      |f AS (SELECT user_id, st, en,
      |    CASE WHEN prev_en IS NULL OR st > prev_en THEN 1 ELSE 0 END AS brk
      |  FROM m),
      |isl AS (SELECT user_id, st, en,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      |  FROM f),
      |g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien
      |  FROM isl GROUP BY user_id, island)
      |SELECT user_id, count(*) AS n_islands,
      |  CAST(sum(ien - ist) AS BIGINT) AS covered_s,
      |  CAST(max(ien - ist) AS BIGINT) AS max_len_s
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val order = Window.partitionBy("user_id").orderBy(col("st"), col("en"), col("event_id"))
    val prev = order.rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("user_id").orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ivDf(s, d)
      .withColumn("prev_en", max(col("en")).over(prev))
      .withColumn("brk",
        when(col("prev_en").isNull || col("st") > col("prev_en"), 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy("user_id", "island")
      .agg(min("st").as("ist"), max("en").as("ien"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist")).as("covered_s"),
        max(col("ien") - col("ist")).as("max_len_s"))
      .orderBy("user_id")
  }

  /** Peak concurrency per user via the sweep line: each half-open
    * interval contributes +1 at its start and −1 at its end; the
    * maximum of the running sum over (time, delta) is the answer. Ends
    * sort before starts at the same instant (delta −1 < +1), so
    * back-to-back intervals don't double-count — the half-open
    * convention both engines share by construction. One explode (2
    * rows/event, map-side) + one user-keyed window: the same
    * single-shuffle budget as interval_merge. */
  val maxConcurrency: Q = Q(
    "q107_max_concurrency",
    s"""WITH $ivSql,
      |pts AS (SELECT user_id, st AS t, 1 AS delta, event_id FROM iv
      |        UNION ALL
      |        SELECT user_id, en, -1, event_id FROM iv),
      |run AS (SELECT user_id,
      |    CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
      |  FROM pts)
      |SELECT user_id, max(cc) AS max_cc
      |FROM run GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val iv = ivDf(s, d)
    val pts = iv.select(col("user_id"), col("st").as("t"), lit(1).as("delta"), col("event_id"))
      .unionAll(iv.select(col("user_id"), col("en").as("t"), lit(-1).as("delta"), col("event_id")))
    val run = Window.partitionBy("user_id").orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("cc", sum(col("delta")).over(run).cast("long"))
      .groupBy("user_id").agg(max("cc").as("max_cc"))
      .orderBy("user_id")
  }

  /** Last-touch attribution: every purchase is credited to the user's
    * most recent PRECEDING marketing touch (click or view; 'none' if
    * the purchase had no prior touch), then conversions and revenue
    * roll up by channel. The carry-forward is last_value(IGNORE NULLS)
    * over preceding rows — the same single user-keyed window shuffle,
    * no self-join of purchases against touches (the naive as-of
    * formulation would shuffle the event log twice and explode on
    * high-touch users). Revenue sums 2-decimal doubles and re-rounds
    * to 2dp, the repo's established stable-sum recipe (q45). */
  val attribution: Q = Q(
    "q108_attribution",
    """WITH t AS (SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN event_type IN ('click','view') THEN event_type END AS touch
      |  FROM events),
      |m AS (SELECT user_id, event_type, value,
      |    last_value(touch IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
      |  FROM t)
      |SELECT COALESCE(attr, 'none') AS channel,
      |  count(*) AS conversions, round(sum(value), 2) AS revenue
      |FROM m WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val prev = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, d)
      .withColumn("touch",
        when(col("event_type").isin("click", "view"), col("event_type")))
      .withColumn("attr", last(col("touch"), ignoreNulls = true).over(prev))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("attr"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("conversions"), round(sum("value"), 2).as("revenue"))
      .orderBy("channel")
  }

  /** Autocorrelation (lags 1..5) of the daily order-count series —
    * the seasonality probe run before fitting any forecast. Pairs
    * (day, day+k) come from an equi-join of the daily aggregate with
    * itself on shifted date keys (NOT a partition-less row_number
    * window — the series is grouped and joined by date, so the plan is
    * all date-keyed hash joins and survives arbitrarily long series).
    * r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², expanded so every Σ is an
    * exact BIGINT aggregate (Σx_t·x_{t+k}, pair-side sums, counts);
    * the single double expression over them is evaluated identically
    * by both engines. The 1-row totals broadcast (whitelisted 1-row
    * crossJoin class). Days absent from the data simply produce no
    * pair — identical semantics on both sides. */
  val acfDaily: Q = Q(
    "q109_acf",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM daily),
      |lags AS (SELECT unnest(range(1, 6)) AS lag),
      |pairs AS (SELECT l.lag, a.x AS xa, b.x AS xb
      |  FROM lags l
      |    JOIN daily a ON TRUE
      |    JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(xa * xb) AS BIGINT) AS sxy,
      |    CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb
      |  FROM pairs GROUP BY lag)
      |SELECT CAST(lag AS INTEGER) AS lag, c AS pairs,
      |  floor((sxy - (CAST(sx AS DOUBLE) / n) * (sa + sb)
      |      + c * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |    / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |    * 1000000 + 0.5) / 1000000 AS acf
      |FROM num CROSS JOIN tot ORDER BY lag""".stripMargin) { (s, d) =>
    val daily = ord(s, d).groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(count(lit(1)).cast("long").as("n"),
      sum("x").cast("long").as("sx"),
      sum(col("x") * col("x")).cast("long").as("sxx"))
    val lags = s.range(1, 6).select(col("id").as("lag"))
    val a = daily.crossJoin(lags)
      .select(col("lag"), col("x").as("xa"),
        date_add(col("day"), col("lag").cast("int")).as("jday"))
    val b = daily.select(col("day").as("jday"), col("x").as("xb"))
    val num = a.join(b, "jday")
      .groupBy("lag")
      .agg(count(lit(1)).cast("long").as("c"),
        sum(col("xa") * col("xb")).cast("long").as("sxy"),
        sum("xa").cast("long").as("sa"), sum("xb").cast("long").as("sb"))
    val mu = col("sx").cast("double") / col("n")
    num.crossJoin(broadcast(tot))
      .select(col("lag").cast("int").as("lag"), col("c").as("pairs"),
        (floor((col("sxy") - mu * (col("sa") + col("sb")) + col("c") * mu * mu)
          / (col("sxx") - col("n") * mu * mu) * 1000000 + lit(0.5)) / 1000000)
          .as("acf"))
      .orderBy("lag")
  }

  /** Rolling z-score anomaly detection: each event's value (in exact
    * cents) is scored against the mean/stddev of the user's previous
    * 20 events; |z| > 3 with ≥5 priors flags an anomaly. The rolling
    * sums are BIGINT over a ROWS frame (one user-keyed window shuffle);
    * z itself is one fixed double expression over those integers —
    * sqrt and divide are IEEE correctly-rounded, so both engines score
    * identically. The per-user aggregate keeps only users with ≥1
    * scorable row, reporting anomaly count and the peak |z|. */
  val rollingZ: Q = Q(
    "q110_rolling_z",
    """WITH c AS (SELECT user_id, ts, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |w AS (SELECT user_id, cents,
      |    count(cents) OVER win AS n,
      |    sum(cents) OVER win AS sc,
      |    sum(cents * cents) OVER win AS sq
      |  FROM c
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT user_id,
      |    (cents - CAST(sc AS DOUBLE) / n)
      |      / sqrt((sq - CAST(sc AS DOUBLE) * sc / n) / (n - 1)) AS zs
      |  FROM w WHERE n >= 5 AND n * sq > sc * sc)
      |SELECT user_id, CAST(sum(CASE WHEN abs(zs) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |  floor(max(abs(zs)) * 1000000 + 0.5) / 1000000 AS max_abs_z
      |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    ev(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("n", count(col("cents")).over(win))
      .withColumn("sc", sum(col("cents")).over(win))
      .withColumn("sq", sum(col("cents") * col("cents")).over(win))
      .filter(col("n") >= 5 && col("n") * col("sq") > col("sc") * col("sc"))
      .withColumn("zs",
        (col("cents") - col("sc").cast("double") / col("n"))
          / sqrt((col("sq") - col("sc").cast("double") * col("sc") / col("n"))
            / (col("n") - 1)))
      .groupBy("user_id")
      .agg(sum(when(abs(col("zs")) > 3, 1).otherwise(0)).as("n_anomalies"),
        (floor(max(abs(col("zs"))) * 1000000 + lit(0.5)) / 1000000).as("max_abs_z"))
      .orderBy("user_id")
  }

  /** Point-in-time (temporal) join against an SCD2-versioned dimension:
    * purchases version each user's state (q59's construction — validity
    * [ts, next_ts)); every click then joins to the version VALID AT ITS
    * EVENT TIME, rolling up click count and exact-cents click value per
    * (user, version). The scale shape is the standard temporal-join
    * plan: ONE equi-shuffle join on the entity key with the validity
    * range as a residual filter — per-key fan-out is bounded by that
    * key's version count, so no range-join machinery or broadcast is
    * needed, and both sides co-partition by user_id at any scale.
    * Clicks before the first version drop out identically on both
    * engines (no matching validity window). */
  val temporalJoin: Q = Q(
    "q115_temporal_join",
    """WITH dim AS (
      |  SELECT user_id, ts AS vfrom,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vto,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS version
      |  FROM events WHERE event_type = 'purchase'),
      |clk AS (SELECT user_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'click')
      |SELECT d.user_id, CAST(d.version AS INTEGER) AS version,
      |  count(*) AS n_clicks,
      |  CAST(sum(c.cents) AS BIGINT) AS click_cents
      |FROM clk c JOIN dim d ON c.user_id = d.user_id
      |  AND c.ts >= d.vfrom AND (d.vto IS NULL OR c.ts < d.vto)
      |GROUP BY d.user_id, d.version
      |ORDER BY d.user_id, d.version""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val dim = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("vfrom"),
        lead(col("ts"), 1).over(w).as("vto"),
        row_number().over(w).cast("int").as("version"))
    val clk = ev(s, d).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    clk.join(dim, Seq("user_id"))
      .filter(col("ts") >= col("vfrom")
        && (col("vto").isNull || col("ts") < col("vto")))
      .groupBy("user_id", "version")
      .agg(count(lit(1)).as("n_clicks"), sum("cents").as("click_cents"))
      .orderBy("user_id", "version")
  }

  /** Time-weighted average value per user (TWAP) — the
    * piecewise-constant integral the pricing/metering world runs over
    * event streams, where plain AVG over-weights bursts. Each event's
    * value holds until the user's next event (lead over the user-keyed
    * window — the one shuffle); weight × value stays BIGINT
    * (epoch-seconds × cents), so the per-user ratio is one double
    * division of exact integers. The final interval (no successor) has
    * zero weight by construction, matching the metering convention. */
  val twapValue: Q = Q(
    "twap_value",
    """WITH e AS (SELECT user_id, event_id,
      |    epoch(date_trunc('second', ts)) AS st,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |w AS (SELECT user_id, cents,
      |    lead(st) OVER (PARTITION BY user_id ORDER BY st, event_id) - st
      |      AS dur
      |  FROM e)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(COALESCE(dur, 0)) AS BIGINT) AS total_sec,
      |  floor(CAST(sum(cents * COALESCE(dur, 0)) AS DOUBLE)
      |    / sum(COALESCE(dur, 0)) / 100 * 10000 + 0.5) / 10000 AS twap
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("st", "event_id")
    ev(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("st"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("dur", lead("st", 1).over(w) - col("st"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(col("dur"), lit(0L))).as("total_sec"),
        (floor(sum(col("cents") * coalesce(col("dur"), lit(0L))).cast("double")
          / sum(coalesce(col("dur"), lit(0L))) / 100 * 10000 + lit(0.5))
          / 10000).as("twap"))
      .orderBy("user_id")
  }

  /** Sliding 7-day distinct active users per day — the DAU/WAU
    * engagement metric, computed EXACTLY without a sliding-window
    * distinct state store: dedupe to (user, day), fan each user-day
    * out to the ≤7 window-end days it supports (a bounded ×7 explode,
    * the scalable alternative to re-scanning 7 days of raw events per
    * window), and count distinct users per window end. Shuffle is 7 ×
    * |user-days| — proportional to the deduped activity surface, not
    * the raw event count; window ends are restricted to days that
    * exist in the data (calendar semi-join, broadcast-sized). */
  val slidingDistinct: Q = Q(
    "sliding_distinct_users",
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |fan AS (SELECT ud.user_id, ud.day + o * INTERVAL 1 DAY AS wend
      |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o))
      |SELECT strftime(f.wend, '%Y-%m-%d') AS window_end,
      |  count(DISTINCT f.user_id) AS n_active_7d
      |FROM fan f JOIN days dy ON dy.day = f.wend
      |GROUP BY 1 ORDER BY window_end""".stripMargin) { (s, d) =>
    val ud = ev(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val days = ud.select(col("day").as("dday")).distinct()
    ud.withColumn("o", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"),
        (col("day") + expr("make_interval(0, 0, 0, o, 0, 0, 0)")).as("wend"))
      .join(broadcast(days), col("wend") === col("dday"), "left_semi")
      .groupBy(date_format(col("wend"), "yyyy-MM-dd").as("window_end"))
      .agg(countDistinct("user_id").as("n_active_7d"))
      .orderBy("window_end")
  }

  /** Holt's linear-trend exponential smoothing (double exponential —
    * the level+trend forecaster one step up from q94's EWMA) over each
    * user's daily value series, α = β = 0.5. The recurrence folds the
    * day-sorted per-user series left-to-right in BOTH engines — Spark
    * as `aggregate` over a sorted collect_list with a 2-field struct
    * state; the oracle as a per-user RECURSIVE CTE carrying (l, b)
    * columns, because DuckDB 1.0.0's `list_reduce` mis-evaluates
    * struct ACCUMULATORS past the first iteration (verified: isolated
    * steps are correct, the chained fold is not — q94's scalar-state
    * fold never hits this). Halving multipliers keep every
    * intermediate a dyadic rational exactly representable in doubles,
    * so level/trend/forecast are bit-identical. Per-user series are
    * month-bounded (≤ 31 days), so the fold state is tiny; the one
    * shuffle is the daily collapse. Init: l₁ = y₁, b₁ = 0 (the
    * no-special-case seed). */
  val holtLinear: Q = Q(
    "holt_linear",
    """WITH RECURSIVE daily AS (SELECT user_id, date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |idx AS (SELECT user_id, CAST(y AS DOUBLE) AS yd,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS BIGINT) AS i,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      |  FROM daily),
      |rec AS (
      |  SELECT user_id, n, i, yd AS l, CAST(0 AS DOUBLE) AS b
      |  FROM idx WHERE i = 1 AND n >= 2
      |  UNION ALL
      |  SELECT r.user_id, r.n, d.i,
      |    0.5 * d.yd + 0.5 * (r.l + r.b),
      |    0.5 * ((0.5 * d.yd + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      |  FROM rec r JOIN idx d ON d.user_id = r.user_id AND d.i = r.i + 1)
      |SELECT user_id, n AS n_days,
      |  floor(l / 100 * 10000 + 0.5) / 10000 AS level,
      |  floor(b / 100 * 10000 + 0.5) / 10000 AS trend,
      |  floor((l + b) / 100 * 10000 + 0.5) / 10000 AS forecast
      |FROM rec WHERE i = n ORDER BY user_id""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id", "day").agg(sum("cents").as("y"))
    daily.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, y))), " +
          "t -> struct(CAST(t.y AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b))")
          .as("sts"))
      .filter(col("n_days") >= 2)
      .withColumn("fin", expr(
        "aggregate(slice(sts, 2, size(sts) - 1), sts[0], (a, x) -> struct(" +
          "0.5D * x.l + 0.5D * (a.l + a.b) AS l, " +
          "0.5D * ((0.5D * x.l + 0.5D * (a.l + a.b)) - a.l) + 0.5D * a.b AS b))"))
      .select(col("user_id"), col("n_days"),
        (floor(col("fin.l") / 100 * 10000 + lit(0.5)) / 10000).as("level"),
        (floor(col("fin.b") / 100 * 10000 + lit(0.5)) / 10000).as("trend"),
        (floor((col("fin.l") + col("fin.b")) / 100 * 10000 + lit(0.5)) / 10000)
          .as("forecast"))
      .orderBy("user_id")
  }

  /** First-order event-type transition matrix — P(next event type |
    * current) across every user's stream: the product-analytics
    * Markov view of user behavior (markov_next's sibling over events
    * instead of words). One user-keyed lead window (the single
    * shuffle), a 25-cell count collapse, and row-conditional
    * probabilities as single exact divisions. */
  val eventTransitions: Q = Q(
    "event_transitions",
    """WITH w AS (SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |c AS (SELECT cur, nxt, count(*) AS n FROM w
      |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY cur)
      |SELECT c.cur, c.nxt, c.n,
      |  floor(CAST(c.n AS DOUBLE) / t.tn * 1000000 + 0.5) / 1000000 AS p
      |FROM c JOIN t ON t.cur = c.cur
      |ORDER BY c.cur, c.nxt""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val c = ev(s, d)
      .select(col("event_type").as("cur"),
        lead("event_type", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("cur").as("tcur")).agg(sum("n").as("tn"))
    c.join(broadcast(t), col("cur") === col("tcur"))
      .select(col("cur"), col("nxt"), col("n"),
        (floor(col("n").cast("double") / col("tn") * 1000000 + lit(0.5))
          / 1000000).as("p"))
      .orderBy("cur", "nxt")
  }

  /** CUSUM changepoint detection on the daily revenue series (Page
    * 1954) — the classic "did the level shift, and when" monitor that
    * q110's rolling z-score cannot answer (z flags points; CUSUM
    * accumulates small persistent drifts). The recurrence
    * S_t = max(0, S_{t−1} + (x_t − mean)) is multiplied through by
    * N_days so every step is EXACT BIGINT arithmetic:
    * S'_t = max(0, S'_{t−1} + N·x_t − T); only the final descale to
    * dollars divides. The argmax (strictly-greater update ⇒ earliest
    * max) is therefore an exact integer comparison in both engines.
    * Scale: the daily collapse is the one data-sized shuffle; the fold
    * runs over a CALENDAR-bounded series (~365 rows at any corpus
    * size — 100 TB adds events per day, not days), and S' ≤ N·T stays
    * under 2^63 past 10^5× this fixture. Spark folds a day-sorted
    * struct state; the oracle replays the recurrence as a RECURSIVE
    * CTE (holt_linear's split — DuckDB list_reduce cannot chain struct
    * accumulators). */
  val cusumDrift: Q = Q(
    "cusum_drift",
    """WITH RECURSIVE daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
      |    CAST(sum(x) AS BIGINT) AS t FROM daily),
      |idx AS (SELECT strftime(day, '%Y-%m-%d') AS day, x,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
      |rec AS (
      |  SELECT i, greatest(CAST(0 AS BIGINT), nd * x - t) AS s,
      |    greatest(CAST(0 AS BIGINT), nd * x - t) AS best, day AS bd
      |  FROM idx CROSS JOIN tot WHERE i = 1
      |  UNION ALL
      |  SELECT d.i,
      |    greatest(CAST(0 AS BIGINT), r.s + tt.nd * d.x - tt.t),
      |    CASE WHEN greatest(CAST(0 AS BIGINT), r.s + tt.nd * d.x - tt.t)
      |        > r.best
      |      THEN greatest(CAST(0 AS BIGINT), r.s + tt.nd * d.x - tt.t)
      |      ELSE r.best END,
      |    CASE WHEN greatest(CAST(0 AS BIGINT), r.s + tt.nd * d.x - tt.t)
      |        > r.best THEN d.day ELSE r.bd END
      |  FROM rec r JOIN idx d ON d.i = r.i + 1 CROSS JOIN tot tt)
      |SELECT nd AS n_days,
      |  floor(CAST(best AS DOUBLE) / nd / 100 * 10000 + 0.5) / 10000
      |    AS cusum_max, bd AS drift_day
      |FROM rec CROSS JOIN tot WHERE i = nd""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("x"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum("x").as("t"))
    daily.crossJoin(broadcast(tot)) // 1-row totals
      .groupBy("nd", "t")
      .agg(expr("array_sort(collect_list(struct(day, x)))").as("sr"))
      .withColumn("fin", expr(
        "aggregate(sr, struct(CAST(0 AS BIGINT) AS s, " +
          "CAST(-1 AS BIGINT) AS best, CAST('' AS STRING) AS bd), " +
          "(a, e) -> struct(" +
          "greatest(CAST(0 AS BIGINT), a.s + nd * e.x - t) AS s, " +
          "IF(greatest(CAST(0 AS BIGINT), a.s + nd * e.x - t) > a.best, " +
          "greatest(CAST(0 AS BIGINT), a.s + nd * e.x - t), a.best) AS best, " +
          "IF(greatest(CAST(0 AS BIGINT), a.s + nd * e.x - t) > a.best, " +
          "e.day, a.bd) AS bd))"))
      .select(col("nd").as("n_days"),
        (floor(col("fin.best").cast("double") / col("nd") / 100 * 10000
          + lit(0.5)) / 10000).as("cusum_max"),
        col("fin.bd").as("drift_day"))
  }

  /** Kendall τ-b between daily revenue and daily event count — the
    * rank-concordance trend test (did activity and revenue move
    * together?) that needs no distributional assumptions. Pair
    * classification uses SIGN LOGIC only (never the dx·dy product,
    * which overflows BIGINT once daily deltas reach ~10¹¹ — at 100 TB
    * they would); C/D/tie counts are exact integers and τ-b is one
    * fixed-form double. The pair set is the CALENDAR-bounded daily
    * series self-joined (≈365² /2 pairs at any corpus size — the
    * non-equi join is bounded by construction, whitelisted in the
    * cartesian sweep); the only data-sized work is the daily
    * collapse. */
  val kendallTau: Q = Q(
    "kendall_tau",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev,
      |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
      |p AS (SELECT b.rev - a.rev AS dx, b.cnt - a.cnt AS dy
      |      FROM daily a JOIN daily b ON a.day < b.day),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(count(*) FILTER ((dx > 0 AND dy > 0)
      |      OR (dx < 0 AND dy < 0)) AS BIGINT) AS nc,
      |    CAST(count(*) FILTER ((dx > 0 AND dy < 0)
      |      OR (dx < 0 AND dy > 0)) AS BIGINT) AS nd,
      |    CAST(count(*) FILTER (dx = 0 AND dy <> 0) AS BIGINT) AS tx,
      |    CAST(count(*) FILTER (dy = 0 AND dx <> 0) AS BIGINT) AS ty
      |  FROM p),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
      |SELECT n_days, m AS n_pairs, nc AS n_concordant, nd AS n_discordant,
      |  floor(CAST(nc - nd AS DOUBLE)
      |    / sqrt(CAST(nc + nd + ty AS DOUBLE) * (nc + nd + tx))
      |    * 1000000 + 0.5) / 1000000 AS tau_b
      |FROM c CROSS JOIN t""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
    val a = daily.select(col("day").as("da"), col("rev").as("ra"),
      col("cnt").as("ca"))
    val b = daily.select(col("day").as("db"), col("rev").as("rb"),
      col("cnt").as("cb"))
    val p = a.join(b, col("da") < col("db")) // bounded ~365-row sides
      .select((col("rb") - col("ra")).as("dx"),
        (col("cb") - col("ca")).as("dy"))
    val c = p.agg(count(lit(1)).as("m"),
      count(when((col("dx") > 0 && col("dy") > 0)
        || (col("dx") < 0 && col("dy") < 0), 1)).as("nc"),
      count(when((col("dx") > 0 && col("dy") < 0)
        || (col("dx") < 0 && col("dy") > 0), 1)).as("nd"),
      count(when(col("dx") === 0 && col("dy") =!= 0, 1)).as("tx"),
      count(when(col("dy") === 0 && col("dx") =!= 0, 1)).as("ty"))
    val t = daily.agg(count(lit(1)).as("n_days"))
    c.crossJoin(broadcast(t)) // 1-row day count
      .select(col("n_days"), col("m").as("n_pairs"),
        col("nc").as("n_concordant"), col("nd").as("n_discordant"),
        (floor((col("nc") - col("nd")).cast("double")
          / sqrt((col("nc") + col("nd") + col("ty")).cast("double")
            * (col("nc") + col("nd") + col("tx")))
          * 1000000 + lit(0.5)) / 1000000).as("tau_b"))
  }

  /** Theil–Sen robust trend line over daily revenue — the median of
    * all pairwise slopes (50% breakdown point; one wild day cannot
    * bend it, unlike q82's least squares). Slopes are identical
    * fixed-form doubles in both engines (exact BIGINT cent deltas over
    * exact integer day spans); the LOWER median is a deterministic
    * PICKED element, found by PrefixScan over slope-grouped counts —
    * never a buffered sort. The intercept is the median residual
    * against the ROUNDED slope (both engines use the same 1e-6 grid
    * value, keeping residuals bit-identical). Pair set is
    * calendar-bounded (~365²/2 at any scale); the two driver hops are
    * PrefixScan's grand totals (bounded by design). */
  val theilSen: Q = Q(
    "theil_sen",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev FROM events GROUP BY 1),
      |dx AS (SELECT date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
      |      AS x, rev FROM daily),
      |p AS (SELECT CAST(b.rev - a.rev AS DOUBLE) / (100.0 * (b.x - a.x))
      |      AS sl FROM dx a JOIN dx b ON a.x < b.x),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
      |g AS (SELECT sl, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY sl),
      |cum AS (SELECT sl, CAST(sum(c) OVER (ORDER BY sl) AS BIGINT) AS cum
      |      FROM g),
      |s1 AS (SELECT floor(min(sl) * 1000000 + 0.5) / 1000000 AS slope
      |      FROM cum CROSS JOIN m WHERE cum >= (m + 1) // 2),
      |r AS (SELECT CAST(rev AS DOUBLE) / 100 - slope * x AS res
      |      FROM dx CROSS JOIN s1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dx),
      |rg AS (SELECT res, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY res),
      |rcum AS (SELECT res, CAST(sum(c) OVER (ORDER BY res) AS BIGINT)
      |      AS cum FROM rg),
      |s2 AS (SELECT floor(min(res) * 10000 + 0.5) / 10000 AS intercept
      |      FROM rcum CROSS JOIN n WHERE cum >= (n + 1) // 2)
      |SELECT n AS n_days, m AS n_pairs, slope, intercept
      |FROM n CROSS JOIN m CROSS JOIN s1 CROSS JOIN s2""".stripMargin) {
    (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val dx = daily.select(
      datediff(col("day"), to_date(lit("1970-01-01"))).as("x"), col("rev"))
    val a = dx.select(col("x").as("xa"), col("rev").as("ra"))
    val b = dx.select(col("x").as("xb"), col("rev").as("rb"))
    val p = a.join(b, col("xa") < col("xb")) // bounded ~365-row sides
      .select(((col("rb") - col("ra")).cast("double")
        / (lit(100.0) * (col("xb") - col("xa")))).as("sl"))
    val g = p.groupBy("sl").agg(count(lit(1)).as("c"))
    val (cum, tots) = graft.ops.PrefixScan.withCumSums(
      g, Seq(col("sl")), Seq("c"))
    val m = tots(0)
    val slopeRaw = cum.filter(col("cum_c") >= (m + 1) / 2)
      .agg(min("sl")).collect()(0).getDouble(0) // bounded driver hop
    val slope = math.floor(slopeRaw * 1000000 + 0.5) / 1000000
    val r = dx.select(
      (col("rev").cast("double") / 100 - lit(slope) * col("x")).as("res"))
    val rg = r.groupBy("res").agg(count(lit(1)).as("c"))
    val (rcum, rtots) = graft.ops.PrefixScan.withCumSums(
      rg, Seq(col("res")), Seq("c"))
    val n = rtots(0)
    rcum.filter(col("cum_c") >= (n + 1) / 2)
      .agg(min("res").as("imin"))
      .select(lit(n).as("n_days"), lit(m).as("n_pairs"),
        lit(slope).as("slope"),
        (floor(col("imin") * 10000 + lit(0.5)) / 10000).as("intercept"))
  }

  /** Wald–Wolfowitz runs test on daily revenue vs its median — "is the
    * series random, or does it trend/cluster?" (too few runs = regime
    * persistence; too many = oscillation). The median is a PICKED
    * element from PrefixScan over revenue-grouped counts (q54's
    * never-buffer-a-group discipline); signs re-index through a second
    * PrefixScan (NOT a partition-less window — the sweep bans that
    * form) and transitions come from an i→i+1 equi-self-join. All
    * counts exact integers; z is one fixed-form double. Everything
    * after the daily collapse runs on a calendar-bounded ~365-row
    * relation. */
  val runsTest: Q = Q(
    "runs_test",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev FROM events GROUP BY 1),
      |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
      |g AS (SELECT rev, CAST(count(*) AS BIGINT) AS c FROM daily
      |      GROUP BY rev),
      |cum AS (SELECT rev, CAST(sum(c) OVER (ORDER BY rev) AS BIGINT) AS cum
      |      FROM g),
      |med AS (SELECT CAST(min(rev) AS BIGINT) AS med FROM cum CROSS JOIN n0
      |      WHERE cum >= (n + 1) // 2),
      |s AS (SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS sgn
      |      FROM daily CROSS JOIN med WHERE rev <> med),
      |idx AS (SELECT sgn, CAST(row_number() OVER (ORDER BY day) AS BIGINT)
      |      AS i FROM s),
      |tr AS (SELECT CAST(count(*) FILTER (a.sgn <> b.sgn) AS BIGINT) AS ch
      |      FROM idx a JOIN idx b ON b.i = a.i + 1),
      |cnts AS (SELECT CAST(count(*) FILTER (sgn = 1) AS BIGINT) AS n1,
      |    CAST(count(*) FILTER (sgn = 0) AS BIGINT) AS n2 FROM s)
      |SELECT n1 AS n_above, n2 AS n_below, ch + 1 AS n_runs,
      |  floor((ch + 1 - (2.0 * n1 * n2 / (n1 + n2) + 1))
      |    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
      |      / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))
      |    * 1000000 + 0.5) / 1000000 AS z_stat
      |FROM cnts CROSS JOIN tr""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val g = daily.groupBy("rev").agg(count(lit(1)).as("c"))
    val (cum, tots) = graft.ops.PrefixScan.withCumSums(
      g, Seq(col("rev")), Seq("c"))
    val n = tots(0)
    val med = cum.filter(col("cum_c") >= (n + 1) / 2)
      .agg(min("rev").as("med"))
    val sg = daily.crossJoin(broadcast(med)) // 1-row median
      .filter(col("rev") =!= col("med"))
      .select(col("day"), when(col("rev") > col("med"), 1).otherwise(0)
        .as("sgn"), lit(1L).as("one"))
    val (idx, _) = graft.ops.PrefixScan.withCumSums(
      sg, Seq(col("day")), Seq("one"))
    val ia = idx.select(col("sgn").as("sa"), col("cum_one").as("i"))
    val ib = idx.select(col("sgn").as("sb"), (col("cum_one") - 1).as("j"))
    val tr = ia.join(ib, col("i") === col("j"))
      .agg(count(when(col("sa") =!= col("sb"), 1)).as("ch"))
    val cnts = sg.agg(count(when(col("sgn") === 1, 1)).as("n1"),
      count(when(col("sgn") === 0, 1)).as("n2"))
    cnts.crossJoin(tr) // 1-row x 1-row report join
      .select(col("n1").as("n_above"), col("n2").as("n_below"),
        (col("ch") + 1).as("n_runs"),
        (floor((col("ch") + 1
          - (lit(2.0) * col("n1") * col("n2") / (col("n1") + col("n2"))
            + 1))
          / sqrt(lit(2.0) * col("n1") * col("n2")
            * (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2"))
            / ((col("n1") + col("n2")).cast("double")
              * (col("n1") + col("n2")) * (col("n1") + col("n2") - 1)))
          * 1000000 + lit(0.5)) / 1000000).as("z_stat"))
  }

  /** Additive seasonal decomposition of daily revenue — the classic
    * trend/seasonal split (the DESCRIPTIVE counterpart to
    * dow_seasonality's raw ratio index): trend = centered 7-day moving
    * average (calendar-keyed equi-join, q109's device — no
    * partition-less window), seasonal(dow) = mean DETRENDED value per
    * weekday over interior days. Exactness: the detrended residual is
    * kept ×7-SCALED (det7 = 7·rev − Σ₇rev, an exact BIGINT), so the
    * per-dow mean is ONE division of exact integers — no double is
    * ever summed across rows. Spec pins Σ(seasonal·n) ≈ 0 (the
    * additive-decomposition identity). Daily collapse is the only
    * data-sized stage; everything after is calendar-bounded. */
  val seasonalDecompose: Q = Q(
    "seasonal_decompose",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev FROM events GROUP BY 1),
      |win AS (SELECT a.day, a.rev,
      |    CAST(sum(b.rev) AS BIGINT) AS s7, CAST(count(*) AS BIGINT) AS w
      |  FROM daily a JOIN daily b
      |    ON b.day BETWEEN a.day - 3 AND a.day + 3
      |  GROUP BY a.day, a.rev),
      |det AS (SELECT dayofweek(day) + 1 AS dow, 7 * rev - s7 AS det7
      |      FROM win WHERE w = 7),
      |sea AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_obs,
      |    CAST(sum(det7) AS BIGINT) AS sd FROM det GROUP BY dow)
      |SELECT dow, n_obs,
      |  floor(CAST(sd AS DOUBLE) / (7 * n_obs) / 100 * 10000 + 0.5) / 10000
      |    AS seasonal
      |FROM sea ORDER BY dow""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val b = daily.select(col("day").as("bday"), col("rev").as("brev"))
    // centered 7-day window via a bounded ±3-offset equi-join fan-out
    val win = daily
      .withColumn("o", explode(sequence(lit(-3), lit(3))))
      .select(col("day"), col("rev"), expr("date_add(day, o)").as("nday"))
      .join(b, col("nday") === col("bday"))
      .groupBy("day", "rev")
      .agg(sum("brev").as("s7"), count(lit(1)).as("w"))
    val det = win.filter(col("w") === 7)
      .select(dayofweek(col("day")).cast("long").as("dow"),
        (lit(7) * col("rev") - col("s7")).as("det7"))
    det.groupBy("dow")
      .agg(count(lit(1)).as("n_obs"), sum("det7").as("sd"))
      .select(col("dow"), col("n_obs"),
        (floor(col("sd").cast("double") / (lit(7) * col("n_obs")) / 100
          * 10000 + lit(0.5)) / 10000).as("seasonal"))
      .orderBy("dow")
  }

  /** Stationary distribution of the event-type Markov chain — where
    * user behavior settles long-run (the quantity event_transitions'
    * one-step matrix only hints at): three synchronous π ← πP updates
    * from the uniform start. The chain is STATE-bounded (≤ |event
    * types|² cells at any corpus size), so after the one data-sized
    * lead-window collapse everything rides a ≤25-row broadcast.
    * Determinism: P's entries are single exact-count divisions, and
    * each π update folds its ≤5 terms in cur-sorted order (Spark
    * sorted-struct aggregate ≡ DuckDB ordered list_aggregate — the
    * nb_langid discipline), so both engines chain identical doubles. */
  /** Transition matrix P(cur→nxt) of the event-type chain — exact
    * count ratios; shared by markov_stationary / entropy_rate. */
  private def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val c = ev(s, d)
      .select(col("event_type").as("cur"),
        lead("event_type", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("cur").as("tcur")).agg(sum("n").as("tn"))
    c.join(broadcast(t), col("cur") === col("tcur"))
      .select(col("cur"), col("nxt"),
        (col("n").cast("double") / col("tn")).as("p"))
  }

  /** Three synchronous π ← πP updates from uniform (cur-sorted folds —
    * identical double chains cross-engine). Returns (state, pi). */
  private def stationaryPi(p: DataFrame): DataFrame = {
    val k = p.agg(countDistinct("cur").as("k"))
    val pi0 = p.select(col("cur").as("state")).distinct()
      .crossJoin(broadcast(k)) // 1-row state count
      .select(col("state"), (lit(1.0) / col("k")).as("pi"))
    def step(prev: DataFrame): DataFrame =
      p.join(broadcast(prev), col("state") === col("cur"))
        .groupBy(col("nxt").as("state2"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("cur"), (col("pi") * col("p"))
            .as("v")))),
          lit(0.0), (acc, x) => acc + x.getField("v")).as("pi"))
        .select(col("state2").as("state"), col("pi"))
    step(step(step(pi0)))
  }

  val markovStationary: Q = Q(
    "markov_stationary",
    {
      def step(prev: String, n: Int): String =
        s"""pi$n AS (SELECT nxt AS state,
           |    list_aggregate(list(pi * p ORDER BY cur), 'sum') AS pi
           |  FROM p JOIN $prev ON $prev.state = p.cur GROUP BY nxt)"""
          .stripMargin
      s"""WITH w AS (SELECT event_type AS cur,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM w
         |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY cur),
         |p AS (SELECT c.cur, c.nxt, CAST(c.n AS DOUBLE) / t.tn AS p
         |      FROM c JOIN t ON t.cur = c.cur),
         |k AS (SELECT CAST(count(DISTINCT cur) AS BIGINT) AS k FROM p),
         |pi0 AS (SELECT DISTINCT cur AS state,
         |      1.0 / (SELECT k FROM k) AS pi FROM p),
         |${step("pi0", 1)},
         |${step("pi1", 2)},
         |${step("pi2", 3)}
         |SELECT state, floor(pi * 1000000 + 0.5) / 1000000 AS pi
         |FROM pi3 ORDER BY state""".stripMargin
    }) { (s, d) =>
    stationaryPi(transitionMatrix(s, d))
      .select(col("state"),
        (floor(col("pi") * 1000000 + lit(0.5)) / 1000000).as("pi"))
      .orderBy("state")
  }

  /** Entropy rate of the event-type Markov chain — bits of surprise
    * per step at stationarity, H = −Σ π(cur)·p·log₂p: the single
    * number answering "how predictable is user behavior" (efficiency
    * = H/log₂k is the fraction of maximum randomness). Reuses the
    * shared transition matrix + stationary π; the ≤25 per-cell terms
    * fold (cur, nxt)-sorted so both engines chain identical doubles;
    * log₂ parity holds as the ln parity the corpus establishes
    * (lm_perplexity) divided by a constant. */
  val entropyRate: Q = Q(
    "entropy_rate",
    {
      def step(prev: String, n: Int): String =
        s"""pi$n AS (SELECT nxt AS state,
           |    list_aggregate(list(pi * p ORDER BY cur), 'sum') AS pi
           |  FROM p JOIN $prev ON $prev.state = p.cur GROUP BY nxt)"""
          .stripMargin
      s"""WITH w AS (SELECT event_type AS cur,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM w
         |      WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY cur),
         |p AS (SELECT c.cur, c.nxt, CAST(c.n AS DOUBLE) / t.tn AS p
         |      FROM c JOIN t ON t.cur = c.cur),
         |k AS (SELECT CAST(count(DISTINCT cur) AS BIGINT) AS k FROM p),
         |pi0 AS (SELECT DISTINCT cur AS state,
         |      1.0 / (SELECT k FROM k) AS pi FROM p),
         |${step("pi0", 1)},
         |${step("pi1", 2)},
         |${step("pi2", 3)},
         |cells AS (SELECT p.cur AS cur, p.nxt AS nxt,
         |      pi3.pi * p.p * log2(p.p) AS term
         |    FROM p JOIN pi3 ON pi3.state = p.cur),
         |h AS (SELECT -list_aggregate(list(term ORDER BY cur, nxt), 'sum')
         |      AS h FROM cells)
         |SELECT floor(h * 1000000 + 0.5) / 1000000 AS entropy_rate,
         |  floor(log2(k) * 1000000 + 0.5) / 1000000 AS max_entropy,
         |  floor(h / log2(k) * 1000000 + 0.5) / 1000000 AS efficiency
         |FROM h CROSS JOIN k""".stripMargin
    }) { (s, d) =>
    val p = transitionMatrix(s, d)
    val pi = stationaryPi(p)
    val k = p.agg(countDistinct("cur").as("k"))
    val h = p.join(broadcast(pi), col("state") === col("cur"))
      .select(col("cur"), col("nxt"),
        (col("pi") * col("p") * log2(col("p"))).as("term"))
      .agg((-aggregate(
        array_sort(collect_list(struct(col("cur"), col("nxt"),
          col("term").as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v"))).as("h"))
    h.crossJoin(broadcast(k)) // 1-row state count
      .select(
        (floor(col("h") * 1000000 + lit(0.5)) / 1000000).as("entropy_rate"),
        (floor(log2(col("k")) * 1000000 + lit(0.5)) / 1000000)
          .as("max_entropy"),
        (floor(col("h") / log2(col("k")) * 1000000 + lit(0.5)) / 1000000)
          .as("efficiency"))
  }

  /** Forecast backtest — the model-selection loop for the smoothing /
    * decomposition family (holt_linear, seasonal_decompose): hold out
    * the last 7 days of daily purchase revenue, forecast them with the
    * three standard baselines (naive last-value, seasonal-naive d−7,
    * drift), and score MAE/RMSE/MAPE per method. Daily revenues are
    * exact BIGINT cents; naive/seasonal predictions stay integers and
    * drift is one fixed-form rational; every error metric folds
    * DAY-SORTED on both engines (7 terms — never an engine-ordered
    * avg). The winner on this fixture is decided by the gate-pinned
    * numbers, which is the point: backtests must be reproducible.
    * Scales as one scan → calendar-bounded daily aggregate → 7-row
    * joins. */
  val forecastBacktest: Q = Q(
    "forecast_backtest",
    """WITH daily AS (SELECT
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |a22 AS (SELECT rev AS rev22 FROM daily WHERE d = 22),
      |a0 AS (SELECT rev AS rev0 FROM daily WHERE d = 0),
      |test AS (SELECT t.d, t.rev AS actual, s.rev AS snaive, rev22 AS naive,
      |    rev22 + (t.d - 22) * (rev22 - rev0) / 22.0 AS drift
      |  FROM daily t JOIN daily s ON s.d = t.d - 7
      |  CROSS JOIN a22 CROSS JOIN a0
      |  WHERE t.d >= 23),
      |err AS (SELECT d, actual, m.method,
      |    CASE m.method WHEN 'naive' THEN CAST(naive AS DOUBLE)
      |                  WHEN 'snaive' THEN CAST(snaive AS DOUBLE)
      |                  ELSE drift END AS pred
      |  FROM test CROSS JOIN
      |    (SELECT unnest(['naive', 'snaive', 'drift']) AS method) m),
      |terms AS (SELECT method, d, abs(actual - pred) AS ae,
      |    (actual - pred) * (actual - pred) AS se,
      |    abs(actual - pred) / actual AS ape
      |  FROM err)
      |SELECT method,
      |  floor(list_aggregate(list(ae ORDER BY d), 'sum') / 7 / 100 * 100
      |    + 0.5) / 100 AS mae,
      |  floor(sqrt(list_aggregate(list(se ORDER BY d), 'sum') / 7) / 100
      |    * 100 + 0.5) / 100 AS rmse,
      |  floor(list_aggregate(list(ape ORDER BY d), 'sum') / 7 * 1000000
      |    + 0.5) / 1000000 AS mape
      |FROM terms GROUP BY method ORDER BY method""".stripMargin) { (s, d) =>
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
        .as("d"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val a22 = daily.filter(col("d") === 22).select(col("rev").as("rev22"))
    val a0 = daily.filter(col("d") === 0).select(col("rev").as("rev0"))
    val s7 = daily.select((col("d") + 7).as("sd"), col("rev").as("snaive"))
    val test = daily.filter(col("d") >= 23)
      .join(s7, col("d") === col("sd"))
      .crossJoin(broadcast(a22)) // 1-row last-train-value anchor
      .crossJoin(broadcast(a0)) // 1-row first-value anchor
      .select(col("d"), col("rev").as("actual"), col("snaive"),
        col("rev22").as("naive"),
        (col("rev22") + (col("d") - 22) * (col("rev22") - col("rev0"))
          / 22.0).as("drift"))
    val err = test.select(col("d"), col("actual"),
      explode(array(
        struct(lit("naive").as("method"),
          col("naive").cast("double").as("pred")),
        struct(lit("snaive").as("method"),
          col("snaive").cast("double").as("pred")),
        struct(lit("drift").as("method"), col("drift").as("pred"))))
        .as("m"))
      .select(col("d"), col("actual"), col("m.method").as("method"),
        col("m.pred").as("pred"))
    val terms = err.select(col("method"), col("d"),
      abs(col("actual") - col("pred")).as("ae"),
      ((col("actual") - col("pred")) * (col("actual") - col("pred")))
        .as("se"),
      (abs(col("actual") - col("pred")) / col("actual")).as("ape"))
    def dayFold(field: String): org.apache.spark.sql.Column =
      expr(s"aggregate(transform(array_sort(collect_list(struct(d, $field))), " +
        s"t -> t.$field), 0D, (a, x) -> a + x)")
    terms.groupBy("method")
      .agg(dayFold("ae").as("sae"), dayFold("se").as("sse"),
        dayFold("ape").as("sape"))
      .select(col("method"),
        (floor(col("sae") / 7 / 100 * 100 + lit(0.5)) / 100).as("mae"),
        (floor(sqrt(col("sse") / 7) / 100 * 100 + lit(0.5)) / 100).as("rmse"),
        (floor(col("sape") / 7 * 1000000 + lit(0.5)) / 1000000).as("mape"))
      .orderBy("method")
  }

  /** Sequential-pattern support mining — "users who do a later do b",
    * the subsequence generalization of event_transitions' ADJACENT
    * pairs (a GSP/PrefixSpan length-2 pass). The trick that makes it
    * scale: a user exhibits a→b iff first_ts(a) < last_ts(b), so the
    * per-user event stream compresses to ≤|event types| (first, last)
    * rows and candidate enumeration is a user-keyed self-join of that
    * 5-row summary (≤25 pairs/user, bounded by the TYPE alphabet, not
    * the stream length — repeats a→a fall out naturally from first <
    * last). Support = exact user counts over a 1-row total broadcast. */
  val seqSupport: Q = Q(
    "seq_support",
    """WITH ft AS (SELECT user_id, event_type,
      |    min(ts) AS first_ts, max(ts) AS last_ts
      |  FROM events GROUP BY user_id, event_type),
      |pairs AS (SELECT a.user_id, a.event_type AS a, b.event_type AS b
      |  FROM ft a JOIN ft b ON a.user_id = b.user_id
      |    AND a.first_ts < b.last_ts),
      |sup AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_users
      |        FROM pairs GROUP BY a, b),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM
      |        (SELECT DISTINCT user_id FROM events))
      |SELECT a AS first_type, b AS then_type, n_users,
      |  floor(CAST(n_users AS DOUBLE) / n * 1000000 + 0.5) / 1000000
      |    AS support
      |FROM sup CROSS JOIN tot
      |ORDER BY n_users DESC, first_type, then_type""".stripMargin) { (s, d) =>
    val ft = ev(s, d).groupBy("user_id", "event_type")
      .agg(min("ts").as("first_ts"), max("ts").as("last_ts"))
    val a = ft.select(col("user_id"), col("event_type").as("a"),
      col("first_ts"))
    val b = ft.select(col("user_id").as("uid_b"), col("event_type").as("b"),
      col("last_ts"))
    val pairs = a.join(b,
      col("user_id") === col("uid_b") && col("first_ts") < col("last_ts"))
    val sup = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_users"))
    val tot = ev(s, d).select("user_id").distinct()
      .agg(count(lit(1)).as("n"))
    sup.crossJoin(broadcast(tot)) // 1-row user-total broadcast
      .select(col("a").as("first_type"), col("b").as("then_type"),
        col("n_users"),
        (floor(col("n_users").cast("double") / col("n") * 1000000
          + lit(0.5)) / 1000000).as("support"))
      .orderBy(col("n_users").desc, col("first_type"), col("then_type"))
  }

  /** Funnel conversion-latency percentiles — the follow-up every
    * funnel dashboard (q55) needs: for users who signed up and later
    * purchased, how long did conversion take? Per-user delta = first
    * purchase after first signup, in EXACT integer seconds
    * (epoch-µs // 1e6 differences); the p25/p50/p75/p90 are exact
    * lower order statistics picked by the PrefixScan cum-count at
    * rank ⌈q·n/100⌉ (the conformal_interval device — never a
    * partition-less rank, never a driver sort), with the 4-row pick
    * spec broadcast. */
  val funnelLatency: Q = Q(
    "funnel_latency",
    """WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |pu AS (SELECT e.user_id, min(ts) AS p_ts
      |  FROM events e JOIN su ON su.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > su.s_ts
      |  GROUP BY e.user_id),
      |dl AS (SELECT su.user_id,
      |    CAST(epoch_us(p_ts) // 1000000 - epoch_us(s_ts) // 1000000
      |      AS BIGINT) AS delta_sec
      |  FROM su JOIN pu ON pu.user_id = su.user_id),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dl),
      |rk AS (SELECT user_id, delta_sec,
      |    row_number() OVER (ORDER BY delta_sec, user_id) AS r FROM dl),
      |spec AS (SELECT q, CAST(ceil(q * n / 100.0) AS BIGINT) AS pick
      |  FROM n CROSS JOIN (SELECT unnest([25, 50, 75, 90]) AS q))
      |SELECT CAST(spec.q AS INTEGER) AS quantile, n.n AS n_converted,
      |  rk.delta_sec,
      |  floor(CAST(rk.delta_sec AS DOUBLE) / 3600 * 100 + 0.5) / 100
      |    AS delta_hours
      |FROM spec JOIN rk ON rk.r = spec.pick CROSS JOIN n
      |ORDER BY quantile""".stripMargin) { (s, d) =>
    val su = ev(s, d).filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val pu = ev(s, d).filter(col("event_type") === "purchase")
      .join(su.withColumnRenamed("user_id", "su_uid"),
        col("user_id") === col("su_uid") && col("ts") > col("s_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    val dl = su.join(pu, Seq("user_id"))
      .select(col("user_id"),
        (col("p_ts").cast("long") - col("s_ts").cast("long"))
          .as("delta_sec"))
      .withColumn("one", lit(1L))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      dl, Seq(col("delta_sec"), col("user_id")), Seq("one"))
    val n = totals(0)
    val spec = ev(s, d).sparkSession.range(1)
      .select(explode(expr("array(25, 50, 75, 90)")).as("q"))
      .select(col("q"),
        ceil(col("q") * lit(n) / lit(100.0)).cast("long").as("pick"))
    scanned.join(broadcast(spec), col("cum_one") === col("pick"))
      .select(col("q").cast("int").as("quantile"),
        lit(n).as("n_converted"), col("delta_sec"),
        (floor(col("delta_sec").cast("double") / 3600 * 100 + lit(0.5))
          / 100).as("delta_hours"))
      .orderBy("quantile")
  }

  /** Inventory run-out simulation — the CAPPED running sum, the
    * canonical NON-associative scan no window frame can express
    * (max(0, prev + in − out) does not decompose): per supplier, daily
    * shipped quantity drains a stock that refills at the supplier's
    * ceiling-mean daily rate, clamped at zero. The recurrence runs as
    * holt_linear's device — a day-sorted struct-state fold per
    * supplier (bounded by the calendar), all EXACT BIGINTs (demand =
    * rounded integer quantities, restock = integer ceil division,
    * gaps = day differences), so every engine folds identical
    * integers; the oracle replays it as a recursive CTE. Reports
    * stock-outs, ending and peak stock for the first 15 suppliers. */
  val inventoryRunout: Q = Q(
    "inventory_runout",
    """WITH RECURSIVE dd AS (SELECT l_suppkey AS sk,
      |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      AS day,
      |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
      |      AS dm
      |  FROM lineitem GROUP BY 1, 2),
      |rr AS (SELECT sk,
      |    (CAST(sum(dm) AS BIGINT) + (max(day) - min(day) + 1) - 1)
      |      // (max(day) - min(day) + 1) AS r,
      |    CAST(count(*) AS BIGINT) AS nd
      |  FROM dd GROUP BY sk),
      |idx AS (SELECT dd.sk, dd.day, dd.dm, rr.r, rr.nd,
      |    CAST(row_number() OVER (PARTITION BY dd.sk ORDER BY dd.day)
      |      AS BIGINT) AS i
      |  FROM dd JOIN rr ON rr.sk = dd.sk),
      |rec AS (
      |  SELECT sk, nd, r, i, day AS pd,
      |    greatest(r - dm, 0) AS inv,
      |    CASE WHEN r - dm <= 0 THEN CAST(1 AS BIGINT)
      |         ELSE CAST(0 AS BIGINT) END AS zeros,
      |    greatest(r - dm, 0) AS mx
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT r2.sk, r2.nd, r2.r, d.i, d.day,
      |    greatest(r2.inv + r2.r * (d.day - r2.pd) - d.dm, 0),
      |    r2.zeros + CASE WHEN r2.inv + r2.r * (d.day - r2.pd) - d.dm <= 0
      |               THEN 1 ELSE 0 END,
      |    greatest(r2.mx,
      |      greatest(r2.inv + r2.r * (d.day - r2.pd) - d.dm, 0))
      |  FROM rec r2 JOIN idx d ON d.sk = r2.sk AND d.i = r2.i + 1)
      |SELECT sk AS suppkey, nd AS n_demand_days, r AS restock_rate,
      |  inv AS end_stock, zeros AS n_stockouts, mx AS peak_stock
      |FROM rec WHERE i = nd AND sk <= 15 ORDER BY suppkey""".stripMargin) {
    (s, d) =>
    val dd = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("sk"),
        datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01")))
          .as("day"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
      .groupBy("sk", "day").agg(sum("q").as("dm"))
    // integer ceil-division: Spark's / is double division, so compute
    // exactly as (sum + span - 1) DIV span on the longs
    val withR = dd.groupBy("sk")
      .agg(count(lit(1)).as("nd"),
        sum("dm").as("tot"),
        (max("day") - min("day") + 1).as("span"),
        expr("array_sort(collect_list(struct(day, dm)))").as("sts"))
      .withColumn("r", expr("CAST((tot + span - 1) DIV span AS BIGINT)"))
    withR
      .withColumn("fin", expr(
        "aggregate(slice(sts, 2, size(sts) - 1), " +
          "struct(sts[0].day AS pd, " +
          "greatest(r - sts[0].dm, CAST(0 AS BIGINT)) AS inv, " +
          "CAST(IF(r - sts[0].dm <= 0, 1, 0) AS BIGINT) AS zeros, " +
          "greatest(r - sts[0].dm, CAST(0 AS BIGINT)) AS mx), " +
          "(a, x) -> struct(x.day AS pd, " +
          "greatest(a.inv + r * (x.day - a.pd) - x.dm, CAST(0 AS BIGINT)) AS inv, " +
          "a.zeros + CAST(IF(a.inv + r * (x.day - a.pd) - x.dm <= 0, 1, 0) AS BIGINT) AS zeros, " +
          "greatest(a.mx, greatest(a.inv + r * (x.day - a.pd) - x.dm, " +
          "CAST(0 AS BIGINT))) AS mx))"))
      .filter(col("sk") <= 15)
      .select(col("sk").as("suppkey"), col("nd").as("n_demand_days"),
        col("r").as("restock_rate"), col("fin.inv").as("end_stock"),
        col("fin.zeros").as("n_stockouts"), col("fin.mx").as("peak_stock"))
      .orderBy("suppkey")
  }

  /** Hampel filter — ROBUST rolling outlier detection (the rolling-z
    * of q110 breaks when the window itself contains the outlier; the
    * rolling MEDIAN/MAD does not): over each user's daily-cents
    * series, a centered 7-day ROWS frame collects into an array and
    * the LOWER MEDIAN + MAD are exact integer element PICKS from the
    * sorted frame (never float quantiles), so the flag |x−med| > 3·MAD
    * is a pure integer comparison on both engines. Frames are
    * user-partitioned windows — scale-safe. First 25 flagged days. */
  val hampelFilter: Q = Q(
    "hampel_filter",
    """WITH daily AS (SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2),
      |fr AS (SELECT user_id, day, cents,
      |    list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w
      |  FROM daily),
      |st AS (SELECT user_id, day, cents,
      |    w[CAST((len(w) - 1) // 2 AS INTEGER) + 1] AS med,
      |    list_sort(list_transform(w,
      |      v -> abs(v - w[CAST((len(w) - 1) // 2 AS INTEGER) + 1])))
      |      [CAST((len(w) - 1) // 2 AS INTEGER) + 1] AS mad
      |  FROM fr)
      |SELECT user_id, CAST(day AS INTEGER) AS day, cents, med, mad
      |FROM st WHERE abs(cents - med) > 3 * mad
      |ORDER BY user_id, day LIMIT 25""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    val w7 = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(-3, 3)
    val fr = daily.withColumn("w",
      sort_array(collect_list(col("cents")).over(w7)))
    val st = fr
      .withColumn("med",
        expr("w[CAST((size(w) - 1) DIV 2 AS INT)]"))
      .withColumn("mad", expr(
        "sort_array(transform(w, v -> abs(v - med)))" +
          "[CAST((size(w) - 1) DIV 2 AS INT)]"))
    st.filter(abs(col("cents") - col("med")) > col("mad") * 3)
      .select(col("user_id"), col("day").cast("int").as("day"),
        col("cents"), col("med"), col("mad"))
      .orderBy("user_id", "day").limit(25)
  }

  /** Holt–Winters additive triple exponential smoothing (level + trend
    * + weekly seasonality, α = β = γ = 0.5, m = 7) over the GLOBAL
    * daily revenue series — holt_linear's seasonal big sibling, the
    * capacity-planning forecaster. The data-scale work is the daily
    * collapse (one shuffle, exact integer cents); the fold then runs
    * over a CALENDAR-BOUNDED series (≤ ~2,400 days regardless of
    * corpus size), so the single-task struct fold is constant work at
    * any scale. The state is struct(l, b, s[7]) with the seasonal ring
    * rotated each step; every multiplier is 0.5, so both engines
    * execute the identical IEEE operation sequence (Spark: `aggregate`
    * over the day-sorted list; oracle: per-step recursive CTE carrying
    * the same (l, b, s) — same recurrence, same association, bit-equal
    * doubles). Emits the 7-day-ahead forecast fan h = 1..7. */
  val holtWinters: Q = Q(
    "holt_winters",
    """WITH RECURSIVE daily AS (SELECT
      |    strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT CAST(y AS DOUBLE) AS yd,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
      |    CAST(count(*) OVER () AS BIGINT) AS n FROM daily),
      |rec AS (
      |  SELECT i, n, yd AS l, CAST(0 AS DOUBLE) AS b,
      |    [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
      |     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
      |     CAST(0 AS DOUBLE)] AS s
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT d.i, r.n,
      |    0.5 * (d.yd - r.s[1]) + 0.5 * (r.l + r.b),
      |    0.5 * ((0.5 * (d.yd - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
      |      + 0.5 * r.b,
      |    list_concat(r.s[2:7],
      |      [0.5 * (d.yd - (0.5 * (d.yd - r.s[1]) + 0.5 * (r.l + r.b)))
      |       + 0.5 * r.s[1]])
      |  FROM rec r JOIN idx d ON d.i = r.i + 1)
      |SELECT CAST(h AS BIGINT) AS h, n AS n_days,
      |  floor(l / 100 * 10000 + 0.5) / 10000 AS level,
      |  floor(b / 100 * 10000 + 0.5) / 10000 AS trend,
      |  floor((l + h * b + s[h]) / 100 * 10000 + 0.5) / 10000 AS forecast
      |FROM rec CROSS JOIN (SELECT unnest(range(1, 8)) AS h)
      |WHERE i = n ORDER BY h""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").as("y"))
    daily
      .agg(count(lit(1)).as("n_days"),
        expr("array_sort(collect_list(struct(day, CAST(y AS DOUBLE) AS yd)))")
          .as("sd"))
      .withColumn("fin", expr(
        "aggregate(slice(sd, 2, size(sd) - 1), " +
          "struct(sd[0].yd AS l, CAST(0 AS DOUBLE) AS b, " +
          "array_repeat(CAST(0 AS DOUBLE), 7) AS s), " +
          "(a, x) -> struct(" +
          "0.5D * (x.yd - a.s[0]) + 0.5D * (a.l + a.b) AS l, " +
          "0.5D * ((0.5D * (x.yd - a.s[0]) + 0.5D * (a.l + a.b)) - a.l) " +
          "+ 0.5D * a.b AS b, " +
          "concat(slice(a.s, 2, 6), array(" +
          "0.5D * (x.yd - (0.5D * (x.yd - a.s[0]) + 0.5D * (a.l + a.b))) " +
          "+ 0.5D * a.s[0])) AS s))"))
      .select(col("n_days"), col("fin"),
        explode(expr("sequence(1, 7)")).as("h"))
      .select(col("h").cast("long").as("h"), col("n_days"),
        (floor(col("fin.l") / 100 * 10000 + lit(0.5)) / 10000).as("level"),
        (floor(col("fin.b") / 100 * 10000 + lit(0.5)) / 10000).as("trend"),
        (floor((col("fin.l") + col("h") * col("fin.b")
          + expr("element_at(fin.s, h)")) / 100 * 10000 + lit(0.5)) / 10000)
          .as("forecast"))
      .orderBy("h")
  }

  /** SAX symbolic discretization (Lin et al., DMKD'07) of each user's
    * daily-spend series — the time-series indexing primitive: z-
    * normalize per user, PAA-average into 8 segments, map each to a
    * 4-letter Gaussian-breakpoint alphabet, then group identical words
    * to surface the corpus's dominant temporal motifs. Everything
    * stays exact until one final division per segment: z's numerator
    * n·Σ_seg − c·S and the variance radicand n·Q − S² are pure BIGINT
    * co-moments, and `sqrt` is IEEE-correctly-rounded, so both
    * engines compare identical doubles against identical breakpoint
    * literals. Per-user series are calendar-bounded (≤31 days), all
    * windows are user-partitioned, and the word collapse is one
    * shuffle on the ≤4⁸ word space. */
  val saxSymbols: Q = Q(
    "sax_symbols",
    """WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM events GROUP BY 1, 2),
      |idx AS (SELECT user_id, y,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
      |      AS BIGINT) AS i,
      |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
      |    CAST(sum(y) OVER (PARTITION BY user_id) AS BIGINT) AS s,
      |    CAST(sum(y * y) OVER (PARTITION BY user_id) AS BIGINT) AS q
      |  FROM daily),
      |seg AS (SELECT user_id, ((i - 1) * 8) // n AS g,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS c,
      |    any_value(n) AS n, any_value(s) AS s, any_value(q) AS q
      |  FROM idx WHERE n >= 8 GROUP BY 1, 2),
      |sym AS (SELECT user_id, g,
      |    CASE WHEN n * q - s * s = 0 THEN 'c'
      |      WHEN CAST(n * sy - c * s AS DOUBLE)
      |          / (c * sqrt(CAST(n * q - s * s AS DOUBLE))) < -0.6745
      |        THEN 'a'
      |      WHEN CAST(n * sy - c * s AS DOUBLE)
      |          / (c * sqrt(CAST(n * q - s * s AS DOUBLE))) < 0.0 THEN 'b'
      |      WHEN CAST(n * sy - c * s AS DOUBLE)
      |          / (c * sqrt(CAST(n * q - s * s AS DOUBLE))) < 0.6745
      |        THEN 'c'
      |      ELSE 'd' END AS ch
      |  FROM seg),
      |words AS (SELECT user_id, string_agg(ch, '' ORDER BY g) AS word
      |  FROM sym GROUP BY 1)
      |SELECT word, CAST(count(*) AS BIGINT) AS n_users
      |FROM words GROUP BY word
      |ORDER BY n_users DESC, word LIMIT 15""".stripMargin) { (s, d) =>
    val wUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val wOrd = wUser.orderBy("day")
    val daily = ev(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id", "day").agg(sum("cents").as("y"))
    val idx = daily.select(col("user_id"), col("y"),
      row_number().over(wOrd).cast("long").as("i"),
      count(lit(1)).over(wUser).as("n"),
      sum("y").over(wUser).as("s"),
      sum(col("y") * col("y")).over(wUser).as("q"))
    val seg = idx.filter(col("n") >= 8)
      .withColumn("g", expr("((i - 1) * 8) div n"))
      .groupBy("user_id", "g")
      .agg(sum("y").as("sy"), count(lit(1)).as("c"),
        first("n").as("n"), first("s").as("s"), first("q").as("q"))
    val z = col("zn").cast("double") / (col("c") * sqrt(col("rad").cast("double")))
    val sym = seg
      .withColumn("zn", col("n") * col("sy") - col("c") * col("s"))
      .withColumn("rad", col("n") * col("q") - col("s") * col("s"))
      .select(col("user_id"), col("g"),
        when(col("rad") === 0, "c")
          .when(z < -0.6745, "a")
          .when(z < 0.0, "b")
          .when(z < 0.6745, "c")
          .otherwise("d").as("ch"))
    sym.groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(g, ch))), t -> t.ch), '')").as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("word")).limit(15)
  }

  /** Shapley-value marketing attribution (the game-theoretic upgrade
    * of q108's last-touch): each purchase's preceding touch-set over
    * channels {click, view, signup} defines the coalition data, the
    * characteristic function v(S) counts purchases whose touch-set ⊆
    * S, and every channel gets its exact Shapley credit φ_i =
    * Σ_S |S|!(c−|S|−1)!/c! · (v(S∪i) − v(S)). With c = 3 the weights
    * are sixths, so 6φ is computed as an EXACT integer — both engines
    * divide once at the end. The data-scale work is one user-
    * partitioned preceding-window pass + an ≤8-row subset collapse;
    * the 8×8 subset algebra runs on a single row (no driver loop).
    * Efficiency (Σφ = v(C) − v(∅)) is pinned in TemporalOpsSuite. */
  val shapleyAttribution: Q = Q(
    "shapley_attribution",
    """WITH t AS (SELECT user_id, ts, event_id, event_type,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
      |      AS cf,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w
      |      AS vf,
      |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER w
      |      AS sf
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT COALESCE(cf, 0) + 2 * COALESCE(vf, 0)
      |    + 4 * COALESCE(sf, 0) AS tset
      |  FROM t WHERE event_type = 'purchase'),
      |nt AS (SELECT tset, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
      |subsets AS (SELECT unnest(range(0, 8)) AS s),
      |v AS (SELECT s.s,
      |    CAST(COALESCE(sum(CASE WHEN (nt.tset & s.s) = nt.tset
      |      THEN nt.n END), 0) AS BIGINT) AS v
      |  FROM subsets s LEFT JOIN nt ON TRUE GROUP BY s.s),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2),
      |  ('signup', 4)) c(channel, b)),
      |phi AS (SELECT c.channel,
      |    CAST(sum(CASE WHEN (s.s & c.b) = 0 THEN
      |      (CASE bit_count(s.s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
      |      * (vb.v - vs.v) ELSE 0 END) AS BIGINT) AS phi6
      |  FROM ch c CROSS JOIN subsets s
      |  JOIN v vs ON vs.s = s.s
      |  JOIN v vb ON vb.s = (s.s | c.b)
      |  GROUP BY 1),
      |tot AS (SELECT (SELECT v FROM v WHERE s = 7)
      |  - (SELECT v FROM v WHERE s = 0) AS attributable)
      |SELECT channel,
      |  floor(CAST(phi6 AS DOUBLE) / 6 * 10000 + 0.5) / 10000 AS phi,
      |  floor(CAST(phi6 AS DOUBLE) / (6 * attributable) * 1000000 + 0.5)
      |    / 1000000 AS share
      |FROM phi CROSS JOIN tot ORDER BY channel""".stripMargin) { (s, d) =>
    val wPrev = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def flag(t: String) =
      max(when(col("event_type") === t, 1).otherwise(0)).over(wPrev)
    val nt = ev(s, d)
      .withColumn("cf", flag("click"))
      .withColumn("vf", flag("view"))
      .withColumn("sf", flag("signup"))
      .filter(col("event_type") === "purchase")
      .select((coalesce(col("cf"), lit(0)) + coalesce(col("vf"), lit(0)) * 2
        + coalesce(col("sf"), lit(0)) * 4).as("tset"))
      .groupBy("tset").agg(count(lit(1)).as("n"))
    nt.agg(expr("map_from_entries(collect_list(struct(tset, n)))").as("m"))
      .withColumn("nt",
        expr("transform(sequence(0, 7), t -> coalesce(element_at(m, t), 0L))"))
      .withColumn("v", expr("transform(sequence(0, 7), s -> " +
        "aggregate(sequence(0, 7), 0L, (a, t) -> " +
        "a + IF((t & s) = t, nt[t], 0L)))"))
      .select(col("v"), explode(expr(
        "array(struct('click' AS channel, 1 AS b), " +
          "struct('view' AS channel, 2 AS b), " +
          "struct('signup' AS channel, 4 AS b))")).as("c"))
      .select(col("c.channel").as("channel"), col("v"), col("c.b").as("b"))
      .withColumn("phi6", expr("aggregate(sequence(0, 7), 0L, (a, s) -> " +
        "a + IF((s & b) = 0, " +
        "CAST(CASE bit_count(s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END " +
        "AS BIGINT) * (v[s | b] - v[s]), 0L))"))
      .select(col("channel"),
        (floor(col("phi6").cast("double") / 6 * 10000 + lit(0.5)) / 10000)
          .as("phi"),
        (floor(col("phi6").cast("double")
          / (lit(6) * (expr("v[7] - v[0]"))) * 1000000 + lit(0.5)) / 1000000)
          .as("share"))
      .orderBy("channel")
  }

  /** Exponential time-decay popularity ranking — the feature-store /
    * trending-items primitive: every order contributes 2^(−age/28d)
    * (a power-of-two half-life every 4 weeks), so recent demand
    * dominates but history never fully vanishes. Decay ages are
    * INTEGER bucket indices (floor-div 28 against the fixture's fixed
    * anchor date), making each weight an exactly-representable dyadic
    * 2^−k — pow(half, integer) is exact in both engines — and each
    * part folds its ≤86 bucket terms in k-sorted order, so the double
    * accumulation sequence is identical cross-engine. One join + one
    * (part, bucket) collapse; the fold is O(buckets) per part. */
  val decayedPopularity: Q = Q(
    "decayed_popularity",
    """WITH a AS (SELECT li.l_partkey AS pk,
      |    date_diff('day', o.o_orderdate,
      |      TIMESTAMP '2001-08-01 00:00:00') // 28 AS k
      |  FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey),
      |c AS (SELECT pk, CAST(k AS BIGINT) AS k,
      |      CAST(count(*) AS BIGINT) AS cnt FROM a GROUP BY 1, 2),
      |s0 AS (SELECT pk, CAST(sum(cnt) AS BIGINT) AS n_orders,
      |    list(cnt ORDER BY k) AS cs, list(k ORDER BY k) AS ks
      |  FROM c GROUP BY pk),
      |s AS (SELECT pk, n_orders,
      |    list_aggregate(list_transform(range(1, len(cs) + 1),
      |      i -> cs[i] * pow(0.5, CAST(ks[i] AS DOUBLE))), 'sum') AS score
      |  FROM s0)
      |SELECT pk AS part, n_orders,
      |  floor(score * 10000 + 0.5) / 10000 AS decayed_score
      |FROM s ORDER BY decayed_score DESC, part LIMIT 15""".stripMargin) {
    (s, d) =>
    val a = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey").as("pk"),
        expr("CAST(datediff(TIMESTAMP '2001-08-01 00:00:00', o_orderdate) " +
          "div 28 AS BIGINT)").as("k"))
    a.groupBy("pk", "k").agg(count(lit(1)).as("cnt"))
      .groupBy("pk")
      .agg(sum("cnt").as("n_orders"),
        expr("aggregate(array_sort(collect_list(struct(k, cnt))), 0D, " +
          "(acc, t) -> acc + t.cnt * pow(0.5D, CAST(t.k AS DOUBLE)))")
          .as("score"))
      .select(col("pk").as("part"), col("n_orders"),
        (floor(col("score") * 10000 + lit(0.5)) / 10000)
          .as("decayed_score"))
      .orderBy(col("decayed_score").desc, col("part")).limit(15)
  }

  /** Event-sequence pattern matching (the MATCH_RECOGNIZE shape): each
    * user's journey compresses to an ordered event-initial string —
    * one (ts, event_id)-sorted fold per user, journeys are bounded by
    * per-user activity — and the pattern "click, then purchase, with
    * no error between" is the regex `c[^e]*p` counted per journey.
    * Regex runs once per USER (≤ ~70 chars), never per event; both
    * engines scan leftmost-first with the same greedy semantics, so
    * non-overlapping match counts agree. Emits the top-20 converting
    * journeys. */
  val eventRegexMatch: Q = Q(
    "event_regex_match",
    """WITH j AS (SELECT user_id,
      |    string_agg(CASE event_type WHEN 'click' THEN 'c'
      |      WHEN 'view' THEN 'v' WHEN 'signup' THEN 's'
      |      WHEN 'purchase' THEN 'p' ELSE 'e' END,
      |      '' ORDER BY ts, event_id) AS journey
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(journey) AS BIGINT) AS n_events,
      |  CAST(len(regexp_extract_all(journey, 'c[^e]*p')) AS BIGINT)
      |    AS n_matches
      |FROM j
      |WHERE len(regexp_extract_all(journey, 'c[^e]*p')) > 0
      |ORDER BY n_matches DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
    ev(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", "c")
          .when(col("event_type") === "view", "v")
          .when(col("event_type") === "signup", "s")
          .when(col("event_type") === "purchase", "p")
          .otherwise("e").as("ini"))
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(ts, event_id, ini))), t -> t.ini), '')").as("journey"))
      .select(col("user_id"),
        length(col("journey")).cast("long").as("n_events"),
        expr("CAST(regexp_count(journey, 'c[^e]*p') AS BIGINT)")
          .as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("n_matches").desc, col("user_id")).limit(20)
  }

  /** Trailing 14-day rolling correlation between daily purchase
    * revenue and daily click volume — "does engagement still track
    * spend this fortnight", the co-movement monitor behind anomaly
    * alerts. Each day fans out to the ≤14 window ends it supports
    * (sliding_distinct_users' bounded-explode device — shuffle ∝ the
    * DAILY table, never the raw events), windows collapse to exact
    * BIGINT co-moments, and r's numerator/denominator are assembled
    * from those integers with IEEE-only double steps (the variance
    * product crosses 2⁶³, so the two factors convert exactly to
    * doubles first). Full 14-day windows only; zero-variance guards
    * keep ANSI mode happy. */
  val rollingCorr: Q = Q(
    "rolling_corr",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |days AS (SELECT day FROM daily),
      |fan AS (SELECT d.day + o * INTERVAL 1 DAY AS wend, d.x, d.y
      |  FROM daily d CROSS JOIN (SELECT unnest(range(0, 14)) AS o)),
      |w AS (SELECT f.wend, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(f.x) AS BIGINT) AS sx, CAST(sum(f.y) AS BIGINT) AS sy,
      |    CAST(sum(f.x * f.y) AS BIGINT) AS sxy,
      |    CAST(sum(f.x * f.x) AS BIGINT) AS sxx,
      |    CAST(sum(f.y * f.y) AS BIGINT) AS syy
      |  FROM fan f JOIN days dy ON dy.day = f.wend
      |  GROUP BY f.wend)
      |SELECT strftime(wend, '%Y-%m-%d') AS window_end,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
      |    floor((CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |             * CAST(n * syy - sy * sy AS DOUBLE)))
      |      * 1000000 + 0.5) / 1000000 END AS corr_14d
      |FROM w WHERE n = 14 ORDER BY window_end""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
          .otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
    val days = daily.select(col("day").as("dday"))
    val w = daily
      .withColumn("o", explode(sequence(lit(0), lit(13))))
      .select((col("day") + expr("make_interval(0, 0, 0, o, 0, 0, 0)"))
        .as("wend"), col("x"), col("y"))
      .join(broadcast(days), col("wend") === col("dday"), "left_semi")
      .groupBy("wend")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") === 14)
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    w.select(date_format(col("wend"), "yyyy-MM-dd").as("window_end"),
        when(vx > 0 && vy > 0,
          floor(((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / sqrt(vx.cast("double") * vy.cast("double")))
            * 1000000 + lit(0.5)) / 1000000).as("corr_14d"))
      .orderBy("window_end")
  }

  /** Dickey–Fuller unit-root test (no-lag form, Dickey & Fuller 1979)
    * on the daily revenue series — "is this series mean-reverting or
    * a random walk", the stationarity check run before ARIMA-family
    * modeling. Δy_t regresses on (1, y_{t−1}) with the lag pairs
    * built as a DATE-KEYED equi-join of the daily aggregate with
    * itself (acf's device — no partition-less window, survives
    * arbitrarily long series), all co-moments exact BIGINTs in whole
    * dollars (cents²·days crosses 2⁶³), and β̂/t from the standard
    * OLS identities as mirrored double steps. Decision at the 5% DF
    * critical value −2.86. */
  val adfTest: Q = Q(
    "adf_test",
    """WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      / 100) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |pr AS (SELECT a.y AS x, b.y - a.y AS dy FROM daily a
      |  JOIN daily b ON b.day = a.day + INTERVAL 1 DAY),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
      |    CAST(sum(x * dy) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(dy * dy) AS BIGINT) AS syy FROM pr),
      |f AS (SELECT n,
      |    sxx - CAST(sx AS DOUBLE) * sx / n AS cxx,
      |    sxy - CAST(sx AS DOUBLE) * sy / n AS cxy,
      |    syy - CAST(sy AS DOUBLE) * sy / n AS cyy FROM m),
      |g AS (SELECT n, cxx, cxy / cxx AS beta,
      |    (cyy - cxy / cxx * cxy) / (n - 2) AS s2 FROM f)
      |SELECT n AS n_pairs,
      |  floor(beta * 1000000 + 0.5) / 1000000 AS beta,
      |  floor(beta / sqrt(s2 / cxx) * 10000 + 0.5) / 10000 AS t_stat,
      |  beta / sqrt(s2 / cxx) < -2.86 AS stationary
      |FROM g""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(floor(sum(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast("long")) / 100).cast("long").as("y"))
    val pr = daily.as("a").join(daily.as("b"),
        col("b.day") === col("a.day") + expr("INTERVAL 1 DAY"))
      .select(col("a.y").as("x"), (col("b.y") - col("a.y")).as("dy"))
    val m = pr.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("dy").as("sy"), sum(col("x") * col("dy")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
    val cxx = col("sxx") - col("sx").cast("double") * col("sx") / col("n")
    val cxy = col("sxy") - col("sx").cast("double") * col("sy") / col("n")
    val cyy = col("syy") - col("sy").cast("double") * col("sy") / col("n")
    val beta = cxy / cxx
    val s2 = (cyy - cxy / cxx * cxy) / (col("n") - 2)
    m.select(col("n").as("n_pairs"),
      (floor(beta * 1000000 + lit(0.5)) / 1000000).as("beta"),
      (floor(beta / sqrt(s2 / cxx) * 10000 + lit(0.5)) / 10000)
        .as("t_stat"),
      (beta / sqrt(s2 / cxx) < -2.86).as("stationary"))
  }

  /** Kleinberg burst detection (Kleinberg, KDD'02 — the 2-state
    * infinite-automaton reduced to its standard 2-level form): which
    * days does the purchase rate BURST above baseline? State 0 emits
    * at the corpus rate p₀, state 1 at 2p₀; entering the burst state
    * costs γ·ln T (γ = 1) and the minimum-cost state sequence comes
    * from an exact Viterbi pass. Both the forward pass (costs +
    * predecessor choices) and the backtrace run as expression folds
    * over the CALENDAR-BOUNDED daily array on one collapsed row; the
    * oracle replays them with two recursive CTEs carrying the
    * identical (d0, d1, preds) state, so every min/ln/compare is the
    * same IEEE op in the same order. Emission costs are
    * integer-count × ln-of-exact-rational products; ties prefer the
    * base state on entry (≤) and the burst state on stay (<) —
    * pinned in both engines' CASE order. */
  val kleinbergBurst: Q = Q(
    "kleinberg_burst",
    """WITH RECURSIVE daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d')
      |      AS day,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |base AS (SELECT list(day ORDER BY day) AS days,
      |    list(n ORDER BY day) AS ns, list(c ORDER BY day) AS cs,
      |    CAST(count(*) AS BIGINT) AS tt,
      |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(c) AS BIGINT) AS cc
      |  FROM daily),
      |cons AS (SELECT days, ns, cs, tt,
      |    ln(CAST(cc AS DOUBLE) / nn) AS lh0,
      |    ln(1.0 - CAST(cc AS DOUBLE) / nn) AS lm0,
      |    ln(2.0 * (CAST(cc AS DOUBLE) / nn)) AS lh1,
      |    ln(1.0 - 2.0 * (CAST(cc AS DOUBLE) / nn)) AS lm1,
      |    ln(CAST(tt AS DOUBLE)) AS lnt
      |  FROM base),
      |fwd AS (
      |  SELECT CAST(1 AS BIGINT) AS i, days, ns, cs, tt, lh0, lm0, lh1,
      |    lm1, lnt,
      |    -(cs[1] * lh0 + (ns[1] - cs[1]) * lm0) AS d0,
      |    lnt + -(cs[1] * lh1 + (ns[1] - cs[1]) * lm1) AS d1,
      |    []::STRUCT(p0 INTEGER, p1 INTEGER)[] AS preds
      |  FROM cons
      |  UNION ALL
      |  SELECT i + 1, days, ns, cs, tt, lh0, lm0, lh1, lm1, lnt,
      |    -(cs[i + 1] * lh0 + (ns[i + 1] - cs[i + 1]) * lm0)
      |      + CASE WHEN d0 <= d1 THEN d0 ELSE d1 END,
      |    -(cs[i + 1] * lh1 + (ns[i + 1] - cs[i + 1]) * lm1)
      |      + CASE WHEN d0 + lnt < d1 THEN d0 + lnt ELSE d1 END,
      |    list_concat(preds, [{'p0': CASE WHEN d0 <= d1 THEN 0 ELSE 1 END,
      |      'p1': CASE WHEN d0 + lnt < d1 THEN 0 ELSE 1 END}])
      |  FROM fwd WHERE i < tt),
      |fin AS (SELECT days, ns, cs, tt, preds,
      |    CASE WHEN d0 <= d1 THEN 0 ELSE 1 END AS fs
      |  FROM fwd WHERE i = tt),
      |bwd AS (
      |  SELECT tt AS j, days, ns, cs, tt, preds, fs AS cur, [fs] AS flags
      |  FROM fin
      |  UNION ALL
      |  SELECT j - 1, days, ns, cs, tt, preds,
      |    CASE WHEN cur = 0 THEN preds[CAST(j - 1 AS BIGINT)].p0
      |         ELSE preds[CAST(j - 1 AS BIGINT)].p1 END,
      |    list_prepend(CASE WHEN cur = 0 THEN preds[CAST(j - 1 AS BIGINT)].p0
      |         ELSE preds[CAST(j - 1 AS BIGINT)].p1 END, flags)
      |  FROM bwd WHERE j > 1),
      |res AS (SELECT days, ns, cs, flags FROM bwd WHERE j = 1)
      |SELECT unnest(days) AS day, unnest(ns) AS n_events,
      |  unnest(cs) AS n_purchases, unnest(flags) = 1 AS burst
      |FROM res ORDER BY day""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
    val base = daily.agg(
      expr("transform(array_sort(collect_list(struct(day, n, c))), " +
        "t -> t.day)").as("days"),
      expr("transform(array_sort(collect_list(struct(day, n, c))), " +
        "t -> t.n)").as("ns"),
      expr("transform(array_sort(collect_list(struct(day, n, c))), " +
        "t -> t.c)").as("cs"),
      count(lit(1)).as("tt"), sum("n").as("nn"), sum("c").as("cc"))
    val cons = base.select(col("days"), col("ns"), col("cs"), col("tt"),
      log(col("cc").cast("double") / col("nn")).as("lh0"),
      log(lit(1.0) - col("cc").cast("double") / col("nn")).as("lm0"),
      log(lit(2.0) * (col("cc").cast("double") / col("nn"))).as("lh1"),
      log(lit(1.0) - lit(2.0) * (col("cc").cast("double") / col("nn")))
        .as("lm1"),
      log(col("tt").cast("double")).as("lnt"))
    val fwd = cons.withColumn("fin", expr(
      "aggregate(sequence(2, CAST(tt AS INT)), " +
        "struct(-(cs[0] * lh0 + (ns[0] - cs[0]) * lm0) AS d0, " +
        "lnt + -(cs[0] * lh1 + (ns[0] - cs[0]) * lm1) AS d1, " +
        "CAST(array() AS array<struct<p0: int, p1: int>>) AS preds), " +
        "(a, i) -> struct(" +
        "-(cs[i - 1] * lh0 + (ns[i - 1] - cs[i - 1]) * lm0) " +
        "+ IF(a.d0 <= a.d1, a.d0, a.d1) AS d0, " +
        "-(cs[i - 1] * lh1 + (ns[i - 1] - cs[i - 1]) * lm1) " +
        "+ IF(a.d0 + lnt < a.d1, a.d0 + lnt, a.d1) AS d1, " +
        "concat(a.preds, array(struct(" +
        "IF(a.d0 <= a.d1, 0, 1) AS p0, " +
        "IF(a.d0 + lnt < a.d1, 0, 1) AS p1))) AS preds))"))
      .withColumn("fs", expr("IF(fin.d0 <= fin.d1, 0, 1)"))
    val bwd = fwd.withColumn("flags", expr(
      "aggregate(sequence(CAST(tt AS INT) - 1, 1, -1), " +
        "struct(fs AS cur, array(fs) AS flags), " +
        "(a, j) -> struct(" +
        "IF(a.cur = 0, fin.preds[j - 1].p0, fin.preds[j - 1].p1) AS cur, " +
        "concat(array(IF(a.cur = 0, fin.preds[j - 1].p0, " +
        "fin.preds[j - 1].p1)), a.flags) AS flags)).flags"))
    bwd
      .select(posexplode(arrays_zip(col("days"), col("ns"), col("cs"),
        col("flags"))).as(Seq("k", "z")))
      .select(col("z.days").as("day"), col("z.ns").as("n_events"),
        col("z.cs").as("n_purchases"), (col("z.flags") === 1).as("burst"))
      .orderBy("day")
  }

  /** Maximum drawdown of the cumulative net flow (daily purchase
    * revenue minus error-event value) — the worst peak-to-trough
    * slide, finance's standard risk summary applied to an ops
    * metric. Two PrefixScan passes (cumulative sum, then running
    * peak of that sum — withCumMaxs' 2nd consumer) keep everything
    * range-partitioned exact integers; the trough is a 1-row
    * struct-max pick (earliest day on ties) and the governing peak
    * day one broadcast filter. */
  val maxDrawdown: Q = Q(
    "max_drawdown",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
      |        WHEN event_type = 'error'
      |        THEN -CAST(floor(value * 100 + 0.5) AS BIGINT)
      |        ELSE 0 END) AS BIGINT) AS flow
      |  FROM events GROUP BY 1),
      |cum AS (SELECT day, CAST(sum(flow) OVER (ORDER BY day) AS BIGINT)
      |      AS cumv
      |  FROM daily),
      |pk AS (SELECT day, cumv, CAST(max(cumv) OVER (ORDER BY day)
      |      AS BIGINT) AS peak
      |  FROM cum),
      |dd AS (SELECT day, cumv, peak, peak - cumv AS draw FROM pk),
      |mx AS (SELECT max(draw) AS mdd FROM dd),
      |tr AS (SELECT min(day) AS trough_day FROM dd CROSS JOIN mx
      |       WHERE draw = mdd),
      |pv AS (SELECT d.peak AS peakv FROM dd d JOIN tr
      |       ON d.day = tr.trough_day),
      |pkday AS (SELECT min(day) AS peak_day FROM dd CROSS JOIN pv
      |       WHERE cumv = peakv)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
      |  strftime((SELECT peak_day FROM pkday), '%Y-%m-%d') AS peak_day,
      |  strftime((SELECT trough_day FROM tr), '%Y-%m-%d') AS trough_day,
      |  floor(CAST((SELECT mdd FROM mx) AS DOUBLE) / 100 * 10000 + 0.5)
      |    / 10000 AS max_drawdown""".stripMargin) { (s, d) =>
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val daily = ev(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .agg(sum(when(col("event_type") === "purchase", cents)
        .when(col("event_type") === "error", -cents)
        .otherwise(0L)).as("flow"))
    val (cum, _) = graft.ops.PrefixScan.withCumSums(
      daily, Seq(col("day")), Seq("flow"))
    val cumv = cum.select(col("day"), col("cum_flow").as("cumv"))
    val (pk, _) = graft.ops.PrefixScan.withCumMaxs(
      cumv, Seq(col("day")), Seq("cumv"))
    val dd = pk.select(col("day"), col("cumv"),
      col("cummax_cumv").as("peak"),
      (col("cummax_cumv") - col("cumv")).as("draw"))
    val tr = dd
      .agg(max(struct(col("draw"),
        expr("CAST(-unix_date(CAST(day AS DATE)) AS BIGINT)").as("nd"),
        col("peak").as("pv"))).as("m"),
        count(lit(1)).as("n_days"))
      .select(col("n_days"), col("m.draw").as("mdd"),
        expr("date_format(date_add(DATE '1970-01-01', " +
          "CAST(-m.nd AS INT)), 'yyyy-MM-dd')").as("trough_day"),
        col("m.pv").as("peakv"))
    dd.crossJoin(broadcast(tr)) // 1-row trough/peak-value broadcast
      .filter(col("cumv") === col("peakv") && col("day") <= col("trough_day"))
      .agg(first("n_days").as("n_days"), min("day").as("peak_day"),
        first("trough_day").as("trough_day"),
        (floor(first("mdd").cast("double") / 100 * 10000 + lit(0.5))
          / 10000).as("max_drawdown"))
      .select("n_days", "peak_day", "trough_day", "max_drawdown")
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) on the daily
    * order-count series — "is there ANY autocorrelation left", the
    * whiteness check a forecaster's residuals must pass. Reuses
    * q109_acf's exact-co-moment ρ̂ₖ algebra (date-keyed lag joins,
    * never a partition-less window) for lags 1..5, then
    * Q = n(n+2)·Σ ρ̂ₖ²/(n−k) with the 5 terms folded lag-sorted.
    * Significance at the χ²₅ 5% bound 11.0705. */
  val ljungBox: Q = Q(
    "ljung_box",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM daily),
      |lags AS (SELECT unnest(range(1, 6)) AS lag),
      |pairs AS (SELECT l.lag, a.x AS xa, b.x AS xb
      |  FROM lags l
      |    JOIN daily a ON TRUE
      |    JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(xa * xb) AS BIGINT) AS sxy,
      |    CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb
      |  FROM pairs GROUP BY lag),
      |rho AS (SELECT lag,
      |    (sxy - (CAST(sx AS DOUBLE) / n) * (sa + sb)
      |      + c * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |    / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |      AS r, n
      |  FROM num CROSS JOIN tot),
      |q0 AS (SELECT any_value(n) AS n, list(r ORDER BY lag) AS rl,
      |    list(lag ORDER BY lag) AS ll FROM rho),
      |q AS (SELECT n, list_aggregate(list_transform(range(1, 6), k ->
      |    rl[k] * rl[k] / (n - ll[k])), 'sum') AS s FROM q0)
      |SELECT n AS n_days,
      |  floor(n * (n + 2) * s * 10000 + 0.5) / 10000 AS q_stat,
      |  CAST(5 AS BIGINT) AS lb_df,
      |  n * (n + 2) * s > 11.0705 AS significant
      |FROM q""".stripMargin) { (s, d) =>
    val daily = ev2ord(s, d)
    val tot = daily.agg(count(lit(1)).cast("long").as("n"),
      sum("x").cast("long").as("sx"),
      sum(col("x") * col("x")).cast("long").as("sxx"))
    val lags = s.range(1, 6).select(col("id").as("lag"))
    val a = daily.crossJoin(lags)
      .select(col("lag"), col("x").as("xa"),
        date_add(col("day"), col("lag").cast("int")).as("jday"))
    val b = daily.select(col("day").as("jday"), col("x").as("xb"))
    val mu = col("sx").cast("double") / col("n")
    val rho = a.join(b, "jday")
      .groupBy("lag")
      .agg(count(lit(1)).cast("long").as("c"),
        sum(col("xa") * col("xb")).cast("long").as("sxy"),
        sum("xa").cast("long").as("sa"), sum("xb").cast("long").as("sb"))
      .crossJoin(broadcast(tot))
      .select(col("lag"), col("n"),
        ((col("sxy") - mu * (col("sa") + col("sb")) + col("c") * mu * mu)
          / (col("sxx") - col("n") * mu * mu)).as("r"))
    rho.agg(first("n").as("n"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "struct(lag, r, n))), t -> t.r * t.r / (t.n - t.lag)), 0D, " +
          "(a, x) -> a + x)").as("s"))
      .select(col("n").as("n_days"),
        (floor(col("n") * (col("n") + 2) * col("s") * 10000 + lit(0.5))
          / 10000).as("q_stat"),
        lit(5L).as("lb_df"),
        (col("n") * (col("n") + 2) * col("s") > 11.0705).as("significant"))
  }

  private def ev2ord(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))

  /** Index-of-dispersion (overdispersion) check on daily purchase
    * counts — Poisson says variance = mean; real traffic rarely
    * obeys, and the count-model family (Poisson vs negative binomial)
    * hangs on this one ratio. Exact BIGINT moments → D = s²/x̄ and
    * the normal-approximation z = (D−1)·√((n−1)/2), flagged at the
    * one-sided 5% bound 1.644854. One daily collapse; 1-row output. */
  val overdispersionCheck: Q = Q(
    "overdispersion_check",
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s,
      |    CAST(sum(c * c) AS BIGINT) AS ss FROM daily),
      |f AS (SELECT n,
      |    CAST(s AS DOUBLE) / n AS mean,
      |    (ss - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var FROM m)
      |SELECT n AS n_days,
      |  floor(mean * 10000 + 0.5) / 10000 AS mean,
      |  floor(var * 10000 + 0.5) / 10000 AS variance,
      |  floor(var / mean * 10000 + 0.5) / 10000 AS dispersion,
      |  floor((var / mean - 1) * sqrt((n - 1) / 2.0) * 10000 + 0.5)
      |    / 10000 AS z,
      |  (var / mean - 1) * sqrt((n - 1) / 2.0) > 1.644854
      |    AS overdispersed
      |FROM f""".stripMargin) { (s, d) =>
    val m = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c"))
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("ss"))
    val mean = col("s").cast("double") / col("n")
    val vr = (col("ss") - col("s").cast("double") * col("s") / col("n")) /
      (col("n") - 1)
    m.select(col("n").as("n_days"),
      (floor(mean * 10000 + lit(0.5)) / 10000).as("mean"),
      (floor(vr * 10000 + lit(0.5)) / 10000).as("variance"),
      (floor(vr / mean * 10000 + lit(0.5)) / 10000).as("dispersion"),
      (floor((vr / mean - 1) * sqrt((col("n") - 1) / lit(2.0)) * 10000
        + lit(0.5)) / 10000).as("z"),
      ((vr / mean - 1) * sqrt((col("n") - 1) / lit(2.0)) > 1.644854)
        .as("overdispersed"))
  }

  /** Seasonal-strength measure (Hyndman & Athanasopoulos, FPP:
    * F_s = max(0, 1 − Var(remainder)/Var(detrended))) over
    * seasonal_decompose's exact machinery — "is the weekly pattern
    * real enough to model". Both variances come from EXACT integer
    * co-moments of the ×7-scaled detrended series: the remainder's
    * per-dow sum telescopes to zero, so Var(R) reduces to per-dow
    * moment algebra (n²Σd² − n·S² terms) folded dow-sorted — no
    * double is ever summed across data rows. */
  val seasonalStrength: Q = Q(
    "seasonal_strength",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev FROM events GROUP BY 1),
      |win AS (SELECT a.day, a.rev,
      |    CAST(sum(b.rev) AS BIGINT) AS s7, CAST(count(*) AS BIGINT) AS w
      |  FROM daily a JOIN daily b
      |    ON b.day BETWEEN a.day - 3 AND a.day + 3
      |  GROUP BY a.day, a.rev),
      |det AS (SELECT dayofweek(day) + 1 AS dow, 7 * rev - s7 AS det7
      |      FROM win WHERE w = 7),
      |gm AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(det7) AS BIGINT) AS sd,
      |    CAST(sum(det7 * det7) AS BIGINT) AS sdd FROM det GROUP BY dow),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(sd) AS BIGINT) AS st,
      |    CAST(sum(sdd) AS BIGINT) AS sst,
      |    list(n ORDER BY dow) AS nl, list(sd ORDER BY dow) AS sl,
      |    list(sdd ORDER BY dow) AS ddl
      |  FROM gm),
      |f AS (SELECT nn,
      |    (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / nn)
      |      / (49.0 * nn) AS var_det,
      |    list_aggregate(list_transform(range(1, len(nl) + 1), i ->
      |      (CAST(nl[i] AS DOUBLE) * nl[i] * ddl[i]
      |        - CAST(nl[i] AS DOUBLE) * sl[i] * sl[i])
      |      / (49.0 * nl[i] * nl[i])), 'sum') / nn AS var_rem
      |  FROM tot)
      |SELECT nn AS n_days,
      |  floor(var_det / 10000 * 10000 + 0.5) / 10000 AS var_detrended,
      |  floor(var_rem / 10000 * 10000 + 0.5) / 10000 AS var_remainder,
      |  floor(greatest(0.0, 1 - var_rem / var_det) * 1000000 + 0.5)
      |    / 1000000 AS seasonal_strength
      |FROM f""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val b = daily.select(col("day").as("bday"), col("rev").as("brev"))
    val win = daily
      .withColumn("o", explode(sequence(lit(-3), lit(3))))
      .select(col("day"), col("rev"), expr("date_add(day, o)").as("nday"))
      .join(b, col("nday") === col("bday"))
      .groupBy("day", "rev")
      .agg(sum("brev").as("s7"), count(lit(1)).as("w"))
    val gm = win.filter(col("w") === 7)
      .select(dayofweek(col("day")).cast("long").as("dow"),
        (lit(7) * col("rev") - col("s7")).as("det7"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n"), sum("det7").as("sd"),
        sum(col("det7") * col("det7")).as("sdd"))
    val tot = gm.agg(sum("n").as("nn"), sum("sd").as("st"),
      sum("sdd").as("sst"),
      expr("aggregate(array_sort(collect_list(struct(dow, n, sd, sdd))), " +
        "0D, (a, t) -> a + (CAST(t.n AS DOUBLE) * t.n * t.sdd " +
        "- CAST(t.n AS DOUBLE) * t.sd * t.sd) / (49.0D * t.n * t.n))")
        .as("remsum"))
    val varDet = (col("sst").cast("double")
      - col("st").cast("double") * col("st") / col("nn")) /
      (lit(49.0) * col("nn"))
    val varRem = col("remsum") / col("nn")
    tot.select(col("nn").as("n_days"),
      (floor(varDet / 10000 * 10000 + lit(0.5)) / 10000)
        .as("var_detrended"),
      (floor(varRem / 10000 * 10000 + lit(0.5)) / 10000)
        .as("var_remainder"),
      (floor(greatest(lit(0.0), lit(1) - varRem / varDet) * 1000000
        + lit(0.5)) / 1000000).as("seasonal_strength"))
  }

  /** Top-k assortment turnover — how much of the monthly best-seller
    * list is NEW each month, the catalog-stability metric behind
    * "trending" features and cache sizing. Monthly part order-counts
    * collapse once; top-20 per month via a month-partitioned rank
    * window; consecutive months meet on an integer month key
    * (equi-join, scales to arbitrary history), and the overlap is an
    * exact 20∩20 set count with Jaccard = |∩|/(40 − |∩|). */
  val topkTurnover: Q = Q(
    "topk_turnover",
    """WITH mc AS (SELECT
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mk,
      |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
      |    li.l_partkey AS pk, CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
      |  GROUP BY 1, 2, 3),
      |rk AS (SELECT mk, mon, pk,
      |    row_number() OVER (PARTITION BY mk ORDER BY c DESC, pk) AS rn
      |  FROM mc),
      |top AS (SELECT mk, mon, pk FROM rk WHERE rn <= 20),
      |ov AS (SELECT a.mk AS mka, CAST(count(*) AS BIGINT) AS inter
      |  FROM top a JOIN top b ON b.mk = a.mk + 1 AND b.pk = a.pk
      |  GROUP BY a.mk),
      |mons AS (SELECT DISTINCT mk, mon FROM top)
      |SELECT ma.mon AS month_a, mb.mon AS month_b,
      |  COALESCE(ov.inter, 0) AS n_common,
      |  floor(CAST(COALESCE(ov.inter, 0) AS DOUBLE)
      |    / (40 - COALESCE(ov.inter, 0)) * 1000000 + 0.5) / 1000000
      |    AS jaccard
      |FROM mons ma JOIN mons mb ON mb.mk = ma.mk + 1
      |LEFT JOIN ov ON ov.mka = ma.mk
      |ORDER BY month_a""".stripMargin) { (s, d) =>
    val mc = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mk"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("mon"),
        col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("c"))
    val top = mc.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("mk")
          .orderBy(col("c").desc, col("pk"))))
      .filter(col("rn") <= 20)
      .select("mk", "mon", "pk")
    val ov = top.as("a")
      .join(top.as("b"),
        col("b.mk") === col("a.mk") + 1 && col("b.pk") === col("a.pk"))
      .groupBy(col("a.mk").as("mka"))
      .agg(count(lit(1)).as("inter"))
    val mons = top.select("mk", "mon").distinct()
    mons.as("ma")
      .join(mons.as("mb"), col("mb.mk") === col("ma.mk") + 1)
      .join(ov, col("mka") === col("ma.mk"), "left")
      .select(col("ma.mon").as("month_a"), col("mb.mon").as("month_b"),
        coalesce(col("inter"), lit(0L)).as("n_common"),
        (floor(coalesce(col("inter"), lit(0L)).cast("double")
          / (lit(40) - coalesce(col("inter"), lit(0L))) * 1000000
          + lit(0.5)) / 1000000).as("jaccard"))
      .orderBy("month_a")
  }

  /** Laspeyres / Paasche / Fisher price indices by year over the
    * 25-brand basket (base 1995) — the inflation-adjustment triple
    * every revenue trend should be deflated by. Per-(year, brand)
    * unit prices are exact-integer ratios (Σcents/Σqty); the four
    * basket sums fold over the BOUNDED brand dimension in brand-sorted
    * order, so both engines chain identical doubles; Fisher is the
    * geometric mean √(L·P) (IEEE sqrt). One fact-table collapse; the
    * index algebra rides 25-row relations. */
  val priceIndex: Q = Q(
    "price_index",
    """WITH yb AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    p.p_brand AS brand,
      |    CAST(sum(CAST(floor(li.l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev,
      |    CAST(sum(CAST(floor(li.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
      |      AS qty
      |  FROM lineitem li
      |  JOIN orders o ON o.o_orderkey = li.l_orderkey
      |  JOIN part p ON p.p_partkey = li.l_partkey
      |  GROUP BY 1, 2),
      |base AS (SELECT brand, rev AS rb, qty AS qb FROM yb
      |         WHERE yr = 1995),
      |j AS (SELECT yb.yr, yb.brand, yb.rev AS rt, yb.qty AS qt,
      |      base.rb, base.qb
      |  FROM yb JOIN base USING (brand)),
      |one AS (SELECT yr,
      |    list(rt ORDER BY brand) AS rts, list(qt ORDER BY brand) AS qts,
      |    list(rb ORDER BY brand) AS rbs, list(qb ORDER BY brand) AS qbs
      |  FROM j GROUP BY yr),
      |f AS (SELECT yr,
      |    list_aggregate(list_transform(range(1, len(rts) + 1), i ->
      |      CAST(rts[i] AS DOUBLE) / qts[i] * qbs[i]), 'sum')
      |    / list_aggregate(list_transform(range(1, len(rts) + 1), i ->
      |      CAST(rbs[i] AS DOUBLE) / qbs[i] * qbs[i]), 'sum') AS lasp,
      |    list_aggregate(list_transform(range(1, len(rts) + 1), i ->
      |      CAST(rts[i] AS DOUBLE) / qts[i] * qts[i]), 'sum')
      |    / list_aggregate(list_transform(range(1, len(rts) + 1), i ->
      |      CAST(rbs[i] AS DOUBLE) / qbs[i] * qts[i]), 'sum') AS paas
      |  FROM one)
      |SELECT yr AS year,
      |  floor(lasp * 10000 + 0.5) / 10000 AS laspeyres,
      |  floor(paas * 10000 + 0.5) / 10000 AS paasche,
      |  floor(sqrt(lasp * paas) * 10000 + 0.5) / 10000 AS fisher
      |FROM f ORDER BY year""".stripMargin) { (s, d) =>
    val yb = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("p_brand").as("brand"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"),
        sum(floor(col("l_quantity") + lit(0.5)).cast("long")).as("qty"))
    val base = yb.filter(col("yr") === 1995)
      .select(col("brand"), col("rev").as("rb"), col("qty").as("qb"))
    val one = yb.join(base, "brand")
      .groupBy("yr")
      .agg(expr("array_sort(collect_list(struct(brand, rev, qty, rb, qb)))")
        .as("cl"))
    def fold(term: String) =
      s"aggregate(cl, 0D, (a, t) -> a + $term)"
    val f = one.select(col("yr"),
      (expr(fold("CAST(t.rev AS DOUBLE) / t.qty * t.qb"))
        / expr(fold("CAST(t.rb AS DOUBLE) / t.qb * t.qb"))).as("lasp"),
      (expr(fold("CAST(t.rev AS DOUBLE) / t.qty * t.qty"))
        / expr(fold("CAST(t.rb AS DOUBLE) / t.qb * t.qty"))).as("paas"))
    f.select(col("yr").as("year"),
        (floor(col("lasp") * 10000 + lit(0.5)) / 10000).as("laspeyres"),
        (floor(col("paas") * 10000 + lit(0.5)) / 10000).as("paasche"),
        (floor(sqrt(col("lasp") * col("paas")) * 10000 + lit(0.5)) / 10000)
          .as("fisher"))
      .orderBy("year")
  }

  /** Day-N retention curve — the product-analytics survival summary:
    * of users whose FIRST signup lands on day d, what share is active
    * again exactly k days later (k = 1..7)? Each user contributes one
    * (signup day, active-day set) pass: the signup anchor is a
    * per-user min aggregate, activity joins back on a user+day key,
    * and the ×7 horizon fan-out is bounded (sliding_distinct's
    * device). Exact integer cohort counts; one division per k. */
  val retentionCurve: Q = Q(
    "retention_curve",
    """WITH su AS (SELECT user_id,
      |    min(CAST(date_trunc('day', ts) AS DATE)) AS sday
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('day', ts) AS DATE) AS aday FROM events),
      |fan AS (SELECT su.user_id, su.sday, k.k,
      |    su.sday + CAST(k.k AS INTEGER) AS tday
      |  FROM su CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k),
      |hit AS (SELECT f.k, CAST(count(*) AS BIGINT) AS n_active
      |  FROM fan f JOIN act a
      |    ON a.user_id = f.user_id AND a.aday = f.tday
      |  GROUP BY f.k),
      |coh AS (SELECT CAST(count(*) AS BIGINT) AS n_cohort FROM su)
      |SELECT CAST(ks.k AS BIGINT) AS day_k, n_cohort,
      |  COALESCE(hit.n_active, 0) AS n_active,
      |  floor(CAST(COALESCE(hit.n_active, 0) AS DOUBLE) / n_cohort
      |    * 1000000 + 0.5) / 1000000 AS retention
      |FROM (SELECT unnest(range(1, 8)) AS k) ks
      |LEFT JOIN hit ON hit.k = ks.k CROSS JOIN coh
      |ORDER BY day_k""".stripMargin) { (s, d) =>
    val su = ev(s, d).filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(date_trunc("day", col("ts")).cast("date")).as("sday"))
    val act = ev(s, d)
      .select(col("user_id").as("auid"),
        date_trunc("day", col("ts")).cast("date").as("aday"))
      .distinct()
    val fan = su.withColumn("k", explode(sequence(lit(1), lit(7))))
      .select(col("user_id"), col("k"),
        expr("date_add(sday, k)").as("tday"))
    val hit = fan.join(act,
        col("auid") === col("user_id") && col("aday") === col("tday"))
      .groupBy("k").agg(count(lit(1)).as("n_active"))
    val coh = su.agg(count(lit(1)).as("n_cohort"))
    s.range(1, 8).select(col("id").as("k"))
      .join(hit, Seq("k"), "left")
      .crossJoin(broadcast(coh)) // 1-row cohort size
      .select(col("k").cast("long").as("day_k"), col("n_cohort"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        (floor(coalesce(col("n_active"), lit(0L)).cast("double")
          / col("n_cohort") * 1000000 + lit(0.5)) / 1000000)
          .as("retention"))
      .orderBy("day_k")
  }

  /** Order-value distribution drift as KL divergence (1996 ∥ 2000,
    * Laplace-smoothed decile-band bins) — drift_psi's
    * information-theoretic sibling on the money axis: "how differently
    * were order values distributed five years on". Exact bin counts,
    * probabilities as single divisions, and the ≤12-term KL sum folds
    * bin-sorted (ln parity corpus-established). */
  val valueDriftKl: Q = Q(
    "value_drift_kl",
    """WITH b AS (SELECT
      |    CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
      |    CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |      THEN 1 ELSE 0 END AS p,
      |    CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |      AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
      |      THEN 1 ELSE 0 END AS q
      |  FROM orders),
      |g AS (SELECT bin, CAST(sum(p) AS BIGINT) AS cp,
      |      CAST(sum(q) AS BIGINT) AS cq FROM b
      |  WHERE p = 1 OR q = 1 GROUP BY bin),
      |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
      |    CAST(sum(cq) AS BIGINT) AS nq,
      |    CAST(count(*) AS BIGINT) AS nb,
      |    list(cp ORDER BY bin) AS cps, list(cq ORDER BY bin) AS cqs
      |  FROM g),
      |f AS (SELECT np, nq, nb,
      |    list_aggregate(list_transform(range(1, nb + 1), i ->
      |      ((cps[i] + 1.0) / (np + nb))
      |        * ln(((cps[i] + 1.0) / (np + nb))
      |             / ((cqs[i] + 1.0) / (nq + nb)))), 'sum') AS kl
      |  FROM tot)
      |SELECT np AS n_1996, nq AS n_2000, nb AS n_bins,
      |  floor(kl * 1000000 + 0.5) / 1000000 AS kl_divergence
      |FROM f""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val g = o.select(
        least(floor(col("o_totalprice") / 50000), lit(9)).cast("long")
          .as("bin"),
        when(col("o_orderdate") >= lit("1996-01-01 00:00:00")
          .cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00")
            .cast("timestamp"), 1L).otherwise(0L).as("p"),
        when(col("o_orderdate") >= lit("2000-01-01 00:00:00")
          .cast("timestamp")
          && col("o_orderdate") < lit("2001-01-01 00:00:00")
            .cast("timestamp"), 1L).otherwise(0L).as("q"))
      .filter(col("p") === 1 || col("q") === 1)
      .groupBy("bin").agg(sum("p").as("cp"), sum("q").as("cq"))
    g.agg(sum("cp").as("np"), sum("cq").as("nq"),
        count(lit(1)).as("nb"),
        expr("array_sort(collect_list(struct(bin, cp, cq)))").as("cl"))
      .withColumn("kl", expr("aggregate(cl, 0D, (a, t) -> " +
        "a + ((t.cp + 1.0D) / (np + nb)) " +
        "* ln(((t.cp + 1.0D) / (np + nb)) / ((t.cq + 1.0D) / (nq + nb))))"))
      .select(col("np").as("n_1996"), col("nq").as("n_2000"),
        col("nb").as("n_bins"),
        (floor(col("kl") * 1000000 + lit(0.5)) / 1000000)
          .as("kl_divergence"))
  }

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975 — theil_sen's
    * significance companion): is the daily order-count series
    * trending, without assuming linearity or normality? S = Σ_{i<j}
    * sgn(y_j − y_i) is an EXACT integer over the calendar-bounded
    * daily pair space (kendall_tau's whitelisted shape), the variance
    * carries the exact tie correction Σ tp(tp−1)(2tp+5), and the
    * continuity-corrected z is one mirrored double expression. */
  val mannKendall: Q = Q(
    "mann_kendall",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      |s AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
      |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS ss
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
      |ties AS (SELECT CAST(COALESCE(sum(tp * (tp - 1) * (2 * tp + 5)), 0)
      |      AS BIGINT) AS tc
      |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS tp FROM daily
      |        GROUP BY y) WHERE tp > 1),
      |v AS (SELECT n, ss, tc,
      |    (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tc) / 18.0 AS vr
      |  FROM s CROSS JOIN n CROSS JOIN ties)
      |SELECT n AS n_days, ss AS s_stat,
      |  floor(vr * 100 + 0.5) / 100 AS variance,
      |  floor(CASE WHEN ss > 0 THEN (ss - 1) / sqrt(vr)
      |        WHEN ss < 0 THEN (ss + 1) / sqrt(vr)
      |        ELSE 0.0 END * 10000 + 0.5) / 10000 AS z,
      |  CASE WHEN (CASE WHEN ss > 0 THEN (ss - 1) / sqrt(vr)
      |        WHEN ss < 0 THEN (ss + 1) / sqrt(vr) ELSE 0.0 END)
      |      > 1.959964 THEN 'increasing'
      |    WHEN (CASE WHEN ss > 0 THEN (ss - 1) / sqrt(vr)
      |        WHEN ss < 0 THEN (ss + 1) / sqrt(vr) ELSE 0.0 END)
      |      < -1.959964 THEN 'decreasing'
      |    ELSE 'none' END AS trend
      |FROM v""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val a = daily.select(col("day").as("da"), col("y").as("ya"))
    val b = daily.select(col("day").as("db"), col("y").as("yb"))
    val ss = a.join(b, col("da") < col("db")) // calendar-bounded pairs
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("ss"))
    val n = daily.agg(count(lit(1)).as("n"))
    val ties = daily.groupBy("y").agg(count(lit(1)).as("tp"))
      .filter(col("tp") > 1)
      .agg(coalesce(sum(col("tp") * (col("tp") - 1)
        * (lit(2) * col("tp") + 5)), lit(0L)).as("tc"))
    val vr = (col("n").cast("double") * (col("n") - 1)
      * (lit(2) * col("n") + 5) - col("tc")) / lit(18.0)
    val z = when(col("ss") > 0, (col("ss") - 1) / sqrt(vr))
      .when(col("ss") < 0, (col("ss") + 1) / sqrt(vr))
      .otherwise(lit(0.0))
    ss.crossJoin(broadcast(n)).crossJoin(broadcast(ties)) // 1-row stats
      .select(col("n").as("n_days"), col("ss").as("s_stat"),
        (floor(vr * 100 + lit(0.5)) / 100).as("variance"),
        (floor(z * 10000 + lit(0.5)) / 10000).as("z"),
        when(z > 1.959964, "increasing")
          .when(z < -1.959964, "decreasing")
          .otherwise("none").as("trend"))
  }

  /** Cohort LTV matrix — q56_cohort's money dimension: per signup-week
    * cohort, cumulative purchase revenue PER USER at each age week,
    * the unit-economics view every growth model feeds on. Cohort and
    * age keys are engine-neutral integer epoch-week buckets (div 7 on
    * epoch days — never engine week-truncation semantics); revenue is
    * exact cents; cumulation runs over the ≤5-week bounded age axis
    * via a cohort-partitioned window; one division per cell. */
  val cohortLtv: Q = Q(
    "cohort_ltv",
    """WITH su AS (SELECT user_id,
      |    min(date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('day', ts) AS DATE))) AS sday
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |coh AS (SELECT user_id, sday, sday // 7 AS cw FROM su),
      |sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users FROM coh
      |       GROUP BY cw),
      |pur AS (SELECT e.user_id,
      |    date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('day', e.ts) AS DATE)) AS pday,
      |    CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events e WHERE e.event_type = 'purchase'),
      |cell AS (SELECT c.cw, (p.pday - c.sday) // 7 AS age,
      |    CAST(sum(p.cents) AS BIGINT) AS rev
      |  FROM pur p JOIN coh c ON c.user_id = p.user_id
      |  WHERE p.pday >= c.sday GROUP BY 1, 2),
      |cum AS (SELECT cw, age, rev,
      |    CAST(sum(rev) OVER (PARTITION BY cw ORDER BY age) AS BIGINT)
      |      AS cum_rev
      |  FROM cell)
      |SELECT CAST(cum.cw AS BIGINT) AS cohort_week,
      |  CAST(cum.age AS BIGINT) AS age_week, sz.n_users,
      |  floor(CAST(cum.cum_rev AS DOUBLE) / sz.n_users / 100 * 10000
      |    + 0.5) / 10000 AS ltv_per_user
      |FROM cum JOIN sz ON sz.cw = cum.cw
      |ORDER BY cohort_week, age_week""".stripMargin) { (s, d) =>
    val day = datediff(date_trunc("day", col("ts")).cast("date"),
      to_date(lit("1970-01-01")))
    val coh = ev(s, d).filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(day).as("sday"))
      .withColumn("cw", expr("sday div 7"))
    val sz = coh.groupBy("cw").agg(count(lit(1)).as("n_users"))
    val pur = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id").as("puid"), day.as("pday"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val cell = pur.join(coh, col("puid") === col("user_id"))
      .filter(col("pday") >= col("sday"))
      .groupBy(col("cw"), expr("(pday - sday) div 7").as("age"))
      .agg(sum("cents").as("rev"))
    val cum = cell.withColumn("cum_rev",
      sum("rev").over(org.apache.spark.sql.expressions.Window
        .partitionBy("cw").orderBy("age")))
    cum.join(sz, "cw")
      .select(col("cw").cast("long").as("cohort_week"),
        col("age").cast("long").as("age_week"), col("n_users"),
        (floor(col("cum_rev").cast("double") / col("n_users") / 100
          * 10000 + lit(0.5)) / 10000).as("ltv_per_user"))
      .orderBy("cohort_week", "age_week")
  }

  /** Calendar-aligned growth: monthly revenue with month-over-month and
    * year-over-year percentages — the BI staple whose correctness trap
    * is CALENDAR alignment (Jan vs Dec, Jan vs last-Jan), not
    * arithmetic. Months key as year·12+month so both offsets are
    * integer subtraction; prior periods attach by two self-joins on
    * that key (partition-safe — no global-order window), left so the
    * first month/year still appear. Cents are exact BIGINTs; the two
    * ratios are the only doubles, floor-rounded at 1e-6. */
  val momYoyGrowth: Q = Q(
    "mom_yoy_growth",
    """WITH m AS (SELECT CAST(year(o_orderdate) * 12
      |      + month(o_orderdate) - 1 AS BIGINT) AS mk,
      |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS ym,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT cur.ym, cur.cents,
      |  floor((CAST(cur.cents AS DOUBLE) / mom.cents - 1) * 1000000 + 0.5)
      |    / 1000000 AS mom_pct,
      |  floor((CAST(cur.cents AS DOUBLE) / yoy.cents - 1) * 1000000 + 0.5)
      |    / 1000000 AS yoy_pct
      |FROM m cur
      |LEFT JOIN m mom ON mom.mk = cur.mk - 1
      |LEFT JOIN m yoy ON yoy.mk = cur.mk - 12
      |ORDER BY cur.ym""".stripMargin) { (s, d) =>
    val m = Tables.orders(s, d)
      .groupBy(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mk"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("ym"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    m.as("cur")
      .join(m.as("mom"), col("mom.mk") === col("cur.mk") - 1, "left_outer")
      .join(m.as("yoy"), col("yoy.mk") === col("cur.mk") - 12, "left_outer")
      .select(col("cur.ym").as("ym"), col("cur.cents").as("cents"),
        (floor((col("cur.cents").cast("double") / col("mom.cents") - 1)
          * 1000000 + lit(0.5)) / 1000000).as("mom_pct"),
        (floor((col("cur.cents").cast("double") / col("yoy.cents") - 1)
          * 1000000 + lit(0.5)) / 1000000).as("yoy_pct"))
      .orderBy("ym")
  }

  /** Changepoint detection by BINARY SEGMENTATION (first split): the
    * split day maximizing the between-segment sum-of-squares gain
    * s²/n + (S−s)²/(N−n) − S²/N over the daily revenue series — the
    * offline counterpart of cusum_drift's sequential monitor. Prefix
    * (n, s) pairs come from a bounded self-join on the day key (the
    * series is one row per day; per-key series at scale partition by
    * series id), every sum an exact BIGINT; gains round to the 1e-6
    * grid with the earlier day as tie-break, so the argmax is a pure
    * function. Output: the split plus both segment means. */
  val binsegSplit: Q = Q(
    "binseg_split",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
      |    CAST(sum(rev) AS BIGINT) AS ss FROM daily),
      |pre AS (SELECT a.day, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(b.rev) AS BIGINT) AS s
      |  FROM daily a JOIN daily b ON b.day <= a.day
      |  GROUP BY a.day),
      |gain AS (SELECT pre.day, pre.n, pre.s, tot.nn, tot.ss,
      |    floor((CAST(pre.s AS DOUBLE) * pre.s / pre.n
      |      + CAST(tot.ss - pre.s AS DOUBLE) * (tot.ss - pre.s)
      |        / (tot.nn - pre.n)
      |      - CAST(tot.ss AS DOUBLE) * tot.ss / tot.nn) / 10000
      |      * 1000000 + 0.5) / 1000000 AS g
      |  FROM pre CROSS JOIN tot
      |  WHERE pre.n >= 2 AND tot.nn - pre.n >= 2)
      |SELECT strftime(day, '%Y-%m-%d') AS split_day, g AS gain,
      |  floor(CAST(s AS DOUBLE) / n / 100 * 10000 + 0.5) / 10000
      |    AS mean_left,
      |  floor(CAST(ss - s AS DOUBLE) / (nn - n) / 100 * 10000 + 0.5) / 10000
      |    AS mean_right
      |FROM gain ORDER BY g DESC, split_day LIMIT 1""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("rev"))
    val tot = daily.agg(count(lit(1)).as("nn"), sum("rev").as("ss"))
    val pre = daily.as("a").join(daily.as("b"), col("b.day") <= col("a.day"))
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("b.rev")).as("s"))
    val g = (col("s").cast("double") * col("s") / col("n")
      + (col("ss") - col("s")).cast("double") * (col("ss") - col("s"))
        / (col("nn") - col("n"))
      - col("ss").cast("double") * col("ss") / col("nn")) / 10000
    pre.crossJoin(broadcast(tot))
      .filter(col("n") >= 2 && col("nn") - col("n") >= 2)
      .select(date_format(col("day"), "yyyy-MM-dd").as("split_day"),
        (floor(g * 1000000 + lit(0.5)) / 1000000).as("gain"),
        (floor(col("s").cast("double") / col("n") / 100 * 10000 + lit(0.5))
          / 10000).as("mean_left"),
        (floor((col("ss") - col("s")).cast("double") / (col("nn") - col("n"))
          / 100 * 10000 + lit(0.5)) / 10000).as("mean_right"))
      .orderBy(col("gain").desc, col("split_day"))
      .limit(1)
  }

  /** Length-3 path census — event_transitions' order-3 sibling: the
    * top user-journey triples (A → B → C over each user's time-ordered
    * event stream, consecutive by position), the standard
    * clickstream-path report behind sankey/journey dashboards. Two
    * user-partitioned lead() windows share ONE user-keyed sort (never
    * partition-less), the triple count is a V³-bounded groupBy, and
    * the top-20 pick orders by (count DESC, path) for deterministic
    * ties. */
  val pathTriples: Q = Q(
    "path_triples",
    """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
      |t AS (SELECT user_id, event_type AS t1,
      |    lead(event_type, 1) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |    lead(event_type, 2) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS t3
      |  FROM e)
      |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      |FROM t WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d).select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** Multi-window SLO burn rate (the SRE alerting arithmetic): with
    * SLO "value ≤ 90" and a 5% error budget, each day's 1-day and
    * 7-day-trailing error rates become burn rates (rate / budget),
    * and the standard two-window alert ladder fires page (1d ≥ 14.4
    * AND 7d ≥ 6 — fast burn confirmed by the slow window) or ticket
    * (7d ≥ 1) severities. The 7-day window is the bounded ×7 day-key
    * FAN-OUT (the sliding_distinct_users device, r10 verdict cleanup):
    * each day's (n, nbad) explodes to the ≤7 target days it
    * contributes to, and one equi-join groupBy sums the trailing
    * window — a.day receives b iff a = b.day + off, off ∈ 0..6 ⇔
    * a−6 ≤ b.day ≤ a.day, exactly the range predicate, with no
    * BroadcastNestedLoopJoin anywhere in the plan. All rates are
    * single divisions of exact integer counts, 1e-6 floor-rounded.
    * Output: the 15 worst days by 1-day burn. */
  val sloBurnRate: Q = Q(
    "slo_burn_rate",
    """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CASE WHEN value > 90 THEN 1 ELSE 0 END AS bad FROM events),
      |dd AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(bad) AS BIGINT) AS nbad FROM e GROUP BY day),
      |w7 AS (SELECT a.day, CAST(sum(b.n) AS BIGINT) AS n7,
      |    CAST(sum(b.nbad) AS BIGINT) AS nbad7
      |  FROM dd a JOIN dd b
      |    ON b.day >= a.day - INTERVAL 6 DAY AND b.day <= a.day
      |  GROUP BY a.day),
      |r AS (SELECT dd.day,
      |    floor(CAST(dd.nbad AS DOUBLE) / dd.n / 0.05 * 1000000 + 0.5)
      |      / 1000000 AS burn_1d,
      |    floor(CAST(w7.nbad7 AS DOUBLE) / w7.n7 / 0.05 * 1000000 + 0.5)
      |      / 1000000 AS burn_7d
      |  FROM dd JOIN w7 ON w7.day = dd.day)
      |SELECT CAST(day AS VARCHAR) AS day, burn_1d, burn_7d,
      |  CASE WHEN burn_1d >= 14.4 AND burn_7d >= 6 THEN 'page'
      |       WHEN burn_7d >= 1 THEN 'ticket' ELSE 'ok' END AS severity
      |FROM r ORDER BY burn_1d DESC, day LIMIT 15""".stripMargin) { (s, d) =>
    val dd = ev(s, d)
      .select(to_date(date_trunc("day", col("ts"))).as("day"),
        when(col("value") > 90, 1L).otherwise(0L).as("bad"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("bad").as("nbad"))
    // day b contributes to trailing-7 windows of days b..b+6; the final
    // inner join on dd keeps only target days that actually exist, so
    // the fan-out ≡ the range self-join at 7/|days| of its pair count
    val w7 = dd.withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("day"), col("off")).as("day"),
        col("n"), col("nbad"))
      .groupBy("day")
      .agg(sum("n").as("n7"), sum("nbad").as("nbad7"))
    def r6(c: Column) = floor(c * 1000000 + lit(0.5)) / 1000000
    dd.join(w7, "day")
      .select(col("day").cast("string").as("day"),
        r6(col("nbad").cast("double") / col("n") / 0.05).as("burn_1d"),
        r6(col("nbad7").cast("double") / col("n7") / 0.05).as("burn_7d"))
      .withColumn("severity",
        when(col("burn_1d") >= 14.4 && col("burn_7d") >= 6, "page")
          .when(col("burn_7d") >= 1, "ticket").otherwise("ok"))
      .orderBy(col("burn_1d").desc, col("day"))
      .limit(15)
  }

  /** Allen interval-algebra census (Allen 1983) — the relation
    * vocabulary every temporal-reasoning pipeline classifies with:
    * each user's per-event-type activity SPAN ([first start, last
    * end] over that type's half-open event intervals) is compared
    * against the user's other type spans, and the pair lands in
    * exactly one of the 13 relations (before/after, meets/met_by,
    * overlaps/overlapped_by, starts/started_by, during/contains,
    * finishes/finished_by, equals) via one fixed CASE ladder —
    * total, first-match-wins, identical in both engines, pure
    * integer-second comparisons. Output: per ordered type pair, how
    * many users exhibit each relation. Plan: one groupBy to a
    * ≤|users|·|alphabet| span relation, then a user-keyed self-join
    * fanning out ≤ C(|alphabet|,2) rows per user — the alphabet is
    * the bound, never the corpus. */
  val allenIntervals: Q = Q(
    "allen_intervals",
    """WITH iv AS (SELECT user_id, event_type,
      |    epoch(date_trunc('second', ts)) AS st,
      |    epoch(date_trunc('second', ts)) + CAST(floor(value) AS BIGINT) AS en
      |  FROM events),
      |sp AS (SELECT user_id, event_type, min(st) AS st, max(en) AS en
      |       FROM iv GROUP BY 1, 2),
      |pr AS (SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
      |    a.st AS ast, a.en AS aen, b.st AS bst, b.en AS ben
      |  FROM sp a JOIN sp b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type),
      |rel AS (SELECT type_a, type_b,
      |    CASE
      |      WHEN aen < bst THEN 'before'
      |      WHEN ben < ast THEN 'after'
      |      WHEN aen = bst AND ast < bst THEN 'meets'
      |      WHEN ben = ast AND bst < ast THEN 'met_by'
      |      WHEN ast = bst AND aen = ben THEN 'equals'
      |      WHEN ast = bst AND aen < ben THEN 'starts'
      |      WHEN ast = bst THEN 'started_by'
      |      WHEN aen = ben AND ast > bst THEN 'finishes'
      |      WHEN aen = ben THEN 'finished_by'
      |      WHEN ast > bst AND aen < ben THEN 'during'
      |      WHEN ast < bst AND aen > ben THEN 'contains'
      |      WHEN ast < bst THEN 'overlaps'
      |      ELSE 'overlapped_by'
      |    END AS relation
      |  FROM pr)
      |SELECT type_a, type_b, relation, CAST(count(*) AS BIGINT) AS n_users
      |FROM rel GROUP BY 1, 2, 3
      |ORDER BY type_a, type_b, relation""".stripMargin) { (s, d) =>
    val sp = ev(s, d).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("st0"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast("long"))
          .as("en0"))
      .groupBy("user_id", "event_type")
      .agg(min("st0").as("st"), max("en0").as("en"))
    val a = sp.select(col("user_id"), col("event_type").as("type_a"),
      col("st").as("ast"), col("en").as("aen"))
    val b = sp.select(col("user_id").as("uid_b"),
      col("event_type").as("type_b"),
      col("st").as("bst"), col("en").as("ben"))
    a.join(b, col("user_id") === col("uid_b")
        && col("type_a") < col("type_b"))
      .withColumn("relation", expr(
        """CASE
          |  WHEN aen < bst THEN 'before'
          |  WHEN ben < ast THEN 'after'
          |  WHEN aen = bst AND ast < bst THEN 'meets'
          |  WHEN ben = ast AND bst < ast THEN 'met_by'
          |  WHEN ast = bst AND aen = ben THEN 'equals'
          |  WHEN ast = bst AND aen < ben THEN 'starts'
          |  WHEN ast = bst THEN 'started_by'
          |  WHEN aen = ben AND ast > bst THEN 'finishes'
          |  WHEN aen = ben THEN 'finished_by'
          |  WHEN ast > bst AND aen < ben THEN 'during'
          |  WHEN ast < bst AND aen > ben THEN 'contains'
          |  WHEN ast < bst THEN 'overlaps'
          |  ELSE 'overlapped_by'
          |END""".stripMargin))
      .groupBy("type_a", "type_b", "relation")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("type_a", "type_b", "relation")
  }

  /** Markov removal-effect attribution (Anderl et al. 2016 — the
    * data-driven alternative to Shapley/last-touch): per-user journeys
    * (events ordered by (ts, event_id), truncated at the first
    * purchase) define a first-order chain over channel states with
    * START, absorbing CONV (purchase) and NULL (drop-off); each
    * channel's credit is its REMOVAL EFFECT — how much the absorption
    * probability P(START→CONV) falls when that channel's transitions
    * are redirected to NULL. The metric is pinned as K = 12 synchronous
    * value-iteration steps in 1e-9 INTEGER units with PER-TERM integer
    * division ((cnt·V_b) div tot_a) — every accumulation is an
    * order-independent BIGINT sum (the nelson_aalen quantization
    * device), so both engines produce bit-identical integers with no
    * float folds at all; shares are one final integer division (ppm,
    * zero-guarded). Overflow bound (the k_betweenness discipline): the
    * per-term intermediate is cnt·V with V ≤ 1e9 on the 1e-9 grid, so
    * BIGINT requires cnt < 2^63/1e9 ≈ 9.2e9 transitions PER (prev,cur)
    * CELL. A 100 TB corpus with ≳1e10 transitions into one cell must
    * pre-scale the counts (divide every cnt by a common power of ten —
    * probabilities are ratios, so the recurrence is invariant) or drop
    * the grid to 1e-6; DuckDB would raise on the overflow while Spark
    * wraps silently, which is why the bound is stated here rather than
    * discovered. Scale shape: the data-sized work is one
    * user-partitioned lag pass + a (channels+2)²-bounded transition
    * count; only that bounded matrix reaches the driver (the kcore
    * gate discipline), where the 12×|variants|×|states| ≤ 12·7·7
    * integer recurrence is O(1). The DuckDB replica runs the same
    * recurrence as a recursive CTE over the zero-padded transition
    * grid. */
  val markovAttribution: Q = Q(
    "markov_attribution",
    """WITH RECURSIVE e AS (SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 'CONV'
      |      ELSE event_type END AS st
      |  FROM events),
      |fpr AS (SELECT user_id, ts AS fts, event_id AS fid,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM e WHERE st = 'CONV'),
      |fp AS (SELECT user_id, fts, fid FROM fpr WHERE rn = 1),
      |kept AS (SELECT e.user_id, e.ts, e.event_id, e.st
      |  FROM e LEFT JOIN fp USING (user_id)
      |  WHERE fp.user_id IS NULL OR e.ts < fp.fts
      |    OR (e.ts = fp.fts AND e.event_id <= fp.fid)),
      |seq AS (SELECT user_id, st,
      |    lag(st) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rdesc,
      |    bool_or(st = 'CONV') OVER (PARTITION BY user_id) AS conv
      |  FROM kept),
      |trans AS (
      |  SELECT coalesce(prev, 'START') AS prev, st AS cur FROM seq
      |  UNION ALL
      |  SELECT st, 'NULL' FROM seq WHERE rdesc = 1 AND NOT conv),
      |counts AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cnt
      |  FROM trans GROUP BY 1, 2),
      |tot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot
      |  FROM counts GROUP BY 1),
      |states AS (SELECT DISTINCT prev AS state FROM counts),
      |variants AS (SELECT '__none__' AS variant
      |  UNION ALL SELECT state FROM states WHERE state <> 'START'),
      |cpad AS (SELECT s.state AS prev, c2.state AS cur,
      |    coalesce(c.cnt, 0) AS cnt, t.tot
      |  FROM states s CROSS JOIN states c2
      |  LEFT JOIN counts c ON c.prev = s.state AND c.cur = c2.state
      |  JOIN tot t ON t.prev = s.state),
      |consts AS (SELECT c.prev,
      |    CAST(sum((c.cnt * 1000000000) // t.tot) AS BIGINT) AS kv
      |  FROM counts c JOIN tot t ON t.prev = c.prev
      |  WHERE c.cur = 'CONV' GROUP BY 1),
      |it AS (
      |  SELECT 0 AS k, v.variant, s.state, CAST(0 AS BIGINT) AS val
      |  FROM variants v CROSS JOIN states s
      |  UNION ALL
      |  SELECT i.k + 1, i.variant, c.prev,
      |    CAST(sum(CASE WHEN c.cur = i.variant THEN 0
      |        ELSE (c.cnt * i.val) // c.tot END)
      |      + coalesce(any_value(k2.kv), 0) AS BIGINT)
      |  FROM it i
      |  JOIN cpad c ON c.cur = i.state
      |  LEFT JOIN consts k2 ON k2.prev = c.prev
      |  WHERE i.k < 12
      |  GROUP BY 1, 2, 3),
      |fin AS (SELECT variant, val FROM it
      |  WHERE k = 12 AND state = 'START'),
      |base AS (SELECT val AS base FROM fin WHERE variant = '__none__'),
      |re AS (SELECT f.variant AS channel,
      |    CAST(b.base - f.val AS BIGINT) AS re_units, b.base
      |  FROM fin f CROSS JOIN base b WHERE f.variant <> '__none__'),
      |sre AS (SELECT CAST(sum(re_units) AS BIGINT) AS s FROM re)
      |SELECT r.channel, r.base AS base_units, r.re_units,
      |  CAST(CASE WHEN s.s = 0 THEN 0
      |    ELSE r.re_units * 1000000 // s.s END AS BIGINT) AS share_ppm
      |FROM re r CROSS JOIN sre s
      |ORDER BY channel""".stripMargin) { (s, d) =>
    val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wUd = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val wAll = Window.partitionBy("user_id")
    val e = ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
      when(col("event_type") === "purchase", "CONV")
        .otherwise(col("event_type")).as("st"))
    val kept = e
      .withColumn("fp", min(when(col("st") === "CONV",
        struct(col("ts"), col("event_id")))).over(wAll))
      .filter(col("fp").isNull
        || struct(col("ts"), col("event_id")) <= col("fp"))
    val seqd = kept
      .withColumn("prev", lag(col("st"), 1).over(wU))
      .withColumn("rdesc", row_number().over(wUd))
      .withColumn("conv",
        max(when(col("st") === "CONV", 1).otherwise(0)).over(wAll))
    val trans = seqd
      .select(coalesce(col("prev"), lit("START")).as("prev"),
        col("st").as("cur"))
      .unionAll(seqd.filter(col("rdesc") === 1 && col("conv") === 0)
        .select(col("st").as("prev"), lit("NULL").as("cur")))
    // bounded driver traffic: ≤ (|event types| + 2)² transition cells
    val cells = trans.groupBy("prev", "cur")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val tot = cells.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val states = tot.keySet.toSeq.sorted // transient states (all prevs)
    val channels = states.filterNot(_ == "START")
    val U = 1000000000L
    def solve(removed: Option[String]): Long = {
      var v = states.map(_ -> 0L).toMap
      for (_ <- 1 to 12) {
        v = states.map { a =>
          val ta = tot(a)
          a -> (states.map { b =>
            if (removed.contains(b)) 0L
            else cells.getOrElse((a, b), 0L) * v(b) / ta
          }.sum + cells.getOrElse((a, "CONV"), 0L) * U / ta)
        }.toMap
      }
      v("START")
    }
    val baseV = solve(None)
    val res = channels.map(c => (c, baseV - solve(Some(c))))
    val sre = res.map(_._2).sum
    import s.implicits._
    res.map { case (c, re) =>
      (c, baseV, re, if (sre == 0) 0L else re * 1000000L / sre)
    }.toDF("channel", "base_units", "re_units", "share_ppm")
      .orderBy("channel")
  }

  val all: Seq[Q] = Seq(markovAttribution, allenIntervals, pathTriples, sloBurnRate, intervalMerge, maxConcurrency, attribution, acfDaily,
    rollingZ, temporalJoin, twapValue, slidingDistinct, holtLinear,
    eventTransitions, cusumDrift, kendallTau, theilSen, runsTest,
    seasonalDecompose, markovStationary, entropyRate, forecastBacktest,
    seqSupport, funnelLatency, inventoryRunout, hampelFilter, holtWinters,
    saxSymbols, shapleyAttribution, decayedPopularity, eventRegexMatch,
    rollingCorr, adfTest, kleinbergBurst, maxDrawdown, ljungBox,
    overdispersionCheck, seasonalStrength, topkTurnover, priceIndex,
    retentionCurve, valueDriftKl, mannKendall, cohortLtv, momYoyGrowth,
    binsegSplit, bollingerBands, rsiCutler, varCvar, activityStreaks,
    ccfLeadlag, pacfLags, grangerLag1, hurstRs, theilU, evtGumbel,
    xbarChart, crostonSma, maseEval)

  /** Extreme-value fit: Gumbel location/scale by method of moments
    * over monthly block maxima of daily revenue, plus the 10-year
    * (120-month) return level — the "how bad can a peak day get"
    * planning number. Monthly maxima are exact cents; mean/variance
    * come from BIGINT Σx/Σx² over integer DOLLARS (cents² overflows
    * int64 once daily revenue reaches ~$10M — measured at sf0.1, so
    * the downshift is load-bearing, not hypothetical); μ̂/σ̂/return level are fixed double
    * expressions with the Euler–Mascheroni and √6/π constants shared
    * verbatim. Calendar-bounded after the daily collapse. */
  lazy val evtGumbel: Q = Q(
    "evt_gumbel",
    """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |mm AS (SELECT year(day) * 12 + month(day) AS mon,
      |    CAST(max(rev) // 100 AS BIGINT) AS mx FROM daily GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(mx) AS BIGINT) AS sx,
      |    CAST(sum(mx * mx) AS BIGINT) AS sxx FROM mm),
      |fit AS (SELECT n,
      |    CAST(sx AS DOUBLE) / n AS mean,
      |    sqrt((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
      |      * 0.7796968012336761 AS beta
      |  FROM st)
      |SELECT n AS n_months,
      |  floor((mean - 0.5772156649015329 * beta) * 100 + 0.5) / 100
      |    AS mu_dollars,
      |  floor(beta * 100 + 0.5) / 100 AS beta_dollars,
      |  floor((mean - 0.5772156649015329 * beta
      |    - beta * ln(-ln(1.0 - 1.0 / 120))) * 100 + 0.5) / 100
      |    AS rl_10y_dollars
      |FROM fit""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val mm = daily
      .groupBy((year(col("day")) * 12 + month(col("day"))).as("mon"))
      .agg(floor(max("rev") / 100).cast("long").as("mx"))
    val st = mm.agg(count(lit(1)).as("n"), sum("mx").as("sx"),
      sum(col("mx") * col("mx")).as("sxx"))
    val mean = col("sx").cast("double") / col("n")
    val beta = sqrt((col("sxx") - col("sx").cast("double") * col("sx")
      / col("n")) / (col("n") - 1)) * 0.7796968012336761
    val mu = mean - lit(0.5772156649015329) * beta
    st.select(col("n").as("n_months"),
      (floor(mu * 100 + lit(0.5)) / 100).as("mu_dollars"),
      (floor(beta * 100 + lit(0.5)) / 100).as("beta_dollars"),
      (floor((mu - beta * log(-log(lit(1.0) - lit(1.0) / 120))) * 100
        + lit(0.5)) / 100).as("rl_10y_dollars"))
  }

  /** Shewhart X̄/R control chart over weekly subgroups of daily order
    * counts (n = 7; A2/D3/D4 constants for subgroup size 7 shared
    * verbatim): grand mean, mean range, control limits, and the
    * out-of-control week counts on both charts. Subgroup statistics
    * are exact integer sums/ranges; the limit comparisons are fixed
    * double expressions — both engines flag identical weeks. */
  lazy val xbarChart: Q = Q(
    "xbar_chart",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS t,
      |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      |wk AS (SELECT t // 7 AS w, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(max(y) - min(y) AS BIGINT) AS r,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM daily GROUP BY 1 HAVING count(*) = 7),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS b,
      |    CAST(sum(sy) AS BIGINT) AS tot,
      |    CAST(sum(r) AS BIGINT) AS sr FROM wk),
      |lim AS (SELECT b,
      |    CAST(tot AS DOUBLE) / (7 * b) AS xbb,
      |    CAST(sr AS DOUBLE) / b AS rb FROM g),
      |fl AS (SELECT
      |    CAST(sum(CASE WHEN CAST(sy AS DOUBLE) / 7
      |        > xbb + 0.419 * rb
      |      OR CAST(sy AS DOUBLE) / 7 < xbb - 0.419 * rb
      |      THEN 1 ELSE 0 END) AS BIGINT) AS out_x,
      |    CAST(sum(CASE WHEN r > 1.924 * rb OR r < 0.076 * rb
      |      THEN 1 ELSE 0 END) AS BIGINT) AS out_r
      |  FROM wk CROSS JOIN lim)
      |SELECT lim.b AS n_weeks,
      |  floor(lim.xbb * 10000 + 0.5) / 10000 AS xbar_grand,
      |  floor(lim.rb * 10000 + 0.5) / 10000 AS r_bar,
      |  floor((lim.xbb + 0.419 * lim.rb) * 10000 + 0.5) / 10000 AS ucl_x,
      |  floor((lim.xbb - 0.419 * lim.rb) * 10000 + 0.5) / 10000 AS lcl_x,
      |  fl.out_x AS n_out_xbar, fl.out_r AS n_out_range
      |FROM lim CROSS JOIN fl""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(count(lit(1)).as("y"))
    val wk = daily.groupBy(floor(col("t") / 7).cast("long").as("w"))
      .agg(sum("y").as("sy"), (max("y") - min("y")).as("r"),
        count(lit(1)).as("c"))
      .filter(col("c") === 7)
    val g = wk.agg(count(lit(1)).as("b"), sum("sy").as("tot"),
      sum("r").as("sr"))
    val xbb = col("tot").cast("double") / (lit(7) * col("b"))
    val rb = col("sr").cast("double") / col("b")
    val lim = g.select(col("b"), xbb.as("xbb"), rb.as("rb"))
    val fl = wk.crossJoin(broadcast(lim))
      .agg(sum(when(col("sy").cast("double") / 7
          > col("xbb") + lit(0.419) * col("rb"), 1L)
        .when(col("sy").cast("double") / 7
          < col("xbb") - lit(0.419) * col("rb"), 1L)
        .otherwise(0L)).as("out_x"),
        sum(when(col("r") > lit(1.924) * col("rb"), 1L)
          .when(col("r") < lit(0.076) * col("rb"), 1L)
          .otherwise(0L)).as("out_r"))
    lim.crossJoin(broadcast(fl))
      .select(col("b").as("n_weeks"),
        (floor(col("xbb") * 10000 + lit(0.5)) / 10000).as("xbar_grand"),
        (floor(col("rb") * 10000 + lit(0.5)) / 10000).as("r_bar"),
        (floor((col("xbb") + lit(0.419) * col("rb")) * 10000 + lit(0.5))
          / 10000).as("ucl_x"),
        (floor((col("xbb") - lit(0.419) * col("rb")) * 10000 + lit(0.5))
          / 10000).as("lcl_x"),
        col("out_x").as("n_out_xbar"), col("out_r").as("n_out_range"))
  }

  /** Croston's intermittent-demand forecast (SBA-free SMA variant —
    * the recursion-free form both engines replay exactly): for slow
    * movers (a deterministic 1-in-8 part panel), demand estimate =
    * mean nonzero weekly demand, interval estimate = mean
    * inter-demand gap (span/(k−1), the exact telescoped average), and
    * forecast = ẑ/î. Exact integer sums per part, two divisions; top
    * 25 by forecast. The panel filter rides the scan (partition-
    * prunable at 100 TB); everything after is part-keyed. */
  lazy val crostonSma: Q = Q(
    "croston_sma",
    """WITH wk AS (SELECT l_partkey AS pk,
      |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      // 7 AS w,
      |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
      |      AS z
      |  FROM lineitem WHERE l_partkey % 8 = 0
      |  GROUP BY 1, 2),
      |st AS (SELECT pk, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(z) AS BIGINT) AS sz,
      |    CAST(max(w) - min(w) AS BIGINT) AS span
      |  FROM wk GROUP BY pk HAVING count(*) >= 2)
      |SELECT pk AS partkey, k AS n_demand_weeks,
      |  floor(CAST(sz AS DOUBLE) / k * 10000 + 0.5) / 10000
      |    AS demand_est,
      |  floor(CAST(span AS DOUBLE) / (k - 1) * 10000 + 0.5) / 10000
      |    AS interval_est,
      |  floor(CAST(sz AS DOUBLE) / k
      |    / (CAST(span AS DOUBLE) / (k - 1)) * 10000 + 0.5) / 10000
      |    AS croston_forecast
      |FROM st WHERE span > 0
      |ORDER BY croston_forecast DESC, partkey LIMIT 25""".stripMargin) {
      (s, d) =>
    val wk = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 8 === 0)
      .groupBy(col("l_partkey").as("pk"),
        floor(datediff(col("l_shipdate").cast("date"),
          lit("1970-01-01").cast("date")) / 7).cast("long").as("w"))
      .agg(sum(floor(col("l_quantity") + lit(0.5)).cast("long")).as("z"))
    val st = wk.groupBy("pk")
      .agg(count(lit(1)).as("k"), sum("z").as("sz"),
        (max("w") - min("w")).as("span"))
      .filter(col("k") >= 2 && col("span") > 0)
    val dEst = col("sz").cast("double") / col("k")
    val iEst = col("span").cast("double") / (col("k") - 1)
    st.select(col("pk").as("partkey"), col("k").as("n_demand_weeks"),
        (floor(dEst * 10000 + lit(0.5)) / 10000).as("demand_est"),
        (floor(iEst * 10000 + lit(0.5)) / 10000).as("interval_est"),
        (floor(dEst / iEst * 10000 + lit(0.5)) / 10000)
          .as("croston_forecast"))
      .orderBy(col("croston_forecast").desc, col("partkey"))
      .limit(25)
  }

  /** Forecast-accuracy metric pair for the drift model theil_u rates:
    * MASE (MAE over the in-sample naive MAE — Hyndman's scale-free
    * standard) and sMAPE. |errors| are exact integer cents, so MASE
    * is a pure integer ratio; sMAPE's bounded per-term rationals fold
    * day-sorted. Same calendar-bounded consecutive-day triples as
    * theil_u. */
  lazy val maseEval: Q = Q(
    "mase_eval",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) AS t,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |nxt AS (SELECT a.t, min(b2.t) AS tn FROM daily a JOIN daily b2
      |  ON b2.t > a.t GROUP BY a.t),
      |tri AS (SELECT n1.t, d0.rev AS y0, d1.rev AS y1, d2.rev AS y2
      |  FROM nxt n1 JOIN nxt n2 ON n2.t = n1.tn
      |    JOIN daily d0 ON d0.t = n1.t
      |    JOIN daily d1 ON d1.t = n1.tn
      |    JOIN daily d2 ON d2.t = n2.tn),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(abs(2 * y1 - y0 - y2)) AS BIGINT) AS mae_model,
      |    CAST(sum(abs(y2 - y1)) AS BIGINT) AS mae_naive,
      |    list_aggregate(list(2.0 * abs(2 * y1 - y0 - y2)
      |      / (abs(CAST(y2 AS DOUBLE)) + abs(2.0 * y1 - y0))
      |      ORDER BY t), 'sum') AS smape_sum
      |  FROM tri)
      |SELECT n AS n_triples,
      |  floor(CAST(mae_model AS DOUBLE) / mae_naive * 1000000 + 0.5)
      |    / 1000000 AS mase,
      |  floor(smape_sum / n * 1000000 + 0.5) / 1000000 AS smape,
      |  CAST(mae_model AS DOUBLE) / mae_naive < 1.0 AS beats_naive
      |FROM f""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .groupBy(datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val nxt = daily.as("a")
      .join(daily.select(col("t").as("t2")), col("t2") > col("a.t"))
      .groupBy(col("a.t").as("t")).agg(min("t2").as("tn"))
    val tri = nxt.as("n1")
      .join(nxt.select(col("t").as("tn"), col("tn").as("tnn")), "tn")
      .join(daily.select(col("t"), col("rev").as("y0")), "t")
      .join(daily.select(col("t").as("tn"), col("rev").as("y1")), "tn")
      .join(daily.select(col("t").as("tnn"), col("rev").as("y2")), "tnn")
    val f = tri.agg(count(lit(1)).as("n"),
      sum(abs(lit(2) * col("y1") - col("y0") - col("y2"))).as("mae_model"),
      sum(abs(col("y2") - col("y1"))).as("mae_naive"),
      expr("aggregate(array_sort(collect_list(struct(t, " +
        "2.0d * abs(2 * y1 - y0 - y2) " +
        "/ (abs(CAST(y2 AS DOUBLE)) + abs(2.0d * y1 - y0)) AS s))), " +
        "0D, (acc, x) -> acc + x.s)").as("smape_sum"))
    f.select(col("n").as("n_triples"),
      (floor(col("mae_model").cast("double") / col("mae_naive") * 1000000
        + lit(0.5)) / 1000000).as("mase"),
      (floor(col("smape_sum") / col("n") * 1000000 + lit(0.5)) / 1000000)
        .as("smape"),
      (col("mae_model").cast("double") / col("mae_naive") < 1.0)
        .as("beats_naive"))
  }

  /** Theil's U2 — does a DRIFT forecast (carry yesterday's change
    * forward) beat the naive no-change forecast on daily revenue?
    * U2 < 1 means the model earns its keep; forecast_backtest grades
    * one model, this grades it against the canonical benchmark. Each
    * relative error is integer cents over integer cents (one division
    * per term); both quadratic sums fold in day-sorted order; triples
    * ride two calendar-bounded next-observed-day joins. */
  lazy val theilU: Q = Q(
    "theil_u",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) AS t,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |nxt AS (SELECT a.t, min(b2.t) AS tn FROM daily a JOIN daily b2
      |  ON b2.t > a.t GROUP BY a.t),
      |tri AS (SELECT n1.t, d0.rev AS y0, d1.rev AS y1, d2.rev AS y2
      |  FROM nxt n1 JOIN nxt n2 ON n2.t = n1.tn
      |    JOIN daily d0 ON d0.t = n1.t
      |    JOIN daily d1 ON d1.t = n1.tn
      |    JOIN daily d2 ON d2.t = n2.tn),
      |terms AS (SELECT t,
      |    (CAST(2 * y1 - y0 AS DOUBLE) - y2) / y1 AS fpe,
      |    CAST(y2 - y1 AS DOUBLE) / y1 AS ape
      |  FROM tri),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    list_aggregate(list(fpe * fpe ORDER BY t), 'sum') AS sf,
      |    list_aggregate(list(ape * ape ORDER BY t), 'sum') AS sa
      |  FROM terms)
      |SELECT n AS n_triples,
      |  floor(sqrt(sf / sa) * 1000000 + 0.5) / 1000000 AS u2,
      |  sqrt(sf / sa) < 1.0 AS beats_naive
      |FROM f""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .groupBy(datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val nxt = daily.as("a")
      .join(daily.select(col("t").as("t2")), col("t2") > col("a.t"))
      .groupBy(col("a.t").as("t")).agg(min("t2").as("tn"))
    val tri = nxt.as("n1")
      .join(nxt.select(col("t").as("tn"), col("tn").as("tnn")), "tn")
      .join(daily.select(col("t"), col("rev").as("y0")), "t")
      .join(daily.select(col("t").as("tn"), col("rev").as("y1")), "tn")
      .join(daily.select(col("t").as("tnn"), col("rev").as("y2")), "tnn")
    val terms = tri.select(col("t"),
      (((lit(2) * col("y1") - col("y0")).cast("double") - col("y2"))
        / col("y1")).as("fpe"),
      ((col("y2") - col("y1")).cast("double") / col("y1")).as("ape"))
    val f = terms.agg(count(lit(1)).as("n"),
      expr("aggregate(array_sort(collect_list(struct(t, fpe * fpe AS s))), " +
        "0D, (acc, x) -> acc + x.s)").as("sf"),
      expr("aggregate(array_sort(collect_list(struct(t, ape * ape AS s))), " +
        "0D, (acc, x) -> acc + x.s)").as("sa"))
    f.select(col("n").as("n_triples"),
      (floor(sqrt(col("sf") / col("sa")) * 1000000 + lit(0.5)) / 1000000)
        .as("u2"),
      (sqrt(col("sf") / col("sa")) < 1.0).as("beats_naive"))
  }

  /** Granger-causality F-test at lag 1: do yesterday's CLICKS carry
    * information about today's PURCHASES beyond yesterday's purchases
    * alone? Restricted (AR(1)) vs unrestricted (AR(1)+click) OLS via
    * centered co-moments — every raw sum BIGINT over the
    * calendar-bounded consecutive-day triple join, β/RSS/F fixed
    * double expressions, so both engines agree bit-for-bit before the
    * grids. The F(1, n−3) 5% line is the shared 3.8415 constant. */
  lazy val grangerLag1: Q = Q(
    "granger_lag1",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |tri AS (SELECT b.y AS yt, a.y AS u, a.x AS v
      |  FROM daily a JOIN daily b ON b.day = a.day + 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(yt) AS BIGINT) AS sy,
      |    CAST(sum(u * u) AS BIGINT) AS suu,
      |    CAST(sum(v * v) AS BIGINT) AS svv,
      |    CAST(sum(u * v) AS BIGINT) AS suv,
      |    CAST(sum(u * yt) AS BIGINT) AS suy,
      |    CAST(sum(v * yt) AS BIGINT) AS svy,
      |    CAST(sum(yt * yt) AS BIGINT) AS syy FROM tri),
      |c AS (SELECT n,
      |    suu - CAST(su AS DOUBLE) * su / n AS cuu,
      |    svv - CAST(sv AS DOUBLE) * sv / n AS cvv,
      |    suv - CAST(su AS DOUBLE) * sv / n AS cuv,
      |    suy - CAST(su AS DOUBLE) * sy / n AS cuy,
      |    svy - CAST(sv AS DOUBLE) * sy / n AS cvy,
      |    syy - CAST(sy AS DOUBLE) * sy / n AS cyy FROM m),
      |f AS (SELECT n,
      |    (cuy * cvv - cvy * cuv) / (cuu * cvv - cuv * cuv) AS b,
      |    (cvy * cuu - cuy * cuv) / (cuu * cvv - cuv * cuv) AS cc,
      |    cyy - cuy * cuy / cuu AS rss_r,
      |    cyy - (cuy * cvv - cvy * cuv) / (cuu * cvv - cuv * cuv) * cuy
      |        - (cvy * cuu - cuy * cuv) / (cuu * cvv - cuv * cuv) * cvy
      |      AS rss_u
      |  FROM c)
      |SELECT n AS n_days,
      |  floor(b * 1000000 + 0.5) / 1000000 AS beta_ylag,
      |  floor(cc * 1000000 + 0.5) / 1000000 AS beta_xlag,
      |  floor((rss_r - rss_u) / (rss_u / (n - 3)) * 10000 + 0.5) / 10000
      |    AS f_stat,
      |  (rss_r - rss_u) / (rss_u / (n - 3)) > 3.8415 AS granger_causes
      |FROM f""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val tri = daily.as("a")
      .join(daily.select(date_sub(col("day"), 1).as("day"),
        col("y").as("yt")), "day")
      .select(col("yt"), col("y").as("u"), col("x").as("v"))
    val m = tri.agg(count(lit(1)).as("n"), sum("u").as("su"),
      sum("v").as("sv"), sum("yt").as("sy"),
      sum(col("u") * col("u")).as("suu"),
      sum(col("v") * col("v")).as("svv"),
      sum(col("u") * col("v")).as("suv"),
      sum(col("u") * col("yt")).as("suy"),
      sum(col("v") * col("yt")).as("svy"),
      sum(col("yt") * col("yt")).as("syy"))
    val cuu = col("suu") - col("su").cast("double") * col("su") / col("n")
    val cvv = col("svv") - col("sv").cast("double") * col("sv") / col("n")
    val cuv = col("suv") - col("su").cast("double") * col("sv") / col("n")
    val cuy = col("suy") - col("su").cast("double") * col("sy") / col("n")
    val cvy = col("svy") - col("sv").cast("double") * col("sy") / col("n")
    val cyy = col("syy") - col("sy").cast("double") * col("sy") / col("n")
    val det = cuu * cvv - cuv * cuv
    val b = (cuy * cvv - cvy * cuv) / det
    val cc = (cvy * cuu - cuy * cuv) / det
    val rssR = cyy - cuy * cuy / cuu
    val rssU = cyy - b * cuy - cc * cvy
    val fstat = (rssR - rssU) / (rssU / (col("n") - 3))
    m.select(col("n").as("n_days"),
      (floor(b * 1000000 + lit(0.5)) / 1000000).as("beta_ylag"),
      (floor(cc * 1000000 + lit(0.5)) / 1000000).as("beta_xlag"),
      (floor(fstat * 10000 + lit(0.5)) / 10000).as("f_stat"),
      (fstat > 3.8415).as("granger_causes"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis of the daily
    * order-count series over dyadic scales 32–256: H ≈ 0.5 reads
    * "no long memory", H > 0.5 persistent. Day indexing and the
    * within-window cumulative both stay keyed ((scale, window)
    * partitions of ≤256 rows — no partition-less state); R and S are
    * fixed double expressions over BIGINT window sums; per-scale
    * means and the final log-log slope fold in explicitly sorted
    * order. Everything after the daily collapse is calendar-bounded. */
  lazy val hurstRs: Q = Q(
    "hurst_rs",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      |idx AS (SELECT a.day, any_value(a.y) AS y,
      |    CAST(count(b2.day) AS BIGINT) AS i
      |  FROM daily a LEFT JOIN daily b2 ON b2.day < a.day GROUP BY a.day),
      |sc AS (SELECT unnest([32, 64, 128, 256]) AS scale),
      |w AS (SELECT sc.scale, idx.i // sc.scale AS win, idx.i, idx.y
      |  FROM sc JOIN idx ON TRUE),
      |full_w AS (SELECT scale, win FROM w GROUP BY scale, win
      |  HAVING count(*) = scale),
      |ww AS (SELECT w.scale, w.win, w.i, w.y,
      |    sum(w.y) OVER (PARTITION BY w.scale, w.win ORDER BY w.i) AS cum,
      |    row_number() OVER (PARTITION BY w.scale, w.win ORDER BY w.i)
      |      AS j,
      |    sum(w.y) OVER (PARTITION BY w.scale, w.win) AS s,
      |    sum(w.y * w.y) OVER (PARTITION BY w.scale, w.win) AS ss
      |  FROM w JOIN full_w ON full_w.scale = w.scale
      |    AND full_w.win = w.win),
      |rs AS (SELECT scale, win,
      |    (max(cum - j * (CAST(s AS DOUBLE) / scale))
      |      - min(cum - j * (CAST(s AS DOUBLE) / scale)))
      |    / sqrt((ss - CAST(s AS DOUBLE) * s / scale) / scale) AS rs
      |  FROM (SELECT scale, win, cum, j, s, ss FROM ww) t
      |  GROUP BY scale, win, s, ss
      |  HAVING (ss - CAST(s AS DOUBLE) * s / scale) > 0),
      |ms AS (SELECT scale, CAST(count(*) AS BIGINT) AS n_windows,
      |    list_aggregate(list(rs ORDER BY win), 'sum') / count(*) AS mrs
      |  FROM rs GROUP BY scale),
      |fit AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |    list_aggregate(list(ln(CAST(scale AS DOUBLE)) ORDER BY scale),
      |      'sum') AS slx,
      |    list_aggregate(list(ln(mrs) ORDER BY scale), 'sum') AS sly,
      |    list_aggregate(list(ln(CAST(scale AS DOUBLE)) * ln(mrs)
      |      ORDER BY scale), 'sum') AS slxy,
      |    list_aggregate(list(ln(CAST(scale AS DOUBLE))
      |      * ln(CAST(scale AS DOUBLE)) ORDER BY scale), 'sum') AS slxx
      |  FROM ms)
      |SELECT CAST(ms.scale AS BIGINT) AS scale, ms.n_windows,
      |  floor(ms.mrs * 1000000 + 0.5) / 1000000 AS rs_mean,
      |  floor((fit.k * fit.slxy - fit.slx * fit.sly)
      |    / (fit.k * fit.slxx - fit.slx * fit.slx) * 1000000 + 0.5)
      |    / 1000000 AS hurst
      |FROM ms CROSS JOIN fit ORDER BY ms.scale""".stripMargin) { (s, d) =>
    val daily = ord(s, d).groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val idx = daily.as("a")
      .join(daily.select(col("day").as("d2")), col("d2") < col("a.day"),
        "left_outer")
      .groupBy(col("a.day").as("day")).agg(first("y").as("y"),
        count(col("d2")).as("i"))
    val sc = s.createDataFrame(Seq(Tuple1(32L), Tuple1(64L), Tuple1(128L),
      Tuple1(256L))).toDF("scale")
    val w = sc.crossJoin(idx)
      .select(col("scale"), floor(col("i") / col("scale")).cast("long")
        .as("win"), col("i"), col("y"))
    val fullW = w.groupBy("scale", "win").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === col("scale")).select("scale", "win")
    val part = Window.partitionBy("scale", "win")
    val ww = w.join(fullW, Seq("scale", "win"))
      .withColumn("cum", sum("y").over(part.orderBy("i")))
      .withColumn("j", row_number().over(part.orderBy("i")))
      .withColumn("s", sum("y").over(part))
      .withColumn("ss", sum(col("y") * col("y")).over(part))
    val zc = col("cum") - col("j") * (col("s").cast("double") / col("scale"))
    val rs = ww.groupBy("scale", "win", "s", "ss")
      .agg(max(zc).as("zmax"), min(zc).as("zmin"))
      .filter((col("ss") - col("s").cast("double") * col("s")
        / col("scale")) > 0)
      .select(col("scale"), col("win"),
        ((col("zmax") - col("zmin"))
          / sqrt((col("ss") - col("s").cast("double") * col("s")
            / col("scale")) / col("scale"))).as("rs"))
    val ms = rs.groupBy("scale")
      .agg(count(lit(1)).as("n_windows"),
        (expr("aggregate(array_sort(collect_list(struct(win, rs AS v))), " +
          "0D, (acc, x) -> acc + x.v)") / count(lit(1))).as("mrs"))
    val fit = ms.agg(count(lit(1)).as("k"),
      expr("aggregate(array_sort(collect_list(struct(scale, " +
        "ln(CAST(scale AS DOUBLE)) AS v))), 0D, (acc, x) -> acc + x.v)")
        .as("slx"),
      expr("aggregate(array_sort(collect_list(struct(scale, ln(mrs) AS v))), " +
        "0D, (acc, x) -> acc + x.v)").as("sly"),
      expr("aggregate(array_sort(collect_list(struct(scale, " +
        "ln(CAST(scale AS DOUBLE)) * ln(mrs) AS v))), 0D, " +
        "(acc, x) -> acc + x.v)").as("slxy"),
      expr("aggregate(array_sort(collect_list(struct(scale, " +
        "ln(CAST(scale AS DOUBLE)) * ln(CAST(scale AS DOUBLE)) AS v))), " +
        "0D, (acc, x) -> acc + x.v)").as("slxx"))
    ms.crossJoin(broadcast(fit))
      .select(col("scale"), col("n_windows"),
        (floor(col("mrs") * 1000000 + lit(0.5)) / 1000000).as("rs_mean"),
        (floor((col("k") * col("slxy") - col("slx") * col("sly"))
          / (col("k") * col("slxx") - col("slx") * col("slx"))
          * 1000000 + lit(0.5)) / 1000000).as("hurst"))
      .orderBy("scale")
  }

  /** Bollinger-band breakout days per brand: 20-observation SMA ± 2σ
    * over each brand's daily revenue, reporting only the days that
    * close OUTSIDE the band (%B < 0 or > 1) once the window is full.
    * Revenue is exact cents, the rolling moments are BIGINT sums over
    * a brand-keyed ROWS frame (25 bounded window states — no
    * partition-less window), and sma/σ/%B are fixed double
    * expressions over those integers, so both engines flag identical
    * days. At 100 TB the scan collapses to (brand × day) cells before
    * any window state exists. */
  lazy val bollingerBands: Q = Q(
    "bollinger_bands",
    """WITH base AS (SELECT p.p_brand AS brand,
      |    CAST(l.l_shipdate AS DATE) AS day,
      |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |daily AS (SELECT brand, day, CAST(sum(cents) AS BIGINT) AS rev
      |  FROM base GROUP BY brand, day),
      |w AS (SELECT brand, day, rev,
      |    count(*) OVER win AS n, sum(rev) OVER win AS s,
      |    sum(rev * rev) OVER win AS ss
      |  FROM daily WINDOW win AS (PARTITION BY brand ORDER BY day
      |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |b AS (SELECT brand, day, rev, s / 20.0 AS sma,
      |    sqrt((ss - CAST(s AS DOUBLE) * s / 20) / 20) AS sd
      |  FROM w WHERE n = 20)
      |SELECT brand, strftime(day, '%Y-%m-%d') AS day, rev,
      |  floor((rev - (sma - 2 * sd)) / (4 * sd) * 10000 + 0.5) / 10000
      |    AS pctb,
      |  floor(4 * sd / sma * 10000 + 0.5) / 10000 AS bandwidth,
      |  CASE WHEN rev > sma + 2 * sd THEN 'above' ELSE 'below' END
      |    AS side
      |FROM b WHERE rev > sma + 2 * sd OR rev < sma - 2 * sd
      |ORDER BY brand, day""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val win = Window.partitionBy("brand").orderBy("day").rowsBetween(-19, 0)
    val w = daily
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s", sum("rev").over(win))
      .withColumn("ss", sum(col("rev") * col("rev")).over(win))
      .filter(col("n") === 20)
    val sma = col("s") / 20.0
    val sd = sqrt((col("ss") - col("s").cast("double") * col("s") / 20) / 20)
    w.filter(col("rev") > sma + lit(2) * sd || col("rev") < sma - lit(2) * sd)
      .select(col("brand"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev"),
        (floor((col("rev") - (sma - lit(2) * sd)) / (lit(4) * sd) * 10000
          + lit(0.5)) / 10000).as("pctb"),
        (floor(lit(4) * sd / sma * 10000 + lit(0.5)) / 10000).as("bandwidth"),
        when(col("rev") > sma + lit(2) * sd, "above").otherwise("below")
          .as("side"))
      .orderBy("brand", "day")
  }

  /** Cutler's RSI (14-period, SMA-based — the window-expressible RSI
    * variant; Wilder's recursive smoothing deliberately NOT used so
    * both engines stay in exact integers) per brand over daily
    * revenue deltas. RSI = 100·ΣG/(ΣG+ΣL) is an exact rational over
    * BIGINT gain/loss sums, so overbought/oversold day counts are
    * exact. Two stacked brand-keyed windows (prev-day delta, then the
    * 14-row moment frame); the scan collapses to (brand × day) cells
    * first. */
  lazy val rsiCutler: Q = Q(
    "rsi_cutler",
    """WITH base AS (SELECT p.p_brand AS brand,
      |    CAST(l.l_shipdate AS DATE) AS day,
      |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |daily AS (SELECT brand, day, CAST(sum(cents) AS BIGINT) AS rev
      |  FROM base GROUP BY brand, day),
      |dl AS (SELECT brand, day,
      |    rev - lag(rev) OVER (PARTITION BY brand ORDER BY day) AS dlt
      |  FROM daily),
      |g AS (SELECT brand, day,
      |    CASE WHEN dlt > 0 THEN dlt ELSE 0 END AS gain,
      |    CASE WHEN dlt < 0 THEN -dlt ELSE 0 END AS loss
      |  FROM dl WHERE dlt IS NOT NULL),
      |w AS (SELECT brand, day,
      |    count(*) OVER win AS n, sum(gain) OVER win AS sg,
      |    sum(loss) OVER win AS sl
      |  FROM g WINDOW win AS (PARTITION BY brand ORDER BY day
      |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      |r AS (SELECT brand,
      |    CASE WHEN sg + sl = 0 THEN 50.0
      |      ELSE 100.0 * sg / (sg + sl) END AS rsi
      |  FROM w WHERE n = 14)
      |SELECT brand, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN rsi >= 70 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_overbought,
      |  CAST(sum(CASE WHEN rsi <= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oversold,
      |  floor(max(rsi) * 10000 + 0.5) / 10000 AS max_rsi,
      |  floor(min(rsi) * 10000 + 0.5) / 10000 AS min_rsi
      |FROM r GROUP BY brand ORDER BY brand""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val lagw = Window.partitionBy("brand").orderBy("day")
    val g = daily
      .withColumn("dlt", col("rev") - lag("rev", 1).over(lagw))
      .filter(col("dlt").isNotNull)
      .select(col("brand"), col("day"),
        when(col("dlt") > 0, col("dlt")).otherwise(0L).as("gain"),
        when(col("dlt") < 0, -col("dlt")).otherwise(0L).as("loss"))
    val win = Window.partitionBy("brand").orderBy("day").rowsBetween(-13, 0)
    val w = g
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("sg", sum("gain").over(win))
      .withColumn("sl", sum("loss").over(win))
      .filter(col("n") === 14)
    val rsi = when(col("sg") + col("sl") === 0, lit(50.0))
      .otherwise(lit(100.0) * col("sg") / (col("sg") + col("sl")))
    w.select(col("brand"), rsi.as("rsi"))
      .groupBy("brand").agg(count(lit(1)).as("n_days"),
        sum(when(col("rsi") >= 70, 1L).otherwise(0L)).as("n_overbought"),
        sum(when(col("rsi") <= 30, 1L).otherwise(0L)).as("n_oversold"),
        (floor(max("rsi") * 10000 + lit(0.5)) / 10000).as("max_rsi"),
        (floor(min("rsi") * 10000 + lit(0.5)) / 10000).as("min_rsi"))
      .orderBy("brand")
  }

  /** Historical VaR + expected shortfall (CVaR) of the daily global
    * revenue CHANGE at 95% and 99% — risk quantiles a revenue desk
    * actually monitors. Changes are exact integer cents over
    * consecutive observed days (calendar-bounded next-day self-join),
    * order statistics come from the distinct-value cumulative table
    * (min v with cum ≥ k — no engine quantile semantics involved),
    * interpolation is one shared double expression, and the tail mean
    * is an exact integer sum with the boundary value weighted by the
    * remaining count. Everything after the daily collapse is
    * calendar-bounded (~2.4k rows at any SF). */
  lazy val varCvar: Q = Q(
    "var_cvar",
    """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) AS t,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |nxt AS (SELECT a.t, min(b2.t) AS tn FROM daily a JOIN daily b2
      |  ON b2.t > a.t GROUP BY a.t),
      |ch AS (SELECT d2.rev - d1.rev AS v FROM nxt
      |  JOIN daily d1 ON d1.t = nxt.t JOIN daily d2 ON d2.t = nxt.tn),
      |c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY v),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
      |cum AS (SELECT a.v, any_value(a.c) AS c,
      |    CAST(COALESCE(sum(b2.c), 0) AS BIGINT) AS clt
      |  FROM c a LEFT JOIN c b2 ON b2.v < a.v GROUP BY a.v),
      |al AS (SELECT unnest([0.95, 0.99]) AS alpha),
      |kk AS (SELECT al.alpha, n.n,
      |    (1.0 - al.alpha) * (n.n - 1) AS r,
      |    CAST(floor((1.0 - al.alpha) * (n.n - 1)) AS BIGINT) + 1 AS k1,
      |    CAST(floor((1.0 - al.alpha) * (n.n - 1)) AS BIGINT) + 2 AS k2,
      |    greatest(1, CAST(floor((1.0 - al.alpha) * n.n) AS BIGINT)) AS m
      |  FROM al CROSS JOIN n),
      |v1 AS (SELECT kk.alpha, min(cum.v) AS v1 FROM kk JOIN cum
      |  ON cum.clt + cum.c >= kk.k1 GROUP BY kk.alpha),
      |v2 AS (SELECT kk.alpha, min(cum.v) AS v2 FROM kk JOIN cum
      |  ON cum.clt + cum.c >= kk.k2 GROUP BY kk.alpha),
      |vb AS (SELECT kk.alpha, min(cum.v) AS vb FROM kk JOIN cum
      |  ON cum.clt + cum.c >= kk.m GROUP BY kk.alpha),
      |tl AS (SELECT kk.alpha,
      |    CAST(COALESCE(sum(CASE WHEN cum.v < vb.vb THEN cum.c * cum.v
      |      ELSE 0 END), 0) AS BIGINT) AS ts,
      |    CAST(COALESCE(sum(CASE WHEN cum.v < vb.vb THEN cum.c
      |      ELSE 0 END), 0) AS BIGINT) AS tc
      |  FROM kk JOIN vb ON vb.alpha = kk.alpha
      |    LEFT JOIN cum ON TRUE
      |  GROUP BY kk.alpha)
      |SELECT kk.alpha, kk.n AS n_changes,
      |  floor((v1.v1 + (kk.r - floor(kk.r)) * (v2.v2 - v1.v1)) / 100.0
      |    * 10000 + 0.5) / 10000 AS var_dollars,
      |  floor((CAST(tl.ts + (kk.m - tl.tc) * vb.vb AS DOUBLE) / kk.m)
      |    / 100.0 * 10000 + 0.5) / 10000 AS cvar_dollars,
      |  kk.m AS tail_days
      |FROM kk JOIN v1 ON v1.alpha = kk.alpha
      |  JOIN v2 ON v2.alpha = kk.alpha JOIN vb ON vb.alpha = kk.alpha
      |  JOIN tl ON tl.alpha = kk.alpha
      |ORDER BY kk.alpha""".stripMargin) { (s, d) =>
    val daily = Tables.lineitem(s, d)
      .groupBy(datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).as("t"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .as("rev"))
    val nxt = daily.as("a")
      .join(daily.select(col("t").as("t2")), col("t2") > col("a.t"))
      .groupBy(col("a.t").as("t")).agg(min("t2").as("tn"))
    val ch = nxt
      .join(daily.select(col("t"), col("rev").as("r1")), "t")
      .join(daily.select(col("t").as("tn"), col("rev").as("r2")), "tn")
      .select((col("r2") - col("r1")).as("v"))
    val c = ch.groupBy("v").agg(count(lit(1)).as("c"))
    val n = c.agg(sum("c").as("n"))
    val cum = c.as("a")
      .join(c.select(col("v").as("v2"), col("c").as("c2")),
        col("v2") < col("a.v"), "left_outer")
      .groupBy(col("a.v").as("v")).agg(first("c").as("c"),
        coalesce(sum("c2"), lit(0L)).as("clt"))
      .withColumn("cle", col("clt") + col("c"))
    val al = s.createDataFrame(Seq(Tuple1(0.95), Tuple1(0.99)))
      .toDF("alpha")
    val r = (lit(1.0) - col("alpha")) * (col("n") - 1)
    val kk = al.crossJoin(broadcast(n))
      .select(col("alpha"), col("n"), r.as("r"),
        (floor(r).cast("long") + 1).as("k1"),
        (floor(r).cast("long") + 2).as("k2"),
        greatest(lit(1L), floor((lit(1.0) - col("alpha")) * col("n"))
          .cast("long")).as("m"))
    def kth(key: org.apache.spark.sql.Column, out: String): DataFrame = kk
      .join(cum, col("cle") >= key)
      .groupBy("alpha").agg(min("v").as(out))
    val v1 = kth(col("k1"), "v1")
    val v2 = kth(col("k2"), "v2")
    val vb = kth(col("m"), "vb")
    val tl = kk.join(vb, "alpha").crossJoin(cum)
      .groupBy("alpha")
      .agg(coalesce(sum(when(col("v") < col("vb"), col("c") * col("v"))
        .otherwise(0L)), lit(0L)).as("ts"),
        coalesce(sum(when(col("v") < col("vb"), col("c")).otherwise(0L)),
          lit(0L)).as("tc"))
    kk.join(v1, "alpha").join(v2, "alpha").join(vb, "alpha").join(tl, "alpha")
      .select(col("alpha"), col("n").as("n_changes"),
        (floor((col("v1") + (col("r") - floor(col("r")))
          * (col("v2") - col("v1"))) / 100.0 * 10000 + lit(0.5)) / 10000)
          .as("var_dollars"),
        (floor((col("ts") + (col("m") - col("tc")) * col("vb"))
          .cast("double") / col("m") / 100.0 * 10000 + lit(0.5)) / 10000)
          .as("cvar_dollars"),
        col("m").as("tail_days"))
      .orderBy("alpha")
  }

  /** Longest consecutive-day activity streak per user (the classic
    * gaps-and-islands shape): distinct (user, day) cells, island id =
    * epoch-day − row_number inside a user-keyed window, islands
    * collapse to (length, start), best-per-user ties break on earliest
    * start. Top 25 by streak length with a total day/user tiebreak.
    * Every window is user-keyed; the scan collapses to distinct
    * activity cells first. */
  lazy val activityStreaks: Q = Q(
    "activity_streaks",
    """WITH ud AS (SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('day', ts) AS DATE)) AS d FROM events),
      |rn AS (SELECT user_id, d, row_number()
      |    OVER (PARTITION BY user_id ORDER BY d) AS rn FROM ud),
      |isl AS (SELECT user_id, d - rn AS island,
      |    CAST(count(*) AS BIGINT) AS len, min(d) AS start
      |  FROM rn GROUP BY user_id, d - rn),
      |best AS (SELECT user_id, len, start, row_number()
      |    OVER (PARTITION BY user_id ORDER BY len DESC, start) AS b
      |  FROM isl)
      |SELECT user_id, len AS streak_days,
      |  strftime(DATE '1970-01-01' + CAST(start AS INTEGER), '%Y-%m-%d')
      |    AS start_day
      |FROM best WHERE b = 1
      |ORDER BY streak_days DESC, start_day, user_id
      |LIMIT 25""".stripMargin) { (s, d) =>
    val ud = ev(s, d)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .as("d"))
      .distinct()
    val rn = ud.withColumn("rn",
      row_number().over(Window.partitionBy("user_id").orderBy("d")))
    val isl = rn.groupBy(col("user_id"), (col("d") - col("rn")).as("island"))
      .agg(count(lit(1)).as("len"), min("d").as("start"))
    val best = isl.withColumn("b", row_number().over(
        Window.partitionBy("user_id").orderBy(col("len").desc, col("start"))))
      .filter(col("b") === 1)
    best.select(col("user_id"), col("len").as("streak_days"),
        date_format(date_add(lit("1970-01-01").cast("date"),
          col("start").cast("int")), "yyyy-MM-dd").as("start_day"))
      .orderBy(col("streak_days").desc, col("start_day"), col("user_id"))
      .limit(25)
  }

  /** Lead–lag cross-correlation: does the daily CLICK series lead the
    * daily PURCHASE series? Pearson r between (click_t, purchase_{t+l})
    * for l ∈ [−7, 7], each lag over its complete day-joined pair set —
    * every sum BIGINT, r one fixed double expression, so the peak-lag
    * flag is exact. The join is calendar-bounded (~365 days × 15
    * lags); positive peak lag reads "clicks lead purchases". */
  lazy val ccfLeadlag: Q = Q(
    "ccf_leadlag",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |lags AS (SELECT unnest(range(-7, 8)) AS lag),
      |pr AS (SELECT l.lag, a.x, b.y
      |  FROM lags l JOIN daily a ON TRUE
      |  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |mm AS (SELECT lag, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pr GROUP BY lag),
      |r AS (SELECT CAST(lag AS INTEGER) AS lag, c,
      |    floor((c * sxy - CAST(sx AS DOUBLE) * sy)
      |      / sqrt((c * sxx - CAST(sx AS DOUBLE) * sx)
      |           * (c * syy - CAST(sy AS DOUBLE) * sy))
      |      * 1000000 + 0.5) / 1000000 AS ccf
      |  FROM mm)
      |SELECT lag, c AS n_pairs, ccf,
      |  abs(ccf) = (SELECT max(abs(ccf)) FROM r) AS is_peak
      |FROM r ORDER BY lag""".stripMargin) { (s, d) =>
    val daily = ev(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val lags = s.range(-7, 8).select(col("id").as("lag"))
    val a = daily.crossJoin(broadcast(lags))
      .select(col("lag"), col("x"),
        date_add(col("day"), col("lag").cast("int")).as("jday"))
    val b = daily.select(col("day").as("jday"), col("y"))
    val mm = a.join(b, "jday").groupBy("lag")
      .agg(count(lit(1)).as("c"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val r = mm.select(col("lag").cast("int").as("lag"), col("c"),
      (floor((col("c") * col("sxy") - col("sx").cast("double") * col("sy"))
        / sqrt((col("c") * col("sxx") - col("sx").cast("double") * col("sx"))
          * (col("c") * col("syy") - col("sy").cast("double") * col("sy")))
        * 1000000 + lit(0.5)) / 1000000).as("ccf"))
    val mx = r.agg(max(abs(col("ccf"))).as("mxa"))
    r.crossJoin(broadcast(mx))
      .select(col("lag"), col("c").as("n_pairs"), col("ccf"),
        (abs(col("ccf")) === col("mxa")).as("is_peak"))
      .orderBy("lag")
  }

  /** Partial autocorrelation of the daily order-count series at lags
    * 1–3 via the Durbin–Levinson closed forms — q109_acf answers "is
    * there memory?", this answers "how many AR terms does it take?".
    * The ρ inputs reuse acf's exact pair-complete integer sums
    * UNROUNDED; φ22/φ33 are fixed scalar expressions over them on one
    * collapsed row, so both engines agree bit-for-bit before the 1e-6
    * grid. Calendar-bounded pair joins, nothing row-level survives the
    * daily collapse. */
  lazy val pacfLags: Q = Q(
    "pacf_lags",
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM daily),
      |lags AS (SELECT unnest(range(1, 4)) AS lag),
      |pairs AS (SELECT l.lag, a.x AS xa, b.x AS xb
      |  FROM lags l JOIN daily a ON TRUE
      |  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |num AS (SELECT lag, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(xa * xb) AS BIGINT) AS sxy,
      |    CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb
      |  FROM pairs GROUP BY lag),
      |rho AS (SELECT lag,
      |    (sxy - (CAST(sx AS DOUBLE) / n) * (sa + sb)
      |      + c * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |    / (sxx - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |      AS r
      |  FROM num CROSS JOIN tot),
      |p AS (SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
      |    max(CASE WHEN lag = 2 THEN r END) AS r2,
      |    max(CASE WHEN lag = 3 THEN r END) AS r3 FROM rho),
      |dl AS (SELECT r1 AS p1, (r2 - r1 * r1) / (1 - r1 * r1) AS p22,
      |    r1, r2, r3 FROM p),
      |dl2 AS (SELECT p1, p22, r1, r2, r3,
      |    r1 - p22 * r1 AS p21 FROM dl)
      |SELECT floor(p1 * 1000000 + 0.5) / 1000000 AS pacf1,
      |  floor(p22 * 1000000 + 0.5) / 1000000 AS pacf2,
      |  floor((r3 - p21 * r2 - p22 * r1)
      |    / (1 - p21 * r1 - p22 * r2) * 1000000 + 0.5) / 1000000
      |    AS pacf3
      |FROM dl2""".stripMargin) { (s, d) =>
    val daily = ord(s, d).groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val lags = s.range(1, 4).select(col("id").as("lag"))
    val a = daily.crossJoin(broadcast(lags))
      .select(col("lag"), col("x").as("xa"),
        date_add(col("day"), col("lag").cast("int")).as("jday"))
    val b = daily.select(col("day").as("jday"), col("x").as("xb"))
    val num = a.join(b, "jday").groupBy("lag")
      .agg(count(lit(1)).as("c"), sum(col("xa") * col("xb")).as("sxy"),
        sum("xa").as("sa"), sum("xb").as("sb"))
    val mu = col("sx").cast("double") / col("n")
    val rho = num.crossJoin(broadcast(tot))
      .select(col("lag"),
        ((col("sxy") - mu * (col("sa") + col("sb")) + col("c") * mu * mu)
          / (col("sxx") - col("n") * mu * mu)).as("r"))
    val p = rho.agg(max(when(col("lag") === 1, col("r"))).as("r1"),
      max(when(col("lag") === 2, col("r"))).as("r2"),
      max(when(col("lag") === 3, col("r"))).as("r3"))
    val p22 = (col("r2") - col("r1") * col("r1"))
    p.select(col("r1"), col("r2"), col("r3"),
        (p22 / (lit(1) - col("r1") * col("r1"))).as("p22"))
      .withColumn("p21", col("r1") - col("p22") * col("r1"))
      .select((floor(col("r1") * 1000000 + lit(0.5)) / 1000000).as("pacf1"),
        (floor(col("p22") * 1000000 + lit(0.5)) / 1000000).as("pacf2"),
        (floor((col("r3") - col("p21") * col("r2") - col("p22") * col("r1"))
          / (lit(1) - col("p21") * col("r1") - col("p22") * col("r2"))
          * 1000000 + lit(0.5)) / 1000000).as("pacf3"))
  }
}
