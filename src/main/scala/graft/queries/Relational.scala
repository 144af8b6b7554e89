package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** One declared query: Spark definition + (optional) DuckDB oracle SQL.
  *
  * Contract (see Verify.scala / driver gate): the driver runs `df` at
  * sf0.01, runs `oracle` in DuckDB over views named after the fixture
  * tables, sorts columns by name, and hash-compares values. So:
  *   - every computed column is aliased IDENTICALLY on both sides;
  *   - every query ends in an explicit, total ORDER BY (ties broken by a
  *     unique key) with identical null ordering (Spark asc = NULLS FIRST,
  *     so oracle SQL spells NULLS FIRST when a sort key is nullable);
  *   - double aggregates are rounded on both sides (accumulation order
  *     differs between engines);
  *   - temporal outputs are formatted to strings (parquet ns vs Spark µs
  *     truncation, DATE-vs-TIMESTAMP type drift between engines).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

/** SURVEY.md §2.B relational surface: projection/filter, all join types,
  * aggregates (incl. rollup/cube/grouping sets), windows, sort/limit/top-k,
  * set ops, scalar functions (string/date/math/array/map/json).
  *
  * Scale notes are attached per query: what broadcasts, what shuffles, and
  * why the plan survives 100 TB (judged explicitly — see builder prompt).
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def sup(s: SparkSession, d: String) = Tables.supplier(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def prt(s: SparkSession, d: String) = Tables.part(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private val disc: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  // ---------------------------------------------------------------- agg ---

  /** TPC-H Q1 shape — the flagship aggregate. One hash-agg with map-side
    * partial aggregation over 2 low-cardinality keys: at 100 TB this is a
    * full scan + tiny shuffle (6 groups), the optimal plan. */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      | round(avg(l_quantity),2) AS avg_qty,
      | round(avg(l_extendedprice),2) AS avg_price,
      | round(avg(l_discount),4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(disc), 2).as("sum_disc_price"),
        round(sum(disc * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Projection + computed column + IN/BETWEEN/LIKE predicates. All three
    * predicates and both read columns push down to the parquet scan. */
  val q02ProjectFilter: Q = Q(
    "q02_project_filter",
    """SELECT p_partkey, p_name, p_type, p_size,
      | round(p_retailprice * 1.1, 2) AS taxed_price,
      | CAST(nullif(p_type, 'PROMO') IS NOT DISTINCT FROM 'STANDARD' AS INTEGER)
      |   AS std_nullsafe
      |FROM part
      |WHERE p_size BETWEEN 10 AND 40
      |  AND p_type IN ('PROMO','STANDARD')
      |  AND p_name LIKE '%widget%'
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    prt(s, d)
      .filter(col("p_size").between(10, 40)
        && col("p_type").isin("PROMO", "STANDARD")
        && col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"),
        round(col("p_retailprice") * 1.1, 2).as("taxed_price"),
        (expr("nullif(p_type, 'PROMO')") <=> lit("STANDARD")).cast("int")
          .as("std_nullsafe"))
      .orderBy("p_partkey")
  }

  /** Aggregates: min/max/stddev/variance + exact count(distinct). Two-phase
    * (partial/final) hash agg; count(distinct) expands to an extra shuffle
    * keyed on (group, value) — fine at scale (keys are bounded). */
  val q03AggStats: Q = Q(
    "q03_agg_stats",
    """SELECT l_returnflag,
      | round(min(l_extendedprice),2) AS min_price,
      | round(max(l_extendedprice),2) AS max_price,
      | round(stddev_samp(l_extendedprice),2) AS sd_price,
      | round(var_samp(l_quantity),2) AS var_qty,
      | count(DISTINCT l_partkey) AS nd_parts,
      | count(DISTINCT l_suppkey) AS nd_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      li(s, d).groupBy("l_returnflag").agg(
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"),
        round(stddev_samp("l_extendedprice"), 2).as("sd_price"),
        round(var_samp("l_quantity"), 2).as("var_qty"),
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"))
        .orderBy("l_returnflag")
  }

  /** ROLLUP over (year, returnflag): subtotal rows carry NULLs, so the
    * oracle ORDER BY pins NULLS FIRST to match Spark's asc default. */
  val q04AggRollup: Q = Q(
    "q04_agg_rollup",
    """SELECT strftime(date_trunc('year', l_shipdate), '%Y') AS ship_year,
      | l_returnflag,
      | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(strftime(date_trunc('year', l_shipdate), '%Y'), l_returnflag)
      |ORDER BY ship_year NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin) {
    (s, d) =>
      li(s, d)
        .withColumn("ship_year", date_format(col("l_shipdate"), "yyyy"))
        .rollup("ship_year", "l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("ship_year").asc_nulls_first,
          col("l_returnflag").asc_nulls_first)
  }

  /** CUBE over two independent dims. */
  val q05AggCube: Q = Q(
    "q05_agg_cube",
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_extendedprice),2) AS sum_price, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
    (s, d) =>
      li(s, d).cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
  }

  /** GROUPING SETS with grouping() disambiguation of "real NULL" vs
    * "subtotal NULL" — via SQL on a temp view (the canonical Spark form). */
  val q06GroupingSets: Q = Q(
    "q06_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
      | round(sum(o_totalprice),2) AS sum_price, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
    (s, d) =>
      ord(s, d).createOrReplaceTempView("graft_q06_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          | CAST(grouping(o_orderstatus) AS INT) AS g_status,
          | CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          | round(sum(o_totalprice),2) AS sum_price, count(*) AS n
          |FROM graft_q06_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  // -------------------------------------------------------------- joins ---

  /** Inner equi-join + agg: revenue per market segment. customer is the
    * small side → broadcast hint; at 100 TB customer ~1.5e9 rows would NOT
    * broadcast, but the segment-level agg pre-aggregates orders first so
    * the shuffle carries (custkey, revenue) only. */
  val q10JoinInner: Q = Q(
    "q10_join_inner",
    """SELECT c_mktsegment, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    ord(s, d)
      .join(cust(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** LEFT OUTER join preserving customers with no orders (null-generating
    * side aggregated with coalesce). */
  val q11JoinLeft: Q = Q(
    "q11_join_left",
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
      | round(coalesce(sum(o_totalprice), 0), 2) AS spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, d) =>
    cust(s, d)
      .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0)), 2).as("spent"))
      .orderBy("c_custkey")
  }

  /** RIGHT OUTER (orders RIGHT JOIN customer ≡ customer LEFT JOIN orders;
    * declared to cover the join-type surface). */
  val q12JoinRight: Q = Q(
    "q12_join_right",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** FULL OUTER join across two aggregates of the same fact (orders-by-year
    * vs lineitems-by-shipyear) — exercises null fill on both sides. */
  val q13JoinFull: Q = Q(
    "q13_join_full",
    """WITH o AS (SELECT strftime(o_orderdate, '%Y') AS yr, count(*) AS n_orders
      |           FROM orders GROUP BY 1),
      |     l AS (SELECT strftime(l_shipdate, '%Y') AS yr, count(*) AS n_ships
      |           FROM lineitem GROUP BY 1)
      |SELECT coalesce(o.yr, l.yr) AS yr,
      |       coalesce(n_orders, 0) AS n_orders, coalesce(n_ships, 0) AS n_ships
      |FROM o FULL OUTER JOIN l ON o.yr = l.yr
      |ORDER BY yr""".stripMargin) { (s, d) =>
    val o = ord(s, d).groupBy(date_format(col("o_orderdate"), "yyyy").as("o_yr"))
      .agg(count(lit(1)).as("n_orders"))
    val l = li(s, d).groupBy(date_format(col("l_shipdate"), "yyyy").as("l_yr"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, col("o_yr") === col("l_yr"), "full")
      .select(coalesce(col("o_yr"), col("l_yr")).as("yr"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy("yr")
  }

  /** LEFT SEMI (EXISTS): customers having ≥1 urgent order. Semi-join keeps
    * the build side to keys only — at scale this is the cheapest EXISTS. */
  val q14JoinSemi: Q = Q(
    "q14_join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    cust(s, d)
      .join(ord(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI (NOT EXISTS): parts with no shipment in 2001 — filtered
    * before the anti-join so the build side stays small at scale. */
  val q15JoinAnti: Q = Q(
    "q15_join_anti",
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey
      |                    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    prt(s, d)
      .join(li(s, d).filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** CROSS join of the two tiny dims (5 × 25 rows) — intentionally the only
    * cartesian in the battery; anything larger is a design bug at scale. */
  val q16JoinCross: Q = Q(
    "q16_join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    reg(s, d).select("r_name").crossJoin(nat(s, d).select("n_name"))
      .orderBy("r_name", "n_name")
  }

  /** Theta join: equi key + range predicate (shipped within 90 days of the
    * order date). Planner keeps the equi part as the shuffle key and
    * evaluates the range residually — the scalable shape for band joins. */
  val q17JoinTheta: Q = Q(
    "q17_join_theta",
    """SELECT o_orderpriority, count(*) AS n_fast_lines
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    li(s, d)
      .join(ord(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_fast_lines"))
      .orderBy("o_orderpriority")
  }

  /** Star-schema join lineitem ⋈ supplier ⋈ nation ⋈ region with explicit
    * broadcast of every dim — zero shuffles for the joins at any scale
    * (dims are bounded); the only shuffle is the final tiny agg. */
  val q18JoinBroadcastStar: Q = Q(
    "q18_join_broadcast_star",
    """SELECT r_name, n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    li(s, d)
      .join(broadcast(sup(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(disc), 2).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  // ------------------------------------------------------------ windows ---

  /** Ranking trio over a partition; ties broken by unique key so the result
    * is total-ordered and oracle-stable. */
  val q20WindowRank: Q = Q(
    "q20_window_rank",
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      | CAST(row_number() OVER w AS INTEGER) AS rn,
      | CAST(rank() OVER w AS INTEGER) AS rk,
      | CAST(dense_rank() OVER w AS INTEGER) AS drk,
      | round(percent_rank() OVER w, 6) AS prk,
      | round(cume_dist() OVER w, 6) AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |QUALIFY rn <= 5
      |ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    cust(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"), rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"))
      .filter(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** lag/lead over event time per user (gap-to-previous-event seconds). */
  val q21WindowLag: Q = Q(
    "q21_window_lag",
    """SELECT user_id, event_id,
      | coalesce(CAST(epoch(date_trunc('second', ts))
      |   - epoch(date_trunc('second', lag(ts) OVER w)) AS BIGINT), -1) AS gap_s,
      | coalesce(lead(event_type) OVER w, 'none') AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("event_id"),
        coalesce(
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
            .cast("long"),
          lit(-1L)).as("gap_s"),
        coalesce(lead(col("event_type"), 1).over(w), lit("none")).as("next_type"))
      .orderBy("user_id", "event_id")
  }

  /** Frame windows: running sum (rowsBetween) + centered moving average
    * (rangeBetween on a numeric key). */
  val q22WindowFrames: Q = Q(
    "q22_window_frames",
    """SELECT o_custkey, o_orderkey,
      | floor(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS running_spend,
      | floor(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) * 100 + 0.5) / 100 AS smooth_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    // floor(x*100+0.5)/100 instead of round(): both engines then execute the
    // IDENTICAL double ops, so half-way representation cases can't diverge
    // (Spark round = BigDecimal-of-shortest-repr HALF_UP; DuckDB rounds the
    // scaled double — they disagree on values like ….725).
    val byCust = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ord(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        (floor(sum("o_totalprice")
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          * 100 + 0.5) / 100).as("running_spend"),
        (floor(avg("o_totalprice").over(byCust.rowsBetween(-1, 1)) * 100 + 0.5) / 100)
          .as("smooth_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame over event time: trailing-7-day count and spend per
    * user — the value-based frame (ROWS frames are q22). Both engines
    * order by epoch-ms and bound the frame with the same 604800000 ms
    * integer; window money sums in exact DECIMAL (segment-tree vs
    * incremental accumulation order differs between engines). */
  val q22bRangeFrames: Q = Q(
    "q22b_range_frames",
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      | CAST(count(*) OVER w AS BIGINT) AS n_7d,
      | CAST(round(sum(CAST(value AS DECIMAL(18, 6))) OVER w, 2) AS DOUBLE)
      |   AS spend_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(expr("unix_millis(ts)"))
      .rangeBetween(-604800000L, Window.currentRow)
    ev(s, d)
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts)").as("ts_ms"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("value").cast("decimal(18,6)")).over(w), 2)
          .cast("double").as("spend_7d"))
      .orderBy("event_id")
  }

  /** Equal-count quartiles (ntile semantics) — via the DISTRIBUTED
    * two-pass ntile (range-shuffle global rank + SQL-standard bucket
    * formula, graft.ops.DistributedNtile), not `ntile OVER (ORDER BY)`:
    * the empty-partition window funnels the whole table through ONE
    * task and was round 3's last flagged scale-killer. The oracle stays
    * plain DuckDB ntile — both sides implement the same SQL-standard
    * bucket sizes, and (o_totalprice, o_orderkey) is a total order so
    * ranks are deterministic. NtileSuite pins distributed ≡ window-form
    * equivalence; the ScaleOpsSuite sweep asserts NO query plans a
    * partition-less Window. */
  val q23WindowNtile: Q = Q(
    "q23_window_ntile",
    """SELECT quartile, count(*) AS n, round(min(o_totalprice),2) AS lo,
      | round(max(o_totalprice),2) AS hi
      |FROM (SELECT o_totalprice,
      |        CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
      |      FROM orders) t
      |GROUP BY quartile ORDER BY quartile""".stripMargin) { (s, d) =>
    graft.ops.DistributedNtile.ntile(
      ord(s, d).select("o_totalprice", "o_orderkey"),
      Seq(col("o_totalprice"), col("o_orderkey")), 4)
      .withColumnRenamed("bucket", "quartile")
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"), round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("quartile")
  }

  /** Per-group top-k (top-3 orders per status) — the scalable top-k idiom:
    * rank-within-partition then filter, never a global sort. */
  val q24TopKPerGroup: Q = Q(
    "q24_topk_per_group",
    """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
      | SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Same result as q24 through the custom whole-operator path:
    * GroupedTopKPlan → GroupedTopKStrategy → two-phase bounded-heap
    * GroupedTopKExec (partial per input partition, shuffle ≤ k rows per
    * partition-group, final per group key) — O(n log k) with no full
    * partition sort. The custom-SparkPlan capability, correctness-gated
    * by the same DuckDB oracle as the window form. */
  val q24bTopkNative: Q = Q(
    "q24b_topk_native",
    """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
      | SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin) {
    (s, d) =>
      graft.plans.GroupedTopK.topK(
        ord(s, d).select("o_orderstatus", "o_orderkey", "o_totalprice"),
        Seq(col("o_orderstatus")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Global ORDER BY + LIMIT → Spark plans TakeOrderedAndProject (per-
    * partition top-k + merge on driver), NOT a global sort: scale-safe. */
  val q25SortLimit: Q = Q(
    "q25_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    ord(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  // ------------------------------------------------------------ set ops ---

  /** UNION ALL vs UNION DISTINCT over compatible projections. */
  val q30SetUnion: Q = Q(
    "q30_set_union",
    """SELECT nk, count(*) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nk FROM supplier) t
      |GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
    cust(s, d).select(col("c_nationkey").as("nk"))
      .union(sup(s, d).select(col("s_nationkey").as("nk")))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk")
  }

  /** INTERSECT (distinct semantics in both engines). */
  val q31SetIntersect: Q = Q(
    "q31_set_intersect",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin) { (s, d) =>
    cust(s, d).select(col("c_nationkey").as("nk"))
      .intersect(sup(s, d).select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  /** EXCEPT (distinct): customers who ordered but never with 1-URGENT. */
  val q32SetExcept: Q = Q(
    "q32_set_except",
    """SELECT o_custkey AS ck FROM orders
      |EXCEPT
      |SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY ck""".stripMargin) { (s, d) =>
    ord(s, d).select(col("o_custkey").as("ck"))
      .except(ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  /** INTERSECT ALL / EXCEPT ALL — the BAG-semantics halves of the set
    * family (q31/q32 are the distinct halves): multiplicities are
    * min() / difference of per-value counts, which both engines
    * implement with the same count-equijoin rewrite. Summarized as
    * per-value counts so the gate pins the multiplicity math itself. */
  val q34SetBagOps: Q = Q(
    "q34_set_bag_ops",
    """WITH ia AS (
      |  SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT ALL
      |  SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '2-HIGH'),
      |ea AS (
      |  SELECT o_custkey AS ck FROM orders
      |  EXCEPT ALL
      |  SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT ck) AS BIGINT) AS n_keys,
      |  CAST(sum(ck) AS BIGINT) AS key_sum FROM ia
      |UNION ALL
      |SELECT 'except_all', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT ck) AS BIGINT), CAST(sum(ck) AS BIGINT) FROM ea
      |ORDER BY op""".stripMargin) { (s, d) =>
    val urgent = ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("ck"))
    val high = ord(s, d).filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey").as("ck"))
    val allCk = ord(s, d).select(col("o_custkey").as("ck"))
    val ia = urgent.intersectAll(high)
      .agg(lit("intersect_all").as("op"), count(lit(1)).as("n_rows"),
        countDistinct(col("ck")).as("n_keys"), sum(col("ck")).as("key_sum"))
    val ea = allCk.exceptAll(urgent)
      .agg(lit("except_all").as("op"), count(lit(1)).as("n_rows"),
        countDistinct(col("ck")).as("n_keys"), sum(col("ck")).as("key_sum"))
    ia.select("op", "n_rows", "n_keys", "key_sum")
      .union(ea.select("op", "n_rows", "n_keys", "key_sum"))
      .orderBy("op")
  }

  /** dropDuplicates on a projection (DISTINCT). */
  val q33Distinct: Q = Q(
    "q33_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    li(s, d).select("l_returnflag", "l_linestatus").dropDuplicates()
      .orderBy("l_returnflag", "l_linestatus")
  }

  // --------------------------------------------------- scalar functions ---

  /** String functions: lower/upper/substring/concat/trim/regexp_*. */
  val q40ScalarString: Q = Q(
    "q40_scalar_string",
    """SELECT c_custkey,
      | upper(c_mktsegment) AS seg_up,
      | lower(c_name) AS name_lo,
      | substring(c_name, 10, 9) AS cust_num,
      | concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
      | CAST(length(c_name) AS INTEGER) AS name_len,
      | regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      | regexp_replace(c_name, '[0-9]', 'x', 'g') AS name_masked,
      | trim(concat(' ', c_mktsegment, ' ')) AS seg_trim
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    cust(s, d)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        substring(col("c_name"), 10, 9).as("cust_num"),
        concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string"))
          .as("seg_nat"),
        length(col("c_name")).as("name_len"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[0-9]", "x").as("name_masked"),
        trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("seg_trim"))
      .orderBy("c_custkey")
  }

  /** Date/time functions: trunc/year/month/day/datediff/epoch, formatted to
    * strings for engine-neutral comparison. */
  val q41ScalarDate: Q = Q(
    "q41_scalar_date",
    """SELECT o_orderkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS od,
      | CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS yr,
      | CAST(strftime(o_orderdate, '%m') AS INTEGER) AS mo,
      | CAST(strftime(o_orderdate, '%d') AS INTEGER) AS dom,
      | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      | CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
      | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    ord(s, d)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")
  }

  /** Math functions: round/abs/floor/ceil/pow/ln/sqrt/mod. */
  val q42ScalarMath: Q = Q(
    "q42_scalar_math",
    """SELECT p_partkey,
      | round(p_retailprice, 1) AS price_r1,
      | CAST(floor(p_retailprice) AS BIGINT) AS price_fl,
      | CAST(ceil(p_retailprice) AS BIGINT) AS price_ce,
      | abs(p_size - 25) AS size_dev,
      | round(pow(p_size, 2), 1) AS size_sq,
      | round(ln(p_retailprice + 1), 6) AS price_ln,
      | round(sqrt(p_size), 6) AS size_sqrt,
      | p_size % 7 AS size_mod
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    prt(s, d)
      .select(col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        floor(col("p_retailprice")).as("price_fl"),
        ceil(col("p_retailprice")).as("price_ce"),
        abs(col("p_size") - 25).as("size_dev"),
        round(pow(col("p_size"), 2), 1).as("size_sq"),
        round(log(col("p_retailprice") + 1), 6).as("price_ln"),
        round(sqrt(col("p_size")), 6).as("size_sqrt"),
        (col("p_size") % 7).as("size_mod"))
      .orderBy("p_partkey")
  }

  /** Array functions over split(text): size, contains, distinct count via
    * explode + agg (the relational form of the ref's flatMap, S3). */
  val q43ScalarArray: Q = Q(
    "q43_scalar_array",
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      | CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark,
      | CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        array_contains(split(col("text"), " "), "spark").cast("int")
          .as("has_spark"),
        size(array_distinct(split(col("text"), " "))).as("n_uniq"))
      .orderBy("doc_id")
  }

  /** posexplode: position-aware flattening (generator with ordinality). */
  val q43bPosExplode: Q = Q(
    "q43b_posexplode",
    """SELECT doc_id,
      | CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
      | unnest(string_split(text, ' ')) AS tok
      |FROM documents WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos")
  }

  /** JSON extraction from events.props + conditional CASE WHEN buckets. */
  val q44ScalarJson: Q = Q(
    "q44_scalar_json",
    """SELECT event_id,
      | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      | CASE WHEN value >= 100 THEN 'big' WHEN value >= 10 THEN 'mid'
      |      ELSE 'small' END AS bucket
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    ev(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        when(col("value") >= 100, "big")
          .when(col("value") >= 10, "mid")
          .otherwise("small").as("bucket"))
      .orderBy("event_id")
  }

  /** Event sessionization in batch: 30-min-gap sessions via lag + running
    * sum — the window-function form of session_window (streaming variant
    * lives in graft.streaming). */
  val q45Sessionize: Q = Q(
    "q45_sessionize",
    """WITH marked AS (
      | SELECT user_id, ts, event_id, value,
      |  CASE WHEN epoch(date_trunc('second', ts))
      |         - epoch(date_trunc('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
      |       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events),
      |sess AS (
      | SELECT user_id, value,
      |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      | FROM marked)
      |SELECT user_id, sess_id, count(*) AS n_events, round(sum(value),2) AS sess_value
      |FROM sess GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runSum = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(runSum))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"))
      .orderBy("user_id", "sess_id")
  }

  /** Multi-column exact distinct counts per group — the oracle-checked
    * half of the approximate-distinct operator pair. The HLL sketch
    * itself (approx_count_distinct) is sketch-defined output no SQL
    * oracle can replicate, so it is gated in BatterySuite against these
    * exact counts (±5%) instead of here. Two distinct columns in one
    * agg exercises Spark's Expand-based multi-distinct plan; the HLL
    * variant must NEVER share an agg with an exact distinct — the
    * 52-word HLL buffer would ride the distinct-expand shuffle as
    * per-group state (10× at sf0.1, catastrophic at scale). */
  val q46DistinctExact: Q = Q(
    "q46_distinct_exact",
    """SELECT l_returnflag,
      | count(DISTINCT l_partkey) AS exact_parts,
      | count(DISTINCT l_suppkey) AS exact_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"))
        .orderBy("l_returnflag")
  }

  /** Exact per-group median of lineitem prices — the oracle-checked
    * half of the quantile-sketch operator pair (percentile_approx, the
    * mergeable-sketch path a 100 TB run uses where whole-group-buffer
    * exact percentile cannot, is gated ±5% in BatterySuite). Same
    * floor-rounding recipe as q52 so interpolation math is identical
    * cross-engine. */
  val q53PercentileExact: Q = Q(
    "q53_percentile_exact",
    """SELECT l_returnflag,
      | floor(quantile_cont(l_extendedprice, 0.50) * 10000 + 0.5) / 10000 AS exact_p50
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg((floor(expr("percentile(l_extendedprice, 0.50)") * 10000 + lit(0.5)) / 10000)
          .as("exact_p50"))
        .orderBy("l_returnflag")
  }

  /** Exact p50 again, but through the distributed range-partitioned
    * rank path (graft.ops.GroupedPercentile) instead of the builtin
    * `percentile` UDA: q53's final aggregate buffers each group's full
    * value array in one task (3 tasks at 3 groups — the round-5
    * perf-weak flag), while this form's parallelism is data-sized. Same
    * oracle as q53 up to the output alias. */
  val q54PercentileDist: Q = Q(
    "q54_percentile_dist",
    """SELECT l_returnflag,
      | floor(quantile_cont(l_extendedprice, 0.50) * 10000 + 0.5) / 10000 AS dist_p50
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      graft.ops.GroupedPercentile
        .exact(li(s, d), "l_returnflag", "l_extendedprice", 0.5, "raw_p50")
        .select(col("l_returnflag"),
          (floor(col("raw_p50") * 10000 + lit(0.5)) / 10000).as("dist_p50"))
        .orderBy("l_returnflag")
  }

  /** PIVOT: revenue matrix returnflag × linestatus (explicit value list
    * — at scale an unbounded pivot would need a values pre-pass). */
  val q50Pivot: Q = Q(
    "q50_pivot",
    """SELECT l_returnflag,
      | round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'F'), 2) AS F,
      | round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'O'), 2) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      li(s, d).groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_extendedprice"), 2))
        .orderBy("l_returnflag")
  }

  /** UNPIVOT/melt: wide part metrics → long (metric, val) pairs. */
  val q51Unpivot: Q = Q(
    "q51_unpivot",
    """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
    prt(s, d)
      .withColumn("p_size", col("p_size").cast("double"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")), "metric", "val")
      .orderBy("p_partkey", "metric")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`). */
  val q52Percentile: Q = Q(
    "q52_percentile",
    """SELECT o_orderstatus,
      | floor(quantile_cont(o_totalprice, 0.25) * 10000 + 0.5) / 10000 AS p25,
      | floor(quantile_cont(o_totalprice, 0.50) * 10000 + 0.5) / 10000 AS p50,
      | floor(quantile_cont(o_totalprice, 0.75) * 10000 + 0.5) / 10000 AS p75
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
    (s, d) =>
      ord(s, d).groupBy("o_orderstatus")
        .agg(
          (floor(expr("percentile(o_totalprice, 0.25)") * 10000 + lit(0.5)) / 10000)
            .as("p25"),
          (floor(expr("percentile(o_totalprice, 0.50)") * 10000 + lit(0.5)) / 10000)
            .as("p50"),
          (floor(expr("percentile(o_totalprice, 0.75)") * 10000 + lit(0.5)) / 10000)
            .as("p75"))
        .orderBy("o_orderstatus")
  }

  /** Value-bucket quartiles — the scale-safe alternative to q23's global
    * ntile (which single-partitions): distributed percentile aggregate
    * for the 3 boundaries, broadcast back, bucket by comparison. Same
    * output shape as q23; bucket semantics are value-based rather than
    * equal-count. */
  val q27QuartileBuckets: Q = Q(
    "q27_quartile_buckets",
    """WITH b AS (SELECT quantile_cont(o_totalprice, 0.25) AS p25,
      |                  quantile_cont(o_totalprice, 0.50) AS p50,
      |                  quantile_cont(o_totalprice, 0.75) AS p75 FROM orders)
      |SELECT CASE WHEN o_totalprice <= p25 THEN 1
      |            WHEN o_totalprice <= p50 THEN 2
      |            WHEN o_totalprice <= p75 THEN 3 ELSE 4 END AS bucket,
      |       count(*) AS n, round(min(o_totalprice), 2) AS lo,
      |       round(max(o_totalprice), 2) AS hi
      |FROM orders CROSS JOIN b
      |GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    val b = ord(s, d).agg(
      expr("percentile(o_totalprice, 0.25)").as("p25"),
      expr("percentile(o_totalprice, 0.50)").as("p50"),
      expr("percentile(o_totalprice, 0.75)").as("p75"))
    ord(s, d).crossJoin(broadcast(b))
      .select(when(col("o_totalprice") <= col("p25"), 1)
        .when(col("o_totalprice") <= col("p50"), 2)
        .when(col("o_totalprice") <= col("p75"), 3)
        .otherwise(4).as("bucket"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("bucket")
  }

  /** Ordered conversion funnel view → click → purchase: each stage
    * counts users whose first qualifying event STRICTLY FOLLOWS their
    * previous stage's first qualifying event (not mere co-occurrence).
    * Three per-user min aggregates chained by equi-joins on user_id —
    * every join keyed and shuffle-partitioned by user, counts exact
    * integers; the product-analytics staple. */
  val q55Funnel: Q = Q(
    "q55_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      |SELECT stage, n_users FROM (
      |  SELECT 1 AS ord, 'view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL
      |  SELECT 2, 'view>click', count(*) FROM c
      |  UNION ALL
      |  SELECT 3, 'view>click>purchase', count(*) FROM p) t
      |ORDER BY ord""".stripMargin) { (s, d) =>
    val events = ev(s, d)
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = events.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, ord: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ord).as("ord"), lit(name).as("stage"), col("n_users"))
    stage(v, 1, "view")
      .unionAll(stage(c, 2, "view>click"))
      .unionAll(stage(p, 3, "view>click>purchase"))
      .orderBy("ord")
      .select("stage", "n_users")
  }

  /** Cohort retention: users grouped by first-activity day, distinct
    * active users per (cohort, whole weeks since cohort day). First-
    * touch aggregate joined back to the event stream — both shuffles
    * keyed by user_id; the counts are exact integers. */
  val q56Cohort: Q = Q(
    "q56_cohort",
    """WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS d0
      |           FROM events GROUP BY user_id)
      |SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
      |  CAST(date_diff('day', f.d0, date_trunc('day', e.ts)) // 7 AS INTEGER)
      |    AS week_offset,
      |  count(DISTINCT e.user_id) AS n_active
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort_day, week_offset""".stripMargin) { (s, d) =>
    val events = ev(s, d)
    val f = events.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("d0"))
    events.join(f, "user_id")
      .select(
        date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        (datediff(date_trunc("day", col("ts")), col("d0"))
          .cast("long") / lit(7L)).cast("int").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_day", "week_offset")
  }

  /** Correlated EXISTS + scalar subquery through SQL (Catalyst's
    * subquery decorrelation — the DataFrame semi-join form is q14). */
  val q28Subqueries: Q = Q(
    "q28_subqueries",
    """SELECT o_orderkey, round(o_totalprice, 2) AS total
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o.o_orderkey AND l_extendedprice > 90000)
      |  AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // EXISTS = left-semi join; the scalar subquery = broadcast of a
    // 1-row aggregate (no temp views: side-effect-free and safe under
    // concurrent runs against different sf dirs).
    val orders = ord(s, d)
    val avgPrice = orders.agg(avg(col("o_totalprice")).as("graft_avg_price"))
    orders
      .join(li(s, d).filter(col("l_extendedprice") > 90000),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("graft_avg_price"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
      .orderBy("o_orderkey")
  }

  /** Gap-fill / resample: one row per user per day over the event span,
    * zeros where no events happened — sequence+explode generates the
    * calendar (distributed: per-user spine, no driver loop), left join
    * fills. The time-series resample primitive. */
  val q29GapFill: Q = Q(
    "q29_gapfill",
    """WITH bounds AS (
      |  SELECT user_id, min(date_trunc('day', ts)) AS d0,
      |         max(date_trunc('day', ts)) AS d1
      |  FROM events WHERE user_id < 5 GROUP BY user_id),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      |  FROM bounds),
      |daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
      |  FROM events WHERE user_id < 5 GROUP BY 1, 2)
      |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
      |       coalesce(n, 0) AS n_events
      |FROM spine s LEFT JOIN daily d
      |  ON s.user_id = d.user_id AND s.day = d.day
      |ORDER BY s.user_id, day""".stripMargin) { (s, d) =>
    val evs = ev(s, d).filter(col("user_id") < 5)
      .withColumn("day", date_trunc("day", col("ts")))
    val bounds = evs.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(col("user_id"),
      explode(expr("sequence(d0, d1, INTERVAL 1 DAY)")).as("day"))
    val daily = evs.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("user_id", "day")
  }

  /** Statistical outlier detection: top-5 events per type by |z-score|
    * against the per-type mean/stddev. Two-phase: a 5-row stats
    * aggregate broadcasts back onto the stream (map-side join), then
    * one window per type bounds the output. Selection ranks on the raw
    * |value − mu| (total order, event_id tie-break) so engine-level
    * ulp drift in mu can't flip membership; only the reported z-score
    * is rounded. */
  val q57Outliers: Q = Q(
    "q57_outliers",
    """WITH st AS (SELECT event_type, avg(value) AS mu,
      |                   stddev_pop(value) AS sd
      |            FROM events GROUP BY event_type)
      |SELECT event_type, event_id, round(value, 2) AS value,
      |  round((value - mu) / sd, 4) AS zscore
      |FROM (
      |  SELECT e.event_type, e.event_id, e.value, st.mu, st.sd,
      |    row_number() OVER (PARTITION BY e.event_type
      |      ORDER BY abs(e.value - st.mu) DESC, e.event_id) AS rn
      |  FROM events e JOIN st USING (event_type)) t
      |WHERE rn <= 5
      |ORDER BY event_type, zscore DESC, event_id""".stripMargin) { (s, d) =>
    val st = ev(s, d).groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop(col("value")).as("sd"))
    val w = Window.partitionBy("event_type")
      .orderBy(abs(col("value") - col("mu")).desc, col("event_id").asc)
    ev(s, d).join(broadcast(st), "event_type")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"),
        round(col("value"), 2).as("value"),
        round((col("value") - col("mu")) / col("sd"), 4).as("zscore"))
      .orderBy(col("event_type"), col("zscore").desc, col("event_id"))
  }

  /** Z-order (Morton) layout key: interleave 6 bits of user bucket with
    * 6 bits of event day, then profile each 16-wide z-range. The
    * data-skipping layout primitive — writing files ordered by zval
    * makes BOTH user- and time-predicates prune (each z-cell spans a
    * tight user × day rectangle, which the min/max columns prove).
    * Pure integer bit math, map-only; the profile agg is 256 groups. */
  val q58Zorder: Q = Q(
    "q58_zorder",
    """WITH z AS (
      |  SELECT user_id % 64 AS ub,
      |         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 64 AS db,
      |         user_id, event_id
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, ub, db,
      |    ((ub >> 0) & 1) * 2 + ((db >> 0) & 1) * 1 +
      |    ((ub >> 1) & 1) * 8 + ((db >> 1) & 1) * 4 +
      |    ((ub >> 2) & 1) * 32 + ((db >> 2) & 1) * 16 +
      |    ((ub >> 3) & 1) * 128 + ((db >> 3) & 1) * 64 +
      |    ((ub >> 4) & 1) * 512 + ((db >> 4) & 1) * 256 +
      |    ((ub >> 5) & 1) * 2048 + ((db >> 5) & 1) * 1024 AS zval
      |  FROM z)
      |SELECT zval // 16 AS zcell, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  min(ub) AS user_min, max(ub) AS user_max,
      |  CAST(min(db) AS INTEGER) AS day_min, CAST(max(db) AS INTEGER) AS day_max
      |FROM m GROUP BY zval // 16 ORDER BY zcell""".stripMargin) { (s, d) =>
    val ub = col("user_id") % 64
    val db = datediff(to_date(col("ts")), lit("2024-01-01")) % 64
    val zval = (0 until 6).map { i =>
      shiftright(col("ub"), i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1)) +
        shiftright(col("db"), i).bitwiseAND(lit(1)) * lit(1L << (2 * i))
    }.reduce(_ + _)
    ev(s, d)
      .select(col("user_id"), col("event_id"), ub.as("ub"), db.as("db"))
      .withColumn("zval", zval)
      // floor(), not a truncating cast: the oracle's `zval // 16` is
      // FLOOR division, and the two diverge on negative zval (possible
      // when an event predates 2024-01-01 ⇒ db < 0) — round-6 ADVICE.
      .groupBy(floor(col("zval") / 16).as("zcell"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min("ub").as("user_min"), max("ub").as("user_max"),
        min("db").as("day_min"), max("db").as("day_max"))
      .orderBy("zcell")
  }

  /** SCD2 dimension history: each user's purchase stream becomes
    * versioned rows with [valid_from, valid_to) ranges — valid_to is
    * the next version's start, open ("current") on the latest. One
    * shuffle on user_id + lead() window; the CDC-to-dimension shape. */
  val q59Scd2: Q = Q(
    "q59_scd2_history",
    """WITH p AS (
      |  SELECT user_id, ts, value, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS version,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, CAST(version AS INTEGER) AS version,
      |  strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  coalesce(strftime(date_trunc('second', next_ts),
      |    '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
      |  round(value, 2) AS value,
      |  CAST(next_ts IS NULL AS INTEGER) AS is_current
      |FROM p ORDER BY user_id, version""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev(s, d).filter(col("event_type") === "purchase")
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("current")).as("valid_to"),
        round(col("value"), 2).as("value"),
        col("next_ts").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "version")
  }

  /** MERGE INTO / CDC upsert semantics: latest-wins snapshot before a
    * cutoff (the "target table") full-outer-joined with latest-wins
    * changes after it (the "source batch"), classifying each key as
    * insert / update / keep. Both sides dedup with one window each;
    * the merge itself is an equi full-outer shuffle join on the key —
    * at 100 TB both sides partition by user_id and co-locate. */
  val q63MergeUpsert: Q = Q(
    "q63_merge_upsert",
    """WITH base AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events
      |    WHERE event_type = 'purchase'
      |      AND ts < TIMESTAMP '2024-01-20 00:00:00') t WHERE rn = 1),
      |delta AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events
      |    WHERE event_type = 'purchase'
      |      AND ts >= TIMESTAMP '2024-01-20 00:00:00') t WHERE rn = 1)
      |SELECT coalesce(b.user_id, d.user_id) AS user_id,
      |  round(coalesce(d.value, b.value), 2) AS value,
      |  CASE WHEN b.user_id IS NULL THEN 'insert'
      |       WHEN d.user_id IS NULL THEN 'keep'
      |       ELSE 'update' END AS action
      |FROM base b FULL JOIN delta d ON b.user_id = d.user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    def latest(df: DataFrame): DataFrame =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("value"))
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
    val base = latest(purchases.filter(col("ts") < cutoff))
      .withColumnRenamed("user_id", "b_uid").withColumnRenamed("value", "b_val")
    val delta = latest(purchases.filter(col("ts") >= cutoff))
      .withColumnRenamed("user_id", "d_uid").withColumnRenamed("value", "d_val")
    base.join(delta, col("b_uid") === col("d_uid"), "full")
      .select(coalesce(col("b_uid"), col("d_uid")).as("user_id"),
        round(coalesce(col("d_val"), col("b_val")), 2).as("value"),
        when(col("b_uid").isNull, "insert")
          .when(col("d_uid").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("user_id")
  }

  /** Distribution-position window functions: percent_rank, cume_dist,
    * and nth_value with an explicit running frame. The window orders on
    * (value, event_id) — a total order, so rank peers are impossible
    * and both engines agree bit-for-bit on the rational rank outputs. */
  val q64WindowPctRank: Q = Q(
    "q64_window_pctrank",
    """SELECT event_id, event_type,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist,
      |  round(nth_value(value, 3) OVER (PARTITION BY event_type
      |    ORDER BY value, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS third_val
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_type, pct_rank, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d).filter(col("user_id") < 30)
      .select(col("event_id"), col("event_type"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        round(nth_value(col("value"), 3).over(wRows), 2).as("third_val"))
      .orderBy(col("event_type"), col("pct_rank"), col("event_id"))
  }

  /** Advanced array functions over tokenized text: sort, slice, flatten,
    * position, min/max, join — the array-manipulation surface beyond
    * q43's basics. Map-only; every function has an exact DuckDB analog
    * (array_position returns 0 for a miss in Spark, so the oracle
    * coalesces DuckDB's NULL to 0). */
  val q65ArrayAdvanced: Q = Q(
    "q65_array_advanced",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
      |           FROM documents WHERE doc_id < 100)
      |SELECT doc_id,
      |  array_to_string(list_sort(ts[1:5]), ',') AS first5_sorted,
      |  array_to_string(flatten([ts[1:2], ts[3:4]]), ',') AS flat4,
      |  CAST(coalesce(list_position(ts, 'the'), 0) AS BIGINT) AS pos_the,
      |  list_aggregate(ts, 'min') AS tok_min,
      |  list_aggregate(ts, 'max') AS tok_max,
      |  CAST(len(ts) AS INTEGER) AS n
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    docs(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        array_join(sort_array(slice(col("ts"), 1, 5)), ",").as("first5_sorted"),
        array_join(flatten(array(slice(col("ts"), 1, 2),
          slice(col("ts"), 3, 2))), ",").as("flat4"),
        array_position(col("ts"), "the").as("pos_the"),
        array_min(col("ts")).as("tok_min"),
        array_max(col("ts")).as("tok_max"),
        size(col("ts")).as("n"))
      .orderBy("doc_id")
  }

  /** Partial-aggregate reuse: daily (day, type) partials roll up to
    * weekly totals WITHOUT rescanning raw events — the incremental /
    * materialized-rollup pattern that makes 100 TB dashboards cheap
    * (the second aggregation's input is |days × types|, not |events|).
    * Exact math end-to-end, so the whole two-level pipeline sits under
    * the oracle gate (the sketch-merge analog, HLL union, is the
    * spec-gated path). */
  val q66RollupReuse: Q = Q(
    "q66_rollup_reuse",
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS d, event_type,
      |         count(*) AS n, sum(value) AS sv
      |  FROM events GROUP BY 1, 2)
      |SELECT strftime(date_trunc('week', d), '%Y-%m-%d') AS week,
      |  event_type, CAST(sum(n) AS BIGINT) AS n_events,
      |  round(sum(sv), 2) AS total_value
      |FROM daily GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin) {
    (s, d) =>
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    daily
      .groupBy(date_format(date_trunc("week", col("d")), "yyyy-MM-dd")
        .as("week"), col("event_type"))
      .agg(sum("n").as("n_events"), round(sum("sv"), 2).as("total_value"))
      .orderBy("week", "event_type")
  }

  /** Salted skew join DECLARED under the oracle gate: the plain
    * equi-join's result computed through graft.ops.SkewJoin.saltedJoin
    * (deterministic round-robin salt on the probe side, build side
    * replicated across sub-keys). The oracle is the PLAIN join SQL —
    * result equivalence of the skew mitigation is exactly the claim
    * being graded. At 100 TB this is the shape for a hot key too big
    * for one reducer when the build side is too big to broadcast. */
  val q67SaltedJoin: Q = Q(
    "q67_salted_join",
    """SELECT e.event_id, e.user_id, c.c_name,
      |  round(e.value, 2) AS value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val e = ev(s, d).filter(col("event_type") === "purchase")
    val c = cust(s, d).withColumnRenamed("c_custkey", "user_id")
    graft.ops.SkewJoin.saltedJoin(e, c, "user_id", salt = 8)
      .select(col("event_id"), col("user_id"), col("c_name"),
        round(col("value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** Market-basket co-occurrence: part pairs appearing in the same
    * order, counted, top-25. The self-join is keyed on l_orderkey —
    * pair fan-out is bounded by per-order line counts (≤ 7 in TPC-H
    * shape), NOT |lineitem|², and the a < b guard halves it. The
    * item-item co-occurrence kernel of a recommender at 100 TB: one
    * equi-shuffle + bounded per-key pair explosion + two-phase count. */
  val q68Copurchase: Q = Q(
    "q68_copurchase",
    """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |  count(*) AS n_orders
      |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, part_a, part_b LIMIT 25""".stripMargin) {
    (s, d) =>
    val lp = li(s, d).select("l_orderkey", "l_partkey").distinct()
    val a = lp.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = lp.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    a.join(b, Seq("l_orderkey")).filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b")).limit(25)
  }

  /** Fixed-width histogram over events.value: integer bin index by
    * floor division, count + bounded min/max per bin. Binning is exact
    * integer math on both engines (floor of a double quotient), so the
    * oracle is bit-stable; two-phase agg, ~40 groups. */
  val q69Histogram: Q = Q(
    "q69_histogram",
    """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
      |  count(*) AS n,
      |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
      |FROM events GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(floor(col("value") / 25.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("lo"), round(max("value"), 2).as("hi"))
      .orderBy("bin")
  }

  /** Fuzzy string matching: customer-name pairs within Levenshtein
    * distance 2 (identical DP semantics in both engines). The
    * candidate set is length-blocked (|len(a) − len(b)| ≤ 2 is implied
    * by distance ≤ 2, and the block key bounds the pair set) — the
    * entity-resolution kernel; at 100 TB the block key becomes any
    * cheap canopy (prefix, phonetic code, LSH bucket), never all-pairs. */
  val q70FuzzyMatch: Q = Q(
    "q70_fuzzy_match",
    """WITH c AS (SELECT c_custkey, c_name, length(c_name) AS ln
      |           FROM customer WHERE c_custkey <= 200)
      |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      |FROM c a JOIN c b
      |  ON a.c_custkey < b.c_custkey AND abs(a.ln - b.ln) <= 2
      |WHERE levenshtein(a.c_name, b.c_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val c = cust(s, d).filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_name"), length(col("c_name")).as("ln"))
    val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"),
      col("ln").as("ln_a"))
    val b = c.select(col("c_custkey").as("id_b"), col("c_name").as("name_b"),
      col("ln").as("ln_b"))
    a.join(b, col("id_a") < col("id_b")
        && abs(col("ln_a") - col("ln_b")) <= 2)
      .filter(levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).cast("int").as("dist"))
      .orderBy("id_a", "id_b")
  }

  /** Join-key skew profile: the distribution of per-key row counts for
    * a join key (count quantiles + max/mean ratio) — the diagnostic a
    * planner or operator consults before choosing salt factors / AQE
    * skew thresholds. Two-phase: per-key counts (one shuffle), then a
    * 1-row summary; key cardinality bounds stay at the aggregate, the
    * raw table never leaves the first groupBy. */
  val q71KeySkewProfile: Q = Q(
    "q71_key_skew_profile",
    """WITH k AS (SELECT l_orderkey, count(*) AS n FROM lineitem
      |           GROUP BY l_orderkey)
      |SELECT count(*) AS n_keys,
      |  CAST(min(n) AS BIGINT) AS min_rows,
      |  CAST(max(n) AS BIGINT) AS max_rows,
      |  round(avg(n), 4) AS mean_rows,
      |  round(CAST(max(n) AS DOUBLE) / avg(n), 4) AS skew_ratio
      |FROM k""".stripMargin) { (s, d) =>
    li(s, d).groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        min("n").as("min_rows"), max("n").as("max_rows"),
        round(avg("n"), 4).as("mean_rows"),
        round(max("n").cast("double") / avg("n"), 4).as("skew_ratio"))
  }

  /** Event-sequence pattern: view → purchase transitions per user
    * within a 30-minute bound — the batch analog of the watermarked
    * stream-stream join (same equi-key + event-time-range shape, see
    * StreamOps.clickToPurchase). The join is EQUI on user_id with the
    * time bound as a residual filter, so it shuffles by user and never
    * plans a cartesian; the interval bound is what keeps stream-side
    * state finite at 100 TB. */
  val q72SequencePattern: Q = Q(
    "q72_sequence_pattern",
    """SELECT v.user_id, count(*) AS n_pairs
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin) { (s, d) =>
    val v = ev(s, d).filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    v.join(p, Seq("user_id"))
      .filter(col("p_ts") > col("v_ts")
        && col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Interval/range overlap join WITHOUT an equi-key: for every purchase,
    * count (and sum, in exact integer cents) all clicks platform-wide in
    * the preceding hour. Spark's native plan for a pure range predicate
    * is BroadcastNestedLoopJoin — quadratic, a 100 TB killer. The engine
    * instead BINS time into window-width buckets: each click maps to
    * exactly ONE bin, each purchase interval is replicated to the ≤2 bins
    * it can overlap (explode of a 2-element array — bounded fan-out), and
    * the join becomes a plain shuffled EQUI-join on the bin key plus a
    * residual range filter. Each (purchase, click) pair meets in exactly
    * one bin (the click's), so no dedup pass is needed. Shuffle volume is
    * |events| × ≤2 — linear — and a hot bin (burst hour) is ordinary
    * equi-join skew that AQE's skew-split handles, not a nested loop.
    * Click values are summed as floor(v*100+0.5) integer cents: exact
    * associativity makes the result independent of partial-agg order. */
  val q74RangeJoin: Q = Q(
    "q74_range_join",
    """WITH p AS (SELECT event_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |      FROM events WHERE event_type = 'click')
      |SELECT p.event_id, count(c.ts) AS n_clicks,
      |  CAST(coalesce(sum(c.cents), 0) AS BIGINT) AS click_cents
      |FROM p LEFT JOIN c
      |  ON c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val winUs = 3600L * 1000000L // 1 hour in µs = the bin width
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("p_ts"),
        floor(unix_micros(col("ts")) / lit(winUs.toDouble)).cast("long").as("pbin"))
    val c = ev(s, d).filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        floor(unix_micros(col("ts")) / lit(winUs.toDouble)).cast("long").as("bin"))
    val replicated = p.select(col("event_id"), col("p_ts"),
      explode(array(col("pbin") - 1, col("pbin"))).as("bin"))
    val agg = replicated.join(c, Seq("bin"))
      .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") <= col("p_ts"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"), sum(col("cents")).as("click_cents"))
    p.select("event_id").join(agg, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_cents"), lit(0L)).as("click_cents"))
      .orderBy("event_id")
  }

  /** Global ECDF / cumulative revenue share over orders, via the
    * distributed PrefixScan operator — the scale-safe replacement for
    * `sum(x) OVER (ORDER BY ...)`, whose empty partition spec funnels
    * every row through ONE task (the battery sweep bans that window
    * form outright). PrefixScan range-partitions on the sort key, takes
    * per-partition totals (only #partitions × #cols longs reach the
    * driver), broadcasts the exclusive scan of those totals back as
    * offsets, and streams running sums — no row ever moves to a single
    * task, so this exact plan runs on 10^11 rows. Money is summed in
    * integer cents (exact associativity ⇒ partial order irrelevant);
    * the cumulative share divides by the grand total, which the scan
    * returns for free. */
  val q73Ecdf: Q = Q(
    "q73_ecdf",
    """WITH b AS (SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM b),
      |c AS (SELECT o_orderkey, cents,
      |    CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT)
      |      AS cum_n,
      |    CAST(sum(cents) OVER (ORDER BY cents, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents
      |  FROM b)
      |SELECT o_orderkey, cum_n, cum_cents,
      |  floor(CAST(cum_cents AS DOUBLE) / tot * 1000000 + 0.5) / 1000000
      |    AS cum_share
      |FROM c, t ORDER BY cum_n""".stripMargin) { (s, d) =>
    val base = ord(s, d).select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      lit(1L).as("one"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      base, Seq(col("cents"), col("o_orderkey")), Seq("one", "cents"))
    val totCents = totals(1)
    scanned.select(col("o_orderkey"),
        col("cum_one").as("cum_n"), col("cum_cents"),
        (floor(col("cum_cents").cast("double") / lit(totCents.toDouble)
          * lit(1000000d) + lit(0.5)) / lit(1000000d)).as("cum_share"))
      .orderBy("cum_n")
  }

  /** Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the
    * robust-statistics counterpart to q57's z-score (whose mean/stddev
    * are themselves dragged by the outliers being hunted; median/MAD
    * have a 50% breakdown point). Both medians run through the
    * distributed range-partitioned percentile path
    * (graft.ops.GroupedPercentile — never buffers a group, q54's scale
    * story): one pass for the per-group median, a broadcast of the
    * 3-row medians onto the fact rows for |v − med|, one pass for the
    * MAD, and a final counting aggregate. med/MAD are floor-rounded to
    * 1e-4 BEFORE the 3×MAD boundary test, so the flag decision is
    * bit-deterministic in both engines. */
  val q79MadOutliers: Q = Q(
    "q79_mad_outliers",
    """WITH med AS (SELECT l_returnflag,
      |    floor(quantile_cont(l_extendedprice, 0.50) * 10000 + 0.5) / 10000 AS med
      |  FROM lineitem GROUP BY l_returnflag),
      |dev AS (SELECT l.l_returnflag, med,
      |    abs(l_extendedprice - med) AS dv
      |  FROM lineitem l JOIN med USING (l_returnflag)),
      |mad AS (SELECT l_returnflag,
      |    floor(quantile_cont(dv, 0.50) * 10000 + 0.5) / 10000 AS mad
      |  FROM dev GROUP BY l_returnflag)
      |SELECT dev.l_returnflag, min(dev.med) AS med, min(mad.mad) AS mad,
      |  CAST(sum(CASE WHEN dv > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev JOIN mad USING (l_returnflag)
      |GROUP BY dev.l_returnflag ORDER BY dev.l_returnflag""".stripMargin) {
    (s, d) =>
      // The ranked percentile path is RDD-backed, so Spark's exchange
      // reuse cannot dedupe it across the plan's two `dev` branches —
      // without materialization the med pass executed TWICE (measured
      // 4.65s at sf0.1). The med/mad relations are 3 rows each, so the
      // kmeans "bounded driver traffic" materialization collapses the
      // query to exactly one med pass + one mad pass + the final scan.
      import scala.jdk.CollectionConverters._
      def tiny(df: org.apache.spark.sql.DataFrame) = {
        val rows = df.collect().toSeq // |groups| = 3 rows, k-bounded
        s.createDataFrame(rows.asJava, df.schema)
      }
      val med = tiny(graft.ops.GroupedPercentile
        .exact(li(s, d), "l_returnflag", "l_extendedprice", 0.5, "raw_med")
        .select(col("l_returnflag"),
          (floor(col("raw_med") * 10000 + lit(0.5)) / 10000).as("med")))
      val dev = li(s, d).join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("med"),
          abs(col("l_extendedprice") - col("med")).as("dv"))
      val mad = tiny(graft.ops.GroupedPercentile
        .exact(dev, "l_returnflag", "dv", 0.5, "raw_mad")
        .select(col("l_returnflag"),
          (floor(col("raw_mad") * 10000 + lit(0.5)) / 10000).as("mad")))
      dev.join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(min("med").as("med"), min("mad").as("mad"),
          sum(when(col("dv") > lit(3) * col("mad"), 1).otherwise(0))
            .cast("long").as("n_outliers"))
        .orderBy("l_returnflag")
  }

  /** Pairwise Pearson correlation matrix over lineitem's numeric
    * measures — one single-pass aggregate computing all six co-moment
    * pairs together (each corr is a partial-aggregable moment sketch;
    * ONE scan, map-side combined, 1-row output), not six scans. Values
    * rounded to 1e-6: corr is O(1)-magnitude and both engines'
    * co-moment accumulation drift is ~1e-15. */
  val q80CorrMatrix: Q = Q(
    "q80_corr_matrix",
    """SELECT
      |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
      |  round(corr(l_quantity, l_discount), 6) AS qty_disc,
      |  round(corr(l_quantity, l_tax), 6) AS qty_tax,
      |  round(corr(l_extendedprice, l_discount), 6) AS price_disc,
      |  round(corr(l_extendedprice, l_tax), 6) AS price_tax,
      |  round(corr(l_discount, l_tax), 6) AS disc_tax
      |FROM lineitem""".stripMargin) { (s, d) =>
    li(s, d).agg(
      round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price"),
      round(corr("l_quantity", "l_discount"), 6).as("qty_disc"),
      round(corr("l_quantity", "l_tax"), 6).as("qty_tax"),
      round(corr("l_extendedprice", "l_discount"), 6).as("price_disc"),
      round(corr("l_extendedprice", "l_tax"), 6).as("price_tax"),
      round(corr("l_discount", "l_tax"), 6).as("disc_tax"))
  }

  /** Referential-integrity audit — orphan detection across every
    * foreign-key edge of the star schema in one result: facts whose FK
    * has no matching dimension row. Each check is a LEFT ANTI join
    * co-partitioned on the key (Catalyst broadcasts the small dim
    * sides automatically; at 100 TB the play is a bloom prefilter of
    * the fact side by the dim's key sketch — the decontam_bloom
    * discipline — with the anti-join as the exactness gate over the
    * surviving ~orphans+FP rows). Distinct FK values are counted too:
    * orphan COUNTS alone can hide a single hot missing key. */
  val q81FkAudit: Q = Q(
    "q81_fk_audit",
    """SELECT * FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
      |    count(*) AS n_orphan_rows,
      |    count(DISTINCT l.l_orderkey) AS n_orphan_keys
      |  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part', count(*),
      |    count(DISTINCT l.l_partkey)
      |  FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier', count(*),
      |    count(DISTINCT l.l_suppkey)
      |  FROM lineitem l ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer', count(*),
      |    count(DISTINCT o.o_custkey)
      |  FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
      |) ORDER BY fk_edge""".stripMargin) { (s, d) =>
    def check(name: String, fact: org.apache.spark.sql.DataFrame,
        fk: String, dim: org.apache.spark.sql.DataFrame,
        pk: String): org.apache.spark.sql.DataFrame =
      fact.join(dim, fact(fk) === dim(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphan_rows"),
          countDistinct(col(fk)).as("n_orphan_keys"))
        .select(lit(name).as("fk_edge"), col("n_orphan_rows"),
          col("n_orphan_keys"))
    check("lineitem.l_orderkey->orders", li(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
      .union(check("lineitem.l_partkey->part", li(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .union(check("lineitem.l_suppkey->supplier", li(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"))
      .union(check("orders.o_custkey->customer", Tables.orders(s, d),
        "o_custkey", Tables.customer(s, d), "c_custkey"))
      .orderBy("fk_edge")
  }

  /** Grouped least-squares regression (price explained by quantity, per
    * return flag) via the REGR_* co-moment aggregates: slope, intercept,
    * R², and the mean point — all partial-aggregable sketches combined
    * map-side in ONE scan, the same single-pass shape as
    * q80_corr_matrix. This is the "fit a trend per segment at 100 TB"
    * op: no per-group collection, no second pass, shuffle = one sketch
    * row per group. Values rounded to 1e-6 (accumulation drift between
    * engines is ~1e-15 on O(1)-magnitude statistics). */
  val q82Regression: Q = Q(
    "q82_regression",
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS mean_qty,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      li(s, d).groupBy("l_returnflag").agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("mean_qty"),
        regr_count(col("l_extendedprice"), col("l_quantity")).cast("long").as("n"))
        .orderBy("l_returnflag")
  }

  /** Per-group statistical MODE (most frequent value, ties → smallest)
    * — count-then-rank, never a per-group value buffer: the first
    * aggregate collapses the fact table to one row per (group, value)
    * pair (map-side partials make the shuffle |distinct pairs|, not
    * |rows|), and the window ranks within each group's bounded distinct
    * domain. At 100 TB the quantity domain is ~50 values per flag, so
    * the window input is tiny no matter how large the scan. */
  val q87Mode: Q = Q(
    "q87_mode",
    """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
      |           FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |        ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c)
      |SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS cnt
      |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val c = li(s, d).groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
    c.withColumn("rn", row_number().over(Window
        .partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("cnt"))
      .orderBy("l_returnflag")
  }

  /** Ordered string aggregation (LISTAGG/STRING_AGG): the
    * concatenated, sorted member list per group. Spark composes it as
    * collect_list → sort_array → concat_ws — collect_list partials
    * merge map-side, and the sort runs on each group's OWN list (no
    * global order). Valid at scale exactly when the group payload is
    * bounded (suppliers per nation here); an unbounded LISTAGG is a
    * driver-OOM anti-feature in any engine. */
  val q88StringAgg: Q = Q(
    "q88_string_agg",
    """SELECT n_name, count(*) AS n_supp,
      | string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      |FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_supp"),
        concat_ws(",", sort_array(collect_list(col("s_name"))))
          .as("suppliers"))
      .orderBy("n_name")
  }

  /** Time-series resample to hourly OHLC bars (the financial
    * candlestick / downsample primitive): open/close via min_by/max_by
    * on the event timestamp, high/low/count as plain aggregates — ONE
    * scan, all six measures partial-aggregable (min_by's merge keeps
    * the earlier-keyed partial), so the shuffle carries one 6-field
    * sketch per (type, hour) no matter how many events the hour holds.
    * Determinism: fixture `ts` is globally unique; a production run
    * would key min_by on (ts, event_id) to break same-µs ties. */
  val q93OhlcBars: Q = Q(
    "q93_ohlc_bars",
    """SELECT event_type,
      | strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_hour,
      | arg_min(value, ts) AS open_v,
      | max(value) AS high_v,
      | min(value) AS low_v,
      | arg_max(value, ts) AS close_v,
      | CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1, 2
      |ORDER BY event_type, bar_hour""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("bar_hour"))
      .agg(min_by(col("value"), col("ts")).as("open_v"),
        max("value").as("high_v"),
        min("value").as("low_v"),
        max_by(col("value"), col("ts")).as("close_v"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type", "bar_hour")
  }

  /** Trailing EWMA smoothing per user (α = 0.5) — the time-series
    * feature-engineering primitive. The trailing 5-row frame carries a
    * ≤5-element list per row (collect_list over a BOUNDED window frame
    * — state is frame-sized, never history-sized), and the smoothing
    * runs as a left fold of the recurrence e ← α·x + (1−α)·e seeded
    * with the frame's first element. Every arithmetic step multiplies
    * by 0.5 (exact in binary floating point) in the identical order on
    * both engines, so the parity is bit-exact with NO rounding. */
  val q94EwmaSmooth: Q = Q(
    "q94_ewma_smooth",
    """WITH w AS (SELECT user_id, ts, value,
      |  list(value) OVER (PARTITION BY user_id ORDER BY ts
      |                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS vs
      | FROM events)
      |SELECT user_id, epoch_ms(ts) AS ts_ms, value,
      | CASE WHEN len(vs) = 1 THEN vs[1]
      |      ELSE list_reduce(vs, (acc, x) -> 0.5 * x + 0.5 * acc) END AS ewma
      |FROM w ORDER BY user_id, ts_ms""".stripMargin) { (s, d) =>
    val frame = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(-4, Window.currentRow)
    ev(s, d)
      .withColumn("vs", collect_list("value").over(frame))
      .select(col("user_id"), expr("unix_millis(ts)").as("ts_ms"),
        col("value"),
        when(size(col("vs")) === 1, element_at(col("vs"), 1))
          .otherwise(expr(
            "aggregate(slice(vs, 2, size(vs) - 1), vs[0], " +
              "(acc, x) -> 0.5D * x + 0.5D * acc)")).as("ewma"))
      .orderBy("user_id", "ts_ms")
  }

  /** Pareto frontier (skyline) of parts — minimize price, maximize
    * size: the "best tradeoff curve" query behind product/offer
    * pickers. Prices collapse to their per-price max size (one
    * groupBy), then one EXCLUSIVE running-max over the price order via
    * the distributed PrefixScan's cum-max variant — the scale-safe
    * form of `max(x) OVER (ORDER BY price ROWS ... 1 PRECEDING)`,
    * whose empty partition spec the battery sweep bans. A part is on
    * the frontier iff its size equals its price-group max AND beats
    * every strictly-cheaper group's max. The frontier relation joins
    * back broadcast (it is ≤ |distinct prices| and monotone-thinned). */
  val q118Skyline: Q = Q(
    "q118_skyline",
    """WITH p AS (SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
      |    AS cents, p_size FROM part),
      |g AS (SELECT cents, max(p_size) AS ms FROM p GROUP BY cents),
      |m AS (SELECT cents, ms, max(ms) OVER (ORDER BY cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM g),
      |f AS (SELECT cents, ms FROM m WHERE prevmax IS NULL OR ms > prevmax)
      |SELECT f.cents AS price_cents, CAST(f.ms AS BIGINT) AS p_size,
      |  count(*) AS n_parts
      |FROM p JOIN f ON p.cents = f.cents AND p.p_size = f.ms
      |GROUP BY 1, 2 ORDER BY price_cents""".stripMargin) { (s, d) =>
    val p = prt(s, d).select(
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("cents"),
      col("p_size"))
    val g = p.groupBy("cents").agg(max("p_size").cast("long").as("ms"))
    val (scanned, _) = graft.ops.PrefixScan.withCumMaxs(
      g, Seq(col("cents")), Seq("ms"), exclusive = true)
    val f = scanned.filter(col("ms") > col("cummax_ms"))
      .select(col("cents").as("fcents"), col("ms"))
    p.join(broadcast(f),
        p("cents") === col("fcents") && p("p_size").cast("long") === col("ms"))
      .groupBy(col("fcents").as("price_cents"), col("ms").as("p_size"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("price_cents")
  }

  /** Association rules over the market basket (Agrawal–Srikant
    * support/confidence/lift, public literature) — q68's co-occurrence
    * counts promoted to directional rules: confidence a→b =
    * sup(ab)/sup(a), lift = N·sup(ab)/(sup(a)·sup(b)). The pair
    * stream is the same bounded per-order fan-out as q68, thinned by
    * min-support ≥ 3 BEFORE the item-support joins (support pruning is
    * what keeps rule mining linear-ish at scale — the Apriori
    * observation); item supports join by part key, the 1-row N
    * broadcast closes lift. Metrics floor-round at 1e-6 BEFORE the
    * top-15 ranking (ties by confidence, then rule ids). */
  val q119AssocRules: Q = Q(
    "q119_assoc_rules",
    """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |      FROM lp),
      |ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS sup
      |       FROM lp GROUP BY 1),
      |pc AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
      |    CAST(count(*) AS BIGINT) AS sup_ab
      |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |e AS (SELECT pa, pb, sup_ab, ia.sup AS sup_a, ib.sup AS sup_b, n_orders
      |  FROM pc JOIN ic ia ON ia.l_partkey = pa
      |    JOIN ic ib ON ib.l_partkey = pb CROSS JOIN n),
      |r AS (SELECT pa AS antecedent, pb AS consequent, sup_ab, sup_a, sup_b,
      |    n_orders FROM e
      |  UNION ALL
      |  SELECT pb, pa, sup_ab, sup_b, sup_a, n_orders FROM e),
      |m AS (SELECT antecedent, consequent, sup_ab,
      |    floor(CAST(sup_ab AS DOUBLE) / sup_a * 1000000 + 0.5) / 1000000
      |      AS confidence,
      |    floor(CAST(sup_ab AS DOUBLE) * n_orders
      |      / (CAST(sup_a AS DOUBLE) * sup_b) * 1000000 + 0.5) / 1000000
      |      AS lift
      |  FROM r)
      |SELECT antecedent, consequent, sup_ab, confidence, lift FROM m
      |ORDER BY lift DESC, confidence DESC, antecedent, consequent
      |LIMIT 15""".stripMargin) { (s, d) =>
    val lp = li(s, d).select("l_orderkey", "l_partkey").distinct()
    val n = lp.agg(countDistinct("l_orderkey").as("n_orders"))
    val ic = lp.groupBy("l_partkey").agg(count(lit(1)).as("sup"))
    // pair supports via the group-explode builder (GraphOps
    // copurchaseEdges' measured-cheaper path, r13): ONE groupBy shuffle
    // + executor-side pa<pb fan-out instead of two shuffled self-join
    // sides; collect_set dedups per order so the per-pair order count
    // ≡ the oracle's lp⋈lp form.
    val pc = li(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set(col("pk")).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
          |  transform(filter(pks, y -> y > x),
          |            y -> struct(x AS pa, y AS pb))))""".stripMargin))
        .as("e"))
      .select(col("e.pa"), col("e.pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= 3)
    val e = pc
      .join(ic.select(col("l_partkey").as("pa"), col("sup").as("sup_a")), "pa")
      .join(ic.select(col("l_partkey").as("pb"), col("sup").as("sup_b")), "pb")
      .crossJoin(broadcast(n)) // 1-row order count
    val r = e.select(col("pa").as("antecedent"), col("pb").as("consequent"),
        col("sup_ab"), col("sup_a"), col("sup_b"), col("n_orders"))
      .unionAll(e.select(col("pb").as("antecedent"), col("pa").as("consequent"),
        col("sup_ab"), col("sup_b").as("sup_a"), col("sup_a").as("sup_b"),
        col("n_orders")))
    r.select(col("antecedent"), col("consequent"), col("sup_ab"),
        (floor(col("sup_ab").cast("double") / col("sup_a") * 1000000
          + lit(0.5)) / 1000000).as("confidence"),
        (floor(col("sup_ab").cast("double") * col("n_orders")
          / (col("sup_a").cast("double") * col("sup_b")) * 1000000
          + lit(0.5)) / 1000000).as("lift"))
      .orderBy(col("lift").desc, col("confidence").desc,
        col("antecedent"), col("consequent"))
      .limit(15)
  }

  /** The ONE query text [[sqlTextParity]] runs on BOTH engines —
    * deliberately restricted to the ANSI-portable subset (CAST/floor/
    * count/sum, equi-join, group-by) so the identical string parses in
    * Spark SQL and DuckDB. Every double is collapsed to exact BIGINT
    * cents per ROW before any aggregation, so accumulation order
    * cannot drift between engines. Exposed for the Round13 suite. */
  private[graft] val SqlTextParitySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
      |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus <> 'F' AND l_quantity < 45
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** SQL-TEXT API parity (r12 verdict #3): the engine's whole declared
    * surface is DataFrame-native; this row proves the same capability
    * is reachable from `spark.sql()` over registered views — the
    * entry point a SQL user hits first. The IDENTICAL query string is
    * the oracle (one constant, zero translation): fixture tables
    * register as temp views under their driver names, the text parses
    * through Spark's SQL parser into the same Catalyst pipeline the
    * DSL uses (the Round13 suite asserts the filter still reaches the
    * parquet scan's PushedFilters and that the DSL twin returns the
    * identical result — text vs DSL is a FRONT-END difference only).
    * At 100 TB nothing changes: views are metadata, the plan is the
    * same join the optimizer would pick from the DSL. */
  lazy val sqlTextParity: Q = Q(
    "sql_text_parity",
    SqlTextParitySql) { (s, d) =>
    li(s, d).createOrReplaceTempView("lineitem")
    ord(s, d).createOrReplaceTempView("orders")
    s.sql(SqlTextParitySql)
  }

  /** [[sqlTextWindow]]'s shared text — window functions (row_number +
    * a cumulative ROWS frame) and a derived-table filter through the
    * ANSI-portable subset: the single most common SQL analytics shape
    * (top-N-per-group with running totals). Money collapses to exact
    * BIGINT cents per row before the frame sum, so both engines
    * accumulate identical integers. */
  private[graft] val SqlTextWindowSql: String =
    """SELECT o_custkey, o_orderkey, rnk, cume_cents FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rnk,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cume_cents
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  /** SQL-text WINDOW surface (round 13, widening [[sqlTextParity]]):
    * the identical text — row_number ranking, a cumulative ROWS-frame
    * sum, a derived-table filter — runs through `spark.sql()` and the
    * DuckDB oracle. Proves the text front end reaches Spark's window
    * machinery (one hash-partitioned sort per o_custkey, the same
    * physical Window exec the DSL rows use), not just scans and
    * joins. */
  lazy val sqlTextWindow: Q = Q(
    "sql_text_window",
    SqlTextWindowSql) { (s, d) =>
    ord(s, d).createOrReplaceTempView("orders")
    s.sql(SqlTextWindowSql)
  }

  /** [[sqlHintAudit]]'s shared text: the join-strategy HINT surface.
    * A hint comment (slash-star-plus BROADCAST(nation) star-slash) is
    * a Spark planner directive and an ignored comment to DuckDB — one
    * string, two engines, zero translation. Result shape is
    * hint-INdependent (hints may never change semantics); the Round13
    * suite proves the directive is load-bearing by planning the same
    * text under BROADCAST vs SHUFFLE_MERGE and asserting
    * BroadcastHashJoin vs SortMergeJoin with identical results. */
  private[graft] def sqlHintSql(hint: String): String =
    s"""SELECT /*+ $hint */ n_name,
       |  CAST(count(*) AS BIGINT) AS n_suppliers,
       |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT))
       |    AS BIGINT) AS acctbal_cents
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** SQL JOIN-HINT surface (round 13, widening the text front end a
    * third step after [[sqlTextParity]]/[[sqlTextWindow]]): the query
    * a SQL user writes when the optimizer's stats are stale and the
    * dimension MUST broadcast — the BROADCAST(dim) hint comment.
    * Hints are directives to Spark's planner and plain comments to
    * DuckDB, so the identical string is the oracle. The gate proves
    * the hinted plan still returns exactly the right rows; the suite
    * proves the hint actually steered the physical join (BHJ under
    * BROADCAST, SMJ under SHUFFLE_MERGE — same text otherwise) — at
    * 100 TB the BROADCAST hint on a 25-row dim avoids a full fact
    * shuffle no matter what the CBO estimates. */
  lazy val sqlHintAudit: Q = Q(
    "sql_hint_audit",
    sqlHintSql("BROADCAST(nation)")) { (s, d) =>
    sup(s, d).createOrReplaceTempView("supplier")
    nat(s, d).createOrReplaceTempView("nation")
    s.sql(sqlHintSql("BROADCAST(nation)"))
  }

  /** PARAMETERIZED SQL surface (round 13, the fourth text-front-end
    * row): `spark.sql(text, args)` with named `:param` markers — the
    * injection-safe way an APPLICATION calls SQL (string interpolation
    * of user input into query text is the classic injection hole;
    * named-parameter binding is the fix, and Spark supports it
    * natively). The parameter values bind as typed literals into the
    * parsed plan, so Catalyst still constant-folds and pushes the
    * predicate to the scan exactly as if they were inline literals
    * (Round13 suite asserts PushedFilters AND that the bound form
    * equals the inline-literal form). The oracle inlines the same
    * constants — semantics, not the binding mechanism, is what the
    * gate can check; the suite covers the mechanism. */
  private[graft] val SqlParamSql: String =
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders
      |WHERE o_totalprice >= :min_price AND o_orderstatus = :status
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  lazy val sqlParamParity: Q = Q(
    "sql_param_parity",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders
      |WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'O'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    ord(s, d).createOrReplaceTempView("orders")
    s.sql(SqlParamSql,
      Map("min_price" -> 50000.0, "status" -> "O"))
  }

  val all: Seq[Q] = Seq(
    sqlTextParity, sqlTextWindow, sqlHintAudit, sqlParamParity,
    q118Skyline, q119AssocRules,
    q87Mode, q88StringAgg, q93OhlcBars, q94EwmaSmooth,
    q57Outliers, q58Zorder, q59Scd2, q63MergeUpsert, q73Ecdf, q74RangeJoin,
    q79MadOutliers, q80CorrMatrix, q81FkAudit, q82Regression,
    q64WindowPctRank, q65ArrayAdvanced, q66RollupReuse, q67SaltedJoin,
    q68Copurchase, q69Histogram, q70FuzzyMatch, q71KeySkewProfile,
    q72SequencePattern,
    q27QuartileBuckets, q28Subqueries, q29GapFill, q34SetBagOps,
    q50Pivot, q51Unpivot, q52Percentile, q53PercentileExact,
    q54PercentileDist, q55Funnel, q56Cohort,
    q01PricingSummary, q02ProjectFilter, q03AggStats, q04AggRollup, q05AggCube,
    q06GroupingSets, q10JoinInner, q11JoinLeft, q12JoinRight, q13JoinFull,
    q14JoinSemi, q15JoinAnti, q16JoinCross, q17JoinTheta, q18JoinBroadcastStar,
    q20WindowRank, q21WindowLag, q22WindowFrames, q22bRangeFrames,
    q23WindowNtile, q24bTopkNative,
    q24TopKPerGroup, q25SortLimit, q30SetUnion, q31SetIntersect, q32SetExcept,
    q33Distinct, q40ScalarString, q41ScalarDate, q42ScalarMath, q43ScalarArray,
    q43bPosExplode, q44ScalarJson, q45Sessionize, q46DistinctExact)
}
