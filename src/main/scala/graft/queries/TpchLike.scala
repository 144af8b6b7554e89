package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Full TPC-H-shaped analytics over the fixture star schema — multi-join
  * + filter + aggregate + top-k in single queries, the workloads a
  * complete engine must run end-to-end (adapted to the fixture's
  * columns; see FIXTURES.md).
  *
  * Scale notes: dimension sides broadcast (nation/region always;
  * customer left to Catalyst/AQE — at 100 TB it becomes a shuffle join
  * automatically); date filters push to the parquet scans; top-k is
  * rank-on-rounded + unique-key tie-break so both engines agree. */
object TpchLike {

  // Revenue sums run in exact DECIMAL: double accumulation order differs
  // between engines, and a group whose true sum sits within an ulp of a
  // cent boundary would round differently. Decimal sums are exact and
  // order-independent; the final cast back to double is deterministic.

  /** Q3 shape: shipping-priority revenue of building-segment orders. */
  val q60TpchQ3: Q = Q(
    "q60_tpch_q3",
    """SELECT l_orderkey,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .cast("double").as("revenue"))
        
      .select("l_orderkey", "revenue", "odate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5 shape: local-supplier volume per nation in one region/year. */
  val q61TpchQ5: Q = Q(
    "q61_tpch_q5",
    """SELECT n_name,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .cast("double").as("revenue"))
        
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q10 shape: top returned-item customers in a quarter. */
  val q62TpchQ10: Q = Q(
    "q62_tpch_q10",
    """SELECT c_custkey, c_name,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE) AS revenue, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .cast("double").as("revenue"))
        
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q17 shape: revenue lost to small-quantity orders of one brand —
    * the CORRELATED-AGGREGATE-SUBQUERY pattern (per-part average
    * quantity compared row-by-row). The engine de-correlates it the way
    * Catalyst would a planned subquery: one partial-agg groupBy builds
    * (part → sum, count) and a broadcast-eligible join feeds the filter,
    * so the "subquery" costs one pass over lineitem, not one per row.
    * The threshold test runs in exact integer arithmetic — quantities
    * are integral, so `5·q·cnt < sum` (⟺ q < 0.2·avg) compares exactly
    * where a float 0.2·avg could flip a boundary row between engines.
    * The final /7.0 runs in double on an exactly-decimal sum: identical
    * IEEE ops on identical inputs are deterministic in both engines. */
  val q76TpchQ17: Q = Q(
    "q76_tpch_q17",
    """WITH pa AS (SELECT l_partkey AS pk, sum(l_quantity) AS sq,
      |              count(*) AS cq
      |            FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
      |         / 7.0 * 100 + 0.5) / 100 AS DOUBLE) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN pa   ON pk = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND 5 * l_quantity * cq < sq""".stripMargin) { (s, d) =>
    val pa = Tables.lineitem(s, d).groupBy(col("l_partkey").as("pk"))
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("cq"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#23")),
        col("p_partkey") === col("l_partkey"))
      .join(pa, col("pk") === col("l_partkey"))
      .filter(lit(5) * col("l_quantity") * col("cq") < col("sq"))
      .agg((floor(sum(col("l_extendedprice").cast("decimal(14,2)"))
        .cast("double") / 7.0 * 100 + lit(0.5)) / 100)
        .cast("double").as("avg_yearly"))
  }

  /** Q18 shape: large-volume orders (GROUP → HAVING → semi-join back —
    * the "find qualifying groups, then re-join detail" pattern). The
    * qualifying-order set is built with one partial-agg groupBy and
    * joined back as a plain equi-join (semi via inner on the agg row,
    * which also carries the quantity sum — no second pass over
    * lineitem). Quantity sums are integral doubles, so the HAVING
    * threshold and the emitted sum are exact in both engines. */
  val q77TpchQ18: Q = Q(
    "q77_tpch_q18",
    """WITH big AS (SELECT l_orderkey AS ok, sum(l_quantity) AS tot
      |             FROM lineitem GROUP BY l_orderkey
      |             HAVING sum(l_quantity) > 250)
      |SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice, tot
      |FROM big
      |JOIN orders   ON o_orderkey = ok
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("ok"))
      .agg(sum("l_quantity").as("tot"))
      .filter(col("tot") > 250)
    big.join(Tables.orders(s, d), col("o_orderkey") === col("ok"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_totalprice"), col("tot"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Q7 shape: bilateral trade volume between two nations by ship year
    * — the TWO-ROLE-DIMENSION pattern (nation joined once as supplier
    * nation, once as customer nation). Both nation sides broadcast
    * (25 rows); the big fact⋈fact chain (lineitem⋈orders) shuffles on
    * the order key as usual. The pair filter is applied to the
    * broadcast sides BEFORE the fact join, so at 100 TB the scan output
    * is pruned to the two nations' suppliers/customers immediately
    * after each broadcast probe, not post-join. */
  val q83TpchQ7: Q = Q(
    "q83_tpch_q7",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | year(l_shipdate) AS l_year,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    val pair = Seq("NATION_18", "NATION_19")
    val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .join(broadcast(n1), col("nk1") === col("s_nationkey"))),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .join(broadcast(n2), col("nk2") === col("c_nationkey"))
        .select("c_custkey", "cust_nation")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q14 shape: promo revenue share per ship month — CONDITIONAL
    * aggregation (sum-if over a broadcast-joined dim attribute). One
    * fact pass; part broadcasts; the share division runs in double on
    * exactly-decimal sums so both engines execute identical IEEE ops. */
  val q84TpchQ14: Q = Q(
    "q84_tpch_q14",
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      | CAST(floor(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |     THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |     ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
      |   / CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE)
      |   * 10000 + 0.5) / 10000 AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY ship_month""".stripMargin) { (s, d) =>
    val rev = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1) - col("l_discount").cast("decimal(6,2)"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg((floor(lit(100.0)
        * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(14,2)"))).cast("double")
        / sum(rev).cast("double") * 10000 + lit(0.5)) / 10000)
        .cast("double").as("promo_share"))
      .orderBy("ship_month")
  }

  /** Q19 shape: DISJUNCTIVE multi-attribute predicate spanning both
    * join sides (brand × size × quantity ranges OR-ed together). The
    * per-side halves of each disjunct are pushed below the join — part
    * prunes to the three brands before broadcasting, lineitem to the
    * union of quantity ranges at the scan — and only the cross-side
    * conjunction runs on joined rows. */
  val q85TpchQ19: Q = Q(
    "q85_tpch_q19",
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 10 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(5, 25)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(10, 50)
        && col("l_quantity").between(20, 30))
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(1, 11)
        || col("l_quantity").between(10, 20)
        || col("l_quantity").between(20, 30))
      .join(broadcast(Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3"))),
        col("p_partkey") === col("l_partkey"))
      .filter(pred)
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q22 shape: high-balance customers with NO recent orders, per
    * nation — scalar-subquery threshold (global positive-balance mean,
    * a 1-row broadcast) + NOT-IN rewritten as LEFT ANTI against the
    * distinct recent-buyer keys. At 100 TB the anti-join shuffles on
    * c_custkey (both sides key-partitioned); the distinct prunes the
    * orders side to unique buyers before the exchange. */
  val q86TpchQ22: Q = Q(
    "q86_tpch_q22",
    """WITH a AS (SELECT avg(c_acctbal) AS av FROM customer WHERE c_acctbal > 0),
      |r AS (SELECT DISTINCT o_custkey FROM orders
      |      WHERE o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
      |SELECT n_name, count(*) AS numcust,
      | CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
      |FROM customer JOIN nation ON n_nationkey = c_nationkey, a
      |WHERE c_acctbal > av
      |  AND c_custkey NOT IN (SELECT o_custkey FROM r)
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    val avgBal = Tables.customer(s, d).filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("av"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select("o_custkey").distinct()
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("av"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal").cast("decimal(12,2)")), 2)
          .cast("double").as("totacctbal"))
      .orderBy("n_name")
  }

  /** Q4 shape: EXISTS decorrelated to a LEFT SEMI join — orders with at
    * least one line shipped >30 days after the order date, counted by
    * priority. (The fixture has no l_commitdate, so "late" is
    * ship-vs-order-date lag; the plan shape — semi join on the order
    * key with a cross-side date residual, then a low-cardinality
    * count — is Q4's.) The semi join shuffles both sides on the order
    * key and emits each order AT MOST once no matter how many lines
    * match, so the fan-out never materializes. */
  val q89TpchQ4: Q = Q(
    "q89_tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q12 shape: late-line priority split — conditional aggregation
    * (sum-if on the joined dimension attribute) after an equi join
    * with a cross-side date residual. One shuffle on the order key;
    * the CASE arms run post-join in the same codegen stage, so adding
    * priority classes costs nothing. */
  val q90TpchQ12: Q = Q(
    "q90_tpch_q12",
    """SELECT l_returnflag,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** Q15 shape: top-revenue supplier via a reused "view" — the revenue
    * aggregate is computed ONCE, its global max is a 1-row broadcast
    * (bounded cross join, whitelisted), and the winner filter compares
    * exact DECIMAL totals so float drift can't split a tie. At 100 TB
    * the view is |suppliers| rows after one fact shuffle; the max is a
    * partial-aggregable scalar. */
  val q91TpchQ15: Q = Q(
    "q91_tpch_q15",
    """WITH rev AS (SELECT l_suppkey AS supplier_no,
      |  round(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2) AS total_revenue
      | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      | GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * (lit(1) - col("l_discount").cast("decimal(6,2)"))), 2)
        .as("total_revenue"))
    val top = rev.agg(max("total_revenue").as("max_rev"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q21 shape: the only-late-supplier audit — the hardest TPC-H
    * decorrelation (EXISTS + NOT EXISTS against the same fact). Both
    * quantified predicates become key-partitioned self-joins of the
    * DISTINCT (order, supplier) relation: EXISTS(another supplier on
    * the order) → LEFT SEMI, NOT EXISTS(another LATE supplier) → LEFT
    * ANTI, each an equi join on l_orderkey with a `suppkey <>`
    * residual. The distinct projections collapse line-level fan-out
    * before any join, so shuffle volume is order×supplier pairs —
    * the same discipline DuckDB's plan uses, and the reason this
    * survives a fact table with hundreds of lines per order. */
  val q92TpchQ21: Q = Q(
    "q92_tpch_q21",
    """WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
      |all_os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM all_os a
      |        WHERE a.l_orderkey = l1.l_orderkey
      |          AND a.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l2
      |        WHERE l2.l_orderkey = l1.l_orderkey
      |          AND l2.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin) { (s, d) =>
    val late = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey").distinct()
    val allOs = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey").distinct()
    val other = allOs.select(col("l_orderkey").as("a_ok"),
      col("l_suppkey").as("a_sk"))
    val otherLate = late.select(col("l_orderkey").as("b_ok"),
      col("l_suppkey").as("b_sk"))
    late
      .join(other, col("a_ok") === col("l_orderkey")
        && col("a_sk") =!= col("l_suppkey"), "left_semi")
      .join(otherLate, col("b_ok") === col("l_orderkey")
        && col("b_sk") =!= col("l_suppkey"), "left_anti")
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q6 shape: forecast revenue change — the pure-scan aggregate. All
    * three predicates push to the parquet scan; one partial-agg row per
    * partition crosses the exchange. At 100 TB this is the I/O-bound
    * lower bound for the whole engine. */
  val q98TpchQ6: Q = Q(
    "q98_tpch_q6",
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |   * CAST(l_discount AS DECIMAL(6,2))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.06
      |  AND l_quantity < 24
      |ORDER BY revenue""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.04, 0.06)
        && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice").cast("decimal(14,2)")
        * col("l_discount").cast("decimal(6,2)")), 2)
        .cast("double").as("revenue"))
      .orderBy("revenue")
  }

  /** Q13 shape: customer order-count distribution. LEFT join keeps
    * order-less customers (c_count = 0); the comment NOT LIKE becomes a
    * priority exclusion (fixture has no o_comment). Two stacked hash
    * aggregates; the second groups ~30 distinct counts. */
  val q99TpchQ13: Q = Q(
    "q99_tpch_q13",
    """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q8 shape: national market share — NATION_7's slice of ASIA-customer
    * PROMO-part volume per year. Both sums run in exact DECIMAL, the
    * share divides the decimal-exact doubles, and rounding is the
    * half-up-safe floor(x·1e6 + .5)/1e6 on both engines. Dimensions all
    * broadcast; the only big shuffles are the two fact-side joins. */
  val q100TpchQ8: Q = Q(
    "q100_tpch_q8",
    """WITH v AS (
      | SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |   CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) AS vol,
      |   sn.n_name AS s_nation
      | FROM lineitem
      | JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
      | JOIN orders   ON o_orderkey = l_orderkey
      |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      | JOIN customer ON c_custkey = o_custkey
      | JOIN nation cn ON cn.n_nationkey = c_nationkey
      | JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
      | JOIN supplier ON s_suppkey = l_suppkey
      | JOIN nation sn ON sn.n_nationkey = s_nationkey)
      |SELECT o_year,
      | CAST(floor(CAST(sum(CASE WHEN s_nation = 'NATION_7' THEN vol
      |     ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
      |   / CAST(sum(vol) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS DOUBLE) AS mkt_share
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val vol = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1) - col("l_discount").cast("decimal(6,2)"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
        col("cn_key") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("r_regionkey") === col("n_regionkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("s_nation"))),
        col("sn_key") === col("s_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((floor(sum(when(col("s_nation") === "NATION_7", vol)
          .otherwise(lit(0).cast("decimal(14,2)"))).cast("double")
        / sum(vol).cast("double") * 1000000 + lit(0.5)) / 1000000)
        .cast("double").as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9 shape: product-type profit by supplier nation and year. The
    * fixture has no partsupp, so supply cost is proxied as
    * 0.5 · p_retailprice · quantity — the profit expression keeps Q9's
    * exact shape (revenue minus cost, LIKE-filtered part, two-level
    * group). All arithmetic in exact DECIMAL until the final round. */
  val q101TpchQ9: Q = Q(
    "q101_tpch_q9",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))
      |   - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
      |     * CAST(0.5 AS DECIMAL(2,1))), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation   ON n_nationkey = s_nationkey
      |JOIN orders   ON o_orderkey = l_orderkey
      |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    val profit = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1) - col("l_discount").cast("decimal(6,2)")) -
      col("p_retailprice").cast("decimal(12,2)") *
        col("l_quantity").cast("decimal(12,2)") * lit(0.5).cast("decimal(2,1)")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%widget%"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 shape: important parts — per-part value above a threshold tied
    * to the global total (here 1.5× the mean part value, so the filter
    * is scale-free across SFs; fixture has no partsupp availqty·cost so
    * value is lineitem revenue). The 1-row (total, count) aggregate
    * broadcasts (same scalar-subquery decorrelation as Q22/Q15), and
    * the comparison `val·cnt·2 > tot·3` is pure exact DECIMAL/integer
    * multiplication — no division, so boundary rows agree bit-exactly
    * between engines. */
  val q102TpchQ11: Q = Q(
    "q102_tpch_q11",
    """WITH pv AS (SELECT l_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS val
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT sum(val) AS tot, count(*) AS cnt FROM pv)
      |SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS value
      |FROM pv, t WHERE val * cnt * 2 > tot * 3
      |ORDER BY value DESC, l_partkey""".stripMargin) { (s, d) =>
    val rev = col("l_extendedprice").cast("decimal(14,2)") *
      (lit(1) - col("l_discount").cast("decimal(6,2)"))
    val pv = Tables.lineitem(s, d)
      .groupBy("l_partkey").agg(sum(rev).as("val"))
    val t = pv.agg(sum(col("val")).as("tot"), count(lit(1)).as("cnt"))
    pv.crossJoin(broadcast(t))
      .filter(col("val") * col("cnt") * 2 > col("tot") * 3)
      .select(col("l_partkey"), round(col("val"), 2).cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q16 shape: supplier count per (brand, type, size) for selected
    * sizes, excluding flagged suppliers via NOT IN → LEFT ANTI (the
    * complaint-comment filter becomes negative account balance). The
    * distinct-count is Spark's two-phase partial-distinct aggregate;
    * part and the 6-row exclusion list broadcast. */
  val q103TpchQ16: Q = Q(
    "q103_tpch_q16",
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    Tables.lineitem(s, d)
      .join(broadcast(excl), col("s_suppkey") === col("l_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20 shape: potential part promotion — suppliers who moved more than
    * a threshold quantity of red parts in 1996, as the nested
    * IN-subquery chain: parts LIKE → per-(supplier, part) shipped
    * quantity → qualifying suppliers via LEFT SEMI. Quantities are
    * integral doubles, so the sums and the >50 comparison are exact. */
  val q104TpchQ20: Q = Q(
    "q104_tpch_q20",
    """WITH redp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
      |sq AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      |  FROM lineitem JOIN redp ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM sq WHERE qty > 50)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val redp = Tables.part(s, d).filter(col("p_name").like("red%"))
      .select("p_partkey")
    val qual = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(redp), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 50)
      .select("l_suppkey").distinct()
    Tables.supplier(s, d)
      .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q2 shape: minimum-cost regional supplier — the correlated MIN
    * subquery. Unit cost is min(l_extendedprice / l_quantity) over each
    * EUROPE supplier's shipments of the part (fixture has no partsupp
    * supplycost); the per-part global min joins back on equality of the
    * identically-computed doubles (IEEE division is deterministic, so
    * both engines derive bit-equal costs from the same parquet values).
    * Join-back + broadcast dims + top-100: Q2's full plan shape. */
  val q105TpchQ2: Q = Q(
    "q105_tpch_q2",
    """WITH eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      |cost AS (SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS ucost
      |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey, l_suppkey),
      |mc AS (SELECT l_partkey AS mk, min(ucost) AS mcost FROM cost GROUP BY l_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey,
      |  CAST(floor(mcost * 10000 + 0.5) / 10000 AS DOUBLE) AS min_cost
      |FROM part
      |JOIN mc   ON mk = p_partkey
      |JOIN cost ON cost.l_partkey = mk AND cost.ucost = mcost
      |JOIN eu   ON cost.l_suppkey = eu.s_suppkey
      |WHERE p_size BETWEEN 15 AND 24 AND p_type = 'LARGE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cost = Tables.lineitem(s, d)
      .join(broadcast(eu.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ucost"))
    val mc = cost.groupBy(col("l_partkey").as("mk"))
      .agg(min("ucost").as("mcost"))
    Tables.part(s, d)
      .filter(col("p_size").between(15, 24) && col("p_type") === "LARGE")
      .join(mc, col("mk") === col("p_partkey"))
      .join(cost, col("l_partkey") === col("mk")
        && col("ucost") === col("mcost"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("s_suppkey"),
        (floor(col("mcost") * 10000 + lit(0.5)) / 10000)
          .cast("double").as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** Order-to-ship latency SLA percentiles per order priority — the
    * fulfillment dashboard query: exact interpolated p50/p90 of
    * (ship date − order date) in days, computed through the
    * distributed range-partitioned rank path (GroupedPercentile —
    * never buffers a group; two quantile passes share the join
    * input). Day deltas are exact integers; interpolation is the one
    * deterministic double step. */
  val shipLatency: Q = Q(
    "ship_latency",
    """WITH l AS (SELECT o.o_orderpriority AS pri,
      |    CAST(date_diff('day', o.o_orderdate, li.l_shipdate) AS DOUBLE)
      |      AS lat
      |  FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey)
      |SELECT pri AS o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  floor(quantile_cont(lat, 0.50) * 10000 + 0.5) / 10000 AS p50_days,
      |  floor(quantile_cont(lat, 0.90) * 10000 + 0.5) / 10000 AS p90_days
      |FROM l GROUP BY pri ORDER BY pri""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        expr("CAST(datediff(l_shipdate, o_orderdate) AS DOUBLE)").as("lat"))
    val counts = l.groupBy("pri").agg(count(lit(1)).as("n_lines"))
    val ps = graft.ops.GroupedPercentile.exactMulti(l, "pri", "lat",
      Seq(0.50 -> "p50", 0.90 -> "p90"))
    counts.join(ps, "pri")
      .select(col("pri").as("o_orderpriority"), col("n_lines"),
        (floor(col("p50") * 10000 + lit(0.5)) / 10000).as("p50_days"),
        (floor(col("p90") * 10000 + lit(0.5)) / 10000).as("p90_days"))
      .orderBy("o_orderpriority")
  }


  /** Apdex (Application Performance Index) over ship latency per
    * order priority: satisfied <= T, tolerating <= 4T (T = 30 days),
    * apdex = (sat + tol/2) / n. Pure conditional counting on the same
    * fact-dim join as ship_latency — one scan, exact BIGINTs, a single
    * division per group. The standard SLA rollup for a latency
    * distribution too skewed for means. */
  lazy val apdexScore: Q = Q(
    "apdex_score",
    """WITH l AS (SELECT o.o_orderpriority AS pri,
      |    date_diff('day', o.o_orderdate, li.l_shipdate) AS lat
      |  FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey),
      |g AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_sat,
      |    CAST(sum(CASE WHEN lat > 30 AND lat <= 120 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_tol
      |  FROM l GROUP BY pri)
      |SELECT pri AS o_orderpriority, n, n_sat, n_tol,
      |  floor((n_sat + CAST(n_tol AS DOUBLE) / 2) / n * 1000000 + 0.5)
      |    / 1000000 AS apdex
      |FROM g ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        expr("datediff(l_shipdate, o_orderdate)").as("lat"))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lat") <= 30, 1).otherwise(0)).cast("long").as("n_sat"),
        sum(when(col("lat") > 30 && col("lat") <= 120, 1).otherwise(0))
          .cast("long").as("n_tol"))
      .select(col("pri").as("o_orderpriority"), col("n"), col("n_sat"),
        col("n_tol"),
        (floor((col("n_sat") + col("n_tol").cast("double") / 2) / col("n")
          * 1000000 + lit(0.5)) / 1000000).as("apdex"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(apdexScore, q60TpchQ3, q61TpchQ5, q62TpchQ10, q76TpchQ17,
    q77TpchQ18, q83TpchQ7, q84TpchQ14, q85TpchQ19, q86TpchQ22,
    q89TpchQ4, q90TpchQ12, q91TpchQ15, q92TpchQ21,
    q98TpchQ6, q99TpchQ13, q100TpchQ8, q101TpchQ9, q102TpchQ11,
    q103TpchQ16, q104TpchQ20, q105TpchQ2, shipLatency)

}
