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

  val all: Seq[Q] = Seq(q60TpchQ3, q61TpchQ5, q62TpchQ10, q76TpchQ17,
    q77TpchQ18)
}
