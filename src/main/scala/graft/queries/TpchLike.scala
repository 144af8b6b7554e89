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

  val all: Seq[Q] = Seq(q60TpchQ3, q61TpchQ5, q62TpchQ10)
}
