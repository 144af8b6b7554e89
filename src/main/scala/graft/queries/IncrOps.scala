package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Incremental-pipeline operations: partial-state aggregate maintenance
  * (merge yesterday's state with today's delta instead of recomputing
  * the world), compaction planning (bin-pack small partitions into
  * target-sized files), and a multi-table catalog audit. At 100 TB
  * these are the ops that keep a pipeline's daily cost proportional to
  * the DELTA, not the corpus. */
object IncrOps {

  /** Incremental aggregate maintenance: the standing state (orders
    * before 2000-01-01) and the new delta (orders after) are aggregated
    * INDEPENDENTLY to partial states — (count, exact cent sum) per
    * priority — then merged by summing, never rescanning history. The
    * oracle computes the full aggregate from scratch, so the gate IS
    * the algebraic claim: merge(partial(A), partial(B)) ≡ full(A∪B).
    * Money sums in integer cents (exact, order-independent); the final
    * division by 100 is one deterministic double op per group. */
  val incrAggMerge: Q = Q(
    "incr_agg_merge",
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS DOUBLE) / 100 AS total
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val cents = round(col("o_totalprice") * 100).cast("long")
    def partial(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("pn"), sum(cents).as("pc"))
    val cut = lit("2000-01-01").cast("timestamp")
    val state = partial(Tables.orders(s, d).filter(col("o_orderdate") < cut))
    val delta = partial(Tables.orders(s, d).filter(col("o_orderdate") >= cut))
    state.unionAll(delta)
      .groupBy("o_orderpriority")
      .agg(sum("pn").as("n_orders"),
        (sum("pc").cast("double") / 100).as("total"))
      .orderBy("o_orderpriority")
  }

  /** Compaction planning: treat each order-day's lineitem rowcount as a
    * small "file" and bin-pack days (in day order) into ~20k-row
    * target files — the nightly small-files compaction every lakehouse
    * table needs. Bin id = the file's starting cumulative offset over
    * the target (greedy first-fit in sort order), computed with the
    * distributed PrefixScan — all integer arithmetic, zero float. The
    * per-bin report (file count, rows, day span) is what the compactor
    * would execute. */
  val compactBins: Q = Q(
    "compact_bins",
    """WITH f AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
      |    count(*) AS nrows
      |  FROM lineitem GROUP BY 1),
      |c AS (SELECT day, nrows,
      |    CAST(sum(nrows) OVER (ORDER BY day) AS BIGINT) AS cum FROM f),
      |b AS (SELECT day, nrows, CAST(floor((cum - nrows) / 20000) AS BIGINT) AS bin
      |      FROM c)
      |SELECT bin, count(*) AS n_files, CAST(sum(nrows) AS BIGINT) AS bin_rows,
      |  min(day) AS first_day, max(day) AS last_day
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    val f = Tables.lineitem(s, d)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("nrows"))
    val (scanned, _) = graft.ops.PrefixScan.withCumSums(
      f, Seq(col("day")), Seq("nrows"))
    scanned
      .select(col("day"), col("nrows"),
        floor((col("cum_nrows") - col("nrows")) / 20000).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("nrows").as("bin_rows"),
        min("day").as("first_day"), max("day").as("last_day"))
      .orderBy("bin")
  }

  /** Catalog audit: one row of table statistics per fact/dimension
    * table — row count, primary-key distinctness, and orphan-free
    * checks are the ANALYZE-style stats a planner and a data-quality
    * dashboard both need. Each table contributes one tiny aggregate;
    * the union is |tables| rows. */
  val tableStats: Q = Q(
    "table_stats",
    """SELECT 'customer' AS tbl, count(*) AS n_rows,
      |    count(DISTINCT c_custkey) AS n_keys FROM customer
      |UNION ALL
      |SELECT 'lineitem', count(*), count(DISTINCT l_orderkey) FROM lineitem
      |UNION ALL
      |SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
      |UNION ALL
      |SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
      |UNION ALL
      |SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
      |ORDER BY tbl""".stripMargin) { (s, d) =>
    def one(name: String, df: DataFrame, key: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), countDistinct(col(key)).as("n_keys"))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_keys"))
    one("customer", Tables.customer(s, d), "c_custkey")
      .unionAll(one("lineitem", Tables.lineitem(s, d), "l_orderkey"))
      .unionAll(one("orders", Tables.orders(s, d), "o_orderkey"))
      .unionAll(one("part", Tables.part(s, d), "p_partkey"))
      .unionAll(one("supplier", Tables.supplier(s, d), "s_suppkey"))
      .orderBy("tbl")
  }

  val all: Seq[Q] = Seq(incrAggMerge, compactBins, tableStats)
}
