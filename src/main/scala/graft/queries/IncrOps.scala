package graft.queries

import scala.jdk.CollectionConverters._

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

  /** Incremental JOIN-view maintenance — the delta algebra for a
    * two-table join view: with both tables split into standing state
    * and delta (A = A₀∪ΔA, B = B₀∪ΔB), the view refresh is
    * agg(A₀⋈B₀) ⊕ agg(A₀⋈ΔB) ⊕ agg(ΔA⋈B₀) ⊕ agg(ΔA⋈ΔB) — three of
    * the four terms touch a delta side, so the daily cost is
    * Δ-proportional once A₀⋈B₀ is standing state. The ORACLE is the
    * from-scratch full join aggregate, so the gate proves the 4-term
    * IVM decomposition exactly (integer-cent partials, merged by
    * summation). */
  val incrJoinDelta: Q = Q(
    "incr_join_delta",
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val ocut = lit("2000-01-01").cast("timestamp")
    val lcut = lit("2000-09-02").cast("timestamp")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("c"))
    val (o0, od) = (o.filter(col("o_orderdate") < ocut),
      o.filter(col("o_orderdate") >= ocut))
    val (l0, ld) = (l.filter(col("l_shipdate") < lcut),
      l.filter(col("l_shipdate") >= lcut))
    def partial(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("pn"), sum("c").as("pc"))
    partial(o0, l0).unionAll(partial(o0, ld))
      .unionAll(partial(od, l0)).unionAll(partial(od, ld))
      .groupBy("o_orderpriority")
      .agg(sum("pn").as("n_lines"), sum("pc").as("cents"))
      .orderBy("o_orderpriority")
  }

  /** Snapshot diff / CDC audit — compare two table versions (old: 10%
    * of keys missing; new: 1-in-13 keys retired, 1-in-7 prices bumped
    * a dollar — both versions DERIVED deterministically from the
    * fixture) and classify every key as added / removed / changed /
    * unchanged with net money movement. One full-outer join on the
    * key, pure integer classification — the migration-validation twin
    * of table_fingerprint that says WHAT moved, not just that
    * something did. */
  val snapshotDiff: Q = Q(
    "snapshot_diff",
    """WITH a AS (SELECT o_orderkey AS k,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM orders WHERE o_orderkey % 10 <> 0),
      |b AS (SELECT o_orderkey AS k,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |      + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS c
      |  FROM orders WHERE o_orderkey % 13 <> 0),
      |j AS (SELECT COALESCE(a.k, b.k) AS k, a.c AS ac, b.c AS bc
      |      FROM a FULL OUTER JOIN b ON a.k = b.k),
      |cls AS (SELECT k,
      |    CASE WHEN ac IS NULL THEN 'added'
      |         WHEN bc IS NULL THEN 'removed'
      |         WHEN ac <> bc THEN 'changed' ELSE 'unchanged' END AS status,
      |    COALESCE(bc, 0) - COALESCE(ac, 0) AS delta
      |  FROM j)
      |SELECT status, count(*) AS n_keys,
      |  CAST(sum(delta) AS BIGINT) AS cents_delta
      |FROM cls GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
    val a = Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("ak"), cents.as("ac"))
    val b = Tables.orders(s, d).filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("bk"),
        (cents + when(col("o_orderkey") % 7 === 0, 100L).otherwise(0L))
          .as("bc"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(
        when(col("ac").isNull, "added")
          .when(col("bc").isNull, "removed")
          .when(col("ac") =!= col("bc"), "changed")
          .otherwise("unchanged").as("status"),
        (coalesce(col("bc"), lit(0L)) - coalesce(col("ac"), lit(0L)))
          .as("delta"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_keys"), sum("delta").as("cents_delta"))
      .orderBy("status")
  }

  /** k-anonymity audit over the (nation, market-segment) quasi-
    * identifier pair — the privacy check run before a customer slice
    * ships: the 10 smallest equivalence classes, whose head IS the
    * dataset's k. One 125-group aggregate; at scale this is the same
    * two-phase count as any profiling groupBy. */
  val kAnonymity: Q = Q(
    "k_anonymity",
    """SELECT c_nationkey, c_mktsegment, count(*) AS n_members
      |FROM customer GROUP BY 1, 2
      |ORDER BY n_members, c_nationkey, c_mktsegment
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members"), col("c_nationkey"), col("c_mktsegment"))
      .limit(10)
  }

  /** Data-quality scorecard over `orders` — the contract-validation
    * pass a production pipeline runs before publishing a table: one
    * named row per rule (nulls, key uniqueness, FK integrity, value
    * range, domain membership), each with exact violation counts and
    * a pass rate. Everything is ONE conditional-aggregation scan plus
    * a single anti-join for the FK rule (the q81_fk_audit shape) —
    * rules never each rescan the table. */
  val dqScorecard: Q = Q(
    "dq_scorecard",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
      |base AS (SELECT
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS null_key,
      |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS null_price,
      |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS null_date,
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |      AS dup_keys,
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bad_price,
      |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      |          OR o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'
      |        THEN 1 ELSE 0 END) AS BIGINT) AS bad_date,
      |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
      |  FROM orders),
      |fk AS (SELECT CAST(count(*) AS BIGINT) AS orphans FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)),
      |rules AS (
      |  SELECT 'null_orderkey' AS rule, null_key AS violations FROM base
      |  UNION ALL SELECT 'null_totalprice', null_price FROM base
      |  UNION ALL SELECT 'null_orderdate', null_date FROM base
      |  UNION ALL SELECT 'unique_orderkey', dup_keys FROM base
      |  UNION ALL SELECT 'price_positive', bad_price FROM base
      |  UNION ALL SELECT 'date_in_range', bad_date FROM base
      |  UNION ALL SELECT 'status_in_domain', bad_status FROM base
      |  UNION ALL SELECT 'fk_custkey', orphans FROM fk)
      |SELECT rule, n AS n_rows, violations,
      |  floor((1 - CAST(violations AS DOUBLE) / n) * 1000000 + 0.5)
      |    / 1000000 AS pass_rate
      |FROM rules CROSS JOIN n ORDER BY rule""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val base = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L))
        .as("null_price"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
        .as("null_date"),
      (count(lit(1)) - countDistinct("o_orderkey")).as("dup_keys"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(col("o_orderdate") <
          lit("1995-01-01 00:00:00").cast("timestamp") ||
          col("o_orderdate") >= lit("2002-01-01 00:00:00").cast("timestamp"),
        1L).otherwise(0L)).as("bad_date"),
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val fk = o.join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    val rules = base.crossJoin(broadcast(fk)) // 1-row x 1-row audit join
      .select(col("n"), explode(expr(
        "array(struct('null_orderkey' AS rule, null_key AS violations), " +
          "struct('null_totalprice' AS rule, null_price AS violations), " +
          "struct('null_orderdate' AS rule, null_date AS violations), " +
          "struct('unique_orderkey' AS rule, dup_keys AS violations), " +
          "struct('price_positive' AS rule, bad_price AS violations), " +
          "struct('date_in_range' AS rule, bad_date AS violations), " +
          "struct('status_in_domain' AS rule, bad_status AS violations), " +
          "struct('fk_custkey' AS rule, orphans AS violations))")).as("r"))
    rules.select(col("r.rule").as("rule"), col("n").as("n_rows"),
        col("r.violations").as("violations"),
        (floor((lit(1) - col("r.violations").cast("double") / col("n"))
          * 1000000 + lit(0.5)) / 1000000).as("pass_rate"))
      .orderBy("rule")
  }

  /** l-diversity audit — k_anonymity's sibling: within each
    * quasi-identifier class (nation × market segment), how many
    * DISTINCT sensitive values (account-balance thousand-band) appear?
    * A k-anonymous group with one sensitive value still leaks; l is
    * the real disclosure bound. Reports the 10 least-diverse classes
    * (the dataset's l = the head row). One grouped count-distinct. */
  val lDiversity: Q = Q(
    "l_diversity",
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
      |    AS BIGINT) AS l_div
      |FROM customer GROUP BY 1, 2
      |ORDER BY l_div, c_nationkey, c_mktsegment LIMIT 10""".stripMargin) {
    (s, d) =>
    Tables.customer(s, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(floor(col("c_acctbal") / 1000).cast("long"))
          .as("l_div"))
      .orderBy(col("l_div"), col("c_nationkey"), col("c_mktsegment"))
      .limit(10)
  }

  /** t-closeness audit — the third leg of the disclosure-risk tripod
    * (k_anonymity: class size; l_diversity: distinct sensitive values;
    * t-closeness: DISTANCE between the class's sensitive distribution
    * and the global one — a diverse class can still leak if its
    * distribution is skewed). Distance is the Earth Mover's Distance
    * over the ORDERED balance bands, computed entirely on exact
    * integers: |F_class − F_global| at band k is compared as
    * |cum_c·N − cum_g·n_c| (no float enters the sum), and t is ONE
    * final division per class. Shape: two grouped counts, a
    * |classes|×B zero-filled grid (B ≤ 11 bands — bounded by the value
    * domain, so the broadcast fan-out is constant at any data scale),
    * and a class-partitioned cumulative window. Reports the 10 classes
    * farthest from the global distribution. */
  val tCloseness: Q = Q(
    "t_closeness",
    """WITH c AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band FROM customer),
      |cb AS (SELECT nk, seg, band, CAST(count(*) AS BIGINT) AS cnt
      |       FROM c GROUP BY 1, 2, 3),
      |bands AS (SELECT band, CAST(count(*) AS BIGINT) AS g FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
      |               CAST(count(*) AS BIGINT) AS nb FROM bands),
      |grid AS (SELECT DISTINCT nk, seg FROM cb),
      |filled AS (SELECT gr.nk, gr.seg, b.band, b.g,
      |    COALESCE(cb.cnt, 0) AS cnt
      |  FROM grid gr CROSS JOIN bands b
      |  LEFT JOIN cb ON cb.nk = gr.nk AND cb.seg = gr.seg
      |    AND cb.band = b.band),
      |cum AS (SELECT nk, seg,
      |    CAST(sum(cnt) OVER (PARTITION BY nk, seg ORDER BY band)
      |      AS BIGINT) AS cumc,
      |    CAST(sum(g) OVER (PARTITION BY nk, seg ORDER BY band)
      |      AS BIGINT) AS cumg,
      |    CAST(sum(cnt) OVER (PARTITION BY nk, seg) AS BIGINT) AS ncls
      |  FROM filled)
      |SELECT nk AS c_nationkey, seg AS c_mktsegment,
      |  max(ncls) AS n_members,
      |  floor(CAST(sum(abs(cumc * nn - cumg * ncls)) AS DOUBLE)
      |    / (CAST((any_value(nb) - 1) * any_value(ncls) AS BIGINT)
      |       * any_value(nn)) * 1000000 + 0.5)
      |    / 1000000 AS t_close
      |FROM cum CROSS JOIN tot
      |GROUP BY nk, seg
      |ORDER BY t_close DESC, nk, seg LIMIT 10""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
      .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val cb = c.groupBy("nk", "seg", "band").agg(count(lit(1)).as("cnt"))
    val bands = c.groupBy("band").agg(count(lit(1)).as("g"))
    val tot = bands.agg(sum("g").as("nn"), count(lit(1)).as("nb"))
    val grid = cb.select("nk", "seg").distinct()
      .crossJoin(broadcast(bands)) // B <= 11 domain-bounded band rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nk", "seg").orderBy("band")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("nk", "seg")
    grid.join(cb, Seq("nk", "seg", "band"), "left")
      .select(col("nk"), col("seg"), col("band"), col("g"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .select(col("nk"), col("seg"),
        sum("cnt").over(w).as("cumc"),
        sum("g").over(w).as("cumg"),
        sum("cnt").over(wAll).as("ncls"))
      .crossJoin(broadcast(tot)) // 1-row (N, B) totals
      .groupBy("nk", "seg")
      .agg(max("ncls").as("n_members"),
        (floor(sum(abs(col("cumc") * col("nn") - col("cumg") * col("ncls")))
          .cast("double")
          / (((first("nb") - 1) * first("ncls")) * first("nn"))
          * 1000000 + lit(0.5)) / 1000000).as("t_close"))
      .select(col("nk").as("c_nationkey"), col("seg").as("c_mktsegment"),
        col("n_members"), col("t_close"))
      .orderBy(col("t_close").desc, col("c_nationkey"), col("c_mktsegment"))
      .limit(10)
  }

  /** Zone-map (min/max data-skipping) effectiveness audit — the
    * layout decision every 100 TB table faces, measured instead of
    * guessed: for a Q1'1997 ship-date predicate, how many file-bins
    * could a zone map prune under (a) a round-robin/insertion layout
    * (l_orderkey % 32 — per-bin date ranges span everything, nothing
    * prunes) vs (b) a date-partitioned layout (ship month — all but
    * the 3 matching partitions prune)? A bin prunes iff its [min,max]
    * ship-date range misses the predicate; scan_efficiency =
    * matching rows / rows in surviving bins. Two grouped min/max
    * passes + tiny bin-level aggregates, exact integers throughout. */
  val zonemapAudit: Q = Q(
    "zonemap_audit",
    """WITH li AS (SELECT l_orderkey, l_shipdate FROM lineitem),
      |binned AS (
      |  SELECT 'a_roundrobin' AS layout,
      |    CAST(l_orderkey % 32 AS BIGINT) AS bin, l_shipdate FROM li
      |  UNION ALL
      |  SELECT 'b_bydate',
      |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT),
      |    l_shipdate FROM li),
      |bins AS (SELECT layout, bin, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |    min(l_shipdate) AS lo, max(l_shipdate) AS hi
      |  FROM binned GROUP BY 1, 2),
      |audit AS (SELECT layout, bin, n_rows, n_match,
      |    CASE WHEN hi < TIMESTAMP '1997-01-01 00:00:00'
      |      OR lo >= TIMESTAMP '1997-04-01 00:00:00'
      |      THEN 0 ELSE 1 END AS scanned
      |  FROM bins)
      |SELECT layout, CAST(count(*) AS BIGINT) AS n_bins,
      |  CAST(sum(scanned) AS BIGINT) AS n_scanned,
      |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
      |  CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
      |  CAST(sum(n_match) AS BIGINT) AS rows_matching,
      |  CASE WHEN sum(scanned * n_rows) = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE floor(CAST(sum(n_match) AS DOUBLE) / sum(scanned * n_rows)
      |      * 1000000 + 0.5) / 1000000 END AS scan_efficiency
      |FROM audit GROUP BY layout ORDER BY layout""".stripMargin) { (s, d) =>
    val lo = lit("1997-01-01 00:00:00").cast("timestamp")
    val hi = lit("1997-04-01 00:00:00").cast("timestamp")
    val li0 = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    val binned = li0
      .select(lit("a_roundrobin").as("layout"),
        (col("l_orderkey") % 32).cast("long").as("bin"), col("l_shipdate"))
      .unionAll(li0.select(lit("b_bydate").as("layout"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("bin"), col("l_shipdate")))
    val bins = binned.groupBy("layout", "bin")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_shipdate") >= lo && col("l_shipdate") < hi, 1L)
          .otherwise(0L)).as("n_match"),
        min("l_shipdate").as("blo"), max("l_shipdate").as("bhi"))
      .withColumn("scanned",
        when(col("bhi") < lo || col("blo") >= hi, 0L).otherwise(1L))
    bins.groupBy("layout")
      .agg(count(lit(1)).as("n_bins"), sum("scanned").as("n_scanned"),
        sum("n_rows").as("rows_total"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"),
        sum("n_match").as("rows_matching"),
        (floor(sum("n_match").cast("double")
          / sum(col("scanned") * col("n_rows")) * 1000000 + lit(0.5))
          / 1000000).as("scan_efficiency"))
      .orderBy("layout")
  }

  /** Z-ORDER layout audit — zonemap_audit's multi-dimensional sibling
    * and the data-layout decision behind every OPTIMIZE ZORDER BY: for
    * a 2-D box predicate (x ∈ [256,384) ∧ y ∈ [256,384) over the
    * SF-invariant dims x = hash-spread l_partkey, y = price cents % 1024),
    * how many of 32 equal-count file-bins does a min/max zone map
    * prune under (a) a 1-D linear sort on x — tight x-ranges but every
    * bin spans all of y, so only one dimension ever prunes — vs (b) a
    * Z-ORDER curve layout (10+10-bit Morton interleave) — both dims
    * stay range-bounded per bin, so the box prunes in BOTH dimensions
    * and rows_scanned drops accordingly. Bins are the SQL-standard
    * equal-count ntile over a TOTAL order (key, l_orderkey,
    * l_linenumber) from the distributed-rank operator (never a
    * partition-less window); the Morton code, the per-bin min/max, and
    * the prune test are exact integers, so DuckDB replays the audit
    * verbatim with its own ntile window. */
  val zorderLayout: Q = Q(
    "zorder_layout",
    """WITH li AS (SELECT l_orderkey, l_linenumber,
      |    CAST(((l_partkey & 2147483647) * 2654435761) % 1024 AS BIGINT) AS x,
      |    CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) % 1024
      |      AS BIGINT) AS y FROM lineitem),
      |zz AS (SELECT l_orderkey, l_linenumber, x, y,
      |    CAST(list_sum(list_transform(range(0, 10), b ->
      |      (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b + 1))))
      |      AS BIGINT) AS zv
      |  FROM li),
      |binned AS (
      |  SELECT 'a_linear_x' AS layout,
      |    CAST(ntile(32) OVER (ORDER BY x, l_orderkey, l_linenumber)
      |      AS INTEGER) AS bucket, x, y FROM zz
      |  UNION ALL
      |  SELECT 'b_zorder',
      |    CAST(ntile(32) OVER (ORDER BY zv, l_orderkey, l_linenumber)
      |      AS INTEGER), x, y FROM zz),
      |bins AS (SELECT layout, bucket, count(*) AS n_rows,
      |    sum(CASE WHEN x >= 256 AND x < 384 AND y >= 256 AND y < 384
      |        THEN 1 ELSE 0 END) AS n_match,
      |    min(x) AS lox, max(x) AS hix,
      |    min(y) AS loy, max(y) AS hiy
      |  FROM binned GROUP BY 1, 2),
      |audit AS (SELECT layout, n_rows, n_match,
      |    CASE WHEN hix < 256 OR lox >= 384 OR hiy < 256 OR loy >= 384
      |      THEN 0 ELSE 1 END AS scanned
      |  FROM bins)
      |SELECT layout, CAST(count(*) AS BIGINT) AS n_bins,
      |  CAST(sum(scanned) AS BIGINT) AS n_scanned,
      |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
      |  CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
      |  CAST(sum(n_match) AS BIGINT) AS rows_matching,
      |  floor(CAST(sum(n_match) AS DOUBLE) / sum(scanned * n_rows)
      |    * 1000000 + 0.5) / 1000000 AS scan_efficiency
      |FROM audit GROUP BY layout ORDER BY layout""".stripMargin) { (s, d) =>
    val li0 = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      // dims must SPREAD at every SF (raw l_partkey % 1024 is 1..200 at
      // sf0.001 and the box is empty): a multiplicative hash of partkey
      // and the exact integer-cents price band both cover 0..1023 at
      // any scale, and both are replayed exactly by the oracle
      expr("((l_partkey & 2147483647) * 2654435761L) % 1024")
        .cast("long").as("x"),
      (expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)") % 1024)
        .cast("long").as("y"))
    // 10+10-bit Morton interleave: x bits land on even positions, y on
    // odd — one map-side expression, exact BIGINT. The projection is
    // cached because BOTH layouts rank it (2 × (count + range shuffle
    // + rank pass) = 6 scans uncached); ~20 MB at sf0.1.
    // Unrolled Morton interleave (optimization round 13, guide
    // §"expressions and codegen"): the former aggregate(sequence(0,9))
    // higher-order fold was interpreted per ROW (600k rows); twenty flat
    // shift/mask/OR terms whole-stage-codegen and the bitwise OR is
    // order-independent, so the BIGINT result is bit-identical.
    val withZ = li0.withColumn("zv",
      (0 until 10).map { b =>
        shiftleft(shiftright(col("x"), b).bitwiseAND(lit(1L)), 2 * b)
          .bitwiseOR(
            shiftleft(shiftright(col("y"), b).bitwiseAND(lit(1L)), 2 * b + 1))
      }.reduce(_ bitwiseOR _))
      .cache()
    def layout(name: String, key: String) =
      graft.ops.DistributedNtile.ntile(
        withZ.withColumn("layout", lit(name)),
        Seq(col(key), col("l_orderkey"), col("l_linenumber")), 32)
        .select(col("layout"), col("bucket"), col("x"), col("y"))
    val binned =
      try layout("a_linear_x", "x").unionAll(layout("b_zorder", "zv"))
      finally withZ.unpersist(blocking = false)
    // The cache is released HERE, not at battery reset() (r10 advisor:
    // library callers leaked it): ntile's rank passes are eager, so by
    // the time both layouts exist the cache has served all 6 scans and
    // the returned plan reads the LogicalRDD rank output (whose range
    // shuffles are already materialized), never withZ again — a
    // standalone invocation leaves no persisted RDD behind.
    val inBox = col("x") >= 256 && col("x") < 384 &&
      col("y") >= 256 && col("y") < 384
    val bins = binned.groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(inBox, 1L).otherwise(0L)).as("n_match"),
        min("x").as("lox"), max("x").as("hix"),
        min("y").as("loy"), max("y").as("hiy"))
      .withColumn("scanned",
        when(col("hix") < 256 || col("lox") >= 384
          || col("hiy") < 256 || col("loy") >= 384, 0L).otherwise(1L))
    bins.groupBy("layout")
      .agg(count(lit(1)).as("n_bins"), sum("scanned").as("n_scanned"),
        sum("n_rows").as("rows_total"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"),
        sum("n_match").as("rows_matching"),
        when(sum(col("scanned") * col("n_rows")) === 0, lit(0.0))
          .otherwise(floor(sum("n_match").cast("double")
            / sum(col("scanned") * col("n_rows")) * 1000000 + lit(0.5))
            / 1000000).as("scan_efficiency"))
      .orderBy("layout")
  }

  /** Equi-depth histogram + selectivity estimation — the planner
    * statistic behind every cost-based range-scan decision: 10
    * equal-count buckets over exact order-price cents (global
    * distributed ntile on a total order, never a partition-less
    * window), each bucket's [lo, hi] + rowcount, and for a fixed
    * range predicate ($100k ≤ o_totalprice ≤ $200k) the
    * uniform-within-bucket estimate n_b·overlap DIV width per bucket
    * against the exact per-bucket count — the row-level view shows
    * exactly WHERE the uniformity assumption over- or under-shoots.
    * A TOTAL row (bucket 99) carries the summed estimate against the
    * exact answer. Integer cents and integer division throughout — no
    * float anywhere in the gate. */
  val equidepthHistogram: Q = Q(
    "equidepth_histogram",
    """WITH o AS (SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |b AS (SELECT cents,
      |    CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS INTEGER)
      |      AS bucket
      |  FROM o),
      |hist AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN cents >= 10000000 AND cents <= 20000000
      |        THEN 1 ELSE 0 END) AS BIGINT) AS exact_in_range
      |  FROM b GROUP BY bucket),
      |est AS (SELECT bucket, n_rows, lo, hi, exact_in_range,
      |    CAST(CASE WHEN hi < 10000000 OR lo > 20000000 THEN 0
      |      ELSE (n_rows * (least(hi, 20000000) - greatest(lo, 10000000) + 1))
      |           // (hi - lo + 1) END AS BIGINT) AS est_in_range
      |  FROM hist)
      |SELECT bucket, n_rows, lo, hi, est_in_range, exact_in_range
      |FROM est
      |UNION ALL
      |SELECT 99, CAST(sum(n_rows) AS BIGINT), CAST(min(lo) AS BIGINT),
      |  CAST(max(hi) AS BIGINT), CAST(sum(est_in_range) AS BIGINT),
      |  CAST(sum(exact_in_range) AS BIGINT)
      |FROM est
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val binned = graft.ops.DistributedNtile.ntile(
      o, Seq(col("cents"), col("o_orderkey")), 10)
    val (rlo, rhi) = (10000000L, 20000000L)
    val hist = binned.groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("cents").as("lo"), max("cents").as("hi"),
        sum(when(col("cents") >= rlo && col("cents") <= rhi, 1L)
          .otherwise(0L)).as("exact_in_range"))
    val est = hist.withColumn("est_in_range",
      when(col("hi") < rlo || col("lo") > rhi, 0L)
        .otherwise(expr(
          s"(n_rows * (least(hi, ${rhi}L) - greatest(lo, ${rlo}L) + 1))" +
            " DIV (hi - lo + 1)")))
      .select(col("bucket"), col("n_rows"), col("lo"), col("hi"),
        col("est_in_range"), col("exact_in_range"))
    val total = est.agg(sum("n_rows").as("n_rows"), min("lo").as("lo"),
        max("hi").as("hi"), sum("est_in_range").as("est_in_range"),
        sum("exact_in_range").as("exact_in_range"))
      .select(lit(99).as("bucket"), col("n_rows"), col("lo"), col("hi"),
        col("est_in_range"), col("exact_in_range"))
    est.unionAll(total).orderBy("bucket")
  }

  /** Column-entropy profiling — the information-theoretic column
    * audit a data catalog runs beside table_stats: Shannon entropy
    * (bits), distinct count, and normalized entropy (H / log2 D —
    * how close the column sits to uniform) for the low-cardinality
    * lineitem/orders dimensions. H = log2(n) − (Σ c·ln c)/(n·ln 2)
    * keeps every count exact (one groupBy per column, V-bounded) and
    * defers ln to per-GROUP values — the same cross-engine libm
    * discipline as zipf_fit/topic_coherence — with 1e-6 floor
    * rounding at the end. Flat/near-constant columns (norm ≈ 0) and
    * uniform keys (norm ≈ 1) both read off directly. */
  val columnEntropy: Q = Q(
    "column_entropy",
    """WITH src AS (
      |  SELECT 'l_linestatus' AS col_name, l_linestatus AS val FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', l_returnflag FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity', CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'o_orderpriority', o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', o_orderstatus FROM orders),
      |cnt AS (SELECT col_name, val, CAST(count(*) AS BIGINT) AS c
      |        FROM src GROUP BY 1, 2),
      |agg AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_distinct,
      |    sum(c * ln(CAST(c AS DOUBLE))) AS slc
      |  FROM cnt GROUP BY 1)
      |SELECT col_name, n, n_distinct,
      |  floor((ln(CAST(n AS DOUBLE)) / ln(2.0)
      |      - slc / (CAST(n AS DOUBLE) * ln(2.0))) * 1000000 + 0.5)
      |    / 1000000 AS entropy_bits,
      |  CASE WHEN n_distinct = 1 THEN CAST(0.0 AS DOUBLE)
      |    ELSE floor((ln(CAST(n AS DOUBLE)) / ln(2.0)
      |        - slc / (CAST(n AS DOUBLE) * ln(2.0)))
      |      / (ln(CAST(n_distinct AS DOUBLE)) / ln(2.0))
      |      * 1000000 + 0.5) / 1000000 END AS norm_entropy
      |FROM agg ORDER BY col_name""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val or = Tables.orders(s, d)
    val src = li.select(lit("l_linestatus").as("col_name"),
        col("l_linestatus").as("val"))
      .unionAll(li.select(lit("l_returnflag"), col("l_returnflag")))
      .unionAll(li.select(lit("l_quantity"),
        col("l_quantity").cast("long").cast("string")))
      .unionAll(or.select(lit("o_orderpriority"), col("o_orderpriority")))
      .unionAll(or.select(lit("o_orderstatus"), col("o_orderstatus")))
    val cnt = src.groupBy("col_name", "val").agg(count(lit(1)).as("c"))
    val agg = cnt.groupBy("col_name")
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c").cast("double"))).as("slc"))
    val h = log(col("n").cast("double")) / log(lit(2.0)) -
      col("slc") / (col("n").cast("double") * log(lit(2.0)))
    agg.select(col("col_name"), col("n"), col("n_distinct"),
        (floor(h * 1000000 + lit(0.5)) / 1000000).as("entropy_bits"),
        when(col("n_distinct") === 1, lit(0.0))
          .otherwise(floor(h / (log(col("n_distinct").cast("double"))
            / log(lit(2.0))) * 1000000 + lit(0.5)) / 1000000)
          .as("norm_entropy"))
      .orderBy("col_name")
  }

  /** Catalog coverage audit — dead-stock detection per brand: how
    * many catalog parts have NEVER been ordered? One distinct
    * projection of the fact table + a left-join flag per part, then a
    * 25-row brand rollup with exact counts; the anti-join shape every
    * assortment review runs. */
  val catalogCoverage: Q = Q(
    "catalog_coverage",
    """WITH sold AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
      |p AS (SELECT p_brand AS brand, p_partkey,
      |    CASE WHEN sold.pk IS NULL THEN 0 ELSE 1 END AS ordered
      |  FROM part LEFT JOIN sold ON sold.pk = p_partkey)
      |SELECT brand, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(ordered) AS BIGINT) AS n_ordered,
      |  CAST(count(*) - sum(ordered) AS BIGINT) AS n_dead,
      |  floor(CAST(sum(ordered) AS DOUBLE) / count(*) * 1000000 + 0.5)
      |    / 1000000 AS coverage
      |FROM p GROUP BY brand ORDER BY brand""".stripMargin) { (s, d) =>
    val sold = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk")).distinct()
    Tables.part(s, d)
      .join(sold, col("pk") === col("p_partkey"), "left")
      .select(col("p_brand").as("brand"),
        when(col("pk").isNull, 0L).otherwise(1L).as("ordered"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_parts"), sum("ordered").as("n_ordered"),
        (count(lit(1)) - sum("ordered")).as("n_dead"),
        (floor(sum("ordered").cast("double") / count(lit(1)) * 1000000
          + lit(0.5)) / 1000000).as("coverage"))
      .orderBy("brand")
  }

  /** Broadcast-join advisor — the planner decision every star join
    * hinges on, made from MEASURED sizes instead of row-count folklore:
    * per table, estimated in-memory bytes = 8·(fixed-width cols)·rows
    * + exact summed string lengths, compared against the classic
    * 10 MB auto-broadcast threshold. One aggregate per table (six
    * scans of schema-pruned columns), exact integers; the fact table
    * lands on 'shuffle' and every dimension of this fixture on
    * 'broadcast' — with the margin visible, which is the point. */
  val broadcastAdvisor: Q = Q(
    "broadcast_advisor",
    """WITH est AS (
      |  SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(*) * 8 * 1 + sum(length(r_name)) AS BIGINT) AS est
      |  FROM region
      |  UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT),
      |    CAST(count(*) * 8 * 2 + sum(length(n_name)) AS BIGINT)
      |  FROM nation
      |  UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT),
      |    CAST(count(*) * 8 * 3 + sum(length(s_name)) AS BIGINT)
      |  FROM supplier
      |  UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT),
      |    CAST(count(*) * 8 * 3
      |      + sum(length(c_name) + length(c_mktsegment)) AS BIGINT)
      |  FROM customer
      |  UNION ALL SELECT 'part', CAST(count(*) AS BIGINT),
      |    CAST(count(*) * 8 * 3 + sum(length(p_name) + length(p_brand)
      |      + length(p_type)) AS BIGINT)
      |  FROM part
      |  UNION ALL SELECT 'lineitem', CAST(count(*) AS BIGINT),
      |    CAST(count(*) * 8 * 9 + sum(length(l_returnflag)
      |      + length(l_linestatus)) AS BIGINT)
      |  FROM lineitem)
      |SELECT tbl, n_rows, est AS est_bytes,
      |  CASE WHEN est <= 10 * 1024 * 1024 THEN 'broadcast'
      |       ELSE 'shuffle' END AS advice
      |FROM est ORDER BY tbl""".stripMargin) { (s, d) =>
    def est(name: String, df: org.apache.spark.sql.DataFrame,
        numCols: Int, strBytes: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) * 8 * numCols + sum(strBytes)).as("est"))
        .select(lit(name).as("tbl"), col("n_rows"),
          col("est").as("est_bytes"))
    est("region", Tables.region(s, d), 1, length(col("r_name")).cast("long"))
      .unionAll(est("nation", Tables.nation(s, d), 2,
        length(col("n_name")).cast("long")))
      .unionAll(est("supplier", Tables.supplier(s, d), 3,
        length(col("s_name")).cast("long")))
      .unionAll(est("customer", Tables.customer(s, d), 3,
        (length(col("c_name")) + length(col("c_mktsegment"))).cast("long")))
      .unionAll(est("part", Tables.part(s, d), 3,
        (length(col("p_name")) + length(col("p_brand"))
          + length(col("p_type"))).cast("long")))
      .unionAll(est("lineitem", Tables.lineitem(s, d), 9,
        (length(col("l_returnflag")) + length(col("l_linestatus")))
          .cast("long")))
      .select(col("tbl"), col("n_rows"), col("est_bytes"),
        when(col("est_bytes") <= 10 * 1024 * 1024, "broadcast")
          .otherwise("shuffle").as("advice"))
      .orderBy("tbl")
  }

  /** Build (once per session × fixture) the two bucketed managed
    * tables behind [[bucketJoinAudit]]: lineitem and orders, both
    * `bucketBy(8, <orderkey>).sortBy(<orderkey>)`, pre-repartitioned
    * by the SAME hash (repartition's Murmur3-pmod IS the bucket-id
    * function) so each write task holds exactly one bucket and each
    * bucket lands in exactly ONE file — the single-file-per-bucket
    * layout Spark requires before it trusts the sortBy metadata and
    * plans a sort-free, exchange-free SortMergeJoin. Table names and
    * external paths are content-keyed on the fixture (mtime + size:
    * the driver regenerates /root/testdata between rounds), so sf
    * dirs never collide and bench reps after the first reuse the
    * layout — exactly how a production deployment amortizes the
    * one-time bucketed rewrite across every downstream join. */
  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    synchronized {
      // Spark 3+ distrusts bucket sortBy metadata by default (a bucket
      // split across files has no global order) and inserts local
      // Sorts before the merge join; this layout writes exactly ONE
      // file per bucket (repartition by the bucket hash first), the
      // one case the legacy flag exists for — with it the scan reports
      // its sorted-by-key output ordering and the join is sort-free
      // too, which the Round11 suite asserts.
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val src = java.nio.file.Paths.get(s"$d/lineitem.parquet")
      val id = try s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
        catch { case _: Throwable => "nofile" }
      val key = Integer.toHexString((d + "|" + id).hashCode)
      val liT = s"graft_bkt_lineitem_$key"
      val orT = s"graft_bkt_orders_$key"
      val base = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_bucketed_$key")
      if (!s.catalog.tableExists(liT))
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .repartition(8, col("l_orderkey"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", base.resolve("lineitem").toString)
          .mode("overwrite").saveAsTable(liT)
      if (!s.catalog.tableExists(orT))
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .repartition(8, col("o_orderkey"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", base.resolve("orders").toString)
          .mode("overwrite").saveAsTable(orT)
      (liT, orT)
    }

  /** Bucketed-table layout audit (r10 verdict #1) — the physical-
    * design decision a 100 TB deployment makes weekly: bucket the two
    * biggest fact tables on their join key so every subsequent
    * fact-fact join skips the shuffle ENTIRELY. lineitem and orders
    * are written as `bucketBy(8, orderkey).sortBy(orderkey)` managed
    * tables ([[bucketedTables]]), then joined on the bucketed key with
    * a merge-join hint (the hint pins SortMergeJoin against
    * fixture-scale broadcast conversion — at production scale neither
    * side broadcasts anyway): both scans report `Bucketed: true`, the
    * join consumes the 8 bucket partitions DIRECTLY — zero Exchange
    * and zero Sort between scan and join (one file per bucket makes
    * the sortBy metadata trusted) — and the only shuffle in the whole
    * plan is the 5-group final aggregate AFTER the join. The suite
    * asserts exactly that plan shape; this gate asserts the bucketed
    * result ≡ the plain unbucketed join the oracle runs. Exact
    * integers only (quantities are integral doubles, prices exact
    * cents), so the layout cannot perturb a single bit. */
  val bucketJoinAudit: Q = Q(
    "bucket_join_audit",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val (liT, orT) = bucketedTables(s, d)
    val li = s.table(liT).hint("merge")
    val or = s.table(orT).hint("merge")
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** Build (once per session × fixture) the hive-partitioned orders
    * layout behind [[partitionPruneAudit]]: orders written
    * `partitionBy("o_month")` (80 month directories at any SF — the
    * standard date-partitioned fact layout). Content-keyed on the
    * fixture like [[bucketedTables]] so sf dirs never collide and
    * bench reps reuse the one-time rewrite. */
  private def partitionedOrders(s: SparkSession, d: String): String =
    synchronized {
      // Fail LOUDLY if the fixture is unreadable — a silent fallback key
      // would reuse a possibly-stale layout built from a different
      // fixture and fail parity downstream with no pointer back here.
      val src = java.nio.file.Paths.get(s"$d/orders.parquet")
      val id = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      val key = Integer.toHexString((d + "|" + id).hashCode)
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_part_orders_$key")
      // _SUCCESS gates completeness; cross-JVM races (bench harness and
      // test suite concurrently) are handled the buildChunkDir way:
      // write into an attempt-unique staging dir, then ATOMIC_MOVE into
      // place — the loser of the rename race discards its copy and
      // reuses the winner's (identical, content-keyed) layout.
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        val staging = java.nio.file.Files
          .createTempDirectory(s"graft_part_orders_build_$key")
        Tables.orders(s, d)
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
          // one file per month: partitionBy splits by directory, and
          // repartitioning on the partition column first keeps each
          // month's rows in one task → no small-file spray
          .repartition(col("o_month"))
          .write.partitionBy("o_month")
          .mode("overwrite").parquet(staging.toString)
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
        }
      }
      out.toString
    }

  /** Partition-pruning layout audit — the other half of the physical-
    * design family ([[bucketJoinAudit]] eliminates the JOIN shuffle;
    * this one eliminates the SCAN): orders live hive-partitioned by
    * month (`partitionBy("o_month")`), and a one-quarter query prunes
    * 77 of 80 month directories at PLANNING time — `PartitionFilters`
    * on the scan node, zero data files opened outside the quarter
    * (Round11OpsSuite asserts the scan's numFiles equals the three
    * months' file count and that the executed plan carries the
    * partition filter). The oracle replays the same quarter from the
    * RAW table, so the gate also proves the partitioned rewrite lost
    * nothing. At 100 TB this is THE first-line scan optimization:
    * directory-level skip before a single byte is read. */
  val partitionPruneAudit: Q = Q(
    "partition_prune_audit",
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y-%m') IN ('1997-01','1997-02','1997-03')
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    s.read.parquet(partitionedOrders(s, d))
      .filter(col("o_month").isin("1997-01", "1997-02", "1997-03"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_month")
  }

  /** GDPR-style cascade-delete impact audit: given an erasure batch
    * (every 10th customer by key — a deterministic stand-in for a
    * deletion-request list), count what a referential-integrity-
    * preserving delete removes from each downstream table: the
    * customers themselves, their orders (FK o_custkey), and those
    * orders' lineitems (FK l_orderkey). Pure LEFT SEMI join chain —
    * each hop shuffles on its own FK key with no row widening, the
    * plan a 100 TB deployment runs before every erasure batch to size
    * the rewrite. Output: per-table cascade counts + survivor counts
    * (n_total − n_cascade), all exact BIGINTs. */
  val cascadeDeleteAudit: Q = Q(
    "cascade_delete_audit",
    """WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 3),
      |delo AS (SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (SELECT c_custkey FROM delc)),
      |dell AS (SELECT 1 AS x FROM lineitem
      |  WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
      |SELECT tbl, n_cascade, n_total, n_total - n_cascade AS n_keep
      |FROM (
      |  SELECT 'customer' AS tbl, (SELECT count(*) FROM delc) AS n_cascade,
      |    (SELECT count(*) FROM customer) AS n_total
      |  UNION ALL
      |  SELECT 'orders', (SELECT count(*) FROM delo),
      |    (SELECT count(*) FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem', (SELECT count(*) FROM dell),
      |    (SELECT count(*) FROM lineitem))
      |ORDER BY tbl""".stripMargin) { (s, d) =>
    val delC = Tables.customer(s, d).filter(col("c_custkey") % 10 === 3)
      .select("c_custkey")
    val delO = Tables.orders(s, d).join(delC,
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    val delL = Tables.lineitem(s, d).join(delO,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    def row(tbl: String, cascade: DataFrame, total: DataFrame): DataFrame =
      cascade.agg(count(lit(1)).as("n_cascade"))
        .crossJoin(broadcast(total.agg(count(lit(1)).as("n_total"))))
        .select(lit(tbl).as("tbl"), col("n_cascade"), col("n_total"),
          (col("n_total") - col("n_cascade")).as("n_keep"))
    row("customer", delC, Tables.customer(s, d))
      .unionAll(row("orders", delO, Tables.orders(s, d)))
      .unionAll(row("lineitem", delL, Tables.lineitem(s, d)))
      .orderBy("tbl")
  }

  /** The join-agg behind [[runtimeFilterAudit]], factored out so the
    * suite can assert the injected plan under the same conf window. */
  private[queries] def runtimeFilteredJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))

  /** Run `body` with Spark's runtime bloom-filter injection forced ON
    * for a shuffle join at fixture scale (thresholds that are all
    * defaults-compatible at 100 TB: the application side IS huge and
    * the join IS a shuffle join there; locally we pin them so the same
    * plan materializes). Session confs are restored after — the
    * battery runs queries sequentially. */
  private[queries] def withRuntimeFilter[A](s: SparkSession)(body: => A): A = {
    val pins = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    pins.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** RUNTIME-FILTER join pruning audit — the dynamic member of the
    * physical-optimization family (zonemap = static data skipping,
    * zorder = clustering, bucketing = shuffle elimination, partition
    * dirs = planning-time pruning; this one prunes AT RUNTIME): a
    * selective dimension filter (urgent orders) is turned by Spark's
    * InjectRuntimeFilter rule into a bloom filter evaluated on the
    * fact scan, so lineitem rows that cannot join are dropped BEFORE
    * the shuffle — at 100 TB this is the difference between shuffling
    * the whole fact table and shuffling the ~20% that survives. The
    * suite asserts BloomFilterMightContain sits in the optimized plan
    * under the pinned conf window; this gate asserts the bloom path
    * loses nothing (FPs are re-verified by the join itself) vs the
    * DuckDB replay of the plain join. CONSTRUCTION IS EAGER: the full
    * join runs inside a collect() during DataFrame construction, because
    * the bloom injection happens at optimization time and the conf pins
    * must be live (and restored) around it — so plan-only tooling
    * (Explain / PlanAudit / plan-scanning suites) that merely constructs
    * this query's DataFrame executes the join as a side effect. Tools
    * that sweep every query's plan should skip this one (the plan they
    * would see is the trivial localtable anyway); the result is one
    * exact-integer row. */
  val runtimeFilterAudit: Q = Q(
    "runtime_filter_audit",
    """SELECT CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'""".stripMargin) { (s, d) =>
    val row = withRuntimeFilter(s) { runtimeFilteredJoin(s, d).collect() }
    import s.implicits._
    row.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("n_items", "sum_qty", "cents")
  }

  /** The skewed fact-dim join-agg behind [[skewJoinAudit]], factored
    * out so the suite can assert the AQE plan under the same conf
    * window. The fact side collapses every 4th orderkey onto the single
    * key 0 (~25% of lineitem in ONE shuffle partition — the classic
    * hot-key profile `q71_key_skew_profile` measures); the dim side is
    * unique on the join key (the collapsed orders replaced by one
    * sentinel row), so the skew is pure partition-size skew with no
    * output blow-up. The fact side is round-robin repartitioned into 16
    * map tasks first: AQE splits a skewed REDUCE partition along MAP-
    * output boundaries, and the single-row-group fixture parquet would
    * otherwise arrive from ONE mapper (unsplittable) — at 100 TB the
    * fact side always arrives from thousands of upstream mappers, which
    * is the shape this simulates. */
  private[queries] def skewedJoinAgg(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 4 === 0, 0L)
        .otherwise(col("l_orderkey")).as("sk"),
      col("l_quantity"), col("l_extendedprice"))
      .repartition(16)
    val dim = Tables.orders(s, d).filter(col("o_orderkey") % 4 =!= 0)
      .select(col("o_orderkey").as("rk"), col("o_orderpriority"))
      .unionAll(s.range(1).select(lit(0L).as("rk"),
        lit("0-SKEW").as("o_orderpriority")))
    fact.join(dim, col("sk") === col("rk"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** Run `body` with AQE's dynamic skew-join split forced live at
    * fixture scale: thresholds scaled down so the hot partition
    * qualifies locally (at 100 TB the DEFAULTS fire — 256MB threshold,
    * 5x median factor — this window only shrinks the trigger sizes),
    * broadcast disabled so the join is the SortMergeJoin the skew rule
    * rewrites. Session confs restored after — the battery runs queries
    * sequentially. */
  private[queries] def withSkewSplit[A](s: SparkSession)(body: => A): A = {
    val pins = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    pins.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** AQE SKEW-JOIN audit — the last missing member of the
    * physical-optimization family (r11 verdict #4: static partition
    * prune, runtime bloom prune, bucketed shuffle elimination, zonemap
    * skip, zorder clustering… and now the DYNAMIC skew mitigation a
    * production cluster reaches for FIRST, before the manual
    * `q67_salted_join` fallback): a fact table with ~25% of its rows on
    * one hot key is joined to a key-unique dimension under
    * `spark.sql.adaptive.skewJoin` thresholds that let AQE detect the
    * oversized shuffle partition at RUNTIME and split it into multiple
    * reducer tasks (duplicating the matching dim partition), turning
    * the straggler into parallel work with NO change to the query. The
    * Round12 suite asserts the executed plan carries the skew markers
    * (`isSkewJoin`/AQEShuffleRead skewed) under the pinned window AND
    * that the un-pinned plan differs; this gate asserts the split
    * loses nothing — result ≡ the DuckDB replay of the plain join,
    * exact integers only. CONSTRUCTION IS EAGER (the
    * runtime_filter_audit device): skew re-planning happens during
    * execution, so the conf window wraps a collect() and plan-only
    * tools should skip this op. */
  val skewJoinAudit: Q = Q(
    "skew_join_audit",
    """WITH fact AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
      |      ELSE l_orderkey END AS sk,
      |    l_quantity, l_extendedprice FROM lineitem),
      |dim AS (SELECT o_orderkey AS rk, o_orderpriority FROM orders
      |    WHERE o_orderkey % 4 <> 0
      |  UNION ALL SELECT 0, '0-SKEW')
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM fact JOIN dim ON sk = rk
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val rows = withSkewSplit(s) { skewedJoinAgg(s, d).collect() }
    import s.implicits._
    rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toDF("o_orderpriority", "n_items", "sum_qty", "cents")
  }

  /** DYNAMIC partition pruning audit — the star-schema companion to
    * [[partitionPruneAudit]]: there the pruning months are LITERALS the
    * planner folds into the file listing; here they are only known by
    * JOINING a dimension (the distinct ship months of a lineitem
    * quarter), so static pruning is impossible and Spark's
    * PartitionPruning rule instead plants a DynamicPruningExpression on
    * the fact scan's partition filters — the broadcast built for the
    * join is reused as an IN-filter over the partition column, and 77
    * of 80 month directories are skipped AT RUNTIME before a byte of
    * fact data is read. This is THE optimization that makes
    * date-partitioned 100 TB star schemas queryable: the dim filter
    * (not the analyst) decides which partitions exist for the query.
    * The dim side is explicitly `broadcast()` — a months dimension is
    * ≤ thousands of rows at ANY corpus size, and DPP's default
    * reuseBroadcastOnly mode prunes for free exactly when the join
    * side broadcasts. Round12OpsSuite asserts the executed scan carries
    * the dynamicpruning partition filter, that it read only the 3
    * surviving month files, and that disabling the rule removes the
    * filter; this gate asserts the pruned plan loses nothing vs the
    * DuckDB replay of the raw join. Exact integers only. */
  val dppAudit: Q = Q(
    "dpp_audit",
    """WITH dim AS (SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS s_month
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'),
      |f AS (SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
      |  FROM orders)
      |SELECT o_month, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM f JOIN dim ON o_month = s_month
      |GROUP BY o_month ORDER BY o_month""".stripMargin) { (s, d) =>
    dppJoinAgg(s, d)
  }

  /** The pruned join-agg behind [[dppAudit]], factored out so the suite
    * can assert the executed plan (and its counterfactual with the rule
    * disabled) on the same DataFrame shape. */
  private[queries] def dppJoinAgg(s: SparkSession, d: String): DataFrame = {
    val fact = s.read.parquet(partitionedOrders(s, d))
    val dim = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("s_month"))
      .distinct()
    fact.join(broadcast(dim), col("o_month") === col("s_month"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_month")
  }

  /** The fact-dim join-agg behind [[aqeBhjAudit]], factored out so the
    * suite can assert both plans under its own conf windows. The dim
    * side (suppliers in 5 of 25 nations) is small at runtime but the
    * static planner is denied that knowledge (broadcast threshold -1),
    * so the initial plan is a SortMergeJoin. */
  private[queries] def bhjJoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d).filter(col("s_nationkey") < 5)
          .select(col("s_suppkey"),
            col("s_nationkey").cast("long").as("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("s_nationkey")

  /** Run `body` with AQE's runtime SMJ→BHJ demotion live: the STATIC
    * broadcast threshold is -1 (the planner must not know the dim is
    * small — at 100 TB its pre-filter size estimate routinely misses),
    * while the ADAPTIVE threshold re-enables the conversion from the
    * TRUE post-shuffle size AQE measures at runtime. Session confs
    * restored after — the battery runs queries sequentially. NOTE
    * (r12 advisor, applies to every set/restore conf window in this
    * file plus withCbo/withRocksDbState): these windows mutate
    * session-GLOBAL SQL confs and are safe only under the documented
    * sequential battery; if declared queries ever run concurrently on
    * one SparkSession, switch to per-query cloned sessions
    * (SparkSession.newSession) instead of pin/restore. */
  private[queries] def withAqeBhj[A](s: SparkSession)(body: => A): A = {
    val pins = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB",
      "spark.sql.adaptive.localShuffleReader.enabled" -> "true")
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    pins.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** AQE runtime BROADCAST-DEMOTION audit — the optimistic half of the
    * adaptive family ([[skewJoinAudit]] splits what turned out too BIG;
    * this one broadcasts what turned out SMALL): the static planner,
    * denied size knowledge (broadcast threshold -1 — the 100 TB
    * situation whenever a selective dim filter defeats the stats),
    * plans a SortMergeJoin; AQE measures the dim's true post-shuffle
    * size after the first stage and REWRITES the join to a
    * BroadcastHashJoin with a local (shuffle-free) read on the fact
    * side — the probe side's exchange never crosses the network. The
    * Round12 suite asserts the final adaptive plan carries the BHJ
    * while the initial plan was an SMJ, and that pinning the adaptive
    * threshold to -1 keeps the SMJ (the demotion is live, not
    * incidental); this gate asserts the rewritten plan loses nothing
    * vs the DuckDB replay. CONSTRUCTION IS EAGER (the
    * runtime_filter_audit device): the rewrite happens during
    * execution, so the conf window wraps a collect() and plan-only
    * tools should skip this op. */
  val aqeBhjAudit: Q = Q(
    "aqe_bhj_audit",
    """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey < 5
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
    val rows = withAqeBhj(s) { bhjJoinAgg(s, d).collect() }
    import s.implicits._
    rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toDF("s_nationkey", "n_items", "sum_qty", "cents")
  }

  /** The wide-shuffle aggregate behind [[aqeCoalesceAudit]], factored
    * out for the suite's plan assertions. */
  private[queries] def coalesceAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linenumber").cast("long").as("l_linenumber"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("l_linenumber")

  /** Run `body` with a deliberately over-provisioned shuffle (200
    * reducers — the classic static-conf mistake) and AQE's partition
    * coalescing live, so the runtime folds the hundreds of tiny
    * post-shuffle partitions back to a handful of advisory-sized ones.
    * Session confs restored after. */
  private[queries] def withAqeCoalesce[A](s: SparkSession)(enabled: Boolean)(
      body: => A): A = {
    val pins = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> enabled.toString,
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.shuffle.partitions" -> "200")
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    pins.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** AQE partition-COALESCING audit — the third adaptive member
    * (dynamic skew split, runtime broadcast demotion, and now the
    * shuffle right-sizing every misconfigured cluster relies on
    * daily): a 7-group aggregate shuffled across 200 static reducer
    * partitions produces ~193 empty and 7 near-empty tasks; AQE
    * measures the real map-output sizes and coalesces contiguous
    * partitions up to the advisory size, so the reduce stage runs a
    * handful of tasks instead of 200 (at 100 TB the same mechanism
    * stops a mis-set `spark.sql.shuffle.partitions` from scheduling
    * hundreds of thousands of no-op tasks — scheduling overhead IS a
    * scale bottleneck). The Round12 suite asserts the final plan's
    * AQEShuffleRead is `coalesced` with far fewer output partitions
    * than 200, and that disabling coalescing keeps all 200; this gate
    * asserts right-sizing loses nothing vs the DuckDB replay.
    * CONSTRUCTION IS EAGER (conf window around a collect()); plan-only
    * tools should skip this op. */
  val aqeCoalesceAudit: Q = Q(
    "aqe_coalesce_audit",
    """SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM lineitem
      |GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin) { (s, d) =>
    val rows = withAqeCoalesce(s)(enabled = true) { coalesceAgg(s, d).collect() }
    import s.implicits._
    rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toDF("l_linenumber", "n_items", "sum_qty", "cents")
  }

  /** Build (once per session × fixture) the small-file landing zone
    * behind [[compactionAudit]]: orders sprayed round-robin across 64
    * tiny parquet files — the layout every event-ingestion directory
    * degrades into (one file per writer per trigger). Content-keyed,
    * staged, atomically published like [[partitionedOrders]]. */
  private def smallFileOrders(s: SparkSession, d: String): String =
    synchronized {
      val src = java.nio.file.Paths.get(s"$d/orders.parquet")
      val id = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      val key = Integer.toHexString((d + "|" + id).hashCode)
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_smallfiles_$key")
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        val staging = java.nio.file.Files
          .createTempDirectory(s"graft_smallfiles_build_$key")
        Tables.orders(s, d).repartition(64)
          .write.mode("overwrite").parquet(staging.toString)
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
        }
      }
      out.toString
    }

  /** Target compacted file size. 1 MiB at fixture scale so the fixture
    * genuinely bin-packs to >1 file; production uses 128–1024 MiB (one
    * HDFS/object-store block) — the arithmetic is identical. */
  private val CompactTargetBytes = 1L << 20

  /** Compact the small-file zone: list the data files, size the output
    * as ceil(totalBytes / target), and rewrite via `coalesce` — a
    * file-merge compactor must NOT shuffle (the rows are worthless to
    * co-locate; only the file count matters), and coalesce folds input
    * partitions into output tasks with zero exchange. Returns the
    * compacted dir. Content-keyed on the SOURCE zone so bench reps
    * reuse the one-time rewrite. */
  private[queries] def compactedOrders(s: SparkSession, d: String): String =
    synchronized {
      val srcDir = java.nio.file.Paths.get(smallFileOrders(s, d))
      // Files.list holds an open directory fd until closed; this runs
      // before the _SUCCESS short-circuit on EVERY invocation, so an
      // unclosed stream leaks one fd per bench rep (r12 advisor).
      val dataFiles = scala.util.Using.resource(
        java.nio.file.Files.list(srcDir)) { st =>
        st.iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq
      }
      val totalBytes = dataFiles.map(java.nio.file.Files.size).sum
      val nOut = math.max(1L, (totalBytes + CompactTargetBytes - 1) / CompactTargetBytes).toInt
      val out = srcDir.resolveSibling(srcDir.getFileName.toString + "_compacted")
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        val staging = java.nio.file.Files
          .createTempDirectory("graft_compact_build_")
        s.read.parquet(srcDir.toString).coalesce(nOut)
          .write.mode("overwrite").parquet(staging.toString)
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
        }
      }
      out.toString
    }

  /** Small-file COMPACTION audit — the #1 recurring maintenance job of
    * any 100 TB lake: a 64-file ingestion spray of the orders table is
    * bin-packed to ceil(totalBytes / targetFileSize) files via a
    * shuffle-free `coalesce` rewrite (a compactor that shuffles pays
    * the whole table over the network for nothing — rows need merging,
    * not co-locating). The Round12 suite asserts the compacted zone
    * has exactly the computed file count (≪ 64) and is row-for-row
    * identical to the spray; this gate aggregates FROM THE COMPACTED
    * FILES against the DuckDB replay over the raw table, so the
    * rewrite provably lost nothing. At production block sizes the same
    * arithmetic yields 128 MiB–1 GiB files — the difference between a
    * scan scheduling 10⁶ splits and 10³. */
  val compactionAudit: Q = Q(
    "compaction_audit",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    s.read.parquet(compactedOrders(s, d))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** Build (once per session × fixture) the month-partitioned lake
    * zone behind [[dynamicOverwriteAudit]], then apply ONE dynamic
    * partition overwrite: the base layout partitions orders by month
    * (`yyyy-MM` string); the "daily correction" rewrites ONLY the
    * minimum month — its rows re-keyed to negated order keys, a pure
    * integer content change with zero floating-point hazard — under
    * `partitionOverwriteMode=dynamic`, so every other partition's
    * files are physically untouched (Round13OpsSuite asserts the
    * file listings). Content-keyed, staged, atomically published;
    * the done-marker is `_GRAFT_DONE` because Spark itself writes
    * `_SUCCESS` on every write into the zone. */
  private[queries] def dynOverwrittenOrders(s: SparkSession, d: String)
      : String = synchronized {
    val src = java.nio.file.Paths.get(s"$d/orders.parquet")
    val id = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
    val key = Integer.toHexString((d + "|" + id).hashCode)
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_dynover_$key")
    val done = out.resolve("_GRAFT_DONE")
    if (!java.nio.file.Files.exists(done)) {
      val staging = java.nio.file.Files
        .createTempDirectory(s"graft_dynover_build_$key")
      val ord = Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      ord.write.mode("overwrite").partitionBy("month")
        .parquet(staging.toString)
      val minMonth = ord.agg(min("month")).head.getString(0)
      ord.filter(col("month") === minMonth)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("month").parquet(staging.toString)
      java.nio.file.Files.createFile(staging.resolve("_GRAFT_DONE"))
      try java.nio.file.Files.move(staging, out,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.FileSystemException =>
        org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
      }
    }
    out.toString
  }

  /** DYNAMIC PARTITION OVERWRITE audit (round 13, lake-maintenance
    * family) — the daily-ETL idiom: re-materialize ONLY the partitions
    * the day's correction touches, leaving every other partition's
    * files physically in place. Static overwrite (Spark's default)
    * would DELETE the whole table first — the suite proves that
    * counterfactual on a throwaway copy (one partition survives) and
    * proves dynamic mode leaves the untouched partitions' file
    * listings byte-for-byte identical. The gate reads the final zone
    * and checks per-month row counts and exact integer key sums
    * against the oracle's replay of the correction (min month's keys
    * negated). At 100 TB this is the difference between rewriting
    * 80 TB nightly and rewriting one day's partition. */
  lazy val dynamicOverwriteAudit: Q = Q(
    "dynamic_overwrite_audit",
    """WITH mm AS (SELECT strftime(min(date_trunc('month', o_orderdate)),
      |    '%Y-%m') AS m FROM orders),
      |base AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CASE WHEN strftime(o_orderdate, '%Y-%m') = (SELECT m FROM mm)
      |      THEN -o_orderkey ELSE o_orderkey END AS k
      |  FROM orders)
      |SELECT month, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS key_sum,
      |  CAST(min(k) AS BIGINT) AS min_key
      |FROM base GROUP BY month ORDER BY month""".stripMargin) { (s, d) =>
    s.read.parquet(dynOverwrittenOrders(s, d))
      .groupBy("month")
      .agg(count(lit(1)).as("n"),
        sum("o_orderkey").as("key_sum"),
        min("o_orderkey").as("min_key"))
      .select(col("month"), col("n"), col("key_sum"), col("min_key"))
      .orderBy("month")
  }

  /** VARIANT semi-structured extraction (round 13) — Spark 4's
    * headline type for JSON-shaped data: `parse_json` turns the props
    * string into a binary VARIANT once, `variant_get` extracts typed
    * fields WITHOUT re-tokenizing the JSON text per access (the
    * engine-path difference vs q44's get_json_object, which re-parses
    * the string for every path; with several extracted fields per row
    * at 100 TB, parse-once is the difference between one and N parses
    * per row). Gate: per-type aggregates of the extracted integer —
    * count/sum/min/max, all exact. The Round13 suite asserts the
    * VariantGet expression is really in the plan and that the variant
    * path agrees with the string path row-for-row. */
  lazy val variantAgg: Q = Q(
    "variant_agg",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS k_sum,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS k_min,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")
  }

  private val obsId = new java.util.concurrent.atomic.AtomicLong(0)

  /** `Dataset.observe` metrics (round 13) — the production
    * data-quality hook: named aggregate metrics that ride the SAME
    * scan as the real query (zero extra passes — at 100 TB a second
    * validation scan doubles the bill, which is exactly what observe
    * exists to avoid). The real query here is the per-user purchase
    * count; the observation collects row count, null-props count,
    * value-threshold counts, and id bounds off the identical
    * (pre-filter) scan, and the declared RESULT is the observed
    * metrics themselves, gated against the oracle's straight
    * aggregates — proving the piggybacked metrics equal what a
    * dedicated scan would have computed. EAGER execution (scaladoc
    * contract shared with the audit family): the noop action inside
    * the builder is what materializes the observation; the returned
    * DataFrame is the 5-row metric table. Integer metrics only — no
    * accumulation-order hazard. */
  lazy val observeMetrics: Q = Q(
    "observe_metrics",
    """SELECT * FROM (
      |  SELECT 'max_id' AS metric, CAST(max(event_id) AS BIGINT) AS value
      |    FROM events
      |  UNION ALL
      |  SELECT 'min_id', CAST(min(event_id) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'n_big_value', CAST(sum(CASE WHEN value >= 100 THEN 1
      |    ELSE 0 END) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'n_null_props', CAST(sum(CASE WHEN props IS NULL THEN 1
      |    ELSE 0 END) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'n_rows', CAST(count(*) AS BIGINT) FROM events
      |) ORDER BY metric""".stripMargin) { (s, d) =>
    val obs = org.apache.spark.sql.Observation(
      s"graft_dq_${obsId.incrementAndGet()}")
    val observed = Tables.events(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1).otherwise(0)).as("n_null_props"),
        sum(when(col("value") >= 100, 1).otherwise(0)).as("n_big_value"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"))
    // the REAL query the metrics piggyback on (its result is not the
    // declared output; the metric table is)
    observed.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    val rows = Seq("max_id", "min_id", "n_big_value", "n_null_props",
      "n_rows").map(k => (k, m(k).toString.toLong))
    import s.implicits._
    rows.toDF("metric", "value").orderBy("metric")
  }

  /** Build (once per session × fixture) the two-vintage layout behind
    * [[schemaDriftAudit]]: vintage 1 (even order keys) was written
    * BEFORE a migration added `o_orderpriority`; vintage 2 (odd keys)
    * carries the new column. Plain subdirectories (not hive
    * `key=value` names), so nothing is partition-inferred — the drift
    * lives in the FILE schemas, which is the production situation. */
  private[queries] def driftedOrders(s: SparkSession, d: String): String =
    synchronized {
      val src = java.nio.file.Paths.get(s"$d/orders.parquet")
      val id = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      val key = Integer.toHexString((d + "|" + id).hashCode)
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_drift_$key")
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        val staging = java.nio.file.Files
          .createTempDirectory(s"graft_drift_build_$key")
        Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .coalesce(1).write.mode("overwrite")
          .parquet(staging.resolve("batch_v1").toString)
        Tables.orders(s, d).filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .coalesce(1).write.mode("overwrite")
          .parquet(staging.resolve("batch_v2").toString)
        java.nio.file.Files.createFile(staging.resolve("_SUCCESS"))
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
        }
      }
      out.toString
    }

  /** SCHEMA-DRIFT (evolution) audit — reading a table whose files
    * straddle a column-adding migration, the situation every long-lived
    * lake table is permanently in: vintage-1 files lack
    * `o_orderpriority`, vintage-2 files carry it, and the scan must
    * reconcile them (`mergeSchema` + recursive listing) into one
    * DataFrame where pre-migration rows surface the new column as NULL
    * — never dropped, never misaligned by ordinal. The aggregate groups
    * on the drifted column with NULLs bucketed as '(pre-migration)',
    * and the DuckDB replay derives the same bucketing from the raw
    * table (even keys = vintage 1), so the gate proves schema
    * reconciliation lost nothing. Per-file footer merge is
    * embarrassingly parallel at 100 TB; production turns on exactly
    * these two reader options. */
  val schemaDriftAudit: Q = Q(
    "schema_drift_audit",
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(pre-migration)'
      |  ELSE o_orderpriority END AS prio,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    s.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(driftedOrders(s, d))
      .groupBy(coalesce(col("o_orderpriority"), lit("(pre-migration)"))
        .as("prio"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("prio")
  }

  /** CDC changelog apply — materialize a snapshot from an insert/
    * update/delete event log under AT-LEAST-ONCE delivery, the core op
    * of every replication pipeline (Debezium → lake). The changelog is
    * derived deterministically from orders: v1 INSERT for every key,
    * v2 UPDATE (+500 cents) for keys ≡ 0 mod 3, v3 DELETE for keys ≡ 0
    * mod 7 — and the v2 stream is delivered TWICE to model redelivery.
    * Apply is ONE hash shuffle on the key: row_number() over
    * (PARTITION BY key ORDER BY version DESC) picks the last writer,
    * `op <> 'D'` drops deleted keys, and redelivered duplicates are
    * harmless by construction (identical rows tie on version; whichever
    * wins, the VALUES are equal — idempotence without a pre-dedup
    * pass, which is exactly why CDC consumers key rank by version
    * rather than dropDuplicates first: one shuffle instead of two). At
    * 100 TB the same plan applies a day's changelog to a keyed
    * snapshot in one exchange; the DuckDB replay computes the
    * surviving state in closed form. Exact integer cents. */
  val cdcApply: Q = Q(
    "cdc_apply",
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |    + CASE WHEN o_orderkey % 3 = 0 THEN 500 ELSE 0 END)
      |    AS BIGINT) AS cents
      |FROM orders WHERE o_orderkey % 7 <> 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val ins = base.select(col("k"), lit(1L).as("version"),
      lit("I").as("op"), col("st"), col("cents"))
    val upd = base.filter(col("k") % 3 === 0)
      .select(col("k"), lit(2L).as("version"), lit("U").as("op"),
        col("st"), (col("cents") + 500).as("cents"))
    val del = base.filter(col("k") % 7 === 0)
      .select(col("k"), lit(3L).as("version"), lit("D").as("op"),
        col("st"), lit(0L).as("cents"))
    val log = ins.unionAll(upd).unionAll(upd).unionAll(del)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("version").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy(col("st").as("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("cents"))
      .orderBy("o_orderstatus")
  }

  /** The month-over-month self-join behind [[exchangeReuseAudit]],
    * factored out for the suite's plan assertions: ONE aggregate view
    * referenced twice (this month, previous month). */
  private[queries] def momSelfJoin(s: SparkSession, d: String): DataFrame = {
    val m = Tables.orders(s, d)
      .groupBy(expr("CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)")
        .as("idx"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
    m.as("a").join(m.as("b"), col("a.idx") === col("b.idx") + 1)
      .select(col("a.idx").as("idx"), col("a.cents").as("cents"),
        col("b.cents").as("prev_cents"))
      .orderBy("idx")
  }

  /** EXCHANGE-REUSE audit — the plan-deduplication optimization behind
    * every self-joined aggregate view (month-over-month, share-of-
    * total, same-store sales): the monthly-revenue aggregate is
    * referenced TWICE (current and previous month), and Spark's
    * ReuseExchange rule (stage reuse under AQE) detects the two
    * identical shuffles by canonical plan equality and computes the
    * aggregate ONCE — the second reference reads the first's shuffle
    * output. At 100 TB this halves the dominant cost of the most
    * common reporting topology; a planner without it pays the fact
    * scan + shuffle twice. The Round12 suite asserts ReusedExchange in
    * the executed plan and that `spark.sql.exchange.reuse=false`
    * removes it while leaving the result identical; this gate asserts
    * the deduplicated plan matches the DuckDB replay of the CTE
    * self-join. Exact integer cents. */
  val exchangeReuseAudit: Q = Q(
    "exchange_reuse_audit",
    """WITH m AS (SELECT CAST(year(o_orderdate)*12 + month(o_orderdate)
      |    AS BIGINT) AS idx,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT a.idx AS idx, a.cents AS cents, b.cents AS prev_cents
      |FROM m a JOIN m b ON a.idx = b.idx + 1
      |ORDER BY idx""".stripMargin) { (s, d) =>
    momSelfJoin(s, d)
  }

  /** Build (once per session × fixture) the three ANALYZEd catalog
    * tables behind [[cboJoinReorderAudit]] — row counts AND column
    * stats (ndv, min/max), the inputs Spark's cost-based optimizer
    * needs to estimate join cardinalities. Content-keyed names like
    * [[bucketedTables]]; returns (lineitem, orders, customer) table
    * names. */
  private[queries] def cboTables(s: SparkSession, d: String)
      : (String, String, String) = synchronized {
    val src = java.nio.file.Paths.get(s"$d/lineitem.parquet")
    val id = try s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      catch { case _: Throwable => "nofile" }
    // JVM-unique suffix: the in-memory catalog is per-session, but the
    // default warehouse DIRECTORY is shared across concurrently-running
    // JVMs (bench harness + test suite) — a fresh catalog creating a
    // table over another process's leftover location fails with
    // locationAlreadyExists, so both the names and the external paths
    // carry the pid. The tables are 3 tiny projections; per-JVM rebuild
    // is trivial.
    val key = Integer.toHexString((d + "|" + id).hashCode) +
      "_p" + ProcessHandle.current().pid()
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_cbo_$key")
    val (li, or, cu) =
      (s"graft_cbo_li_$key", s"graft_cbo_or_$key", s"graft_cbo_cu_$key")
    def build(name: String, sub: String, df: => DataFrame): Unit =
      if (!s.catalog.tableExists(name)) {
        df.write.mode("overwrite")
          .option("path", base.resolve(sub).toString).saveAsTable(name)
        s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
        ()
      }
    build(li, "li", Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_extendedprice"))
    build(or, "or", Tables.orders(s, d).select("o_orderkey", "o_custkey"))
    build(cu, "cu", Tables.customer(s, d).select("c_custkey", "c_mktsegment"))
    (li, or, cu)
  }

  /** The deliberately mis-ordered 3-way star join behind
    * [[cboJoinReorderAudit]] — written fact-first (lineitem ⋈ orders,
    * THEN the selective customer filter), the order an analyst types
    * and a syntactic planner executes. Returns the DataFrame plus the
    * three table names so the suite can track join order in the
    * optimized plan. */
  private[queries] def cboStarJoin(s: SparkSession, d: String)
      : (DataFrame, (String, String, String)) = {
    val (li, or, cu) = cboTables(s, d)
    val df = s.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
         |    AS BIGINT) AS cents
         |FROM $li JOIN $or ON l_orderkey = o_orderkey
         |JOIN $cu ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    (df, (li, or, cu))
  }

  /** Run `body` with the cost-based optimizer and its join-reorder
    * rule live (off by default in Spark — a production warehouse turns
    * both on after ANALYZE). Session confs restored after. */
  private[queries] def withCbo[A](s: SparkSession)(enabled: Boolean)(
      body: => A): A = {
    val pins = Seq(
      "spark.sql.cbo.enabled" -> enabled.toString,
      "spark.sql.cbo.joinReorder.enabled" -> enabled.toString)
    val prev = pins.map { case (k, _) => k -> s.conf.getOption(k) }
    pins.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** COST-BASED join-reorder audit — the optimizer family's LAST
    * member, and the only one driven by CATALOG STATISTICS rather than
    * runtime measurement: a 3-way star join written fact-first
    * (lineitem ⋈ orders, then the selective one-segment customer
    * filter — the order an analyst types) is REORDERED by Spark's CBO,
    * which estimates from ANALYZE-collected ndv/min-max column stats
    * that orders ⋈ σ(customer) is ~5× smaller than lineitem ⋈ orders
    * and joins the dimensions first, so the fact table meets an
    * already-reduced build side. At 100 TB written-order execution
    * materializes a full-fact intermediate; the reorder is the
    * difference between shuffling 100 TB twice and once. The Round12
    * suite asserts the optimized join order CHANGES under CBO (dims
    * first) and matches the written order without it, with equal
    * results; this gate asserts the reordered plan loses nothing vs
    * the DuckDB replay. CONSTRUCTION IS EAGER (the runtime_filter
    * device): CBO runs at optimization time inside the conf window, so
    * plan-only tools should skip this op. */
  val cboJoinReorderAudit: Q = Q(
    "cbo_join_reorder_audit",
    """SELECT CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'""".stripMargin) { (s, d) =>
    val rows = withCbo(s)(enabled = true) { cboStarJoin(s, d)._1.collect() }
    import s.implicits._
    rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("n_items", "sum_qty", "cents")
  }

  /** Build (once per session × fixture) the ORC copy of orders behind
    * [[orcRoundtrip]] — content-keyed, staged, atomically published
    * like [[partitionedOrders]]. */
  private[queries] def orcOrders(s: SparkSession, d: String): String =
    synchronized {
      val src = java.nio.file.Paths.get(s"$d/orders.parquet")
      val id = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      val key = Integer.toHexString((d + "|" + id).hashCode)
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_orc_orders_$key")
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        val staging = java.nio.file.Files
          .createTempDirectory(s"graft_orc_build_$key")
        Tables.orders(s, d).coalesce(4)
          .write.mode("overwrite").orc(staging.toString)
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.FileSystemException =>
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
        }
      }
      out.toString
    }

  /** ORC format ROUND-TRIP + pushdown audit — the second columnar
    * format every multi-engine lake carries (Hive/Trino interop):
    * orders is rewritten through Spark's native ORC writer and read
    * back through the vectorized ORC reader with a selective predicate
    * that must reach the ORC scan as a pushed filter (ORC evaluates it
    * against stripe/row-group min-max indexes — the zonemap mechanism,
    * format-native). The gate aggregates the high-value orders FROM
    * THE ORC COPY against the DuckDB replay over the raw parquet, so
    * the round-trip provably loses nothing — values, types, and NULL
    * semantics all survive the format change bit-for-bit (doubles are
    * IEEE in both formats; timestamps compared through the same UTC
    * session). The Round12 suite additionally asserts the pushed
    * filter on the executed ORC scan and full row-identity both ways.
    * Exact integers in the output. */
  val orcRoundtrip: Q = Q(
    "orc_roundtrip",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders WHERE o_totalprice >= 150000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    s.read.orc(orcOrders(s, d))
      .filter(col("o_totalprice") >= 150000)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(incrAggMerge, compactBins, tableStats, incrJoinDelta,
    snapshotDiff, kAnonymity, dqScorecard, lDiversity, tCloseness,
    zonemapAudit, zorderLayout, equidepthHistogram, columnEntropy,
    bucketJoinAudit, partitionPruneAudit, cascadeDeleteAudit,
    runtimeFilterAudit, skewJoinAudit, dppAudit, aqeBhjAudit,
    aqeCoalesceAudit, compactionAudit, schemaDriftAudit, cdcApply,
    exchangeReuseAudit, cboJoinReorderAudit, orcRoundtrip,
    dynamicOverwriteAudit, observeMetrics, variantAgg,
    catalogCoverage, broadcastAdvisor)
}
