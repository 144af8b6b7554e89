package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics as declared queries. Connected components
  * (the dedup-clustering workhorse) lives in graft.dedup and is
  * declared via dedup_components; this object adds PageRank — the
  * canonical "iterate joins to a fixpoint" shape a Spark engine must
  * run well at scale (each iteration = one equi-join on src + one
  * groupBy on dst, both shuffle-partitioned by node key; nothing ever
  * collects to the driver).
  */
object GraphOps {

  /** PageRank (3 unrolled power iterations, damping 0.85) over the
    * bipartite part ↔ supplier graph induced by lineitem, with an
    * undirected edge where a supplier shipped a part. Symmetric edges
    * mean no dangling mass, so the per-iteration update is exactly
    *   r'(v) = 0.15/N + 0.85 * Σ_{u~v} r(u)/deg(u).
    * A FIXED iteration count (not convergence-tested) keeps the result
    * a pure function of the input, so DuckDB replays it with unrolled
    * CTEs. Ranks are emitted for EVERY node, ordered by node id — never
    * by the float rank, so accumulation-order ulp drift between engines
    * can't change row membership or order; values are rounded to 1e-6,
    * nine orders of magnitude above double noise.
    *
    * Engine shape: nodes are PACKED LONGS internally (part → 2·key,
    * supplier → 2·key+1) so every join/shuffle/sort moves 8-byte ints,
    * not strings; the "p<key>"/"s<key>" labels appear only in the final
    * projection. Each iteration is rank ⋈ cached adjacency + a
    * partial-agg groupBy(dst); the driver never sees node data. */
  val pagerankBipartite: Q = Q(
    "pagerank_bipartite",
    """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |            FROM lineitem),
      |edges AS (SELECT p * 2 AS src, s * 2 + 1 AS dst FROM e0
      |          UNION ALL
      |          SELECT s * 2 + 1, p * 2 FROM e0),
      |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
      |n AS (SELECT count(*) AS cnt FROM deg),
      |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / cnt AS r
      |       FROM deg CROSS JOIN n),
      |r1 AS (SELECT e.dst AS node,
      |         CAST(0.15 AS DOUBLE) / cnt + 0.85 * sum(r.r / deg.d) AS r
      |       FROM edges e
      |         JOIN deg ON deg.node = e.src
      |         JOIN r0 r ON r.node = e.src
      |         CROSS JOIN n
      |       GROUP BY e.dst, cnt),
      |r2 AS (SELECT e.dst AS node,
      |         CAST(0.15 AS DOUBLE) / cnt + 0.85 * sum(r.r / deg.d) AS r
      |       FROM edges e
      |         JOIN deg ON deg.node = e.src
      |         JOIN r1 r ON r.node = e.src
      |         CROSS JOIN n
      |       GROUP BY e.dst, cnt),
      |r3 AS (SELECT e.dst AS node,
      |         CAST(0.15 AS DOUBLE) / cnt + 0.85 * sum(r.r / deg.d) AS r
      |       FROM edges e
      |         JOIN deg ON deg.node = e.src
      |         JOIN r2 r ON r.node = e.src
      |         CROSS JOIN n
      |       GROUP BY e.dst, cnt)
      |SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
      |            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
      |  round(r, 6) AS rank
      |FROM r3 ORDER BY node""".stripMargin) {
    (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    // ONE distinct pass; the symmetric reverse edge comes from an
    // in-place explode instead of a union of two branches (the union
    // form ran the distinct scan twice when the adjacency
    // materialized — round-7 rework of the round-6 "~4s" perf claim).
    val edges = e0.select(explode(array(
        struct((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst")),
        struct((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // Degree-annotated adjacency, persisted: every iteration re-reads
    // this one materialization instead of re-running distinct + degree
    // annotation (3x recompute measured at 11.7s before this — the
    // GraphX edge-cache discipline, expressed in SQL). Degree is a
    // COUNT window over the same src-hash-partitioning the cache
    // stores — one shuffle builds partitioning + degree + sort
    // together (the previous groupBy-join-repartition chain shuffled
    // the edge set three times). The cached relation reports
    // HashPartitioning(src) + src-sorted, so each iteration's
    // sort-merge join shuffles only the ~|nodes| rank vector, never
    // the edge set — the co-location play that keeps iterative graph
    // joins viable when the rank vector is too big to broadcast
    // (billions of nodes). CacheManager keys on the canonical plan, so
    // repeated runs share one entry; the library's battery harness
    // (Bench/Verify reset()) clears caches between queries — callers
    // embedding this query long-term should clearCache() likewise.
    val adj = edges.repartition(col("src"))
      .withColumn("d", count(lit(1)).over(Window.partitionBy("src")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // |nodes| via one bounded driver action on the cached adjacency
    // (same driver-traffic class as DistributedNtile's count): a
    // LITERAL 0.15/N constant-folds into each iteration, replacing the
    // crossJoin(broadcast(n)) + 1-row aggregate that round 6 re-ran
    // FOUR times (seed + 3 steps).
    val nNodes = adj.select("src").distinct().count()
    val r0 = adj.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0 / nNodes).as("r"))
    def step(prev: DataFrame): DataFrame =
      adj
        .join(prev.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("d")).as("contrib"))
        .select(col("node"),
          (lit(0.15 / nNodes) + lit(0.85) * col("contrib")).as("r"))
    val r3 = step(step(step(r0)))
    r3.select(
        when(col("node") % 2 === 0,
          concat(lit("p"), (col("node") / 2).cast("long").cast("string")))
          .otherwise(
            concat(lit("s"), (col("node") / 2).cast("long").cast("string")))
          .as("node"),
        round(col("r"), 6).as("rank"))
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(pagerankBipartite)
}
