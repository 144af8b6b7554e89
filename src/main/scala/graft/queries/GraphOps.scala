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
    * bipartite part ↔ supplier graph induced by lineitem: nodes are
    * "p<partkey>" / "s<suppkey>", with an undirected edge where a
    * supplier shipped a part. Symmetric edges mean no dangling mass,
    * so the per-iteration update is exactly
    *   r'(v) = 0.15/N + 0.85 * Σ_{u~v} r(u)/deg(u).
    * A FIXED iteration count (not convergence-tested) keeps the result
    * a pure function of the input, so DuckDB replays it with unrolled
    * CTEs. Ranks are emitted for EVERY node, ordered by node id — never
    * by the float rank, so accumulation-order ulp drift between engines
    * can't change row membership or order; values are rounded to 1e-6,
    * nine orders of magnitude above double noise.
    *
    * Scale shape: edges/degrees/ranks all partition by node key; each
    * iteration is a shuffle join (rank ⋈ edges on src) + a partial-agg
    * groupBy(dst) — the AQE-friendly iterative plan. 3 iterations = 3
    * such rounds; the driver never sees node data. */
  val pagerankBipartite: Q = Q(
    "pagerank_bipartite",
    """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |            FROM lineitem),
      |edges AS (SELECT 'p' || CAST(p AS VARCHAR) AS src,
      |                 's' || CAST(s AS VARCHAR) AS dst FROM e0
      |          UNION ALL
      |          SELECT 's' || CAST(s AS VARCHAR),
      |                 'p' || CAST(p AS VARCHAR) FROM e0),
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
      |SELECT node, round(r, 6) AS rank FROM r3 ORDER BY node""".stripMargin) {
    (s, d) =>
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val edges = e0.select(
        concat(lit("p"), col("p").cast("string")).as("src"),
        concat(lit("s"), col("s").cast("string")).as("dst"))
      .union(e0.select(
        concat(lit("s"), col("s").cast("string")).as("src"),
        concat(lit("p"), col("p").cast("string")).as("dst")))
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Degree-annotated adjacency, persisted: every iteration re-reads
    // this one materialization instead of re-running distinct + union +
    // degree joins (3x recompute measured 11.7s -> the shared-prefix
    // plan; exactly GraphX's edge-cache discipline, expressed in SQL).
    // Spark's CacheManager keys on the canonical plan, so repeated runs
    // of this query share one entry rather than leaking; Bench reset()
    // clears caches between timed passes anyway.
    // Pre-partitioned on the join key BEFORE persisting: the cached
    // relation then REPORTS HashPartitioning(src), so each iteration's
    // join shuffles only the ~|nodes| rank vector, never the edge set —
    // the co-location play that makes iterative graph joins viable when
    // the rank vector is too big to broadcast (billions of nodes).
    val adj = edges.join(deg.withColumnRenamed("node", "src"), "src")
      .repartition(col("src")).sortWithinPartitions("src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.agg(count(lit(1)).as("cnt"))
    val r0 = deg.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("cnt")).as("r"))
    def step(prev: DataFrame): DataFrame =
      adj
        .join(prev.withColumnRenamed("node", "src"), "src")
        .crossJoin(broadcast(n))
        .groupBy(col("dst").as("node"), col("cnt"))
        .agg(sum(col("r") / col("d")).as("contrib"))
        .select(col("node"),
          (lit(0.15) / col("cnt") + lit(0.85) * col("contrib")).as("r"))
    val r3 = step(step(step(r0)))
    r3.select(col("node"), round(col("r"), 6).as("rank")).orderBy("node")
  }

  val all: Seq[Q] = Seq(pagerankBipartite)
}
