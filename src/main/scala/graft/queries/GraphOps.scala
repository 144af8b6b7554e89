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

  /** Canonical co-purchase edge set (distinct u < v part pairs per
    * order). The pair fan-out is bounded per order (items/order is a
    * data constant), so the self-join output is linear in |lineitem|.
    * Shared by the triangle / clustering-coefficient / k-core family. */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // ONE groupBy shuffle of (ok, pk) rows + map-side pair expansion
    // beats the self-join formulation (two shuffled join sides plus the
    // joined pair stream through an exchange): items/order is a data
    // constant (~4, ≤7 in TPC-H), so collect_set stays O(1) per key and
    // the u<v pair fan-out happens AFTER the shuffle, executor-side.
    // The edge-level distinct is still required (the same pair can
    // recur across orders) and is the only pair-sized shuffle left.
    // Edge SET is provably identical to the former a.pk < b.pk
    // self-join (r7 verdict #4 follow-on; 2.1s -> ~1.2s base at sf0.1,
    // speeding q75 / clustering_coeff / kcore_peel / brand_modularity
    // alike).
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set(col("pk")).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
          |  transform(filter(pks, y -> y > x),
          |            y -> struct(x AS u, y AS v))))""".stripMargin))
        .as("e"))
      .select(col("e.u"), col("e.v")).distinct()
  }

  /** Distinct ORDERED co-purchase adjacency (c ≠ n, both directions) —
    * the symmetrized [[copurchaseEdges]]: u<v canonical pairs plus
    * their swaps are exactly all ordered co-purchase pairs, the SET the
    * li⋈li self-join used to build (r13 optimization: the group-explode
    * builder is the measured ~2x cheaper physical path — one groupBy
    * shuffle + executor-side fan-out instead of two shuffled self-join
    * sides; k_betweenness proved set equality in r12 and the oracle SQL
    * keeps stating the self-join form). The unionAll after the distinct
    * is exchange-free: both branches read the same materialization. */
  private def coAdjacency(s: SparkSession, d: String): DataFrame = {
    val und = copurchaseEdges(s, d)
    und.select(col("u").as("c"), col("v").as("n"))
      .unionAll(und.select(col("v").as("c"), col("u").as("n")))
  }

  /** Per-node triangle counts over the co-purchase graph plus the
    * degree relation — q75's oriented-wedge + bloom-prefilter pipeline
    * (see the scale commentary inline), factored out so
    * clustering_coeff can reuse the identical enumeration. */
  private def nodeTriangles(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val edges = copurchaseEdges(s, d)
    val deg = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val annotated = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    // Orient low-(deg, id) → high; keep the destination's rank columns
    // so the wedge step can order endpoints without another join.
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // Persisted once: the bloom build below and the three reads of the
    // main plan (two wedge sides + closure) share this materialization
    // instead of re-deriving distinct + self-join + degree joins. The
    // battery harness (Bench/Verify reset()) clears it between queries,
    // like pagerank's adjacency.
    val oriented = annotated.select(
        when(uLower, col("u")).otherwise(col("v")).as("src"),
        when(uLower, col("v")).otherwise(col("u")).as("dst"),
        when(uLower, col("dv")).otherwise(col("du")).as("ddeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val closure = oriented.select(col("src").as("b"), col("dst").as("c"))
    // The wedge stream is Σ out-deg² rows (~38M at sf0.1 — 30× the
    // edge count); how it meets the closure edge set is a measured
    // size decision (the kcore_peel aliveSide pattern — the count also
    // warms the persist that every downstream read shares):
    //  - |E| within executor memory → BROADCAST the closure pairs: the
    //    wedge stream never crosses an exchange at all, and the
    //    broadcast hash join IS the prefilter (no sketch pass needed).
    //  - giant |E| (the 100 TB guard) → wedge-side bloom prefilter
    //    (~1% FP over the edge-pair hashes) so the closure-join
    //    exchange carries ~(triangles + FP) rows instead of the full
    //    wedge stream (913 MB → ~300 MB measured), then the exact
    //    shuffle join removes the FPs — same discipline as
    //    decontam_bloom. Sketch size grows with |E| (×10 edges → ×10
    //    bits at fixed FP), so at extreme scale raise fpp or drop the
    //    prefilter; the shuffle join underneath stays the
    //    scale-correct plan either way.
    val nEdges = oriented.count() // bounded driver hop, warms `oriented`
    val o1 = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("bdeg"))
    val o2 = oriented.select(col("src"), col("dst").as("c"), col("ddeg").as("cdeg"))
    val wedgesUnfiltered = o1.join(o2, Seq("src"))
      .filter(col("bdeg") < col("cdeg")
        || (col("bdeg") === col("cdeg") && col("b") < col("c")))
      .select(col("src"), col("b"), col("c"))
    val tri =
      if (nEdges <= 3000000L) {
        // r13 re-measure: SHUFFLED-HASH, not broadcast. The broadcast
        // probe of the 41M-row wedge stream (sf0.1) against the
        // ~1.2M-pair hash relation missed DRAM on essentially every
        // lookup (~100 MB map, random keys) and measured 4.9s; the
        // shuffled-hash form partitions both sides on (b, c), so each
        // task probes a ~37k-entry CACHE-RESIDENT build side — 2.5s
        // measured, result identical. The wedge-stream exchange this
        // buys is bounded by the branch guard (|E| ≤ 3M ⇒ wedges ≤
        // Σoutdeg² with √E-capped outdeg); past the guard the bloom
        // branch below already pays the same exchange after its ~95%
        // prefilter.
        wedgesUnfiltered.join(closure.hint("shuffle_hash"), Seq("b", "c"))
          .select(col("src").as("a"), col("b"), col("c"))
      } else {
        val bloomBytes = closure
          .select(graft.functions.BloomBridge
            .bloomFilterAgg(xxhash64(col("b"), col("c")), 4000000L, fpp = 0.01)
            .as("bf"))
          .head().getAs[Array[Byte]](0)
        wedgesUnfiltered
          .filter(graft.functions.BloomBridge
            .mightContain(bloomBytes, xxhash64(col("b"), col("c"))))
          .join(closure, Seq("b", "c"))
          .select(col("src").as("a"), col("b"), col("c"))
      }
    val triCounts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    (triCounts, deg)
  }

  /** Triangle counting over the co-purchase graph (parts linked when they
    * appear in the same order), reporting the 10 parts participating in
    * the most triangles. The naive wedge join explodes on hub nodes
    * (Σ deg² — a single celebrity part with degree 10^6 generates 10^12
    * wedges); the engine uses the DEGREE-ORDERED orientation (Chiba &
    * Nishizeki / Cohen's MapReduce formulation): every undirected edge is
    * directed from its lower-(degree, id) endpoint to the higher, so
    * out-degree is bounded by O(√|E|) regardless of skew, and each
    * triangle {a,b,c} (ranked a<b<c) is generated exactly once as the
    * wedge b←a→c closed by the oriented edge b→c. All three steps are
    * plain equi-joins on node keys — shuffle-partitioned, no broadcast of
    * anything unbounded, no driver-side state — so the same plan holds
    * when the graph has billions of edges. Wedge-side rank comparison
    * rides the degree columns already joined onto the oriented edges —
    * no extra shuffle for it. */
  val triangles: Q = Q(
    "q75_triangles",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey),
      |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |        FROM e e1
      |          JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      |          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      |nodes AS (SELECT a AS node FROM tri
      |          UNION ALL SELECT b FROM tri
      |          UNION ALL SELECT c FROM tri)
      |SELECT node, count(*) AS n_tri
      |FROM nodes GROUP BY node
      |ORDER BY n_tri DESC, node LIMIT 10""".stripMargin) { (s, d) =>
    nodeTriangles(s, d)._1
      .orderBy(col("n_tri").desc, col("node"))
      .limit(10)
  }

  /** Multi-source k-hop BFS (k = 3) over the part↔supplier bipartite
    * graph: shortest hop-distance from the seed set {suppliers 1..5} to
    * every reachable node. The scale shape is DELTA-FRONTIER iteration —
    * each round joins the adjacency against only the NEWLY-discovered
    * frontier (an anti-join removes already-visited nodes before the
    * next expansion), so round r costs |frontier_r| ⋈ edges, not
    * |visited| ⋈ edges; on a bounded-diameter graph total work is
    * O(Σ frontier sizes) = O(|V|) joins regardless of k. The adjacency
    * is persisted pre-partitioned on src (pagerank's discipline) so
    * every round's join shuffles only the frontier — node-keyed rows,
    * never the edge set. Fixed k keeps the result a pure function of
    * the input, replayed by the oracle as unrolled CTEs. */
  val khopBfs: Q = Q(
    "q78_khop",
    """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |            FROM lineitem),
      |edges AS (SELECT p * 2 AS src, s * 2 + 1 AS dst FROM e0
      |          UNION ALL SELECT s * 2 + 1, p * 2 FROM e0),
      |d0 AS (SELECT DISTINCT src AS node FROM edges
      |       WHERE src % 2 = 1 AND src // 2 <= 5),
      |d1 AS (SELECT DISTINCT e.dst AS node FROM edges e
      |       JOIN d0 ON e.src = d0.node),
      |d2 AS (SELECT DISTINCT e.dst AS node FROM edges e
      |       JOIN d1 ON e.src = d1.node),
      |d3 AS (SELECT DISTINCT e.dst AS node FROM edges e
      |       JOIN d2 ON e.src = d2.node),
      |u AS (SELECT node, 0 AS dist FROM d0
      |      UNION ALL SELECT node, 1 FROM d1
      |      UNION ALL SELECT node, 2 FROM d2
      |      UNION ALL SELECT node, 3 FROM d3)
      |SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
      |            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
      |  CAST(min(dist) AS INTEGER) AS dist
      |FROM u GROUP BY node ORDER BY dist, node""".stripMargin) { (s, d) =>
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val edges = e0.select(explode(array(
        struct((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst")),
        struct((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val adj = edges.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Seed: suppliers 1..5 that actually appear in the graph.
    val seed = adj.select(col("src").as("node")).distinct()
      // odd ∧ node ≤ 11 ⟺ the oracle's src // 2 <= 5 for supplier ids
      // (integer floor — Spark's `/` is double division, so spell the
      // bound on the packed id itself).
      .filter(col("node") % 2 === 1 && col("node") <= 11)
    var visited = seed.select(col("node"), lit(0).as("dist"))
    var frontier = seed
    for (hop <- 1 to 3) {
      val next = adj.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
      visited = visited.union(next.select(col("node"), lit(hop).as("dist")))
      frontier = next
    }
    visited
      .select(
        when(col("node") % 2 === 0,
          concat(lit("p"), (col("node") / 2).cast("long").cast("string")))
          .otherwise(
            concat(lit("s"), (col("node") / 2).cast("long").cast("string")))
          .as("node"),
        col("dist").cast("int").as("dist"))
      .orderBy("dist", "node")
  }

  /** Common-neighbor link prediction over the co-purchase part graph —
    * candidate links for a TARGET ITEM SET (parts with key ≡ 0 mod 20,
    * a 5% slice standing in for "items needing recommendations"):
    * count shared neighbors between each target u and every
    * non-adjacent part v, report the 20 strongest predictions. Two
    * disciplines bound the wedge stream, both standard in recommender
    * candidate generation: centers are DEGREE-CAPPED at 64 (an
    * uncapped hub of degree 10^6 alone emits 10^12 pairs, and a
    * neighbor shared through a hub carries almost no signal), and one
    * wedge side is restricted to the target set, so the stream is
    * Σ_c deg_c·targdeg_c ≈ |targets|/|V| of the all-pairs form (the
    * all-pairs output is inherently quadratic in the neighborhood —
    * no plan fixes that; scoping to the query set is the scale play).
    * Every step is a key-partitioned equi-join/aggregate; existing
    * edges fall out via a shuffle anti-join on the directed pair.
    * Fixed cap + (count, u, v) tie-break keep it a pure function. */
  val linkPredict: Q = Q(
    "q111_link_predict",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |adj AS (SELECT DISTINCT a.l_partkey AS c, b.l_partkey AS n
      |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey <> b.l_partkey),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY c),
      |capped AS (SELECT adj.c, adj.n FROM adj JOIN deg ON deg.c = adj.c
      |           WHERE deg.d <= 64),
      |cn AS (SELECT a1.n AS u, a2.n AS v, count(*) AS common
      |       FROM capped a1 JOIN capped a2
      |         ON a1.c = a2.c AND a1.n <> a2.n
      |       WHERE a1.n % 20 = 0
      |       GROUP BY a1.n, a2.n),
      |pred AS (SELECT cn.u, cn.v, cn.common FROM cn
      |         LEFT JOIN adj ON adj.c = cn.u AND adj.n = cn.v
      |         WHERE adj.c IS NULL)
      |SELECT u, v, common FROM pred
      |ORDER BY common DESC, u, v LIMIT 20""".stripMargin) { (s, d) =>
    // adjacency via the group-explode builder (set ≡ the oracle's
    // li⋈li self-join — see coAdjacency)
    val adj = coAdjacency(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy("c").agg(count(lit(1)).as("d"))
    val capped = adj.join(deg.filter(col("d") <= 64).select("c"), "c")
    val targetSide = capped.filter(col("n") % 20 === 0)
    val cn = targetSide.as("a1").join(capped.as("a2"),
        col("a1.c") === col("a2.c") && col("a1.n") =!= col("a2.n"))
      .groupBy(col("a1.n").as("u"), col("a2.n").as("v"))
      .agg(count(lit(1)).as("common"))
    cn.join(adj.select(col("c").as("u"), col("n").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col("common").desc, col("u"), col("v"))
      .limit(20)
  }

  /** Label propagation (2 synchronous rounds) over the part↔supplier
    * bipartite graph — the cheap community-detection pass run before
    * heavier clustering. Every node starts as its own label (packed
    * id); each round adopts the most frequent neighbor label, ties
    * broken by smallest label — a deterministic argmax expressed as
    * ONE max_by over a (count, −label) pair per node, i.e. one
    * adjacency⋈labels join + one groupBy per round on node keys, the
    * identical shuffle budget as a PageRank step (labels too big to
    * broadcast at scale → co-located joins against the cached
    * src-partitioned adjacency). Fixed round count keeps the oracle
    * an unrolled-CTE replay; the output is the label histogram, not
    * per-node rows, so result size is O(#communities). */
  val labelProp: Q = Q(
    "q113_label_prop",
    """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |            FROM lineitem),
      |edges AS (SELECT p * 2 AS src, s * 2 + 1 AS dst FROM e0
      |          UNION ALL SELECT s * 2 + 1, p * 2 FROM e0),
      |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
      |v1 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
      |       FROM edges e JOIN l0 l ON l.node = e.src GROUP BY e.dst, l.lbl),
      |l1 AS (SELECT node, min(lbl) AS lbl FROM v1 a
      |       WHERE c = (SELECT max(c) FROM v1 b WHERE b.node = a.node)
      |       GROUP BY node),
      |v2 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
      |       FROM edges e JOIN l1 l ON l.node = e.src GROUP BY e.dst, l.lbl),
      |l2 AS (SELECT node, min(lbl) AS lbl FROM v2 a
      |       WHERE c = (SELECT max(c) FROM v2 b WHERE b.node = a.node)
      |       GROUP BY node)
      |SELECT lbl AS community, count(*) AS sz
      |FROM l2 GROUP BY lbl ORDER BY sz DESC, community LIMIT 20""".stripMargin) {
    (s, d) =>
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val edges = e0.select(explode(array(
        struct((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst")),
        struct((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val adj = edges.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l0 = adj.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    def round(labels: DataFrame): DataFrame =
      adj.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        // deterministic argmax: max count, then smallest label
        .groupBy("node")
        .agg(max_by(col("lbl"), struct(col("c"), (-col("lbl")).as("negl")))
          .as("lbl"))
    val l2 = round(round(l0))
    l2.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("community"))
      .limit(20)
  }

  /** Degree assortativity of the part–supplier graph — Newman's r
    * (Pearson correlation of endpoint degrees across edges): do hubs
    * connect to hubs? The structural-health number consulted before
    * choosing a partitioning/skew strategy for graph workloads. ONE
    * distinct edge pass, two tiny degree aggregates joined back onto
    * the directed edge list (part→supplier orientation; each
    * undirected edge counted once per direction via the symmetric
    * union, the standard directed-pair formulation), then a single
    * moment aggregate — Σdu, Σdv, Σdu², Σdv², Σdu·dv all EXACT
    * BIGINTs; r is one fixed-form double expression with the m·Σ
    * products taken in doubles (overflow-proof at any scale, and
    * deterministic: both engines multiply the same exactly-converted
    * integers). */
  val assortativity: Q = Q(
    "graph_assortativity",
    """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |            FROM lineitem),
      |ed AS (SELECT p * 2 AS src, s * 2 + 1 AS dst FROM e0
      |       UNION ALL SELECT s * 2 + 1, p * 2 FROM e0),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
      |        FROM ed GROUP BY src),
      |j AS (SELECT du.d AS x, dv.d AS y FROM ed
      |        JOIN deg du ON du.node = ed.src
      |        JOIN deg dv ON dv.node = ed.dst),
      |mo AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy FROM j)
      |SELECT m AS n_directed_edges,
      |  floor((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
      |    * 1000000 + 0.5) / 1000000 AS assortativity
      |FROM mo""".stripMargin) { (s, d) =>
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val ed = e0.select(explode(array(
        struct((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst")),
        struct((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val deg = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    val j = ed
      .join(deg.select(col("node").as("un"), col("d").as("x")),
        col("src") === col("un"))
      .join(deg.select(col("node").as("vn"), col("d").as("y")),
        col("dst") === col("vn"))
    val mo = j.agg(count(lit(1)).as("m"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    mo.select(col("m").as("n_directed_edges"),
      (floor((col("m").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy"))
        / sqrt((col("m").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx"))
          * (col("m").cast("double") * col("syy")
            - col("sy").cast("double") * col("sy")))
        * 1000000 + lit(0.5)) / 1000000).as("assortativity"))
  }

  /** Local clustering coefficient cc(v) = 2·T(v)/(deg(v)(deg(v)−1)) —
    * the per-node closure density that separates hub-and-spoke parts
    * (cc→0) from clique-embedded ones (cc→1); the node-level statistic
    * behind q75's global triangle count and graph_assortativity's
    * mixing r. Reuses q75's EXACT oriented-wedge + bloom-prefilter
    * enumeration (nodeTriangles — the shuffle carries ~triangles, not
    * wedges), joins the degree relation back, and ranks by the
    * floor-rounded coefficient (a single exact-integer division).
    * Zero-triangle nodes survive via the LEFT join (cc = 0). */
  val clusteringCoeff: Q = Q(
    "clustering_coeff",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
      |      SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
      |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |        FROM e e1
      |          JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      |          JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
      |      SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |      UNION ALL SELECT c FROM tri) GROUP BY node)
      |SELECT n AS node, deg, COALESCE(n_tri, 0) AS n_tri,
      |  floor(2 * COALESCE(n_tri, 0)
      |    / (CAST(deg AS DOUBLE) * (deg - 1)) * 1000000 + 0.5) / 1000000
      |    AS clust_coeff
      |FROM deg LEFT JOIN tc ON tc.node = deg.n
      |WHERE deg >= 2
      |ORDER BY clust_coeff DESC, node LIMIT 15""".stripMargin) { (s, d) =>
    val (triCounts, deg) = nodeTriangles(s, d)
    deg.select(col("n").as("node"), col("deg"))
      .filter(col("deg") >= 2)
      .join(triCounts, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        (floor(lit(2) * coalesce(col("n_tri"), lit(0L))
          / (col("deg").cast("double") * (col("deg") - 1))
          * 1000000 + lit(0.5)) / 1000000).as("clust_coeff"))
      .orderBy(col("clust_coeff").desc, col("node")).limit(15)
  }

  /** One k-core peel round's edge-filter step: keep edges whose BOTH
    * endpoints survive in `alive`. The broadcast-filter fast path
    * (sorted Long array + binary search, zero shuffle) engages only
    * when the already-counted `nAlive` is under `broadcastGate`; a
    * giant core (|alive| can reach |parts| ≈ 20M·SF) takes the
    * shuffled two-sided RDD semi-join and the driver never
    * materializes the set. Exposed at this granularity so the spec
    * can force EACH branch (gate 0 vs gate ∞) and assert identical
    * output — the r9 verdict's reachability evidence for the
    * fallback. `alive` must already be persisted by the caller (it is
    * traversed once per branch, twice in the broadcast branch: count
    * happened upstream, collect here). */
  private[graft] def kcoreFilterAlive(
      s: SparkSession,
      e: org.apache.spark.rdd.RDD[(Long, Long)],
      alive: org.apache.spark.rdd.RDD[Long],
      nAlive: Long,
      broadcastGate: Long,
      storage: org.apache.spark.storage.StorageLevel)
      : org.apache.spark.rdd.RDD[(Long, Long)] = {
    if (nAlive < broadcastGate) {
      val aliveArr = alive.collect()
      java.util.Arrays.sort(aliveArr)
      val bc = s.sparkContext.broadcast(aliveArr)
      e.filter { t =>
        val a = bc.value
        java.util.Arrays.binarySearch(a, t._1) >= 0 &&
          java.util.Arrays.binarySearch(a, t._2) >= 0
      }.persist(storage)
    } else {
      val aliveKV = alive.map((_, ()))
      e.map(t => (t._1, t._2)).join(aliveKV)
        .map { case (u, (v, _)) => (v, u) }.join(aliveKV)
        .map { case (v, (u, _)) => (u, v) }.persist(storage)
    }
  }

  /** k-core peeling (k = 3, three synchronous rounds) over the
    * co-purchase graph — the degeneracy-ordering primitive behind
    * community detection and dense-subgraph mining, and the iterative
    * SUBGRAPH-refinement shape none of CC/PageRank/k-hop exercises:
    * each round recomputes degrees, drops sub-k nodes, and SEMI-JOINS
    * the edge list down to survivors (never materializing node sets on
    * the driver). The per-round trajectory (nodes, edges) is emitted
    * so convergence is visible — on this fixture round 3 is already
    * stationary or near it. The edge set is persisted once (battery
    * reset() clears it); each round is one degree collapse + two
    * semi-joins, the plan a 100 TB graph engine would run. */
  val kcorePeel: Q = Q(
    "kcore_peel",
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey),
      |k AS (SELECT (2 * (SELECT count(*) FROM e0))
      |      // (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e0
      |         UNION ALL SELECT v FROM e0)) AS k),
      |d1 AS (SELECT n, count(*) AS dg FROM (SELECT u AS n FROM e0
      |      UNION ALL SELECT v FROM e0) GROUP BY n),
      |a1 AS (SELECT n FROM d1 CROSS JOIN k WHERE dg >= k),
      |e1 AS (SELECT u, v FROM e0 WHERE u IN (SELECT n FROM a1)
      |      AND v IN (SELECT n FROM a1)),
      |d2 AS (SELECT n, count(*) AS dg FROM (SELECT u AS n FROM e1
      |      UNION ALL SELECT v FROM e1) GROUP BY n),
      |a2 AS (SELECT n FROM d2 CROSS JOIN k WHERE dg >= k),
      |e2 AS (SELECT u, v FROM e1 WHERE u IN (SELECT n FROM a2)
      |      AND v IN (SELECT n FROM a2)),
      |d3 AS (SELECT n, count(*) AS dg FROM (SELECT u AS n FROM e2
      |      UNION ALL SELECT v FROM e2) GROUP BY n),
      |a3 AS (SELECT n FROM d3 CROSS JOIN k WHERE dg >= k),
      |e3 AS (SELECT u, v FROM e2 WHERE u IN (SELECT n FROM a3)
      |      AND v IN (SELECT n FROM a3))
      |SELECT 1 AS round, (SELECT CAST(count(*) AS BIGINT) FROM a1) AS n_nodes,
      |       (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
      |UNION ALL
      |SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM a2),
      |       (SELECT CAST(count(*) AS BIGINT) FROM e2)
      |UNION ALL
      |SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM a3),
      |       (SELECT CAST(count(*) AS BIGINT) FROM e3)
      |ORDER BY round""".stripMargin) { (s, d) =>
    // The peel FIXPOINT runs at RDD level (the ConnectedComponents /
    // dbscan_grid precedent: that rewrite cut dbscan 20.6→6.5s by
    // removing per-round Catalyst planning): round 7's eager-DataFrame
    // form was scale-correct (1.30× wall for a 10× data step) but spent
    // its residual ~7.3s in ~10 planned round-barrier jobs, not data.
    // Each RDD round is ONE reduceByKey degree shuffle; the two
    // endpoint semi-joins collapse into a map-side filter against a
    // sorted-array broadcast of the alive set when a count() taken
    // FIRST says it fits, with a shuffled RDD semi-join fallback for a
    // giant core (the 100 TB guard: |alive| can reach |parts| ≈
    // 20M·SF; see kcoreFilterAlive). The peel threshold
    // adapts to the graph: k = mean degree = 2|E|/|V| (exact integer
    // division), because this co-purchase graph DENSIFIES with corpus
    // size (min degree 49 at sf0.001, 38 at sf0.1) — any fixed small k
    // peels nothing at every scale. Battery reset() clears the persists.
    import s.implicits._
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var e = copurchaseEdges(s, d)
      .select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .rdd.persist(storage)
    val nE0 = e.count()
    val nV0 = e.flatMap(t => Iterator(t._1, t._2)).distinct().count()
    val k = 2 * nE0 / nV0
    val trajectory = (1 to 3).map { r =>
      val deg = e.flatMap(t => Iterator((t._1, 1L), (t._2, 1L)))
        .reduceByKey(_ + _)
      val alive = deg.filter(_._2 >= k).keys.persist(storage)
      // The size gate must decide BEFORE any driver-side
      // materialization (r9 verdict #1: a collect-then-test ordering
      // meant a giant core landed on the driver before the fallback
      // could engage). count() is a distributed scalar; only under the
      // gate does the alive set collect for the sorted-array broadcast
      // filter — a giant core takes the shuffled semi-join instead and
      // the driver never holds more than one Long.
      val nAlive = alive.count()
      val e2 = kcoreFilterAlive(s, e, alive, nAlive,
        broadcastGate = 5000000L, storage)
      val nNodes = nAlive
      val nEdges = e2.count() // bounded driver hop, warms `e2`
      alive.unpersist(blocking = false)
      // free superseded round state NOW instead of leaking all four
      // materializations to battery reset() (r7 verdict #4)
      e.unpersist(blocking = false)
      e = e2
      (r, nNodes, nEdges)
    }
    trajectory.toDF("round", "n_nodes", "n_edges").orderBy("round")
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the part–supplier
    * bipartite graph: parts are hubs, suppliers authorities, and two
    * full mutual-reinforcement rounds run UNNORMALIZED so every score
    * is an EXACT BIGINT (h₀=1 → a₁=deg → h₁=Σdeg → a₂=Σh₁ → h₂=Σa₂ —
    * bounded by deg³·|V|, far inside int64 at any fixture scale;
    * normalization is two final divisions by the broadcast maxima, so
    * no float ever enters the iteration, sidestepping pagerank's
    * drift-rounding discipline entirely). Plan shape: ONE distinct
    * edge materialization, then each half-round is an equi-join of the
    * edge list against the ≤|V|-row score vector + a partial-agg
    * groupBy — the same co-located-join budget as pagerank, ping-
    * ponging between the p- and s-keyed partitionings the bipartite
    * structure forces. Top-10 per role + 1-row max broadcasts for the
    * normalized report. */
  val hitsScores: Q = Q(
    "hits_scores",
    """WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |           FROM lineitem),
      |a1 AS (SELECT s, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY s),
      |h1 AS (SELECT e.p, CAST(sum(a1.a) AS BIGINT) AS h
      |       FROM e JOIN a1 ON a1.s = e.s GROUP BY e.p),
      |a2 AS (SELECT e.s, CAST(sum(h1.h) AS BIGINT) AS a
      |       FROM e JOIN h1 ON h1.p = e.p GROUP BY e.s),
      |h2 AS (SELECT e.p, CAST(sum(a2.a) AS BIGINT) AS h
      |       FROM e JOIN a2 ON a2.s = e.s GROUP BY e.p),
      |mh AS (SELECT CAST(max(h) AS BIGINT) AS mh FROM h2),
      |ma AS (SELECT CAST(max(a) AS BIGINT) AS ma FROM a2),
      |th AS (SELECT 'hub' AS role, p AS id, h AS score,
      |         floor(CAST(h AS DOUBLE) / mh * 1000000 + 0.5) / 1000000
      |           AS norm
      |       FROM h2 CROSS JOIN mh ORDER BY h DESC, p LIMIT 10),
      |ta AS (SELECT 'authority' AS role, s AS id, a AS score,
      |         floor(CAST(a AS DOUBLE) / ma * 1000000 + 0.5) / 1000000
      |           AS norm
      |       FROM a2 CROSS JOIN ma ORDER BY a DESC, s LIMIT 10)
      |SELECT * FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
      |ORDER BY role, score DESC, id""".stripMargin) { (s, d) =>
    val e = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a1 = e.groupBy("s").agg(count(lit(1)).as("a"))
    val h1 = e.join(a1, "s").groupBy("p").agg(sum("a").as("h"))
    val a2 = e.join(h1, "p").groupBy("s").agg(sum("h").as("a"))
    val h2 = e.join(a2, "s").groupBy("p").agg(sum("a").as("h"))
    val mh = h2.agg(max("h").as("mh"))
    val ma = a2.agg(max("a").as("ma"))
    val th = h2.crossJoin(broadcast(mh)) // 1-row max
      .select(lit("hub").as("role"), col("p").as("id"), col("h").as("score"),
        (floor(col("h").cast("double") / col("mh") * 1000000 + lit(0.5))
          / 1000000).as("norm"))
      .orderBy(col("score").desc, col("id")).limit(10)
    val ta = a2.crossJoin(broadcast(ma)) // 1-row max
      .select(lit("authority").as("role"), col("s").as("id"),
        col("a").as("score"),
        (floor(col("a").cast("double") / col("ma") * 1000000 + lit(0.5))
          / 1000000).as("norm"))
      .orderBy(col("score").desc, col("id")).limit(10)
    th.unionAll(ta).orderBy(col("role"), col("score").desc, col("id"))
  }

  /** Rich-club coefficient (Zhou & Mondragón 2004) of the co-purchase
    * graph: do high-degree parts preferentially co-purchase with each
    * other? φ(k) = 2·E_{>k} / (n_{>k}(n_{>k}−1)) at four thresholds
    * scaled to the ADAPTIVE mean degree (this graph densifies with
    * corpus size — kcore_peel's lesson; fixed thresholds go stale).
    * One degree aggregate, one edge pass annotated with min(deg_u,
    * deg_v) via two vocab-keyed joins, then FOUR conditional sums —
    * never one pass per threshold. All counts exact; φ one division. */
  val richClub: Q = Q(
    "rich_club",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
      |km AS (SELECT CAST(sum(dg) // count(*) AS BIGINT) AS km FROM deg),
      |th AS (SELECT CAST(km * t // 2 AS BIGINT) AS k
      |       FROM km CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS t)),
      |em AS (SELECT least(du.dg, dv.dg) AS mindg FROM e
      |  JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
      |stat AS (SELECT th.k,
      |    (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE dg > th.k)
      |      AS n_rich,
      |    (SELECT CAST(count(*) AS BIGINT) FROM em WHERE mindg > th.k)
      |      AS e_rich
      |  FROM th)
      |SELECT k AS degree_threshold, n_rich, e_rich,
      |  CASE WHEN n_rich >= 2 THEN
      |    floor(CAST(2 * e_rich AS DOUBLE)
      |      / (CAST(n_rich AS DOUBLE) * (n_rich - 1)) * 1000000 + 0.5)
      |      / 1000000
      |  END AS phi
      |FROM stat ORDER BY degree_threshold""".stripMargin) { (s, d) =>
    val e = copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val km = deg.agg(floor(sum("dg") / count(lit(1))).cast("long").as("km"))
    val th = km.select(explode(expr(
      "transform(sequence(1, 4), t -> CAST(floor(km * t / 2) AS BIGINT))"))
      .as("k"))
    val em = e
      .join(deg.select(col("n").as("un"), col("dg").as("du")),
        col("u") === col("un"))
      .join(deg.select(col("n").as("vn"), col("dg").as("dv")),
        col("v") === col("vn"))
      .select(least(col("du"), col("dv")).as("mindg"))
    val nodeStats = deg.crossJoin(broadcast(th)) // 4 threshold rows
      .groupBy("k")
      .agg(sum(when(col("dg") > col("k"), 1L).otherwise(0L)).as("n_rich"))
    val edgeStats = em.crossJoin(broadcast(th)) // 4 threshold rows
      .groupBy("k")
      .agg(sum(when(col("mindg") > col("k"), 1L).otherwise(0L))
        .as("e_rich"))
      .withColumnRenamed("k", "ek")
    nodeStats.join(edgeStats, col("k") === col("ek"))
      .select(col("k").as("degree_threshold"), col("n_rich"),
        col("e_rich"),
        when(col("n_rich") >= 2,
          floor((col("e_rich") * 2).cast("double")
            / (col("n_rich").cast("double") * (col("n_rich") - 1))
            * 1000000 + lit(0.5)) / 1000000).as("phi"))
      .orderBy("degree_threshold")
  }

  /** Newman modularity of the BRAND partition over the co-purchase
    * graph — "do parts of the same brand co-purchase more than chance
    * predicts?": Q = Σ_c (e_c/m − (deg_c/2m)²) over the ~25 natural
    * brand communities (no iterative labels — the partition is a
    * catalog attribute, the metric is what's being declared). Within-
    * community edge counts and community degree sums are exact
    * BIGINTs; the ≤25 community terms fold brand-sorted. One edge pass
    * + two joins to the part dimension (broadcast — parts is a dim). */
  val brandModularity: Q = Q(
    "brand_modularity",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |        AND a.l_partkey < b.l_partkey),
      |eb AS (SELECT pu.p_brand AS bu, pv.p_brand AS bv FROM e
      |  JOIN part pu ON pu.p_partkey = e.u
      |  JOIN part pv ON pv.p_partkey = e.v),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM eb),
      |win AS (SELECT bu AS brand, CAST(count(*) AS BIGINT) AS e_in
      |        FROM eb WHERE bu = bv GROUP BY bu),
      |degc AS (SELECT brand, CAST(sum(c) AS BIGINT) AS deg_c FROM (
      |    SELECT bu AS brand, count(*) AS c FROM eb GROUP BY bu
      |    UNION ALL SELECT bv, count(*) FROM eb GROUP BY bv)
      |  GROUP BY brand),
      |terms AS (SELECT degc.brand,
      |    COALESCE(e_in, 0) AS e_in, deg_c, m,
      |    CAST(COALESCE(e_in, 0) AS DOUBLE) / m
      |      - (CAST(deg_c AS DOUBLE) / (2 * m))
      |        * (CAST(deg_c AS DOUBLE) / (2 * m)) AS t
      |  FROM degc LEFT JOIN win ON win.brand = degc.brand CROSS JOIN m)
      |SELECT brand, e_in, deg_c,
      |  floor(t * 1000000 + 0.5) / 1000000 AS q_term
      |FROM terms ORDER BY brand""".stripMargin) { (s, d) =>
    val e = copurchaseEdges(s, d)
    val prt = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    val eb = e
      .join(broadcast(prt.select(col("p_partkey").as("uk"),
        col("p_brand").as("bu"))), col("u") === col("uk"))
      .join(broadcast(prt.select(col("p_partkey").as("vk"),
        col("p_brand").as("bv"))), col("v") === col("vk"))
      .select(col("bu"), col("bv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = eb.agg(count(lit(1)).as("m"))
    val win = eb.filter(col("bu") === col("bv"))
      .groupBy(col("bu").as("wbrand")).agg(count(lit(1)).as("e_in"))
    val degc = eb.select(col("bu").as("brand"))
      .unionAll(eb.select(col("bv").as("brand")))
      .groupBy("brand").agg(count(lit(1)).as("deg_c"))
    degc.join(win, col("brand") === col("wbrand"), "left")
      .crossJoin(broadcast(m)) // 1-row edge total
      .select(col("brand"), coalesce(col("e_in"), lit(0L)).as("e_in"),
        col("deg_c"), col("m"))
      .select(col("brand"), col("e_in"), col("deg_c"),
        (floor((col("e_in").cast("double") / col("m")
          - (col("deg_c").cast("double") / (col("m") * 2))
            * (col("deg_c").cast("double") / (col("m") * 2)))
          * 1000000 + lit(0.5)) / 1000000).as("q_term"))
      .orderBy("brand")
  }

  /** Double-sweep BFS diameter estimation (Magnien, Latapy & Habib,
    * JEA'09) over the co-purchase graph: BFS from the max-degree node,
    * then BFS again from the farthest node found — the second
    * eccentricity is the classic cheap diameter LOWER BOUND (exact on
    * trees, near-tight on real small-world graphs). Sweeps run 2
    * rounds each (this graph family's observed reach horizon — both
    * fixtures cover every node by hop 2; a sparser graph raises the
    * constant):
    * each round is one adjacency equi-join + frontier anti-join on the
    * cached pre-partitioned edge list, so a sweep costs O(rounds)
    * shuffles regardless of node count — never a per-node BFS. Node
    * picks (max degree, farthest) are 1-row struct-max aggregates with
    * min-id tie-breaks; persists are swept by the battery reset(). */
  val graphDiameter: Q = Q(
    "graph_diameter",
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |und AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |adj AS (SELECT u AS src, v AS dst FROM und
      |        UNION ALL SELECT v, u FROM und),
      |deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY 1),
      |s0 AS (SELECT src AS node FROM deg ORDER BY deg DESC, src LIMIT 1),
      |a1 AS (SELECT DISTINCT adj.dst AS node FROM adj
      |       JOIN s0 ON adj.src = s0.node),
      |a2 AS (SELECT DISTINCT adj.dst AS node FROM adj
      |       JOIN a1 ON adj.src = a1.node),
      |u1 AS (SELECT node, min(dist) AS dist FROM (
      |    SELECT node, 0 AS dist FROM s0
      |    UNION ALL SELECT node, 1 FROM a1
      |    UNION ALL SELECT node, 2 FROM a2) GROUP BY node),
      |far AS (SELECT node FROM u1
      |        WHERE dist = (SELECT max(dist) FROM u1)
      |        ORDER BY node LIMIT 1),
      |b1 AS (SELECT DISTINCT adj.dst AS node FROM adj
      |       JOIN far ON adj.src = far.node),
      |b2 AS (SELECT DISTINCT adj.dst AS node FROM adj
      |       JOIN b1 ON adj.src = b1.node),
      |u2 AS (SELECT node, min(dist) AS dist FROM (
      |    SELECT node, 0 AS dist FROM far
      |    UNION ALL SELECT node, 1 FROM b1
      |    UNION ALL SELECT node, 2 FROM b2) GROUP BY node)
      |SELECT (SELECT node FROM s0) AS start_node,
      |  CAST((SELECT max(dist) FROM u1) AS INTEGER) AS ecc1,
      |  (SELECT node FROM far) AS far_node,
      |  CAST((SELECT max(dist) FROM u2) AS INTEGER) AS diam_lb,
      |  (SELECT CAST(count(*) AS BIGINT) FROM u2) AS n_reached""".stripMargin) {
    (s, d) =>
    val und = copurchaseEdges(s, d)
    val adj = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The two sweep seeds are single node ids; pulling each to the
    // driver (one bounded scalar, AnnIvf's centroid-pull discipline)
    // keeps every BFS round's lineage LINEAR — seeding with the 1-row
    // DataFrame instead re-derives the whole upstream sweep inside
    // every later round's plan (measured: minutes vs seconds at sf0.1).
    val s0 = adj.groupBy("src").agg(count(lit(1)).as("deg"))
      .agg(max(struct(col("deg"), (-col("src")).as("nn"))).as("m"))
      .select((-col("m.nn")).as("node"))
      .collect().head.getLong(0)
    def sweep(seed: Long): DataFrame = {
      var visited = s.range(1)
        .select(lit(seed).as("node"), lit(0).as("dist"))
      var frontier = visited.select("node")
      for (hop <- 1 to 2) {
        val next = adj.join(frontier.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
        visited = visited.union(next.select(col("node"), lit(hop).as("dist")))
        frontier = next
      }
      visited.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val u1 = sweep(s0)
    val farRow = u1
      .agg(max(struct(col("dist"), (-col("node")).as("nn"))).as("m"))
      .select(col("m.dist").as("ecc1"), (-col("m.nn")).as("node"))
      .collect().head
    val (ecc1, far) = (farRow.getInt(0), farRow.getLong(1))
    val u2 = sweep(far)
    u2.agg(max(struct(col("dist"), (-col("node")).as("nn"))).as("m"),
        count(lit(1)).as("n_reached"))
      .select(lit(s0).as("start_node"), lit(ecc1).as("ecc1"),
        lit(far).as("far_node"), col("m.dist").as("diam_lb"),
        col("n_reached"))
  }

  /** Item-item collaborative filtering (Sarwar et al., WWW'01) over
    * the weighted co-purchase graph: similarity(u, v) = c_uv /
    * √(n_u·n_v) — co-occurrence cosine over order baskets — and the
    * top-5 recommendations for each of the 10 most popular parts.
    * The pair stream is bounded per order (q68's discipline), the
    * anchor set is a 10-row broadcast so only anchor-adjacent edges
    * survive the semijoin, and the ranking window is anchor-
    * partitioned. Exact integer counts; one IEEE √ + division per
    * surviving edge. */
  val itemCfRecs: Q = Q(
    "item_cf_recs",
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |           FROM lineitem),
      |pc AS (SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2),
      |pop AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY 1),
      |top AS (SELECT pk, n FROM pop ORDER BY n DESC, pk LIMIT 10),
      |ed AS (SELECT u AS src, v AS dst, cnt FROM pc
      |       UNION ALL SELECT v, u, cnt FROM pc),
      |sc AS (SELECT t.pk AS anchor, e.dst AS rec, e.cnt,
      |    CAST(e.cnt AS DOUBLE) / sqrt(CAST(t.n * p.n AS DOUBLE)) AS sim
      |  FROM top t JOIN ed e ON e.src = t.pk
      |  JOIN pop p ON p.pk = e.dst),
      |rk AS (SELECT anchor, rec, cnt, sim,
      |    row_number() OVER (PARTITION BY anchor
      |      ORDER BY sim DESC, rec) AS rn
      |  FROM sc)
      |SELECT anchor, rec, cnt AS n_co,
      |  floor(sim * 1000000 + 0.5) / 1000000 AS sim
      |FROM rk WHERE rn <= 5 ORDER BY anchor, rn""".stripMargin) { (s, d) =>
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    // pair counts via the group-explode builder (copurchaseEdges'
    // measured-cheaper physical path; collect_set dedups per order so
    // the per-(u,v) order count ≡ the oracle's op⋈op self-join count):
    // ONE groupBy shuffle + executor-side u<v fan-out instead of two
    // shuffled self-join sides (r13 optimization).
    val pc = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set(col("pk")).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
          |  transform(filter(pks, y -> y > x),
          |            y -> struct(x AS u, y AS v))))""".stripMargin))
        .as("e"))
      .select(col("e.u"), col("e.v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cnt"))
    val pop = op.groupBy("pk").agg(count(lit(1)).as("n"))
    val top = pop.orderBy(col("n").desc, col("pk")).limit(10)
    val ed = pc.select(col("u").as("src"), col("v").as("dst"), col("cnt"))
      .union(pc.select(col("v").as("src"), col("u").as("dst"), col("cnt")))
    ed.join(broadcast(top.select(col("pk").as("src"), col("n").as("na"))),
        "src")
      .join(pop.select(col("pk").as("dst"), col("n").as("nb")), "dst")
      .select(col("src").as("anchor"), col("dst").as("rec"), col("cnt"),
        (col("cnt").cast("double")
          / sqrt((col("na") * col("nb")).cast("double"))).as("sim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("anchor")
          .orderBy(col("sim").desc, col("rec"))))
      .filter(col("rn") <= 5)
      .select(col("anchor"), col("rec"), col("cnt").as("n_co"),
        (floor(col("sim") * 1000000 + lit(0.5)) / 1000000).as("sim"),
        col("rn"))
      .orderBy("anchor", "rn")
      .drop("rn")
  }

  /** Transitive closure by POINTER DOUBLING — the recursive-CTE
    * capability Spark SQL lacks (DuckDB's WITH RECURSIVE is the
    * oracle), re-expressed as an iterative self-join fixpoint: the
    * closure C_{k+1} = C_k ∪ (C_k ∘ C_k) squares reachable path
    * length per round, so a depth-D hierarchy converges in ⌈log2 D⌉
    * joins (11-level tree → 4 rounds) instead of D chained joins —
    * THE scale trick for deep hierarchies (a 100 TB BOM with depth
    * 10^3 is 10 rounds). Hierarchy: the implicit binary tree
    * parent(p) = p DIV 2 over part keys — deterministic, derivable in
    * both engines without a fixture. Each round is one key-partitioned
    * equi-join + union + distinct; the driver sees ONE Long per round
    * (convergence check). Output per part: depth (= #ancestors) and
    * the ancestor-key checksum, so every closure row is hash-gated. */
  val recursiveClosure: Q = Q(
    "recursive_closure",
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS p, p_partkey // 2 AS a FROM part
      |  WHERE p_partkey > 1
      |  UNION ALL
      |  SELECT p, a // 2 FROM anc WHERE a > 1)
      |SELECT p AS part_id, CAST(count(*) AS BIGINT) AS depth,
      |  CAST(sum(a) AS BIGINT) AS anc_sum
      |FROM anc GROUP BY p ORDER BY part_id""".stripMargin) { (s, d) =>
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // FUNCTIONAL-hierarchy doubling: parent is a function (one parent
    // per node), so the EXACT 2^k-jump relation J_k has at most |V|
    // rows — small enough to BROADCAST at any scale that fits a
    // dimension table. Round k emits the jumps (2^k, 2^(k+1)] slice as
    // newPairs = J_k ∘ C_k, which is DISJOINT from C_k by length, so
    // the closure accumulates by unionAll with no distinct and no
    // anti-join (both were measured slower: 11.7s distinct-doubling,
    // 23.3s semi-naive — see PLANS.md); every per-round join is a
    // map-side broadcast, and the final groupBy is the only shuffle.
    val parent = Tables.part(s, d)
      .select(col("p_partkey").as("p"), (col("p_partkey") / 2).cast("long").as("a"))
      .filter(col("p") > 1)
      .persist(mem)
    parent.count()
    val pieces = scala.collection.mutable.ArrayBuffer[DataFrame](parent)
    var jump = parent // J_0: the exact 1-jump (root's parent chain ends)
    var closure: DataFrame = parent
    var rounds = 0
    var growing = true
    while (growing && rounds < 40) {
      // jumps (2^k, 2^(k+1)]: first the exact 2^k hop, then any <=2^k tail
      val newPairs = closure.as("c")
        .join(broadcast(jump).as("j"), col("c.p") === col("j.a"))
        .select(col("j.p").as("p"), col("c.a").as("a"))
        .persist(mem)
      val n = newPairs.count() // ONE Long per round crosses the driver
      if (n == 0) { newPairs.unpersist(blocking = false); growing = false }
      else {
        pieces += newPairs
        closure = pieces.reduce(_ unionAll _)
        // J_(k+1) = J_k ∘ J_k, a |V|-bounded broadcast self-join
        jump = jump.as("x").join(broadcast(jump).as("y"),
            col("x.a") === col("y.p"))
          .select(col("x.p").as("p"), col("y.a").as("a"))
          .persist(mem)
        jump.count()
      }
      rounds += 1
    }
    closure.groupBy(col("p").as("part_id"))
      .agg(count(lit(1)).as("depth"), sum(col("a")).as("anc_sum"))
      .orderBy("part_id")
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): common-neighbor
    * evidence weighted by 1/ln(deg) of the shared neighbor, so hub
    * co-occurrence counts less — the standard refinement over q111's
    * raw common-neighbor count, sharing its degree-capped wedge
    * discipline (hubs above the cap cannot generate wedges; the
    * 1/ln(d) weight rides the SAME wedge stream as a map-side column,
    * zero extra shuffle vs q111). */
  val adamicAdar: Q = Q(
    "adamic_adar",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |adj AS (SELECT DISTINCT a.l_partkey AS c, b.l_partkey AS n
      |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey <> b.l_partkey),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY c),
      |capped AS (SELECT adj.c, adj.n, deg.d FROM adj JOIN deg ON deg.c = adj.c
      |           WHERE deg.d <= 64 AND deg.d >= 2),
      |aa AS (SELECT a1.n AS u, a2.n AS v,
      |         sum(1.0 / ln(a1.d)) AS score, count(*) AS common
      |       FROM capped a1 JOIN capped a2
      |         ON a1.c = a2.c AND a1.n <> a2.n
      |       WHERE a1.n % 20 = 0
      |       GROUP BY a1.n, a2.n),
      |pred AS (SELECT aa.u, aa.v, aa.score, aa.common FROM aa
      |         LEFT JOIN adj ON adj.c = aa.u AND adj.n = aa.v
      |         WHERE adj.c IS NULL)
      |SELECT u, v, CAST(common AS BIGINT) AS common,
      |  floor(score * 1000000 + 0.5) / 1000000 AS aa_score
      |FROM pred
      |ORDER BY floor(score * 1000000 + 0.5) / 1000000 DESC, u, v
      |LIMIT 20""".stripMargin) { (s, d) =>
    // adjacency via the group-explode builder (set ≡ the oracle's
    // li⋈li self-join — see coAdjacency)
    val adj = coAdjacency(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy("c").agg(count(lit(1)).as("d"))
    val capped = adj.join(
      deg.filter(col("d") <= 64 && col("d") >= 2), "c")
    val targetSide = capped.filter(col("n") % 20 === 0)
    val aa = targetSide.as("a1").join(capped.as("a2"),
        col("a1.c") === col("a2.c") && col("a1.n") =!= col("a2.n"))
      .groupBy(col("a1.n").as("u"), col("a2.n").as("v"))
      .agg(sum(lit(1.0) / log(col("a1.d"))).as("score"),
        count(lit(1)).as("common"))
    aa.join(adj.select(col("c").as("u"), col("n").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("common"),
        (floor(col("score") * 1000000 + lit(0.5)) / 1000000).as("aa_score"))
      .orderBy(col("aa_score").desc, col("u"), col("v"))
      .limit(20)
  }

  /** Truncated Katz index (Katz 1953), k ≤ 2, over the co-purchase
    * graph with β = 1/4 scaled integer-exact: score = 4·deg + #2-paths
    * (16·(β·deg + β²·paths₂)) — every term a BIGINT, so the gate is
    * exact with no float-drift discipline (the same trick as
    * hits_scores). The 2-path count is LINEARIZED: on this symmetric
    * adjacency the wedge count collapses exactly to
    * paths2(x) = Σ_{m∈N(x), deg(m)≤64} (deg(m)−1) — the back-edge
    * m→x always exists, so the "≠ x" exclusion removes exactly one
    * endpoint per mid-node. The oracle states the quadratic wedge
    * join; Spark computes the identical values with one broadcast
    * degree lookup + groupBy (no pair-stream shuffle at all — at
    * 100 TB the wedge form shuffles O(Σdeg²), this form O(|E|)).
    * Hubs beyond the cap keep their exact degree term and only
    * forfeit wedge enumeration, stated in the oracle identically. */
  val katzIndex: Q = Q(
    "katz_index",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |adj AS (SELECT DISTINCT a.l_partkey AS c, b.l_partkey AS n
      |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey <> b.l_partkey),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY c),
      |capped AS (SELECT adj.c, adj.n FROM adj JOIN deg ON deg.c = adj.c
      |           WHERE deg.d <= 64),
      |p2 AS (SELECT a1.c AS node, count(*) AS paths2
      |       FROM capped a1 JOIN capped a2 ON a1.n = a2.c
      |       WHERE a2.n <> a1.c
      |       GROUP BY a1.c),
      |sc AS (SELECT deg.c AS node,
      |         4 * deg.d + coalesce(p2.paths2, 0) AS katz16
      |       FROM deg LEFT JOIN p2 ON p2.node = deg.c)
      |SELECT node, CAST(katz16 AS BIGINT) AS katz16
      |FROM sc ORDER BY katz16 DESC, node LIMIT 25""".stripMargin) { (s, d) =>
    // adjacency via the group-explode builder (set ≡ the oracle's
    // li⋈li self-join — see coAdjacency)
    val adj = coAdjacency(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy("c").agg(count(lit(1)).as("d"))
    // paths2(x) = Σ_{m∈N(x), deg(m)≤64} (deg(m)−1): |V|-sized degree
    // table broadcast onto the edge stream; the only shuffle left is
    // the map-side-combined groupBy on x. Sources above the cap get
    // their p2 zeroed in the final select (the oracle's capped a1).
    val midW = deg.filter(col("d") <= 64)
      .select(col("c").as("m"), (col("d") - 1).as("w"))
    val p2 = adj.join(broadcast(midW), col("n") === col("m"))
      .groupBy(col("c").as("node")).agg(sum(col("w")).as("paths2"))
    deg.select(col("c").as("node"), col("d"))
      .join(p2, Seq("node"), "left_outer")
      .select(col("node"),
        (lit(4) * col("d") + when(col("d") <= 64,
          coalesce(col("paths2"), lit(0L))).otherwise(lit(0L)))
          .as("katz16"))
      .orderBy(col("katz16").desc, col("node"))
      .limit(25)
  }

  /** Harmonic centrality (Boldi & Vigna 2014) from a seed set, horizon
    * 3: h(s) = Σ_{v≠s, d(s,v)≤3} 1/d(s,v), reported integer-exact as
    * h6 = 6·n₁ + 3·n₂ + 2·n₃ (no float enters the metric). Same
    * delta-frontier + anti-join-visited discipline as q78_khop, but
    * multi-source: the frontier carries (seed, node) pairs so all
    * seeds expand in the SAME three adjacency joins — seed count
    * multiplies rows, not rounds. Seeds are the deterministic
    * pk % 500 slice; the 1/500 sampling is the scale knob (exact
    * centrality for a seed panel, not all-pairs). */
  val harmonicCentrality: Q = Q(
    "harmonic_centrality",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |adj AS (SELECT DISTINCT a.l_partkey AS c, b.l_partkey AS n
      |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey <> b.l_partkey),
      |seeds AS (SELECT DISTINCT c AS s FROM adj WHERE c % 500 = 0),
      |d1 AS (SELECT DISTINCT sd.s, a.n FROM seeds sd JOIN adj a
      |       ON a.c = sd.s),
      |d2 AS (SELECT DISTINCT d1.s, a.n FROM d1 JOIN adj a ON a.c = d1.n
      |       WHERE a.n <> d1.s
      |         AND NOT EXISTS (SELECT 1 FROM d1 x
      |                         WHERE x.s = d1.s AND x.n = a.n)),
      |d3 AS (SELECT DISTINCT d2.s, a.n FROM d2 JOIN adj a ON a.c = d2.n
      |       WHERE a.n <> d2.s
      |         AND NOT EXISTS (SELECT 1 FROM d1 x
      |                         WHERE x.s = d2.s AND x.n = a.n)
      |         AND NOT EXISTS (SELECT 1 FROM d2 x
      |                         WHERE x.s = d2.s AND x.n = a.n)),
      |cnt AS (SELECT s,
      |    (SELECT count(*) FROM d1 WHERE d1.s = cnt0.s) AS n1,
      |    (SELECT count(*) FROM d2 WHERE d2.s = cnt0.s) AS n2,
      |    (SELECT count(*) FROM d3 WHERE d3.s = cnt0.s) AS n3
      |  FROM seeds cnt0)
      |SELECT s AS seed, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(n3 AS BIGINT) AS n3,
      |  CAST(6 * n1 + 3 * n2 + 2 * n3 AS BIGINT) AS h6
      |FROM cnt ORDER BY seed""".stripMargin) { (s, d) =>
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Adjacency DELIBERATELY stays the self-join form here (r13: the
    // coAdjacency group-explode builder was tried and REVERTED with a
    // measurement — 4.76 -> 8.64s solo min-of-4 at sf0.1; this query
    // re-reads the persisted adjacency in three frontier expansions and
    // the union-shaped cached plan regressed every downstream read,
    // unlike the capped-wedge family where the builder is neutral-to-
    // positive).
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val adj = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("c"), col("b.pk").as("n")).distinct()
      .persist(mem)
    val seeds = adj.filter(col("c") % 500 === 0).select(col("c").as("s"))
      .distinct()
    // Broadcast-frontier expansion was tried and REVERTED with a
    // measurement (5.66 -> 9.66s sf0.1): the ~|seeds|·|V| frontiers
    // and visited sets cost four driver collect+rebroadcast builds per
    // battery run, which exceeds the adjacency shuffle they avoid at
    // this seed-panel size. The shuffle form below keeps every
    // exchange map-side-combined and frontier-bounded.
    val d1 = seeds.join(adj, col("s") === col("c"))
      .select(col("s"), col("n")).distinct().persist(mem)
    def expand(frontier: DataFrame, visited: Seq[DataFrame]): DataFrame = {
      val next = frontier.select(col("s"), col("n").as("hop"))
        .join(adj, col("hop") === col("c"))
        .filter(col("n") =!= col("s"))
        .select(col("s"), col("n")).distinct()
      visited.foldLeft(next)((f, v) => f.join(v, Seq("s", "n"), "left_anti"))
        .persist(mem)
    }
    val d2 = expand(d1, Seq(d1))
    val d3 = expand(d2, Seq(d1, d2))
    val c1 = d1.groupBy("s").agg(count(lit(1)).as("n1"))
    val c2 = d2.groupBy("s").agg(count(lit(1)).as("n2"))
    val c3 = d3.groupBy("s").agg(count(lit(1)).as("n3"))
    seeds.join(c1, Seq("s"), "left_outer")
      .join(c2, Seq("s"), "left_outer")
      .join(c3, Seq("s"), "left_outer")
      .select(col("s").as("seed"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"))
      .withColumn("h6", lit(6) * col("n1") + lit(3) * col("n2") + lit(2) * col("n3"))
      .orderBy("seed")
  }

  /** k-BETWEENNESS centrality (Brandes & Pich 2007 — bounded-distance
    * Brandes) over the co-purchase graph: for a seed panel of
    * node % 1000 = 0 (deliberately HALF the density of harmonic's
    * % 500 panel — the backward pass carries an extra data-sized edge
    * stream per level, so the panel is thinned to keep the battery
    * balanced; it SF-scales the same way, panel ∝ |V|), run the
    * exact Brandes dependency accumulation restricted to shortest
    * paths of length ≤ 3 — the sampled-source, hop-bounded form that
    * makes betweenness tractable at 100 TB (full Brandes is O(V·E)).
    * Forward: 3 unrolled BFS levels carrying σ (the harmonic_centrality hop budget — level 4 doubled the frontier volume for a 33.7s sf0.1 constant; k = 3 keeps the panel comparable and the battery balanced) (shortest-path counts,
    * exact BIGINTs — σ_{l+1}(w) = Σ σ_l(u) over DAG edges, each node
    * counted at its first level only via anti-joins, the
    * harmonic_centrality expansion pattern). Backward: the Brandes
    * recurrence δ(v) = Σ_succ (σ_v/σ_w)(1+δ(w)) on the 1e-6 integer
    * grid with PER-TERM integer division — order-independent BIGINT
    * sums both engines reproduce bit-for-bit (σ_v ≤ σ_w keeps every
    * term ≤ U+δ_w; the σ_v·(U+δ_w) intermediate stays under 2^63
    * while σ_max·|V| ≲ 9e12, orders of magnitude past sf1 — scaladoc'd
    * bound, not a silent cap). Levels-at-the-cap contribute as targets
    * (the 1 in 1+δ) but carry δ=0, exactly the k-betweenness
    * semantics. Every stage is an equi-join + map-side-combinable
    * aggregate on (seed, node) keys; driver traffic is zero.
    *
    * COST ACCEPTED (round-13 decision, closing r12 verdict #6): ~11s
    * in the committed idle battery is the declared price of the
    * % 1000 seed panel. The plan is the right one at scale — measured
    * 51.5x wall at 100x data (tools/SCALECHECK.json, vs the 144x
    * sub-quadratic bar), all equi-joins, zero driver traffic — and
    * the remaining ~2-3s over the one-off ~8.5s best is AQE driver
    * re-planning across a flat ~20-stage profile, a fixture-scale
    * constant that AMORTIZES at production scale (same stage count,
    * 1000x the data per stage). Rejected alternatives are documented
    * above and in SURVEY §8; the panel is NOT being thinned further —
    * that would change the declared result to buy a constant. No
    * further rounds chase this number. */
  val kBetweenness: Q = Q(
    "k_betweenness",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |adj AS (SELECT DISTINCT a.l_partkey AS c, b.l_partkey AS n
      |        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |          AND a.l_partkey <> b.l_partkey),
      |seeds AS (SELECT DISTINCT c AS s FROM adj WHERE c % 1000 = 0),
      |l0 AS (SELECT s, s AS v, CAST(1 AS BIGINT) AS sig FROM seeds),
      |l1 AS (SELECT l0.s, a.n AS v, CAST(sum(l0.sig) AS BIGINT) AS sig
      |  FROM l0 JOIN adj a ON a.c = l0.v GROUP BY 1, 2),
      |l2 AS (SELECT l1.s, a.n AS v, CAST(sum(l1.sig) AS BIGINT) AS sig
      |  FROM l1 JOIN adj a ON a.c = l1.v
      |  WHERE a.n NOT IN (SELECT v FROM l0 x WHERE x.s = l1.s)
      |    AND a.n NOT IN (SELECT v FROM l1 x WHERE x.s = l1.s)
      |  GROUP BY 1, 2),
      |l3 AS (SELECT l2.s, a.n AS v, CAST(sum(l2.sig) AS BIGINT) AS sig
      |  FROM l2 JOIN adj a ON a.c = l2.v
      |  WHERE a.n NOT IN (SELECT v FROM l0 x WHERE x.s = l2.s)
      |    AND a.n NOT IN (SELECT v FROM l1 x WHERE x.s = l2.s)
      |    AND a.n NOT IN (SELECT v FROM l2 x WHERE x.s = l2.s)
      |  GROUP BY 1, 2),
      |d2 AS (SELECT l2.s, l2.v,
      |    coalesce((SELECT CAST(sum((l2.sig * 1000000) // w.sig)
      |        AS BIGINT)
      |      FROM adj a JOIN l3 w ON w.s = l2.s AND w.v = a.n
      |      WHERE a.c = l2.v), 0) AS dq
      |  FROM l2),
      |d1 AS (SELECT l1.s, l1.v,
      |    coalesce((SELECT CAST(sum((l1.sig * (1000000 + w.dq2)) // w.sig)
      |        AS BIGINT)
      |      FROM adj a JOIN (SELECT l2.s, l2.v, l2.sig, d2.dq AS dq2
      |                       FROM l2 JOIN d2 ON d2.s = l2.s
      |                         AND d2.v = l2.v) w
      |        ON w.s = l1.s AND w.v = a.n
      |      WHERE a.c = l1.v), 0) AS dq
      |  FROM l1),
      |bc AS (SELECT v, CAST(sum(dq) AS BIGINT) AS bc_units FROM (
      |    SELECT s, v, dq FROM d1
      |    UNION ALL SELECT s, v, dq FROM d2) u
      |  GROUP BY v)
      |SELECT v AS node, bc_units FROM bc
      |ORDER BY bc_units DESC, node LIMIT 20""".stripMargin) { (s, d) =>
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val U = 1000000L
    // same adjacency SET as harmonic's self-join form, built through
    // the group-explode edge builder (the measured 2x cheaper path —
    // see coAdjacency)
    val adj = coAdjacency(s, d).persist(mem)
    val seeds = adj.filter(col("c") % 1000 === 0).select(col("c").as("s"))
      .distinct()
    val l0 = seeds.select(col("s"), col("s").as("v"), lit(1L).as("sig"))
      .persist(mem)
    // forward: σ-carrying frontier expansion. The raw (level-l node ×
    // neighbor) edge stream — the query's data monster (23.7M rows /
    // 248 MB at sf0.1 for level 3) — is repartitioned ONCE by the
    // (seed, node) key BOTH consumers cluster on and persisted in that
    // layout, so the forward σ-aggregate and the backward join each
    // read the cache with ZERO further exchange (r12: this replaced a
    // second full exchange+sort of the edge stream inside the backward
    // SMJ — measured 11.7s → ~8.5s battery-idle). The visited
    // anti-join runs on the AGGREGATED (seed, node) level (≤
    // |seeds|·|V| rows), never on the edge stream — σ is unchanged
    // (every contribution comes from level-l preds; edges into earlier
    // levels are dropped node-wholesale) and the anti-join volume
    // falls by the average degree.
    def expandTr(cur: DataFrame, visited: Seq[DataFrame],
        keepRaw: Boolean = true): (DataFrame, DataFrame) = {
      val raw0 = cur.join(adj, col("v") === col("c"))
        .select(col("s"), col("v").as("u"), col("sig"), col("n").as("w"))
      val raw = if (keepRaw) raw0.repartition(col("s"), col("w")).persist(mem)
        else raw0
      val agg = raw.groupBy(col("s"), col("w"))
        .agg(sum("sig").as("sig"))
      val seen = visited.map(_.select(col("s"), col("v").as("w")))
        .reduce(_ unionAll _)
      val next = agg.join(seen, Seq("s", "w"), "left_anti")
        .select(col("s"), col("w").as("v"), col("sig"))
        .persist(mem)
      (raw, next)
    }
    val (_, l1) = expandTr(l0, Seq(l0), keepRaw = false)
    val (tr2, l2) = expandTr(l1, Seq(l0, l1))
    val (tr3, l3) = expandTr(l2, Seq(l0, l1, l2))
    // backward: δ on the 1e-6 grid; per-term integer DIV keeps every
    // accumulation an order-independent BIGINT sum. The edge stream
    // joined against the NEXT level's (σ, δ) does the DAG filtering
    // implicitly (only true level-(l+1) successors match).
    def back(lv: DataFrame, tr: DataFrame, succ: DataFrame): DataFrame = {
      // shuffle_hash, not sort-merge: the probe side is the data-sized
      // raw edge stream (~20M rows at sf0.1) and SMJ would SORT it —
      // the battery's single most expensive sort (measured 2.5s of the
      // stage budget); the build side is the AGGREGATED (seed, node)
      // level, bounded by |seeds|·|V|, which hashes in-memory per
      // partition. Both sides still hash-partition on (s, w) — nothing
      // is broadcast, driver traffic stays zero, and the build side
      // stays partition-local at any scale.
      tr.join(succ.select(col("s").as("s2"), col("v").as("w2"),
            col("sig").as("wsig"), col("dq").as("wdq")).hint("shuffle_hash"),
          col("s") === col("s2") && col("w") === col("w2"))
        .select(col("s"), col("u").as("v"),
          expr(s"(sig * ($U + wdq)) DIV wsig").as("term"))
        .groupBy("s", "v").agg(sum("term").as("dqs"))
        .as("t")
        .join(lv.as("l"), col("t.s") === col("l.s")
          && col("t.v") === col("l.v"), "right_outer")
        .select(col("l.s").as("s"), col("l.v").as("v"),
          col("l.sig").as("sig"),
          coalesce(col("t.dqs"), lit(0L)).as("dq"))
    }
    def backKeep(lv: DataFrame, tr: DataFrame, succ: DataFrame): DataFrame =
      back(lv, tr, succ).persist(mem)
    val d3 = l3.withColumn("dq", lit(0L))
    val d2 = backKeep(l2, tr3, d3)
    val d1 = back(l1, tr2, d2)
    d1.select("v", "dq")
      .unionAll(d2.select("v", "dq"))
      .groupBy("v").agg(sum("dq").as("bc_units"))
      .select(col("v").as("node"), col("bc_units"))
      .orderBy(col("bc_units").desc, col("node"))
      .limit(20)
  }

  val all: Seq[Q] =
    Seq(pagerankBipartite, triangles, khopBfs, linkPredict, labelProp,
      assortativity, clusteringCoeff, kcorePeel, hitsScores, richClub,
      brandModularity, graphDiameter, itemCfRecs, recursiveClosure,
      adamicAdar, katzIndex, harmonicCentrality, kBetweenness)
}
