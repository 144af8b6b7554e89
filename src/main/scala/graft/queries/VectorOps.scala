package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Embedding-space operators over `embeddings` (vec_id, embedding:
  * array<float> dim 64, label) — the similarity-search half of the
  * LLM-pipeline surface (north star; see SURVEY.md §2.B last row).
  *
  * All math is done in DOUBLE on both engines (inputs are float32; mixed
  * precision would drift between Spark and DuckDB), composed from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs in
  * the hot path.
  *
  * Scale design: the brute-force top-k broadcasts the (small) query set
  * and streams the corpus once — a map-only plan plus a per-query top-k
  * window, which is exactly the 100 TB baseline. The sub-linear variant
  * (random-hyperplane LSH bucketing) is in graft.ann with ScalaTest
  * recall gates (probabilistic → not oracle-declared).
  */
object VectorOps {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** dot(a, b) over two array<double> columns, computed as a strict left
    * fold — deterministic accumulation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Per-label embedding profile: count + mean L2 norm. */
  val embedStats: Q = Q(
    "embed_stats",
    """SELECT label, count(*) AS n,
      | round(avg(sqrt(list_aggregate(
      |   list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), 'sum'))), 4) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val v = asDouble(col("embedding"))
    emb(s, d)
      .select(col("label"),
        sqrt(graft.functions.GraftFunctions.dotNative(v, v)).as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("norm"), 4).as("avg_norm"))
      .orderBy("label")
  }

  /** Brute-force cosine top-3 neighbours for query vectors vec_id < 5.
    * Broadcast the 5-row query side; corpus scanned once; ranking uses the
    * ROUNDED cosine (6 dp) with vec_id tie-break so both engines agree. */
  val cosineTopK: Q = Q(
    "cosine_topk",
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |scored AS (
      |  SELECT qid, vec_id,
      |    round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos
      |  FROM q JOIN c ON qid <> vec_id)
      |SELECT qid, vec_id, cos FROM (
      |  SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM scored) t
      |WHERE rn <= 3 ORDER BY qid, cos DESC, vec_id""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val q = emb(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val c = emb(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.GraftFunctions.cosineNative(col("qv"), col("cv")), 6)
          .as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "vec_id", "cos")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }

  /** Deterministic pairwise cosine over a fixed candidate set (vec_ids
    * 0-19, lower triangle) — the exact kernel the ANN path approximates. */
  val cosinePairs: Q = Q(
    "cosine_pairs",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
      |           FROM embeddings WHERE vec_id < 20)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.ev, b.ev)
      |    / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val v = emb(s, d).filter(col("vec_id") < 20)
    val a = v.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("ea"))
    val b = v.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** ε-neighbor spatial self-join via grid binning — the canonical
    * distributed spatial-join pattern (bin → replicate to the 3×3
    * neighbor cells → equi-join on cell → exact distance filter),
    * declared over the first two embedding dimensions as a 2-D point
    * set with ε = 0.05. One side replicates ×9 map-side (explode of
    * literal offsets, no theta join); the join is a plain equi-join on
    * the cell key, so at 100 TB it shuffles ~9·|points| rows hashed by
    * cell instead of comparing all pairs; candidate pairs are verified
    * with the exact (double) squared distance, and `a < b` dedupes the
    * symmetric hits. Cell ids from floor(x/ε) on bit-identical doubles
    * are engine-identical. Output: total ε-pair count (1-row
    * broadcast) + the 15 closest pairs. */
  val gridSpatialJoin: Q = Q(
    "grid_spatial_join",
    """WITH p AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
      |    CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
      |pc AS (SELECT vec_id, x, y,
      |    CAST(floor(x / 0.05) AS BIGINT) AS cx,
      |    CAST(floor(y / 0.05) AS BIGINT) AS cy FROM p),
      |rep AS (SELECT vec_id, x, y, cx + dx.d AS cx, cy + dy.d AS cy
      |  FROM pc, (SELECT unnest([-1, 0, 1]) AS d) dx,
      |            (SELECT unnest([-1, 0, 1]) AS d) dy),
      |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM rep a JOIN pc b ON a.cx = b.cx AND a.cy = b.cy
      |    AND a.vec_id < b.vec_id),
      |hits AS (SELECT id_a, id_b, d2 FROM cand WHERE d2 <= 0.0025),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM hits)
      |SELECT id_a, id_b,
      |  floor(sqrt(d2) * 1000000 + 0.5) / 1000000 AS dist, n_pairs
      |FROM hits CROSS JOIN n
      |ORDER BY d2, id_a, id_b LIMIT 15""".stripMargin) { (s, d) =>
    val p = emb(s, d).select(col("vec_id"),
      col("embedding").getItem(0).cast("double").as("x"),
      col("embedding").getItem(1).cast("double").as("y"))
    val pc = p.select(col("vec_id"), col("x"), col("y"),
      floor(col("x") / 0.05).cast("long").as("cx"),
      floor(col("y") / 0.05).cast("long").as("cy"))
    val rep = pc
      .select(col("vec_id"), col("x"), col("y"),
        explode(expr("transform(sequence(-1, 1), d -> cx + d)")).as("acx"),
        col("cy"))
      .select(col("vec_id"), col("x"), col("y"), col("acx"),
        explode(expr("transform(sequence(-1, 1), d -> cy + d)")).as("acy"))
    val b = pc.select(col("vec_id").as("id_b"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    val cand = rep.join(b,
      col("acx") === col("cx") && col("acy") === col("cy") &&
        col("vec_id") < col("id_b"))
    val dx = col("x") - col("bx")
    val dy = col("y") - col("by")
    val hits = cand
      .select(col("vec_id").as("id_a"), col("id_b"),
        (dx * dx + dy * dy).as("d2"))
      .filter(col("d2") <= 0.0025)
    val n = hits.agg(count(lit(1)).as("n_pairs"))
    hits.crossJoin(broadcast(n)) // 1-row pair-count report
      .orderBy(col("d2"), col("id_a"), col("id_b")).limit(15)
      .select(col("id_a"), col("id_b"),
        (floor(sqrt(col("d2")) * 1000000 + lit(0.5)) / 1000000).as("dist"),
        col("n_pairs"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
  }

  /** DBSCAN density clustering (Ester et al. 1996) over the 2-D
    * embedding projection — the full composite on top of the grid
    * spatial join: ε-neighbor pairs (ε=0.01) from the bin→replicate→
    * equi-join pattern, core points = degree ≥ 3, clusters = connected
    * components of the core–core graph (the SAME pointer-jumping
    * operator the dedup pipeline uses; oracle = recursive-CTE
    * transitive closure), border points assigned to their MINIMUM
    * core-neighbor cluster (DBSCAN's assignment is order-dependent in
    * the textbook scan — the min rule makes it deterministic), rest is
    * noise. Output: per-cluster core/border/total counts plus a noise
    * row (component −1). Every stage is the scale-safe shape: grid
    * equi-join, degree aggregate, log-round pointer jumping. */
  val dbscanGrid: Q = Q(
    "dbscan_grid",
    """WITH RECURSIVE p AS (SELECT vec_id,
      |    CAST(embedding[1] AS DOUBLE) AS x,
      |    CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
      |pc AS (SELECT vec_id, x, y,
      |    CAST(floor(x / 0.01) AS BIGINT) AS cx,
      |    CAST(floor(y / 0.01) AS BIGINT) AS cy FROM p),
      |rep AS (SELECT vec_id, x, y, cx + dx.d AS cx, cy + dy.d AS cy
      |  FROM pc, (SELECT unnest([-1, 0, 1]) AS d) dx,
      |            (SELECT unnest([-1, 0, 1]) AS d) dy),
      |nbr AS (SELECT a.vec_id AS ia, b.vec_id AS ib
      |  FROM rep a JOIN pc b ON a.cx = b.cx AND a.cy = b.cy
      |    AND a.vec_id <> b.vec_id
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |    <= 0.0001),
      |deg AS (SELECT ia AS v, CAST(count(*) AS BIGINT) AS c FROM nbr
      |        GROUP BY ia),
      |core AS (SELECT v FROM deg WHERE c >= 3),
      |ce AS (SELECT ia, ib FROM nbr
      |  WHERE ia IN (SELECT v FROM core) AND ib IN (SELECT v FROM core)),
      |reach AS (SELECT ia AS node, ia AS r FROM ce
      |  UNION SELECT reach.node, ce.ib FROM reach JOIN ce
      |    ON reach.r = ce.ia),
      |clbl AS (SELECT core.v, COALESCE(m.comp, core.v) AS comp FROM core
      |  LEFT JOIN (SELECT node, min(r) AS comp FROM reach GROUP BY node) m
      |    ON m.node = core.v),
      |blbl AS (SELECT nbr.ia AS v, min(c2.comp) AS comp FROM nbr
      |  JOIN clbl c2 ON c2.v = nbr.ib
      |  WHERE nbr.ia NOT IN (SELECT v FROM core)
      |  GROUP BY nbr.ia),
      |cstat AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_core
      |          FROM clbl GROUP BY comp),
      |bstat AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_border
      |          FROM blbl GROUP BY comp),
      |clusters AS (SELECT cstat.comp AS component, n_core,
      |    COALESCE(n_border, 0) AS n_border,
      |    n_core + COALESCE(n_border, 0) AS n_pts
      |  FROM cstat LEFT JOIN bstat ON bstat.comp = cstat.comp),
      |noise AS (SELECT CAST(-1 AS BIGINT) AS component,
      |    CAST(0 AS BIGINT) AS n_core, CAST(0 AS BIGINT) AS n_border,
      |    (SELECT count(*) FROM p) - (SELECT count(*) FROM clbl)
      |      - (SELECT count(*) FROM blbl) AS n_pts)
      |SELECT component, n_core, n_border, n_pts
      |FROM (SELECT * FROM clusters UNION ALL SELECT * FROM noise)
      |ORDER BY n_pts DESC, component""".stripMargin) { (s, d) =>
    val p = emb(s, d).select(col("vec_id"),
      col("embedding").getItem(0).cast("double").as("x"),
      col("embedding").getItem(1).cast("double").as("y"))
    val pc = p.select(col("vec_id"), col("x"), col("y"),
      floor(col("x") / 0.01).cast("long").as("cx"),
      floor(col("y") / 0.01).cast("long").as("cy"))
    val rep = pc
      .select(col("vec_id"), col("x"), col("y"),
        explode(expr("transform(sequence(-1, 1), d -> cx + d)")).as("acx"),
        col("cy"))
      .select(col("vec_id"), col("x"), col("y"), col("acx"),
        explode(expr("transform(sequence(-1, 1), d -> cy + d)")).as("acy"))
    val bSide = pc.select(col("vec_id").as("ib"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    val dx = col("x") - col("bx")
    val dy = col("y") - col("by")
    val nbr = rep.join(bSide,
        col("acx") === col("cx") && col("acy") === col("cy") &&
          col("vec_id") =!= col("ib"))
      .filter(dx * dx + dy * dy <= 0.0001)
      .select(col("vec_id").as("ia"), col("ib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = nbr.groupBy(col("ia").as("v")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 3).select("v")
    val ce = nbr
      .join(core.select(col("v").as("va")), col("ia") === col("va"), "left_semi")
      .join(core.select(col("v").as("vb")), col("ib") === col("vb"), "left_semi")
    // The sf0.1 ε-graph's giant core component (768 nodes, effective
    // diameter ~62) needs ~25 propagation rounds — min-label moves the
    // frontier ~2.7 hops/round here, more than the dedup chains the
    // default 20 was tuned for. checkEvery = 6 folds each 6-round
    // block into ONE materializing action (r10 verdict: the battery's
    // slowest entry was paying ~25 convergence-count jobs of pure
    // scheduling overhead; a block of lazy rounds is one job of ~20
    // stages instead). Converged-early blocks waste at most 5 rounds
    // of joins at fixpoint size — noise next to the job overhead they
    // replace.
    val lbl = graft.dedup.ConnectedComponents.components(
      ce.filter(col("ia") < col("ib"))
        .select(col("ia").as("id_a"), col("ib").as("id_b")),
      maxIter = 48, checkEvery = 6)
    val clbl = core.join(lbl, col("v") === col("id"), "left")
      .select(col("v"), coalesce(col("label"), col("v")).as("comp"))
    val blbl = nbr
      .join(core.select(col("v").as("vx")), col("ia") === col("vx"),
        "left_anti")
      .join(clbl.select(col("v").as("cv"), col("comp")),
        col("ib") === col("cv"))
      .groupBy(col("ia").as("v")).agg(min("comp").as("comp"))
    val cstat = clbl.groupBy("comp").agg(count(lit(1)).as("n_core"))
    val bstat = blbl.groupBy(col("comp").as("bcomp"))
      .agg(count(lit(1)).as("n_border"))
    val clusters = cstat.join(bstat, col("comp") === col("bcomp"), "left")
      .select(col("comp").as("component"), col("n_core"),
        coalesce(col("n_border"), lit(0L)).as("n_border"),
        (col("n_core") + coalesce(col("n_border"), lit(0L))).as("n_pts"))
    val nP = p.count()
    val nC = clbl.count()
    val nB = blbl.count()
    val noise = p.sparkSession.range(1)
      .select(lit(-1L).as("component"), lit(0L).as("n_core"),
        lit(0L).as("n_border"), lit(nP - nC - nB).as("n_pts"))
    clusters.unionAll(noise).orderBy(col("n_pts").desc, col("component"))
  }

  /** Moran's I spatial autocorrelation of the point-density surface —
    * the spatial-statistics companion to grid_spatial_join: bin the
    * 2-D embedding projection into 0.05 cells, take x = per-cell point
    * count, rook (4-neighbor) adjacency among OCCUPIED cells, and
    * I = n·Σ_adj dev_i·dev_j / (W·Σ dev_i²) with dev_i = x_i·n − Σx —
    * the n-SCALED deviations keep every product and both sums EXACT
    * BIGINTs (a raw (x−x̄) float sum over the unordered pair stream
    * would be engine-order-nondeterministic), so the only double is
    * the final ratio. Neighbor pairs come from a ×2 map-side offset
    * explode + equi-join (each undirected pair counted twice on both
    * engines, cancelling in I). E[I] = −1/(n−1) is reported beside. */
  val moransI: Q = Q(
    "morans_i",
    """WITH p AS (SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05)
      |      AS BIGINT) AS cx,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
      |  FROM embeddings),
      |cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS x FROM p
      |          GROUP BY cx, cy),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx FROM cells),
      |dev AS (SELECT cx, cy, x, x * n - sx AS dv FROM cells CROSS JOIN tot),
      |nb AS (SELECT a.dv AS da, b.dv AS db
      |  FROM (SELECT cx + o.dx AS cx, cy + o.dy AS cy, dv FROM dev
      |        CROSS JOIN (SELECT unnest([1, 0]) AS dx,
      |                           unnest([0, 1]) AS dy) o) a
      |  JOIN dev b ON a.cx = b.cx AND a.cy = b.cy),
      |agg AS (SELECT CAST(sum(da * db) AS BIGINT) AS num,
      |        CAST(count(*) AS BIGINT) AS w2 FROM nb),
      |den AS (SELECT CAST(sum(dv * dv) AS BIGINT) AS den FROM dev)
      |SELECT n AS n_cells, 2 * w2 AS w_pairs,
      |  floor(CAST(n AS DOUBLE) * (2 * num)
      |    / (CAST(2 * w2 AS DOUBLE) * den) * 1000000 + 0.5) / 1000000
      |    AS morans_i,
      |  floor(-1.0 / (n - 1) * 1000000 + 0.5) / 1000000 AS expected_i
      |FROM agg CROSS JOIN den CROSS JOIN tot""".stripMargin) { (s, d) =>
    val cells = emb(s, d)
      .select(
        floor(col("embedding").getItem(0).cast("double") / 0.05)
          .cast("long").as("cx"),
        floor(col("embedding").getItem(1).cast("double") / 0.05)
          .cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("x"))
    val tot = cells.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val dev = cells.crossJoin(broadcast(tot)) // 1-row cell totals
      .select(col("cx"), col("cy"), col("x"),
        (col("x") * col("n") - col("sx")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shifted = dev.select(
      explode(expr("array(struct(cx + 1 AS cx, cy AS cy), " +
        "struct(cx AS cx, cy + 1 AS cy))")).as("sh"), col("dv"))
      .select(col("sh.cx").as("ax"), col("sh.cy").as("ay"),
        col("dv").as("da"))
    val nb = shifted.join(
      dev.select(col("cx"), col("cy"), col("dv").as("db")),
      col("ax") === col("cx") && col("ay") === col("cy"))
    val agg = nb.agg(sum(col("da") * col("db")).as("num"),
      count(lit(1)).as("w2"))
    val den = dev.agg(sum(col("dv") * col("dv")).as("den"))
    agg.crossJoin(broadcast(den)).crossJoin(broadcast(tot))
      .select(col("n").as("n_cells"), (col("w2") * 2).as("w_pairs"),
        (floor(col("n").cast("double") * (col("num") * 2)
          / ((col("w2") * 2).cast("double") * col("den"))
          * 1000000 + lit(0.5)) / 1000000).as("morans_i"),
        (floor(lit(-1.0) / (col("n") - 1) * 1000000 + lit(0.5)) / 1000000)
          .as("expected_i"))
  }

  /** Getis–Ord Gi* hot-spot detection — the LOCAL companion to
    * morans_i's global autocorrelation: for every occupied grid cell,
    * z-score the 3×3-neighborhood point count against the global
    * surface, Gi* = (S_i − x̄·w_i) / (s·√((n·w_i − w_i²)/(n−1))).
    * Neighborhood sums S_i and occupied-neighbor counts w_i are EXACT
    * integers from a ×9 offset explode + equi-join onto occupied
    * cells; x̄ and s come from the 1-row exact-moment broadcast; each
    * Gi* is one fixed-form double expression over identical integers.
    * Top-10 hottest cells. */
  val getisOrd: Q = Q(
    "getis_ord",
    """WITH p AS (SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05)
      |      AS BIGINT) AS cx,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
      |  FROM embeddings),
      |cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS x FROM p
      |          GROUP BY cx, cy),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx,
      |        CAST(sum(x * x) AS BIGINT) AS sxx FROM cells),
      |contrib AS (SELECT cx + o.dx AS tx, cy + o.dy AS ty, x FROM cells
      |  CROSS JOIN (SELECT dx.d AS dx, dy.d AS dy
      |    FROM (SELECT unnest([-1, 0, 1]) AS d) dx,
      |         (SELECT unnest([-1, 0, 1]) AS d) dy) o),
      |nbh AS (SELECT c.cx, c.cy, CAST(sum(k.x) AS BIGINT) AS si,
      |    CAST(count(*) AS BIGINT) AS wi
      |  FROM cells c JOIN contrib k ON k.tx = c.cx AND k.ty = c.cy
      |  GROUP BY c.cx, c.cy),
      |gi AS (SELECT cx, cy, si, wi,
      |    (si - CAST(sx AS DOUBLE) / n * wi)
      |      / (sqrt(CAST(sxx AS DOUBLE) / n
      |          - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |        * sqrt((CAST(n AS DOUBLE) * wi - CAST(wi AS DOUBLE) * wi)
      |          / (n - 1))) AS g
      |  FROM nbh CROSS JOIN tot)
      |SELECT cx, cy, si AS nbh_points, wi AS nbh_cells,
      |  floor(g * 1000000 + 0.5) / 1000000 AS gi_star
      |FROM gi ORDER BY g DESC, cx, cy LIMIT 10""".stripMargin) { (s, d) =>
    val cells = emb(s, d)
      .select(
        floor(col("embedding").getItem(0).cast("double") / 0.05)
          .cast("long").as("cx"),
        floor(col("embedding").getItem(1).cast("double") / 0.05)
          .cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = cells.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val contrib = cells
      .select(explode(expr(
        "flatten(transform(sequence(-1, 1), dx -> " +
          "transform(sequence(-1, 1), dy -> " +
          "struct(cx + dx AS tx, cy + dy AS ty))))")).as("t"), col("x"))
      .select(col("t.tx").as("tx"), col("t.ty").as("ty"), col("x"))
    val nbh = cells.select(col("cx"), col("cy"))
      .join(contrib, col("tx") === col("cx") && col("ty") === col("cy"))
      .groupBy("cx", "cy")
      .agg(sum("x").as("si"), count(lit(1)).as("wi"))
    val xbar = col("sx").cast("double") / col("n")
    val sdev = sqrt(col("sxx").cast("double") / col("n") - xbar * xbar)
    nbh.crossJoin(broadcast(tot)) // 1-row exact moments
      .select(col("cx"), col("cy"), col("si"), col("wi"),
        ((col("si") - xbar * col("wi"))
          / (sdev * sqrt((col("n").cast("double") * col("wi")
            - col("wi").cast("double") * col("wi")) / (col("n") - 1))))
          .as("g"))
      .orderBy(col("g").desc, col("cx"), col("cy")).limit(10)
      .select(col("cx"), col("cy"), col("si").as("nbh_points"),
        col("wi").as("nbh_cells"),
        (floor(col("g") * 1000000 + lit(0.5)) / 1000000).as("gi_star"))
  }

  /** Embedding-space isotropy probe (Ethayarajh 2019's observation
    * that contextual embeddings collapse into a cone): the mean and
    * max |cosine| over all pairs of a capped 40-vector sample — near
    * 0 for an isotropic space, near 1 for a collapsed one; the check
    * run before trusting cosine retrieval at all. Pairs are bounded
    * by construction (cosine_pairs' device); the 780 |cos| terms fold
    * (id_a, id_b)-sorted through the established bit-identical
    * sequential dot. */
  val embedIsotropy: Q = Q(
    "embed_isotropy",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
      |           FROM embeddings WHERE vec_id < 40),
      |pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    abs(list_dot_product(a.ev, b.ev)
      |      / (sqrt(list_dot_product(a.ev, a.ev))
      |         * sqrt(list_dot_product(b.ev, b.ev)))) AS ac
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id),
      |one AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    list_aggregate(list(ac ORDER BY ia, ib), 'sum') AS s,
      |    max(ac) AS mx FROM pr)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_sample,
      |  n_pairs,
      |  floor(s / n_pairs * 1000000 + 0.5) / 1000000 AS mean_abs_cos,
      |  floor(mx * 1000000 + 0.5) / 1000000 AS max_abs_cos
      |FROM one""".stripMargin) { (s, d) =>
    val v = emb(s, d).filter(col("vec_id") < 40)
    val a = v.select(col("vec_id").as("ia"),
      col("embedding").cast("array<double>").as("ea"))
    val b = v.select(col("vec_id").as("ib"),
      col("embedding").cast("array<double>").as("eb"))
    val pr = a.join(b, col("ia") < col("ib")) // 40-vector capped sample
      .select(col("ia"), col("ib"),
        abs(cosine(col("ea"), col("eb"))).as("ac"))
    pr.agg(count(lit(1)).as("n_pairs"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "struct(ia, ib, ac))), t -> t.ac), 0D, (a, x) -> a + x)").as("s"),
        max("ac").as("mx"))
      .crossJoin(broadcast(v.agg(count(lit(1)).as("n_sample"))))
      .select(col("n_sample"), col("n_pairs"),
        (floor(col("s") / col("n_pairs") * 1000000 + lit(0.5)) / 1000000)
          .as("mean_abs_cos"),
        (floor(col("mx") * 1000000 + lit(0.5)) / 1000000)
          .as("max_abs_cos"))
  }

  /** Matryoshka-truncation retrieval audit (Kusupati 2022 MRL): does
    * half-dimension cosine retrieval agree with full-dimension? Top-3
    * is computed twice — full 64-d and the 32-d prefix — and the
    * per-query overlap is the quality signal a dimension-truncation
    * rollout decision reads. Same brute-force plan as cosine_topk
    * (broadcast 5-row query side, ONE corpus scan each, window top-k);
    * the truncated pass is the cheap half. */
  val mrlTruncation: Q = Q(
    "mrl_truncation",
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |fullk AS (SELECT qid, vec_id FROM (
      |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv))
      |         * sqrt(list_dot_product(cv, cv))), 6) DESC, vec_id) AS rn
      |  FROM q JOIN c ON qid <> vec_id) t WHERE rn <= 3),
      |halfk AS (SELECT qid, vec_id FROM (
      |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_dot_product(qv[1:32], cv[1:32])
      |      / (sqrt(list_dot_product(qv[1:32], qv[1:32]))
      |         * sqrt(list_dot_product(cv[1:32], cv[1:32]))), 6) DESC,
      |      vec_id) AS rn
      |  FROM q JOIN c ON qid <> vec_id) t WHERE rn <= 3)
      |SELECT f.qid, CAST(count(h.vec_id) AS BIGINT) AS overlap3
      |FROM fullk f LEFT JOIN halfk h
      |  ON h.qid = f.qid AND h.vec_id = f.vec_id
      |GROUP BY f.qid ORDER BY f.qid""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val q = emb(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val c = emb(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    def topk(qc: Column, cc: Column): DataFrame = {
      val scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          round(graft.functions.GraftFunctions.cosineNative(qc, cc), 6)
            .as("cos"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("qid", "vec_id")
    }
    val fullk = topk(col("qv"), col("cv"))
    val halfk = topk(slice(col("qv"), 1, 32), slice(col("cv"), 1, 32))
    fullk.as("f").join(halfk.as("h"),
        col("h.qid") === col("f.qid") && col("h.vec_id") === col("f.vec_id"),
        "left_outer")
      .groupBy(col("f.qid").as("qid"))
      .agg(count(col("h.vec_id")).as("overlap3"))
      .orderBy("qid")
  }

  /** Per-dimension whitening statistics (mean + variance), the
    * preprocessing pass before PCA/whitening or isotropy fixes.
    * Components quantize to an exact 1e-6 LONG grid BEFORE the sums, so
    * both moments are order-independent BIGINT aggregates (the same
    * drift discipline as huber_irls) and the only doubles are two final
    * divisions. Plan: posexplode → (dim)-keyed partial agg — one
    * shuffle of 64 keyed rows per partition regardless of corpus
    * size. */
  val embeddingWhiten: Q = Q(
    "embedding_whiten",
    """WITH x AS (SELECT u.i AS dim,
      |    CAST(floor(u.v * 1000000 + 0.5) AS BIGINT) AS xq
      |  FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
      |               generate_subscripts(embedding, 1) - 1 AS i
      |        FROM embeddings) u),
      |m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(xq) AS BIGINT) AS s1, CAST(sum(xq * xq) AS BIGINT) AS s2
      |  FROM x GROUP BY dim)
      |SELECT CAST(dim AS INTEGER) AS dim,
      |  floor(CAST(s1 AS DOUBLE) / n + 0.5) / 1000000 AS mean,
      |  floor((CAST(s2 AS DOUBLE) / n
      |    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |    / 1000000 + 0.5) / 1000000 AS variance
      |FROM m ORDER BY dim""".stripMargin) { (s, d) =>
    emb(s, d)
      .select(posexplode(asDouble(col("embedding"))).as(Seq("dim", "v")))
      .select(col("dim"),
        floor(col("v") * 1000000 + lit(0.5)).cast("long").as("xq"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("xq").as("s1"),
        sum(col("xq") * col("xq")).as("s2"))
      .select(col("dim").cast("int").as("dim"),
        (floor(col("s1").cast("double") / col("n") + lit(0.5)) / 1000000)
          .as("mean"),
        (floor((col("s2").cast("double") / col("n")
          - (col("s1").cast("double") / col("n"))
            * (col("s1").cast("double") / col("n"))) / 1000000 + lit(0.5))
          / 1000000).as("variance"))
      .orderBy("dim")
  }

  /** FILTERED vector search (pre-filter ANN) — the production retrieval
    * pattern every vector store ships: a metadata predicate restricts
    * the candidate set BEFORE ranking, here "same label as the query,
    * excluding self" (the tenant/namespace filter). Pre-filtering is
    * exact at any k — post-filtering (rank first, filter the top-k
    * after) silently returns < k or lower-recall results whenever the
    * predicate is selective, which is why this op ranks only inside
    * the filtered set. The plan is the scalable one: the query panel
    * is CAPPED at 50 vectors (vec_id % 100 = 0 AND vec_id < 5000 — a
    * fixed request batch, not a corpus-proportional sample, so the
    * broadcast and the total distance work stay O(corpus) at ANY
    * size), the corpus streams once, and the label equi-condition
    * prunes candidates AT THE JOIN (at 100 TB the same predicate
    * prunes IVF/LSH buckets before distance evaluation — label is
    * part of the bucket key). Ranking uses the 6-dp-rounded cosine
    * with vec_id tie-break so both engines agree bit-for-bit. */
  val annPrefilter: Q = Q(
    "ann_prefilter",
    """WITH q AS (SELECT vec_id AS qid, label AS qlabel,
      |    CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 5000),
      |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings),
      |scored AS (
      |  SELECT qid, vec_id,
      |    round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos
      |  FROM q JOIN c ON qlabel = label AND qid <> vec_id)
      |SELECT qid, vec_id, cos FROM (
      |  SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM scored) t
      |WHERE rn <= 3 ORDER BY qid, cos DESC, vec_id""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val q = emb(s, d).filter(col("vec_id") % 100 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        asDouble(col("embedding")).as("qv"))
    val c = emb(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q),
        col("qlabel") === col("label") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.GraftFunctions.cosineNative(col("qv"), col("cv")), 6)
          .as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "vec_id", "cos")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }

  /** HARD-NEGATIVE MINING — the contrastive-training data op behind
    * every retrieval/embedding model (DPR, SimCLR-style): for each
    * anchor in the capped query panel, find the top-3 nearest vectors
    * with a DIFFERENT label (near misses — the negatives that actually
    * move the loss) and score each with its TRIPLET MARGIN pos_cos −
    * neg_cos, where pos_cos is the anchor's nearest same-label cosine.
    * A small (or negative) margin marks the hardest negatives. One
    * corpus stream against the broadcast 50-anchor panel feeds both
    * sides (the same-label positive argmax and the cross-label
    * negative ranking); the positive scalars re-broadcast (≤ panel
    * size). All cosines 6-dp-rounded with vec_id tie-break, margins
    * rounded from the rounded inputs, so both engines agree
    * bit-for-bit. At 100 TB the anchor panel stays a fixed request
    * batch and the cross-label restriction prunes IVF/LSH buckets the
    * same way [[annPrefilter]]'s predicate does. */
  val hardNegatives: Q = Q(
    "hard_negatives",
    """WITH q AS (SELECT vec_id AS qid, label AS qlabel,
      |    CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 5000),
      |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings),
      |scored AS (
      |  SELECT qid, qlabel, vec_id, label,
      |    round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos
      |  FROM q JOIN c ON qid <> vec_id),
      |pos AS (SELECT qid, max(cos) AS pos_cos FROM scored
      |  WHERE label = qlabel GROUP BY qid),
      |neg AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM scored WHERE label <> qlabel)
      |SELECT neg.qid AS qid, neg.vec_id AS neg_id, neg.cos AS neg_cos,
      |  round(pos.pos_cos - neg.cos, 6) AS margin
      |FROM neg JOIN pos ON neg.qid = pos.qid
      |WHERE rn <= 3 ORDER BY qid, neg_cos DESC, neg_id""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val q = emb(s, d).filter(col("vec_id") % 100 === 0 && col("vec_id") < 5000)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        asDouble(col("embedding")).as("qv"))
    val c = emb(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("cv"))
    def scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        round(graft.functions.GraftFunctions.cosineNative(col("qv"), col("cv")), 6)
          .as("cos"))
    val pos = scored.filter(col("label") === col("qlabel"))
      .groupBy("qid").agg(max("cos").as("pos_cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val neg = scored.filter(col("label") =!= col("qlabel"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    neg.join(broadcast(pos), "qid")
      .select(col("qid"), col("vec_id").as("neg_id"), col("cos").as("neg_cos"),
        round(col("pos_cos") - col("cos"), 6).as("margin"))
      .orderBy(col("qid"), col("neg_cos").desc, col("neg_id"))
  }

  val all: Seq[Q] =
    Seq(embedStats, cosineTopK, cosinePairs, gridSpatialJoin, dbscanGrid,
      moransI, getisOrd, embedIsotropy, mrlTruncation, embeddingWhiten,
      quantizeRecall, mmdEmbeddings, annPrefilter, hardNegatives)

  /** Kernel two-sample test: unbiased MMD² between label-0 and
    * label-1 embeddings under an RBF kernel (bandwidth 2σ² = 2·dim —
    * the fixed-bandwidth convention; the median heuristic would add a
    * quantile pass without changing the contract). The modern
    * distribution-shift test for embedding spaces, next to ks_test's
    * scalar ECDF gap. Squared distances come from three dot products
    * (the established list_dot_product ≡ dotNative parity), kernel
    * sums fold in (id_a, id_b) order, exp parity is corpus-wide.
    * Pairs are STRATUM-BOUNDED: two label groups capped by the
    * vec_id < 4096 panel — at 100 TB a two-sample eval runs on
    * bounded strata samples by design, never the full corpus cross. */
  lazy val mmdEmbeddings: Q = Q(
    "mmd_embeddings",
    """WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 4096 AND label IN (0, 1)),
      |px AS (SELECT a.vec_id AS ia, b2.vec_id AS ib, a.label AS la,
      |    b2.label AS lb,
      |    exp(-(list_dot_product(a.v, a.v)
      |        - 2 * list_dot_product(a.v, b2.v)
      |        + list_dot_product(b2.v, b2.v)) / 128.0) AS kk
      |  FROM b a JOIN b b2
      |    ON a.label < b2.label
      |      OR (a.label = b2.label AND a.vec_id < b2.vec_id)),
      |m AS (SELECT CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS m,
      |    CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n FROM b),
      |f AS (SELECT
      |    list_aggregate(list(CASE WHEN la = 0 AND lb = 0 THEN kk END
      |      ORDER BY ia, ib), 'sum') AS sxx,
      |    list_aggregate(list(CASE WHEN la = 1 AND lb = 1 THEN kk END
      |      ORDER BY ia, ib), 'sum') AS syy,
      |    list_aggregate(list(CASE WHEN la = 0 AND lb = 1 THEN kk END
      |      ORDER BY ia, ib), 'sum') AS sxy
      |  FROM px)
      |SELECT m.m, m.n,
      |  floor(2.0 * f.sxx / (m.m * (m.m - 1)) * 10000000 + 0.5)
      |    / 10000000 AS kxx_mean,
      |  floor(2.0 * f.syy / (m.n * (m.n - 1)) * 10000000 + 0.5)
      |    / 10000000 AS kyy_mean,
      |  floor(f.sxy / (CAST(m.m AS DOUBLE) * m.n) * 10000000 + 0.5)
      |    / 10000000 AS kxy_mean,
      |  floor((2.0 * f.sxx / (m.m * (m.m - 1))
      |    + 2.0 * f.syy / (m.n * (m.n - 1))
      |    - 2.0 * f.sxy / (CAST(m.m AS DOUBLE) * m.n)) * 10000000 + 0.5)
      |    / 10000000 AS mmd2
      |FROM f CROSS JOIN m""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    import graft.functions.GraftFunctions.dotNative
    val b = emb(s, d)
      .filter(col("vec_id") < 4096 && col("label").isin(0, 1))
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val px = b.as("a")
      .join(b.select(col("vec_id").as("ib"), col("label").as("lb"),
        col("v").as("vb")),
        col("label") < col("lb")
          || (col("label") === col("lb") && col("vec_id") < col("ib")))
      .select(col("vec_id").as("ia"), col("ib"),
        col("label").as("la"), col("lb"),
        exp(-(dotNative(col("v"), col("v"))
          - lit(2) * dotNative(col("v"), col("vb"))
          + dotNative(col("vb"), col("vb"))) / 128.0).as("kk"))
    val m = b.agg(
      sum(when(col("label") === 0, 1L).otherwise(0L)).as("m"),
      sum(when(col("label") === 1, 1L).otherwise(0L)).as("n"))
    def ordSum(cond: String): org.apache.spark.sql.Column =
      expr("aggregate(transform(array_sort(collect_list(struct(ia, ib, " +
        s"CASE WHEN $cond THEN kk END AS v))), x -> x.v), 0D, " +
        "(acc, x) -> acc + coalesce(x, 0D))")
    val f = px.agg(ordSum("la = 0 AND lb = 0").as("sxx"),
      ordSum("la = 1 AND lb = 1").as("syy"),
      ordSum("la = 0 AND lb = 1").as("sxy"))
    val kxx = lit(2.0) * col("sxx") / (col("m") * (col("m") - 1))
    val kyy = lit(2.0) * col("syy") / (col("n") * (col("n") - 1))
    val kxy = col("sxy") / (col("m").cast("double") * col("n"))
    f.crossJoin(broadcast(m))
      .select(col("m"), col("n"),
        (floor(kxx * 10000000 + lit(0.5)) / 10000000).as("kxx_mean"),
        (floor(kyy * 10000000 + lit(0.5)) / 10000000).as("kyy_mean"),
        (floor(kxy * 10000000 + lit(0.5)) / 10000000).as("kxy_mean"),
        (floor((kxx + kyy - lit(2.0) * kxy) * 10000000 + lit(0.5))
          / 10000000).as("mmd2"))
  }

  /** Retrieval impact of int8 quantization: recall@10 of the
    * asymmetric path (fp32 probe × dequantized int8 corpus) against
    * the fp32 brute-force ground truth, per probe — the measurement
    * that decides whether embed_quantize's 4× compression is free.
    * Quantization replays embed_quantize's exact grid (scale =
    * 127/max|x|, floor(x·s + 0.5)); both rankings use the 1e-6-rounded
    * cosine with vec_id tie-break (the cosine_topk discipline), so
    * the overlap count is engine-exact. Plan: 5-row probe side
    * broadcast twice, corpus streamed twice, two per-probe top-k
    * windows, one 50-row join — the scale shape of the fp baseline
    * itself. */
  lazy val quantizeRecall: Q = Q(
    "quantize_recall",
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |m AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
      |    CAST(list_max(list_transform(embedding, x -> abs(x)))
      |      AS DOUBLE) AS mx
      |  FROM embeddings),
      |dq AS (SELECT vec_id, cv,
      |    list_transform(cv, x -> CAST(floor(x * (127.0 / mx) + 0.5)
      |      AS INTEGER) * (mx / 127.0)) AS dv
      |  FROM m WHERE mx > 0),
      |fp AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv))
      |        * sqrt(list_dot_product(cv, cv))), 6) DESC, vec_id) AS rn
      |  FROM q JOIN dq ON qid <> vec_id),
      |qt AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |    ORDER BY round(list_dot_product(qv, dv)
      |      / (sqrt(list_dot_product(qv, qv))
      |        * sqrt(list_dot_product(dv, dv))), 6) DESC, vec_id) AS rn
      |  FROM q JOIN dq ON qid <> vec_id)
      |SELECT fp.qid, CAST(count(qt.vec_id) AS BIGINT) AS n_match,
      |  floor(count(qt.vec_id) / 10.0 * 1000000 + 0.5) / 1000000
      |    AS recall_at_10
      |FROM fp LEFT JOIN qt ON qt.qid = fp.qid AND qt.vec_id = fp.vec_id
      |  AND qt.rn <= 10
      |WHERE fp.rn <= 10
      |GROUP BY fp.qid ORDER BY fp.qid""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    import graft.functions.GraftFunctions.cosineNative
    val q = emb(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val dq = emb(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("cv"),
        expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)")
          .as("mx"))
      .filter(col("mx") > 0)
      .withColumn("dv", expr("transform(cv, x -> " +
        "CAST(floor(x * (127.0d / mx) + 0.5d) AS INT) * (mx / 127.0d))"))
      .select("vec_id", "cv", "dv")
    def top10(scoreCol: Column, side: DataFrame): DataFrame = {
      val w = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("vec_id"))
      side.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          round(scoreCol, 6).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("qid", "vec_id")
    }
    val fp = top10(cosineNative(col("qv"), col("cv")), dq)
    val qt = top10(cosineNative(col("qv"), col("dv")), dq)
      .withColumn("hit", lit(1))
    fp.join(qt, Seq("qid", "vec_id"), "left_outer")
      .groupBy("qid")
      .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_match"))
      .select(col("qid"), col("n_match"),
        (floor(col("n_match") / 10.0 * 1000000 + lit(0.5)) / 1000000)
          .as("recall_at_10"))
      .orderBy("qid")
  }
}
