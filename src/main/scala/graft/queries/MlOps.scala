package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Distributed ML primitives for corpus curation: k-means clustering
  * (the semantic-dedup / data-mixing building block), count-min-sketch
  * frequency estimation (Cormode & Muthukrishnan 2005), and
  * Johnson-Lindenstrauss random projection — each under the exact
  * DuckDB oracle gate.
  *
  * Cross-engine determinism strategy (shared by all three): float
  * inputs are either scaled to exact BIGINTs up front (k-means:
  * floor(x·2^20), so every sum is integer-exact and order-independent)
  * or kept in doubles that BOTH engines fold in identical index order
  * (JL / distances: Spark `aggregate` and DuckDB `list_sum ∘
  * list_transform` are both sequential left folds), with any final
  * rounding done half-up-safe as floor(x·10^k + 0.5)/10^k.
  */
object MlOps {

  // ------------------------------------------------------------ k-means ---

  // Shared Lloyd machinery — the oracle CTE chain and the Spark-side
  // iteration are consumed by both kmeans_embed and cluster_topics
  // (c-TF-IDF topic labeling over the same clusters), so the two
  // queries provably cluster identically.

  private def kmAssignCte(a: String, from: String): String =
    s"""cd$a AS (SELECT cid, cn,
       |    list_transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) / 1048576.0) AS md
       |  FROM $from),
       |ce$a AS (SELECT cid, cn, md, list_dot_product(md, md) AS dmm FROM cd$a),
       |$a AS (SELECT id, cid, xi FROM (
       |  SELECT p.id, c.cid, p.xi,
       |    row_number() OVER (PARTITION BY p.id ORDER BY
       |      p.dxx - 2 * list_dot_product(p.xd, c.md) + c.dmm, c.cid) AS rn
       |  FROM ptx p CROSS JOIN ce$a c) WHERE rn = 1)""".stripMargin

  private def kmRecomputeCte(c: String, from: String): String =
    s"""$c AS (
       |  SELECT s.cid, s.cs, z.cn FROM
       |   (SELECT cid, list(sx ORDER BY pos) AS cs FROM
       |     (SELECT cid, i AS pos, CAST(sum(xi[i]) AS BIGINT) AS sx
       |      FROM $from, range(1, 65) t(i) GROUP BY cid, i)
       |    GROUP BY cid) s
       |   JOIN (SELECT cid, count(*) AS cn FROM $from GROUP BY cid) z
       |     USING (cid))""".stripMargin

  /** DuckDB CTE chain ending in `a3` = the 3rd-round assignments
    * (id, cid, xi); shared verbatim by both consuming oracles. */
  private[queries] val kmA3Ctes: String =
    s"""pts AS (SELECT vec_id AS id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS xi
       |  FROM embeddings),
       |ptd AS (SELECT id, xi,
       |    list_transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0) AS xd FROM pts),
       |ptx AS (SELECT id, xi, xd, list_dot_product(xd, xd) AS dxx FROM ptd),
       |c0 AS (SELECT CAST(id AS INT) AS cid, xi AS cs, CAST(1 AS BIGINT) AS cn
       |       FROM pts WHERE id < 8),
       |${kmAssignCte("a1", "c0")},
       |${kmRecomputeCte("c1", "a1")},
       |${kmAssignCte("a2", "c1")},
       |${kmRecomputeCte("c2", "a2")},
       |${kmAssignCte("a3", "c2")}""".stripMargin

  /** Spark-side Lloyd rounds. Returns the lazy 3rd-round assignment
    * (id, cid, xi) — one pts scan against the materialized round-2
    * centroids — plus a thunk producing the materialized round-3
    * centroid relation (cid, cs, cn) and a cache-release cleanup
    * (safe to call before consuming: lineage recomputes uncached). */
  private[queries] def lloyd(s: SparkSession, d: String)
      : (DataFrame, () => DataFrame, () => Unit) = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val dot = graft.functions.GraftFunctions.dotNative _
    val pts = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT))").as("xi"))
      .withColumn("xd", expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)"))
      .withColumn("dxx", dot(col("xd"), col("xd")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c0 = pts.filter(col("id") < 8)
      .select(col("id").cast("int").as("cid"), col("xi").as("cs"),
        lit(1L).as("cn"))
    def assign(cents: DataFrame): DataFrame = {
      val enriched = cents
        .withColumn("md", expr(
          "transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) / 1048576.0D)"))
        .withColumn("dmm", dot(col("md"), col("md")))
        .select("cid", "md", "dmm")
      // argmin as min(struct(dist, cid, xi)): unlike a row_number
      // window (which would shuffle all k candidate rows per point),
      // the struct-min partial-aggregates map-side, so only ONE row
      // per point crosses the exchange — at 100 TB the shuffle is 1×
      // the corpus, not k×. Lexicographic struct order ties by cid.
      pts.crossJoin(broadcast(enriched)) // k = 8 centroid rows, bounded
        .withColumn("dist",
          col("dxx") - lit(2) * dot(col("xd"), col("md")) + col("dmm"))
        .select(col("id"), struct(col("dist"), col("cid"), col("xi")).as("sc"))
        .groupBy("id").agg(min("sc").as("m"))
        .select(col("id"), col("m.cid").as("cid"), col("m.xi").as("xi"))
    }
    def recompute(a: DataFrame): DataFrame = {
      val sums = a.select(col("cid"), posexplode(col("xi")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(sum("x").as("sx"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), t -> t.sx)")
          .as("cs"))
      val sizes = a.groupBy("cid").agg(count(lit(1)).as("cn"))
      sums.join(sizes, "cid")
    }
    // Centroids live on the driver between iterations (k×64 longs — the
    // classic distributed-k-means state shape; same bounded-driver-
    // traffic discipline as bpe_train_rounds). Collecting them cuts the
    // lazy lineage that would otherwise re-execute every earlier
    // iteration ~2× per round (measured 3.37s lazy vs ~1s flat at
    // sf0.1): each Lloyd round is then exactly one pts scan.
    import scala.jdk.CollectionConverters._
    def materialize(c: DataFrame): DataFrame = {
      val rows = c.select("cid", "cs", "cn").collect().toSeq
      s.createDataFrame(rows.asJava, c.select("cid", "cs", "cn").schema)
    }
    var c = c0
    for (_ <- 1 to 2) c = materialize(recompute(assign(c)))
    val a3 = assign(c)
    (a3, () => materialize(recompute(a3)), () => { pts.unpersist(); () })
  }

  /** Distributed k-means over the embedding table (k = 8, 3 Lloyd
    * iterations, seeds = vec_id 0..7). This is THE scalable clustering
    * shape: each iteration broadcasts the k-row centroid relation, runs
    * a map-side assignment (argmin of 8 distances per point — no
    * shuffle), and recomputes centroids with one two-phase aggregate
    * whose exchange carries k×64 partial sums per partition, never a
    * point. At 100 TB: points stream from parquet 3×, state is k rows.
    *
    * Exactness: coordinates become floor(x·2^20) BIGINTs; a centroid is
    * the pair (S = Σx_int per dim, n), so every SUM is integer-exact
    * and order-independent. Distances run on the de-scaled doubles as
    * dxx − 2·(x·m) + m·m where every dot product is a sequential
    * left fold — Spark's native codegen'd `graft_dot` loop and
    * DuckDB's `list_dot_product` are bit-identical (verified against a
    * scalar reference fold on the fixture vectors), so the argmin
    * compares EQUAL doubles with no rounding; ties break by cid. The
    * only rounding anywhere is the final centroid-norm display. */
  val kmeansEmbed: Q = Q(
    "kmeans_embed",
    s"""WITH $kmA3Ctes,
       |${kmRecomputeCte("c3", "a3")},
       |cdf AS (SELECT cid, cn,
       |    list_transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) / 1048576.0) AS md
       |  FROM c3)
       |SELECT cid, cn AS size,
       |  CAST(floor(sqrt(list_dot_product(md, md)) * 1000000 + 0.5) / 1000000
       |    AS DOUBLE) AS cent_norm
       |FROM cdf ORDER BY cid""".stripMargin) { (s, d) =>
    val dot = graft.functions.GraftFunctions.dotNative _
    val (_, c3f, cleanup) = lloyd(s, d)
    val out = c3f().withColumn("md", expr(
        "transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) / 1048576.0D)"))
      .select(col("cid"), col("cn").as("size"),
        (floor(sqrt(dot(col("md"), col("md"))) * 1000000 + lit(0.5)) / 1000000)
          .cast("double").as("cent_norm"))
      .orderBy("cid")
    cleanup()
    out
  }

  /** c-TF-IDF topic labeling per embedding cluster (BERTopic's scoring
    * over k-means clusters): documents join their Lloyd cluster, a
    * (cluster, word) count collapse gives class term frequencies, and
    * each word's score is c·ln(1 + k/df_clusters) — top-5 terms label
    * each cluster. The clustering is the SAME shared Lloyd machinery
    * (CTE chain / Spark loop) as kmeans_embed, so the oracle also
    * re-proves the composition end-to-end. Scores floor-round at 1e-6
    * BEFORE ranking (q95 discipline); ties break by word. */
  val clusterTopics: Q = Q(
    "cluster_topics",
    s"""WITH $kmA3Ctes,
       |mem AS (SELECT id, cid FROM a3),
       |cw AS (SELECT cid, w, count(*) AS c FROM (
       |    SELECT m.cid, unnest(string_split(d.text, ' ')) AS w
       |    FROM documents d JOIN mem m ON d.doc_id = m.id)
       |  WHERE w <> '' GROUP BY cid, w),
       |dfc AS (SELECT w, count(DISTINCT cid) AS dfc FROM cw GROUP BY w),
       |sc AS (SELECT cid, cw.w AS w,
       |    CAST(floor(c * ln(1 + 8.0 / dfc) * 1000000 + 0.5) / 1000000
       |      AS DOUBLE) AS score
       |  FROM cw JOIN dfc ON cw.w = dfc.w),
       |r AS (SELECT cid, w, score,
       |    CAST(row_number() OVER (PARTITION BY cid
       |      ORDER BY score DESC, w) AS INT) AS rn FROM sc)
       |SELECT cid, rn, w, score FROM r WHERE rn <= 5
       |ORDER BY cid, rn""".stripMargin) { (s, d) =>
    val (a3, _, cleanup) = lloyd(s, d)
    val member = a3.select(col("id"), col("cid"))
    val cw = Tables.documents(s, d)
      .join(member, col("doc_id") === col("id"))
      .select(col("cid"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("cid", "w").agg(count(lit(1)).as("c"))
    val dfc = cw.groupBy("w").agg(countDistinct("cid").as("dfc"))
    val out = cw.join(dfc, "w")
      .select(col("cid"), col("w"),
        (floor(col("c") * log(lit(1) + lit(8.0) / col("dfc")) * 1000000
          + lit(0.5)) / 1000000).cast("double").as("score"))
      .withColumn("rn", row_number().over(Window.partitionBy("cid")
        .orderBy(col("score").desc, col("w"))).cast("int"))
      .filter(col("rn") <= 5)
      .select("cid", "rn", "w", "score")
      .orderBy("cid", "rn")
    cleanup()
    out
  }

  /** Tokenizer-coverage audit: out-of-vocabulary rate per language on
    * the held-out split, against the top-20 training vocabulary (the
    * fixture corpus has 31 distinct words, so a top-20 vocab leaves a
    * real OOV tail). The vocabulary broadcast-anti-joins the test
    * token stream — at 100 TB the token stream never shuffles; counts
    * and the final rate are exact. */
  val oovRate: Q = Q(
    "oov_rate",
    """WITH s AS (SELECT lang, text,
      |    ((doc_id & 2147483647) * 1442695041) % 100 < 80 AS is_train
      |  FROM documents),
      |tr AS (SELECT w, count(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM s WHERE is_train)
      |  WHERE w <> '' GROUP BY w),
      |vocab AS (SELECT w FROM tr ORDER BY c DESC, w LIMIT 20),
      |te AS (SELECT lang, w FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w
      |    FROM s WHERE NOT is_train) WHERE w <> ''),
      |agg AS (SELECT lang, count(*) AS n_tokens,
      |    CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_oov
      |  FROM te LEFT JOIN vocab ON te.w = vocab.w GROUP BY lang)
      |SELECT lang, n_tokens, n_oov,
      |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
      |FROM agg ORDER BY lang""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d).withColumn("is_train",
      (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(1442695041L)) % 100 < 80)
    val vocab = base.filter(col("is_train"))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(20)
      .select(col("w").as("vw"))
    base.filter(!col("is_train"))
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("vw").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy("lang")
  }

  // -------------------------------------------------- count-min sketch ---

  /** Count-min-sketch frequency estimation (d = 4 rows × w = 1024
    * buckets) probed with the exact top-20 tokens, so the oracle checks
    * the sketch's actual cell arithmetic, not just a property. Both
    * engines build the identical sketch: the base hash is the corpus'
    * established 31-polynomial over the first 8 chars (winnow/markov
    * precedent), row hashes are overflow-safe multiplicative remixes
    * (hb ≤ 2^20, multiplier < 2^32 ⇒ product < 2^52). Shuffle cost:
    * after the vocabulary collapse everything is vocab-sized; the cells
    * relation is ≤ 4096 rows and broadcast into the probe join. CMS
    * guarantees est ≥ true; the gate pins the estimates exactly. */
  val cmsFreq: Q = Q(
    "cms_freq",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
      |h AS (SELECT w, cnt,
      |   list_aggregate(list_transform(range(0, least(length(w), 8)),
      |     j -> ascii(substring(w, CAST(j + 1 AS INTEGER), 1))
      |          * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003 AS hb
      | FROM wc),
      |b AS (SELECT w, cnt, t.j,
      |   (hb * (CASE t.j WHEN 0 THEN 2654435761 WHEN 1 THEN 2246822519
      |          WHEN 2 THEN 3266489917 ELSE 668265263 END)) % 1048573 % 1024 AS b
      | FROM h, range(0, 4) t(j)),
      |cells AS (SELECT j, b, CAST(sum(cnt) AS BIGINT) AS c FROM b GROUP BY j, b),
      |top AS (SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 20)
      |SELECT b.w AS w, CAST(any_value(b.cnt) AS BIGINT) AS true_cnt, min(c) AS cms_est
      |FROM b JOIN top ON b.w = top.w
      |JOIN cells ON cells.j = b.j AND cells.b = b.b
      |GROUP BY b.w ORDER BY true_cnt DESC, b.w""".stripMargin) { (s, d) =>
    val mults = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val h = wc.withColumn("hb", expr(
      "aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, CAST(j + 1 AS INT), 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003"))
    val b = h.select(col("w"), col("cnt"),
      posexplode(array(mults.map(m => (col("hb") * m) % 1048573 % 1024): _*))
        .as(Seq("j", "b")))
    val cells = b.groupBy("j", "b").agg(sum("cnt").as("c"))
    val top = wc.orderBy(col("cnt").desc, col("w")).limit(20)
      .select(col("w").as("tw"))
    b.join(broadcast(top), col("w") === col("tw"))
      .join(broadcast(cells), Seq("j", "b"))
      .groupBy("w")
      .agg(first("cnt").as("true_cnt"), min("c").as("cms_est"))
      .orderBy(col("true_cnt").desc, col("w"))
  }

  // -------------------------------------------- JL random projection ---

  /** Johnson-Lindenstrauss random projection 64 → 16 dims with a
    * deterministic ±1 matrix (Achlioptas 2003 sign variant; the sign of
    * entry (i, j) comes from a tiny integer hash, so the "random"
    * matrix needs no stored state and any executor — or engine —
    * regenerates it identically). Pure map over the vectors: the
    * output is each vector's norm-preservation ratio ‖y‖²/(16·‖x‖²),
    * which JL concentrates around 1. Both engines fold projections and
    * norms in identical index order; final rounding half-up-safe. */
  val rpReduce: Q = Q(
    "rp_reduce",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
      |y AS (SELECT vec_id, x,
      |   list_transform(range(0, 16), j ->
      |     list_sum(list_transform(range(1, 65), i ->
      |       x[i] * (CASE WHEN ((i * 31 + j * 17) % 97) % 2 = 0
      |               THEN 1.0 ELSE -1.0 END)))) AS y
      | FROM v)
      |SELECT vec_id,
      |  CAST(floor(list_sum(list_transform(y, t -> t * t))
      |    / (16.0 * list_sum(list_transform(x, t -> t * t)))
      |    * 1000000 + 0.5) / 1000000 AS DOUBLE) AS jl_ratio
      |FROM y ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)").as("x"))
      .withColumn("y", expr(
        "transform(sequence(0, 15), j -> " +
          "aggregate(sequence(1, 64), 0D, (a, i) -> a + element_at(x, i) * " +
          "(CASE WHEN ((i * 31 + j * 17) % 97) % 2 = 0 THEN 1.0D ELSE -1.0D END)))"))
      .select(col("vec_id"),
        (floor(expr("aggregate(y, 0D, (a, t) -> a + t * t)")
          / (lit(16.0) * expr("aggregate(x, 0D, (a, t) -> a + t * t)"))
          * 1000000 + lit(0.5)) / 1000000).cast("double").as("jl_ratio"))
      .orderBy("vec_id")
  }

  /** Per-dimension variance screening of the embedding space — the
    * feature-selection profile run before PCA/quantization decides
    * which dimensions carry signal. One posexplode pass (64 rows per
    * vector), coordinates scaled to floor(x·2^20) BIGINTs (the
    * k-means discipline) so every (n, Σx, Σx²) moment is
    * order-independent and integer-exact; variance is a single
    * fixed-form double expression per dimension, reported for the
    * top-10 dimensions by variance (tie-broken by dim). 64-group
    * aggregate, map-side combined — a full scan plus a 192-long
    * shuffle at any scale. */
  val embedDimProfile: Q = Q(
    "embed_dim_profile",
    """WITH x AS (SELECT
      |    generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS dim,
      |    CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1048576.0)
      |      AS BIGINT) AS xi
      |  FROM embeddings),
      |m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(xi * xi) AS BIGINT) AS sxx
      |  FROM x GROUP BY dim),
      |v AS (SELECT dim, n,
      |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |      / (n - 1) / 1048576.0 / 1048576.0 AS va
      |  FROM m)
      |SELECT dim, n, floor(va * 100000000 + 0.5) / 100000000 AS variance
      |FROM v ORDER BY va DESC, dim LIMIT 10""".stripMargin) { (s, d) =>
    val x = Tables.embeddings(s, d)
      .select(posexplode(expr("transform(embedding, v -> " +
        "CAST(floor(CAST(v AS DOUBLE) * 1048576.0D) AS BIGINT))")))
      .select(col("pos").cast("long").as("dim"), col("col").as("xi"))
    val m = x.groupBy("dim").agg(count(lit(1)).as("n"),
      sum("xi").as("sx"), sum(col("xi") * col("xi")).as("sxx"))
    val v = m.select(col("dim"), col("n"),
      ((col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double") / col("n"))
        / (col("n") - 1) / 1048576.0 / 1048576.0).as("va"))
    v.orderBy(col("va").desc, col("dim"))
      .limit(10)
      .select(col("dim"), col("n"),
        (floor(col("va") * 100000000 + lit(0.5)) / 100000000).as("variance"))
  }

  /** Decision-stump threshold search — the best single split of the
    * purchase-vs-click event stream by value, scored by weighted Gini
    * impurity: the CART inner loop, run distributed. Candidate
    * thresholds are the distinct values; left/right class counts at
    * every threshold come from ONE distributed PrefixScan over the
    * value-grouped counts (6th consumer — never a partition-less
    * window). The impurity score ((nl²−a²−b²)·nr + (nr²−c²−d²)·nl)
    * / (nl·nr) is algebraically exact: numerator and denominator stay
    * ≤ N³ — exactly representable in doubles up to N ≈ 2·10⁵ per
    * slice, with one deterministic division — so the argmin is
    * bit-stable cross-engine (beyond that, switch the comparison to
    * the integer cross-multiplication form). */
  val bestSplit: Q = Q(
    "best_split",
    """WITH e AS (SELECT value AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
      |      FROM e GROUP BY v),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2
      |      FROM c),
      |sc AS (SELECT v,
      |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS al,
      |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS bl FROM c),
      |sp AS (SELECT v, al, bl, n1 - al AS ar, n2 - bl AS br,
      |    al + bl AS nl, (n1 - al) + (n2 - bl) AS nr FROM sc, n),
      |sg AS (SELECT v, nl, nr,
      |    (CAST(nl * nl - al * al - bl * bl AS DOUBLE) * nr
      |     + CAST(nr * nr - ar * ar - br * br AS DOUBLE) * nl)
      |      / (CAST(nl AS DOUBLE) * nr) AS gini
      |  FROM sp WHERE nl > 0 AND nr > 0)
      |SELECT v AS split_at, nl, nr,
      |  floor(gini * 1000000 + 0.5) / 1000000 AS weighted_gini
      |FROM sg ORDER BY gini, v LIMIT 1""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("value").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("b"))
    val c = e.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      c, Seq(col("v")), Seq("ca", "cb"))
    val (n1, n2) = (totals(0), totals(1))
    val sp = scanned.select(col("v"),
      col("cum_ca").as("al"), col("cum_cb").as("bl"),
      (lit(n1) - col("cum_ca")).as("ar"), (lit(n2) - col("cum_cb")).as("br"),
      (col("cum_ca") + col("cum_cb")).as("nl"),
      ((lit(n1) - col("cum_ca")) + (lit(n2) - col("cum_cb"))).as("nr"))
    val sg = sp.filter(col("nl") > 0 && col("nr") > 0)
      .select(col("v"), col("nl"), col("nr"),
        (((col("nl") * col("nl") - col("al") * col("al")
            - col("bl") * col("bl")).cast("double") * col("nr")
          + (col("nr") * col("nr") - col("ar") * col("ar")
            - col("br") * col("br")).cast("double") * col("nl"))
          / (col("nl").cast("double") * col("nr"))).as("gini"))
    sg.orderBy(col("gini"), col("v")).limit(1)
      .select(col("v").as("split_at"), col("nl"), col("nr"),
        (floor(col("gini") * 1000000 + lit(0.5)) / 1000000).as("weighted_gini"))
  }

  /** SemDeDup (Abbas et al. 2023, public literature) — semantic
    * deduplication via cluster-bounded cosine pruning: pairwise
    * similarity is computed ONLY within each k-means cluster, turning
    * the O(n²) all-pairs scan into O(Σ c_k²) — the paper's point, and
    * the reason this survives web-scale corpora (cluster count grows
    * with n, so c_k stays bounded). Reuses the SAME shared Lloyd
    * machinery as kmeans_embed/cluster_topics (one more composition
    * the oracle re-proves end-to-end); cosine runs on the de-scaled
    * coordinates through the bit-identical sequential-fold dot, and a
    * pair ≥ 0.95 drops the higher id (keep-first). Output: per-cluster
    * points/dropped counts. */
  val semDedup: Q = Q(
    "semdedup",
    s"""WITH $kmA3Ctes,
       |mem AS (SELECT a3.id, a3.cid,
       |    list_transform(a3.xi, v -> CAST(v AS DOUBLE) / 1048576.0) AS xd
       |  FROM a3),
       |nrm AS (SELECT id, cid, xd, sqrt(list_dot_product(xd, xd)) AS nx
       |  FROM mem),
       |pr AS (SELECT a.cid, a.id AS id_a, b.id AS id_b
       |  FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.id < b.id
       |  WHERE list_dot_product(a.xd, b.xd) / (a.nx * b.nx) >= 0.95),
       |drp AS (SELECT cid, count(DISTINCT id_b) AS n_dropped
       |  FROM pr GROUP BY cid),
       |sz AS (SELECT cid, count(*) AS n_points FROM nrm GROUP BY cid)
       |SELECT sz.cid, sz.n_points,
       |  CAST(COALESCE(drp.n_dropped, 0) AS BIGINT) AS n_dropped
       |FROM sz LEFT JOIN drp ON drp.cid = sz.cid
       |ORDER BY sz.cid""".stripMargin) { (s, d) =>
    val dot = graft.functions.GraftFunctions.dotNative _
    val (a3, _, cleanup) = lloyd(s, d)
    // Persisted: the cluster-bounded pair join reads `mem` TWICE (both
    // sides) and the size aggregate a third time — each read otherwise
    // re-executes the whole Lloyd assignment pass (RDD-backed, so
    // exchange reuse can't dedupe it; the davies_bouldin finding). The
    // relation is corpus-sized, so at 100 TB this persist IS the
    // production shape (store the assignment, then self-join it); the
    // battery harness sweeps it between queries like pagerank's
    // adjacency. Measured ~1.7s -> ~1.2s at sf0.1.
    val mem = a3
      .withColumn("xd", expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)"))
      .withColumn("nx", sqrt(dot(col("xd"), col("xd"))))
      .select(col("id"), col("cid"), col("xd"), col("nx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = mem.select(col("cid"), col("id").as("id_a"),
      col("xd").as("xa"), col("nx").as("na"))
    val b = mem.select(col("cid"), col("id").as("id_b"),
      col("xd").as("xb"), col("nx").as("nb"))
    val pr = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("xa"), col("xb")) / (col("na") * col("nb")) >= 0.95)
    val drp = pr.groupBy("cid").agg(countDistinct("id_b").as("n_dropped"))
    val sz = mem.groupBy("cid").agg(count(lit(1)).as("n_points"))
    val out = sz.join(drp, Seq("cid"), "left")
      .select(col("cid"), col("n_points"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy("cid")
    cleanup()
    out
  }

  /** AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996)
    * over the token stream, gated against the EXACT F2 = Σ c_t² —
    * cms_freq's sibling for the self-join-size / repeat-rate moment
    * (F2/n² is the corpus repeat probability; the sketch is 16
    * BIGINTs however large the vocabulary). Signs are bit 15 of the
    * portable 31-polynomial ×16 odd multipliers (all products < 2^52,
    * exact in both engines; low-bit parity of the product left ±10%
    * pair-correlation bias on this Zipf corpus — measured, switched);
    * each counter Z_j = Σ ±c_t is an exact BIGINT and the estimate is
    * the MEAN of the 16 Z² values (integer-floor-divided — the
    * unbiased E[Z²]=F2 estimator; the classic median-of-means is
    * ROBUST but biased low when one heavy token dominates every
    * counter, which Zipf data guarantees). The ×16 fan-out rides the
    * VOCAB relation, never the corpus stream. Exact side: Σc² ≤ n²
    * needs DECIMAL past ~3e9 tokens (doc'd; BIGINT-safe here). */
  val amsF2: Q = Q(
    "ams_f2",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
      |      FROM documents),
      |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok
      |      WHERE w <> '' GROUP BY w),
      |h AS (SELECT w, cnt,
      |   list_aggregate(list_transform(range(0, least(length(w), 8)),
      |     j -> ascii(substring(w, CAST(j + 1 AS INTEGER), 1))
      |          * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003 AS hb
      | FROM wc),
      |sg AS (SELECT t.j, cnt,
      |    1 - 2 * (((hb * (2654435761 + 2 * t.j)) // 32768) % 2) AS sgn
      |  FROM h, range(0, 16) t(j)),
      |z AS (SELECT j, CAST(sum(sgn * cnt) AS BIGINT) AS zz FROM sg
      |      GROUP BY j),
      |est AS (SELECT CAST(sum(zz * zz) // 16 AS BIGINT) AS f2_est FROM z),
      |ex AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM wc)
      |SELECT f2_exact, f2_est,
      |  floor((CAST(f2_est AS DOUBLE) - f2_exact) / f2_exact * 1000000
      |    + 0.5) / 1000000 AS rel_err
      |FROM ex CROSS JOIN est""".stripMargin) { (s, d) =>
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val h = wc.withColumn("hb", expr(
      "aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, CAST(j + 1 AS INT), 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003"))
    val sg = h.select(col("cnt"),
      posexplode(array((0 until 16).map(j =>
        lit(1) - lit(2) * shiftright(col("hb") * (2654435761L + 2L * j), 15)
          .bitwiseAND(1)): _*)).as(Seq("j", "sgn")))
    val z = sg.groupBy("j").agg(sum(col("sgn") * col("cnt")).as("zz"))
    val est = z.agg(sum(col("zz") * col("zz")).as("zs"))
      .select(expr("zs div 16").as("f2_est"))
    val ex = wc.agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
    ex.crossJoin(est) // 1-row x 1-row report join
      .select(col("f2_exact"), col("f2_est"),
        (floor((col("f2_est").cast("double") - col("f2_exact"))
          / col("f2_exact") * 1000000 + lit(0.5)) / 1000000).as("rel_err"))
  }

  /** Top principal direction of the embedding cloud via 3 power
    * iterations — PCA WITHOUT EVER MATERIALIZING THE d×d COVARIANCE:
    * each round is two vocabulary-of-d-sized joins computing
    * C·v = Σᵢ xᵢ(xᵢᵀv) directly from the (vec, dim, coord) relation,
    * so the work is n·d per round (the covariance build's n·d² never
    * happens — THE scale trick for wide embeddings). Determinism:
    * coords quantize to exact BIGINTs (floor(x·2^20)), v lives on the
    * exact 1e-6 integer grid, per-vector dots are exact BIGINT folds
    * (≤ 6.7e13), per-dim accumulations are exact DECIMAL(38,0), and
    * each round renormalizes by the ∞-norm (an exact max) before
    * re-quantizing — so both engines iterate identical integer
    * vectors. Uncentered (dominant direction of E[xxᵀ]); output is
    * the top-10 |loading| dims. */
  val pcaPower: Q = Q(
    "pca_power",
    {
      def round(vp: String, n: Int): String =
        s"""s$n AS (SELECT vec_id, CAST(sum(xi * vi) AS BIGINT) AS s
           |      FROM base JOIN $vp USING (dim) GROUP BY vec_id),
           |w$n AS (SELECT dim, sum(CAST(xi AS HUGEINT) * s) AS w
           |      FROM base JOIN s$n USING (vec_id) GROUP BY dim),
           |m$n AS (SELECT max(abs(w)) AS m FROM w$n),
           |v$n AS (SELECT dim, CAST(floor(CAST(w AS DOUBLE)
           |      / CAST(m AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vi
           |      FROM w$n CROSS JOIN m$n)""".stripMargin
      s"""WITH base AS (SELECT vec_id, t.j AS dim,
         |    CAST(floor(CAST(e.embedding[t.j + 1] AS DOUBLE) * 1048576)
         |      AS BIGINT) AS xi
         |  FROM embeddings e, range(0, 64) t(j)),
         |v0 AS (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS vi
         |      FROM base),
         |${round("v0", 1)},
         |${round("v1", 2)},
         |${round("v2", 3)}
         |SELECT dim, CAST(vi AS DOUBLE) / 1000000 AS loading
         |FROM v3 ORDER BY abs(CAST(vi AS DOUBLE) / 1000000) DESC, dim
         |LIMIT 10""".stripMargin
    }) { (s, d) =>
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        floor(col("xf").cast("double") * 1048576).cast("long").as("xi"))
    val v0 = base.select("dim").distinct()
      .select(col("dim"), lit(1000000L).as("vi"))
    def round(v: DataFrame): DataFrame = {
      val sv = base.join(broadcast(v), "dim")
        .groupBy("vec_id").agg(sum(col("xi") * col("vi")).as("s"))
      val w = base.join(sv, "vec_id")
        .groupBy("dim").agg(sum(col("xi").cast("decimal(38,0)") * col("s"))
          .as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      w.crossJoin(broadcast(m)) // 1-row infinity-norm
        .select(col("dim"),
          floor(col("w").cast("double") / col("m").cast("double") * 1000000
            + lit(0.5)).cast("long").as("vi"))
    }
    val v3 = round(round(round(v0)))
    v3.select(col("dim"), (col("vi").cast("double") / 1000000).as("loading"))
      .orderBy(abs(col("vi").cast("double") / 1000000).desc, col("dim"))
      .limit(10)
  }

  /** KMV (bottom-k minimum values) distinct-count sketch (Beyer et al.
    * 2007) of the document vocabulary, probed against the exact answer
    * — the third mergeable sketch beside cms_freq and ams_f2, and the
    * cardinality shape behind approx_count_distinct: keep the k=256
    * smallest hash values, estimate D ≈ (k−1)·M/kth_min. The hash is
    * the established portable poly-8 → multiplicative permutation mod
    * the prime M=1000003 (a bijection, so spread = the poly hash's),
    * replayed bit-exactly by the oracle; the bottom-k is a global
    * TakeOrdered over the DISTINCT hash relation (k rows to the
    * driver, never a full sort), and the only doubles are the final
    * estimate division and error ratio. The gate pins both the sketch
    * arithmetic AND its measured relative error vs the exact distinct
    * count — an estimator regression fails loudly. */
  val kmvDistinct: Q = Q(
    "kmv_distinct",
    """WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
      |              FROM documents),
      |tw AS (SELECT w FROM toks WHERE w <> ''),
      |hv AS (SELECT w,
      |    ((list_sum(list_transform(
      |        range(0, CAST(least(length(w), 8) AS BIGINT)),
      |        j -> ascii(substring(w, CAST(j + 1 AS INTEGER), 1))
      |             * CAST(pow(31, j) AS BIGINT))) % 1000003)
      |     * 2654435761) % 1000003 AS hv
      |  FROM tw),
      |dh AS (SELECT DISTINCT hv AS v FROM hv),
      |bottom AS (SELECT v FROM dh ORDER BY v LIMIT 256),
      |sk AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
      |       CAST(max(v) AS BIGINT) AS kth_min FROM bottom),
      |est AS (SELECT k_used, kth_min,
      |    CASE WHEN k_used < 256 THEN k_used
      |         ELSE CAST(floor(255.0 * 1000003 / kth_min + 0.5) AS BIGINT)
      |    END AS est_distinct
      |  FROM sk),
      |ex AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS exact_tokens,
      |       CAST(count(DISTINCT hv) AS BIGINT) AS exact_hashes FROM hv)
      |SELECT k_used, kth_min, est_distinct, exact_hashes, exact_tokens,
      |  floor(abs(CAST(est_distinct - exact_hashes AS DOUBLE))
      |    / exact_hashes * 1000000 + 0.5) / 1000000 AS rel_err
      |FROM est CROSS JOIN ex""".stripMargin) { (s, d) =>
    val tw = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val hv = tw.select(col("w"), expr(
      "((aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, j + 1, 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003) * 2654435761) % 1000003").as("hv"))
    val bottom = hv.select("hv").distinct().orderBy("hv").limit(256)
    val sk = bottom.agg(count(lit(1)).as("k_used"), max("hv").as("kth_min"))
    val est = sk.select(col("k_used"), col("kth_min"),
      when(col("k_used") < 256, col("k_used"))
        .otherwise(floor(lit(255.0) * 1000003 / col("kth_min") + lit(0.5))
          .cast("long")).as("est_distinct"))
    val ex = hv.agg(countDistinct("w").as("exact_tokens"),
      countDistinct("hv").as("exact_hashes"))
    est.crossJoin(broadcast(ex)) // 1-row sketch x 1-row exact report
      .select(col("k_used"), col("kth_min"), col("est_distinct"),
        col("exact_hashes"), col("exact_tokens"),
        (floor(abs((col("est_distinct") - col("exact_hashes")).cast("double"))
          / col("exact_hashes") * 1000000 + lit(0.5)) / 1000000).as("rel_err"))
  }

  /** k-NN classification audit (k=5, cosine) of a held-out query block
    * (vec_id ∈ [100, 140)) against the rest of the corpus as the
    * training set — the eval loop behind "can this embedding space
    * separate the labels at all". The plan is the brute-force retrieval
    * baseline (bounded 40-query broadcast × one corpus scan, per-query
    * top-k window); the vote is a (qid, label) count + deterministic
    * argmax (count DESC, label ASC), and the output is the confusion
    * matrix — exact integer cells. Cosines are rounded 6 dp with
    * vec_id tie-breaks (cosine_topk's device) so neighbor sets are
    * engine-identical. */
  val knnClassify: Q = Q(
    "knn_classify",
    """WITH q AS (SELECT vec_id AS qid, label AS true_label,
      |    CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 140),
      |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS cv
      |      FROM embeddings WHERE vec_id < 100 OR vec_id >= 140),
      |scored AS (SELECT qid, true_label, vec_id, label,
      |    round(list_dot_product(qv, cv)
      |      / (sqrt(list_dot_product(qv, qv))
      |         * sqrt(list_dot_product(cv, cv))), 6) AS cos
      |  FROM q CROSS JOIN c),
      |top AS (SELECT qid, true_label, label FROM (
      |    SELECT qid, true_label, label,
      |      row_number() OVER (PARTITION BY qid
      |        ORDER BY cos DESC, vec_id) AS rn
      |    FROM scored) WHERE rn <= 5),
      |votes AS (SELECT qid, true_label, label,
      |    CAST(count(*) AS BIGINT) AS c FROM top
      |  GROUP BY qid, true_label, label),
      |pred AS (SELECT qid, true_label, label AS pred_label FROM (
      |    SELECT qid, true_label, label,
      |      row_number() OVER (PARTITION BY qid ORDER BY c DESC, label)
      |        AS rn
      |    FROM votes) WHERE rn = 1)
      |SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
      |FROM pred GROUP BY true_label, pred_label
      |ORDER BY true_label, pred_label""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
      .select(col("vec_id").as("qid"), col("label").as("true_label"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb.filter(col("vec_id") < 100 || col("vec_id") >= 140)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("true_label"), col("vec_id"), col("label"),
        round(graft.functions.GraftFunctions
          .cosineNative(col("qv"), col("cv")), 6).as("cos"))
    val wTop = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val top = scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5).select("qid", "true_label", "label")
    val votes = top.groupBy("qid", "true_label", "label")
      .agg(count(lit(1)).as("c"))
    val wVote = Window.partitionBy("qid").orderBy(col("c").desc, col("label"))
    val pred = votes.withColumn("rn", row_number().over(wVote))
      .filter(col("rn") === 1)
      .select(col("qid"), col("true_label"), col("label").as("pred_label"))
    pred.groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  /** Nearest-centroid (Rocchio) classification — the O(k) sibling of
    * knn_classify's O(n) vote, and the production fallback when the
    * corpus is too big to scan per query: per-label centroids on the
    * exact 2^20 integer lattice (kmeans_embed's device — sums are
    * order-independent BIGINTs), test block = the same held-out
    * vec_id ∈ [100, 140), assignment = the map-side struct-min argmin
    * over ≤|labels| broadcast centroid rows (ONE row per point crosses
    * the exchange). Output: exact confusion matrix. */
  val rocchioClassify: Q = Q(
    "rocchio_classify",
    """WITH pts AS (SELECT vec_id AS id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS xi
      |  FROM embeddings),
      |tr AS (SELECT * FROM pts WHERE id < 100 OR id >= 140),
      |te AS (SELECT id, label AS true_label,
      |    list_transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0) AS xd
      |  FROM pts WHERE id >= 100 AND id < 140),
      |cent AS (SELECT s.label, s.cs, z.cn FROM
      |   (SELECT label, list(sx ORDER BY pos) AS cs FROM
      |     (SELECT label, i AS pos, CAST(sum(xi[i]) AS BIGINT) AS sx
      |      FROM tr, range(1, 65) t(i) GROUP BY label, i)
      |    GROUP BY label) s
      |   JOIN (SELECT label, count(*) AS cn FROM tr GROUP BY label) z
      |     USING (label)),
      |ce AS (SELECT label,
      |    list_transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE)
      |      / 1048576.0) AS md
      |  FROM cent),
      |cx AS (SELECT label, md, list_dot_product(md, md) AS dmm FROM ce),
      |assign AS (SELECT id, true_label, cl AS pred_label FROM (
      |  SELECT te.id, te.true_label, c.label AS cl,
      |    row_number() OVER (PARTITION BY te.id ORDER BY
      |      list_dot_product(te.xd, te.xd)
      |        - 2 * list_dot_product(te.xd, c.md) + c.dmm, c.label) AS rn
      |  FROM te CROSS JOIN cx c) WHERE rn = 1)
      |SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
      |FROM assign GROUP BY true_label, pred_label
      |ORDER BY true_label, pred_label""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    val dot = graft.functions.GraftFunctions.dotNative _
    val pts = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("label"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT))").as("xi"))
    val tr = pts.filter(col("id") < 100 || col("id") >= 140)
    val te = pts.filter(col("id") >= 100 && col("id") < 140)
      .select(col("id"), col("label").as("true_label"),
        expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)").as("xd"))
      .withColumn("dxx", dot(col("xd"), col("xd")))
    val sums = tr.select(col("label"), posexplode(col("xi"))
        .as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("sx"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), " +
        "t -> t.sx)").as("cs"))
    val sizes = tr.groupBy("label").agg(count(lit(1)).as("cn"))
    val cx = sums.join(sizes, "label")
      .withColumn("md", expr(
        "transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) " +
          "/ 1048576.0D)"))
      .withColumn("dmm", dot(col("md"), col("md")))
      .select(col("label").as("cl"), col("md"), col("dmm"))
    val assigned = te.crossJoin(broadcast(cx)) // ≤10 centroid rows
      .withColumn("dist",
        col("dxx") - lit(2) * dot(col("xd"), col("md")) + col("dmm"))
      .select(col("id"), col("true_label"),
        struct(col("dist"), col("cl")).as("sc"))
      .groupBy("id", "true_label").agg(min("sc").as("m"))
      .select(col("true_label"), col("m.cl").as("pred_label"))
    assigned.groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }


  /** Per-class precision/recall/F1 + macro report over the nearest-
    * centroid classifier's predictions — the standard multi-class eval
    * readout on top of rocchio_classify's exact confusion (the same
    * CTE chain, re-proven end-to-end by the oracle): per TRUE class,
    * TP / FP / FN as exact integers, P/R/F1 as guarded single
    * divisions, plus a macro row (label −1) whose unweighted means
    * fold class-sorted. */
  val f1Report: Q = Q(
    "f1_report",
    """WITH pts AS (SELECT vec_id AS id, label,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS xi
      |  FROM embeddings),
      |tr AS (SELECT * FROM pts WHERE id < 100 OR id >= 140),
      |te AS (SELECT id, label AS true_label,
      |    list_transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0) AS xd
      |  FROM pts WHERE id >= 100 AND id < 140),
      |cent AS (SELECT s.label, s.cs, z.cn FROM
      |   (SELECT label, list(sx ORDER BY pos) AS cs FROM
      |     (SELECT label, i AS pos, CAST(sum(xi[i]) AS BIGINT) AS sx
      |      FROM tr, range(1, 65) t(i) GROUP BY label, i)
      |    GROUP BY label) s
      |   JOIN (SELECT label, count(*) AS cn FROM tr GROUP BY label) z
      |     USING (label)),
      |ce AS (SELECT label,
      |    list_transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE)
      |      / 1048576.0) AS md
      |  FROM cent),
      |cx AS (SELECT label, md, list_dot_product(md, md) AS dmm FROM ce),
      |assign AS (SELECT id, true_label, cl AS pred_label FROM (
      |  SELECT te.id, te.true_label, c.label AS cl,
      |    row_number() OVER (PARTITION BY te.id ORDER BY
      |      list_dot_product(te.xd, te.xd)
      |        - 2 * list_dot_product(te.xd, c.md) + c.dmm, c.label) AS rn
      |  FROM te CROSS JOIN cx c) WHERE rn = 1),
      |cls AS (SELECT DISTINCT true_label AS c FROM assign),
      |m AS (SELECT cls.c,
      |    CAST((SELECT count(*) FROM assign
      |          WHERE true_label = cls.c AND pred_label = cls.c) AS BIGINT)
      |      AS tp,
      |    CAST((SELECT count(*) FROM assign
      |          WHERE pred_label = cls.c AND true_label <> cls.c) AS BIGINT)
      |      AS fp,
      |    CAST((SELECT count(*) FROM assign
      |          WHERE true_label = cls.c AND pred_label <> cls.c) AS BIGINT)
      |      AS fn
      |  FROM cls),
      |pr AS (SELECT c, tp, fp, fn,
      |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp)
      |         ELSE 0.0 END AS p,
      |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn)
      |         ELSE 0.0 END AS r,
      |    CASE WHEN 2 * tp + fp + fn > 0
      |         THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
      |         ELSE 0.0 END AS f1
      |  FROM m),
      |macro AS (SELECT CAST(-1 AS INTEGER) AS c,
      |    CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(fp) AS BIGINT) AS fp,
      |    CAST(sum(fn) AS BIGINT) AS fn,
      |    list_aggregate(list(p ORDER BY c), 'sum') / count(*) AS p,
      |    list_aggregate(list(r ORDER BY c), 'sum') / count(*) AS r,
      |    list_aggregate(list(f1 ORDER BY c), 'sum') / count(*) AS f1
      |  FROM pr)
      |SELECT c AS label, tp, fp, fn,
      |  floor(p * 1000000 + 0.5) / 1000000 AS precision_c,
      |  floor(r * 1000000 + 0.5) / 1000000 AS recall_c,
      |  floor(f1 * 1000000 + 0.5) / 1000000 AS f1_c
      |FROM (SELECT * FROM pr UNION ALL SELECT * FROM macro)
      |ORDER BY label""".stripMargin) { (s, d) =>
    val assign = rocchioAssignments(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = assign.groupBy(col("true_label").as("c"))
      .agg(sum(when(col("pred_label") === col("true_label"), 1L)
        .otherwise(0L)).as("tp"),
        sum(when(col("pred_label") =!= col("true_label"), 1L)
          .otherwise(0L)).as("fn"))
    val fp = assign.groupBy(col("pred_label").as("pc"))
      .agg(sum(when(col("pred_label") =!= col("true_label"), 1L)
        .otherwise(0L)).as("fp"))
    val pr = m.join(fp, col("c") === col("pc"), "left")
      .select(col("c"), col("tp"), coalesce(col("fp"), lit(0L)).as("fp"),
        col("fn"))
      .select(col("c"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(0.0).as("p"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(0.0).as("r"),
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          (col("tp") * 2).cast("double")
            / (col("tp") * 2 + col("fp") + col("fn")))
          .otherwise(0.0).as("f1"))
    def cFold(field: String) =
      expr(s"aggregate(transform(array_sort(collect_list(struct(c, $field))), " +
        s"t -> t.$field), 0D, (a, x) -> a + x)")
    val macroR = pr.agg(sum("tp").as("tp"), sum("fp").as("fp"),
        sum("fn").as("fn"), cFold("p").as("sp"), cFold("r").as("sr"),
        cFold("f1").as("sf"), count(lit(1)).as("k"))
      .select(lit(-1).as("c"), col("tp"), col("fp"), col("fn"),
        (col("sp") / col("k")).as("p"), (col("sr") / col("k")).as("r"),
        (col("sf") / col("k")).as("f1"))
    pr.unionAll(macroR)
      .select(col("c").as("label"), col("tp"), col("fp"), col("fn"),
        (floor(col("p") * 1000000 + lit(0.5)) / 1000000).as("precision_c"),
        (floor(col("r") * 1000000 + lit(0.5)) / 1000000).as("recall_c"),
        (floor(col("f1") * 1000000 + lit(0.5)) / 1000000).as("f1_c"))
      .orderBy("label")
  }

  /** Shared rocchio assignment pipeline (test id, true_label,
    * pred_label) — consumed by rocchio_classify's confusion and
    * f1_report so the two provably evaluate the same classifier. */
  private def rocchioAssignments(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val dot = graft.functions.GraftFunctions.dotNative _
    val pts = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("label"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1048576.0D) AS BIGINT))").as("xi"))
    val tr = pts.filter(col("id") < 100 || col("id") >= 140)
    val te = pts.filter(col("id") >= 100 && col("id") < 140)
      .select(col("id"), col("label").as("true_label"),
        expr("transform(xi, v -> CAST(v AS DOUBLE) / 1048576.0D)").as("xd"))
      .withColumn("dxx", dot(col("xd"), col("xd")))
    val sums = tr.select(col("label"), posexplode(col("xi"))
        .as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("sx"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), " +
        "t -> t.sx)").as("cs"))
    val sizes = tr.groupBy("label").agg(count(lit(1)).as("cn"))
    val cx = sums.join(sizes, "label")
      .withColumn("md", expr(
        "transform(cs, v -> CAST(v AS DOUBLE) / CAST(cn AS DOUBLE) " +
          "/ 1048576.0D)"))
      .withColumn("dmm", dot(col("md"), col("md")))
      .select(col("label").as("cl"), col("md"), col("dmm"))
    te.crossJoin(broadcast(cx))
      .withColumn("dist",
        col("dxx") - lit(2) * dot(col("xd"), col("md")) + col("dmm"))
      .select(col("id"), col("true_label"),
        struct(col("dist"), col("cl")).as("sc"))
      .groupBy("id", "true_label").agg(min("sc").as("m"))
      .select(col("id"), col("true_label"), col("m.cl").as("pred_label"))
  }

  /** Greedy depth-2 decision tree (best_split's CART recursion, one
    * level deeper): the root splits on event value via the same
    * PrefixScan-threshold sweep, then EACH leaf finds its own best
    * split on a second feature (hour of day). The root threshold is a
    * 1-row broadcast onto the second pass; level-2 thresholds sweep
    * the hour domain (≤24 values) with a leaf-partitioned cumulative
    * window, so no partition-less scan appears anywhere. The gini
    * score reuses best_split's exact-integer algebra (numerator and
    * denominator ≤ N³ — double-exact through 2·10⁵ rows/leaf, one
    * deterministic division). Emits the three nodes of the fitted
    * tree. */
  val treeDepth2: Q = Q(
    "tree_depth2",
    """WITH e AS (SELECT value AS v, CAST(hour(ts) AS BIGINT) AS h,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |c AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
      |      CAST(sum(b) AS BIGINT) AS cb FROM e GROUP BY v),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
      |      CAST(sum(cb) AS BIGINT) AS n2 FROM c),
      |sc AS (SELECT v,
      |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS al,
      |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS bl FROM c),
      |sp AS (SELECT v, al, bl, n1 - al AS ar, n2 - bl AS br,
      |    al + bl AS nl, (n1 - al) + (n2 - bl) AS nr FROM sc, n),
      |sg AS (SELECT v, nl, nr,
      |    (CAST(nl * nl - al * al - bl * bl AS DOUBLE) * nr
      |     + CAST(nr * nr - ar * ar - br * br AS DOUBLE) * nl)
      |      / (CAST(nl AS DOUBLE) * nr) AS gini
      |  FROM sp WHERE nl > 0 AND nr > 0),
      |root AS (SELECT v, nl, nr, gini FROM sg ORDER BY gini, v LIMIT 1),
      |lv AS (SELECT CASE WHEN e.v <= root.v THEN 'left' ELSE 'right' END
      |    AS leaf, e.h, e.a, e.b FROM e CROSS JOIN root),
      |lc AS (SELECT leaf, h, CAST(sum(a) AS BIGINT) AS ca,
      |      CAST(sum(b) AS BIGINT) AS cb FROM lv GROUP BY 1, 2),
      |ln AS (SELECT leaf, CAST(sum(ca) AS BIGINT) AS n1,
      |      CAST(sum(cb) AS BIGINT) AS n2 FROM lc GROUP BY 1),
      |lsc AS (SELECT leaf, h,
      |    CAST(sum(ca) OVER (PARTITION BY leaf ORDER BY h) AS BIGINT)
      |      AS al,
      |    CAST(sum(cb) OVER (PARTITION BY leaf ORDER BY h) AS BIGINT)
      |      AS bl FROM lc),
      |lsp AS (SELECT s.leaf, s.h, s.al, s.bl, t.n1 - s.al AS ar,
      |    t.n2 - s.bl AS br, s.al + s.bl AS nl,
      |    (t.n1 - s.al) + (t.n2 - s.bl) AS nr
      |  FROM lsc s JOIN ln t ON t.leaf = s.leaf),
      |lsg AS (SELECT leaf, h, nl, nr,
      |    (CAST(nl * nl - al * al - bl * bl AS DOUBLE) * nr
      |     + CAST(nr * nr - ar * ar - br * br AS DOUBLE) * nl)
      |      / (CAST(nl AS DOUBLE) * nr) AS gini,
      |    row_number() OVER (PARTITION BY leaf ORDER BY
      |      (CAST(nl * nl - al * al - bl * bl AS DOUBLE) * nr
      |       + CAST(nr * nr - ar * ar - br * br AS DOUBLE) * nl)
      |        / (CAST(nl AS DOUBLE) * nr), h) AS rn
      |  FROM lsp WHERE nl > 0 AND nr > 0)
      |SELECT node, feature, split_at, nl, nr,
      |  floor(gini * 1000000 + 0.5) / 1000000 AS weighted_gini
      |FROM (
      |  SELECT 'root' AS node, 'value' AS feature, v AS split_at,
      |    nl, nr, gini FROM root
      |  UNION ALL
      |  SELECT leaf, 'hour', CAST(h AS DOUBLE), nl, nr, gini
      |  FROM lsg WHERE rn = 1)
      |ORDER BY node""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("value").as("v"), hour(col("ts")).cast("long").as("h"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("b"))
    def gini(nl: org.apache.spark.sql.Column, nr: org.apache.spark.sql.Column,
        al: org.apache.spark.sql.Column, bl: org.apache.spark.sql.Column,
        ar: org.apache.spark.sql.Column, br: org.apache.spark.sql.Column) =
      ((nl * nl - al * al - bl * bl).cast("double") * nr
        + (nr * nr - ar * ar - br * br).cast("double") * nl) /
        (nl.cast("double") * nr)
    val c = e.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    val (scanned, totals) = graft.ops.PrefixScan.withCumSums(
      c, Seq(col("v")), Seq("ca", "cb"))
    val (n1, n2) = (totals(0), totals(1))
    val sp = scanned.select(col("v"),
      col("cum_ca").as("al"), col("cum_cb").as("bl"),
      (lit(n1) - col("cum_ca")).as("ar"), (lit(n2) - col("cum_cb")).as("br"),
      (col("cum_ca") + col("cum_cb")).as("nl"),
      ((lit(n1) - col("cum_ca")) + (lit(n2) - col("cum_cb"))).as("nr"))
    val root = sp.filter(col("nl") > 0 && col("nr") > 0)
      .select(col("v"), col("nl"), col("nr"),
        gini(col("nl"), col("nr"), col("al"), col("bl"), col("ar"),
          col("br")).as("gini"))
      .orderBy(col("gini"), col("v")).limit(1)
    val lv = e.crossJoin(broadcast(root.select(col("v").as("rootv"))))
      .select(when(col("v") <= col("rootv"), "left").otherwise("right")
        .as("leaf"), col("h"), col("a"), col("b"))
    val lc = lv.groupBy("leaf", "h").agg(sum("a").as("ca"), sum("b").as("cb"))
    val wLeaf = org.apache.spark.sql.expressions.Window.partitionBy("leaf")
    val wCum = wLeaf.orderBy("h")
    val lsp = lc.select(col("leaf"), col("h"),
        sum("ca").over(wCum).as("al"), sum("cb").over(wCum).as("bl"),
        (sum("ca").over(wLeaf) - sum("ca").over(wCum)).as("ar"),
        (sum("cb").over(wLeaf) - sum("cb").over(wCum)).as("br"))
      .select(col("leaf"), col("h"), col("al"), col("bl"), col("ar"),
        col("br"), (col("al") + col("bl")).as("nl"),
        (col("ar") + col("br")).as("nr"))
    val leaves = lsp.filter(col("nl") > 0 && col("nr") > 0)
      .select(col("leaf"), col("h"), col("nl"), col("nr"),
        gini(col("nl"), col("nr"), col("al"), col("bl"), col("ar"),
          col("br")).as("gini"))
      .withColumn("rn", row_number().over(
        wLeaf.orderBy(col("gini"), col("h"))))
      .filter(col("rn") === 1)
    root.select(lit("root").as("node"), lit("value").as("feature"),
        col("v").as("split_at"), col("nl"), col("nr"), col("gini"))
      .unionAll(leaves.select(col("leaf").as("node"),
        lit("hour").as("feature"), col("h").cast("double").as("split_at"),
        col("nl"), col("nr"), col("gini")))
      .select(col("node"), col("feature"), col("split_at"), col("nl"),
        col("nr"),
        (floor(col("gini") * 1000000 + lit(0.5)) / 1000000)
          .as("weighted_gini"))
      .orderBy("node")
  }

  /** Deterministic RANSAC line fit (Fischler & Bolles 1981) of
    * extended price against quantity: candidate lines come from all
    * pairs of a CAPPED sample slice (l_orderkey ≤ 24, first line
    * items — bounded at any corpus size, the er_block_metrics
    * discipline), every candidate is scored against the FULL table in
    * one broadcast pass (hypotheses move to the data, never the
    * reverse — the robust-fitting shape that survives 100 TB), and
    * the consensus winner is least-squares refit on its inliers with
    * exact integer co-moments (n·Σxy crosses 2⁶³ at sf0.1, so the
    * final normal-equation products run in IEEE doubles of exact
    * longs — identical on both engines). */
  val ransacFit: Q = Q(
    "ransac_fit",
    """WITH pts0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk,
      |    l_suppkey AS sk,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem WHERE l_orderkey <= 24 AND l_linenumber = 1),
      |cand AS (SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS m,
      |    CAST(a.y AS DOUBLE)
      |      - CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) * a.x AS c
      |  FROM pts0 a JOIN pts0 b
      |    ON (a.ok < b.ok OR (a.ok = b.ok AND (a.pk < b.pk
      |        OR (a.pk = b.pk AND a.sk < b.sk))))
      |   AND a.x <> b.x),
      |all_pts AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |sc AS (SELECT m, c, CAST(count(*) AS BIGINT) AS inl
      |  FROM all_pts p CROSS JOIN cand
      |  WHERE abs(p.y - (cand.m * p.x + cand.c)) <= 1500000
      |  GROUP BY m, c),
      |best AS (SELECT m, c, inl FROM sc ORDER BY inl DESC, m, c LIMIT 1),
      |fit AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(p.x) AS BIGINT) AS sx, CAST(sum(p.y) AS BIGINT) AS sy,
      |    CAST(sum(p.x * p.y) AS BIGINT) AS sxy,
      |    CAST(sum(p.x * p.x) AS BIGINT) AS sxx,
      |    any_value(best.inl) AS inl
      |  FROM all_pts p CROSS JOIN best
      |  WHERE abs(p.y - (best.m * p.x + best.c)) <= 1500000),
      |meta AS (SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM pts0) AS n_sample,
      |    (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand)
      |SELECT n_sample, n_cand, inl AS best_inliers,
      |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |    * 10000 + 0.5) / 10000 AS slope,
      |  floor((sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
      |    / n / 100 * 10000 + 0.5) / 10000 AS intercept
      |FROM fit CROSS JOIN meta""".stripMargin) { (s, d) =>
    val pts0 = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 24 && col("l_linenumber") === 1)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("x"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
      .distinct()
    val a = pts0.select(col("ok").as("aok"), col("pk").as("apk"),
      col("sk").as("ask"), col("x").as("ax"), col("y").as("ay"))
    val b = pts0.select(col("ok").as("bok"), col("pk").as("bpk"),
      col("sk").as("bsk"), col("x").as("bx"), col("y").as("by"))
    // when-guarded: the ax != bx join condition does exclude these
    // pairs, but plan fusion can evaluate the projection inside the
    // nested-loop consume before the residual condition filters, and
    // ANSI mode turns that transient /0 into a hard error
    val slopeC = when(col("bx") =!= col("ax"),
      (col("by") - col("ay")).cast("double") / (col("bx") - col("ax")))
    val cand = a.join(b,
        (col("aok") < col("bok") || (col("aok") === col("bok")
          && (col("apk") < col("bpk") || (col("apk") === col("bpk")
            && col("ask") < col("bsk")))))
          && col("ax") =!= col("bx"))
      .select(slopeC.as("m"),
        (col("ay").cast("double") - slopeC * col("ax")).as("c"))
    val allPts = Tables.lineitem(s, d)
      .select(floor(col("l_quantity") + lit(0.5)).cast("long").as("x"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
    val sc = allPts.crossJoin(broadcast(cand)) // <=~200 capped hypotheses
      .filter(abs(col("y") - (col("m") * col("x") + col("c"))) <= 1500000)
      .groupBy("m", "c").agg(count(lit(1)).as("inl"))
    val best = sc
      .agg(max(struct(col("inl"), (-col("m")).as("nm"), (-col("c")).as("nc")))
        .as("b"))
      .select(col("b.inl").as("inl"), (-col("b.nm")).as("m"),
        (-col("b.nc")).as("c"))
    val slopeFit = (col("n").cast("double") * col("sxy")
      - col("sx").cast("double") * col("sy")) /
      (col("n").cast("double") * col("sxx")
        - col("sx").cast("double") * col("sx"))
    val fit = allPts.crossJoin(broadcast(best)) // 1-row consensus winner
      .filter(abs(col("y") - (col("m") * col("x") + col("c"))) <= 1500000)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        first("inl").as("inl"))
    fit
      .crossJoin(broadcast(pts0.agg(count(lit(1)).as("n_sample"))))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
      .select(col("n_sample"), col("n_cand"), col("inl").as("best_inliers"),
        (floor(slopeFit * 10000 + lit(0.5)) / 10000).as("slope"),
        (floor((col("sy") - slopeFit * col("sx")) / col("n") / 100
          * 10000 + lit(0.5)) / 10000).as("intercept"))
  }

  /** Davies–Bouldin cluster-validity index (Davies & Bouldin 1979,
    * variance-form scatter s_i = √(SSE_i/n_i)) over the SHARED Lloyd
    * clustering — "how separated are the clusters k-means found", the
    * k-selection diagnostic beside kmeans_embed's report. Per-cluster
    * scatter comes from exact integer-lattice moments (Σ‖x‖² and the
    * centroid sums the recompute already materializes — no second
    * data pass beyond one Σ‖x‖² aggregate); centroid distances and
    * the 8×8 ratio grid live on the bounded centroid relation; every
    * double fold is dimension- or cid-sorted. A third oracle consumer
    * re-proving the Lloyd composition end-to-end. */
  val daviesBouldin: Q = Q(
    "davies_bouldin",
    s"""WITH $kmA3Ctes,
       |${kmRecomputeCte("c3", "a3")},
       |px AS (SELECT cid,
       |    list_aggregate(list_transform(xi, x -> x * x), 'sum') AS xx
       |  FROM a3),
       |sx AS (SELECT cid, CAST(sum(xx) AS BIGINT) AS sxx FROM px
       |       GROUP BY cid),
       |cl AS (SELECT c3.cid, c3.cn, sx.sxx, c3.cs,
       |    list_transform(c3.cs, v -> CAST(v AS DOUBLE)
       |      / CAST(c3.cn AS DOUBLE) / 1048576.0) AS md
       |  FROM c3 JOIN sx USING (cid)),
       |si AS (SELECT cid, cn, md,
       |    sqrt((CAST(sxx AS DOUBLE) - list_aggregate(
       |      list_transform(range(1, 65),
       |        i -> CAST(cs[i] AS DOUBLE) * cs[i] / cn), 'sum')) / cn)
       |      / 1048576.0 AS s
       |  FROM cl),
       |pr AS (SELECT a.cid AS ci, a.cn AS cn, a.s AS sa, b.s AS sb,
       |    sqrt(list_aggregate(list_transform(range(1, 65),
       |      i -> (a.md[i] - b.md[i]) * (a.md[i] - b.md[i])), 'sum'))
       |      AS dij
       |  FROM si a JOIN si b ON a.cid <> b.cid),
       |mx AS (SELECT ci AS cid, any_value(cn) AS n,
       |    max((sa + sb) / dij) AS rmax FROM pr GROUP BY ci),
       |db AS (SELECT list_aggregate(list(rmax ORDER BY cid), 'sum')
       |    / CAST(count(*) AS DOUBLE) AS dbi FROM mx)
       |SELECT s.cid, m.n AS size,
       |  floor(s.s * 1000000 + 0.5) / 1000000 AS scatter,
       |  floor(m.rmax * 1000000 + 0.5) / 1000000 AS r_max,
       |  floor(db.dbi * 1000000 + 0.5) / 1000000 AS db_index
       |FROM si s JOIN mx m ON m.cid = s.cid CROSS JOIN db
       |ORDER BY s.cid""".stripMargin) { (s, d) =>
    val (a3, c3f, cleanup) = lloyd(s, d)
    val sx = a3
      .select(col("cid"), expr("aggregate(xi, 0L, (a, x) -> a + x * x)")
        .as("xx"))
      .groupBy("cid").agg(sum("xx").as("sxx"))
    // `si` is consumed THREE times (both sides of the 8x8 grid + the
    // final projection) and `mx` twice; each reference re-executed the
    // whole assign+aggregate subtree because the rank-free kmeans path
    // is RDD-backed and exchange reuse cannot dedupe it (the
    // q79_mad_outliers finding; the r13-opt plan dump showed the
    // two-Exchange aggregation FIVE times). Both relations are k = 8
    // rows, so the established bounded-driver-traffic materialization
    // collapses the query to exactly ONE assignment pass. Measured
    // 2.64s -> ~1.2s at sf0.1; results bit-identical (same rows,
    // collected and re-emitted).
    import scala.jdk.CollectionConverters._
    def tiny(df: DataFrame): DataFrame = {
      val rows = df.collect().toSeq // k = 8 rows, k-bounded
      s.createDataFrame(rows.asJava, df.schema)
    }
    val si = tiny(c3f().join(sx, "cid")
      .withColumn("md", expr("transform(cs, v -> CAST(v AS DOUBLE) " +
        "/ CAST(cn AS DOUBLE) / 1048576.0D)"))
      .withColumn("s", sqrt((col("sxx").cast("double")
        - expr("aggregate(sequence(1, 64), 0D, (a, i) -> " +
          "a + CAST(cs[i - 1] AS DOUBLE) * cs[i - 1] / cn)"))
        / col("cn")) / 1048576.0)
      .select("cid", "cn", "md", "s"))
    val a = si.select(col("cid").as("ci"), col("cn"), col("md").as("mda"),
      col("s").as("sa"))
    val b = si.select(col("cid").as("cj"), col("md").as("mdb"),
      col("s").as("sb"))
    val mx = tiny(a.join(broadcast(b), col("ci") =!= col("cj")) // 8x8 grid
      .withColumn("dij", sqrt(expr("aggregate(sequence(1, 64), 0D, " +
        "(a, i) -> a + (mda[i - 1] - mdb[i - 1]) " +
        "* (mda[i - 1] - mdb[i - 1]))")))
      .groupBy(col("ci").as("cid"))
      .agg(first("cn").as("n"),
        max((col("sa") + col("sb")) / col("dij")).as("rmax")))
    val db = mx.agg((expr("aggregate(transform(array_sort(" +
      "collect_list(struct(cid, rmax))), t -> t.rmax), 0D, (a, x) -> a + x)")
      / count(lit(1)).cast("double")).as("dbi"))
    val out = si.join(mx, "cid")
      .crossJoin(broadcast(db)) // 1-row index
      .select(col("cid"), col("n").as("size"),
        (floor(col("s") * 1000000 + lit(0.5)) / 1000000).as("scatter"),
        (floor(col("rmax") * 1000000 + lit(0.5)) / 1000000).as("r_max"),
        (floor(col("dbi") * 1000000 + lit(0.5)) / 1000000).as("db_index"))
      .orderBy("cid")
    cleanup()
    out
  }

  /** KMV set-operation estimation across two sources (the theta-sketch
    * protocol over kmv_distinct's bottom-k machinery): sketch each
    * source's vocabulary with its bottom-256 permuted hashes, form the
    * union sketch (bottom-256 of the merged candidate set, threshold
    * θ = its kth min), estimate |A∪B| ≈ 255·M/θ and |A∩B| ≈
    * (common-below-θ / k)·est_union — the join-cardinality /
    * overlap-planning estimate every pre-join decision at 100 TB wants
    * WITHOUT scanning either side fully. Both estimates are probed
    * against the exact answers (on the hash domain, isolating sketch
    * error from collision noise) with measured relative errors, so an
    * estimator regression fails the gate loudly. Degenerate SFs are
    * exact by construction: when the merged candidate set fits in k,
    * the sketch IS the set and both errors pin to 0. Plan: two
    * distinct-projections + three k-row TakeOrdereds; only 256-row
    * relations ever reach the driver. */
  val kmvSetOps: Q = Q(
    "kmv_set_ops",
    """WITH docs2 AS (SELECT doc_id % 2 AS src, text FROM documents),
      |tok AS (SELECT DISTINCT src, unnest(string_split(text, ' ')) AS w
      |        FROM docs2),
      |tw AS (SELECT src, w FROM tok WHERE w <> ''),
      |hv AS (SELECT DISTINCT src,
      |    ((list_sum(list_transform(
      |        range(0, CAST(least(length(w), 8) AS BIGINT)),
      |        j -> ascii(substring(w, CAST(j + 1 AS INTEGER), 1))
      |             * CAST(pow(31, j) AS BIGINT))) % 1000003)
      |     * 2654435761) % 1000003 AS v
      |  FROM tw),
      |ka AS (SELECT v FROM hv WHERE src = 0 ORDER BY v LIMIT 256),
      |kb AS (SELECT v FROM hv WHERE src = 1 ORDER BY v LIMIT 256),
      |ku AS (SELECT DISTINCT v FROM
      |        (SELECT v FROM ka UNION ALL SELECT v FROM kb)
      |       ORDER BY v LIMIT 256),
      |th AS (SELECT CAST(max(v) AS BIGINT) AS theta,
      |       CAST(count(*) AS BIGINT) AS k_used FROM ku),
      |cm AS (SELECT CAST(count(*) AS BIGINT) AS k_common FROM ku
      |       WHERE v IN (SELECT v FROM ka) AND v IN (SELECT v FROM kb)),
      |eu AS (SELECT k_used, theta,
      |    CASE WHEN k_used < 256 THEN k_used
      |         ELSE CAST(floor(255.0 * 1000003 / theta + 0.5) AS BIGINT)
      |    END AS est_union
      |  FROM th),
      |ex AS (SELECT
      |    (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM hv) AS exact_union,
      |    (SELECT CAST(count(*) AS BIGINT) FROM
      |      (SELECT v FROM hv WHERE src = 0
      |       INTERSECT SELECT v FROM hv WHERE src = 1)) AS exact_inter)
      |SELECT k_used, theta, est_union, k_common,
      |  CAST(floor(CAST(k_common AS DOUBLE) / k_used * est_union + 0.5)
      |    AS BIGINT) AS est_inter,
      |  exact_union, exact_inter,
      |  CASE WHEN exact_union = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE floor(abs(CAST(est_union - exact_union AS DOUBLE))
      |      / exact_union * 1000000 + 0.5) / 1000000 END AS err_union,
      |  CASE WHEN exact_inter = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE floor(abs(CAST(floor(CAST(k_common AS DOUBLE) / k_used
      |        * est_union + 0.5) - exact_inter AS DOUBLE)) / exact_inter
      |      * 1000000 + 0.5) / 1000000 END AS err_inter
      |FROM eu CROSS JOIN cm CROSS JOIN ex""".stripMargin) { (s, d) =>
    val polyHash =
      "((aggregate(transform(sequence(0, least(length(w), 8) - 1), " +
        "j -> ascii(substring(w, j + 1, 1)) * CAST(pow(31, j) AS BIGINT)), " +
        "0L, (a, x) -> a + x) % 1000003) * 2654435761) % 1000003"
    val hv = Tables.documents(s, d)
      .select((col("doc_id") % 2).as("src"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("src"), expr(polyHash).as("v")).distinct()
    val ka = hv.filter(col("src") === 0).select("v").orderBy("v").limit(256)
    val kb = hv.filter(col("src") === 1).select("v").orderBy("v").limit(256)
    val ku = ka.unionAll(kb).distinct().orderBy("v").limit(256)
    val th = ku.agg(max("v").as("theta"), count(lit(1)).as("k_used"))
    val cm = ku.join(ka.withColumnRenamed("v", "va"),
        col("v") === col("va"), "left_semi")
      .join(kb.withColumnRenamed("v", "vb"), col("v") === col("vb"),
        "left_semi")
      .agg(count(lit(1)).as("k_common"))
    val eu = th.select(col("k_used"), col("theta"),
      when(col("k_used") < 256, col("k_used"))
        .otherwise(floor(lit(255.0) * 1000003 / col("theta") + lit(0.5))
          .cast("long")).as("est_union"))
    val exU = hv.agg(countDistinct("v").as("exact_union"))
    val exI = hv.filter(col("src") === 0).select("v")
      .intersect(hv.filter(col("src") === 1).select("v"))
      .agg(count(lit(1)).as("exact_inter"))
    val estInter = floor(col("k_common").cast("double") / col("k_used")
      * col("est_union") + lit(0.5)).cast("long")
    eu.crossJoin(broadcast(cm)).crossJoin(broadcast(exU))
      .crossJoin(broadcast(exI)) // 1-row sketch x 1-row exact report
      .select(col("k_used"), col("theta"), col("est_union"), col("k_common"),
        estInter.as("est_inter"), col("exact_union"), col("exact_inter"),
        // zero-denominator guard (r10 advisor): a corpus whose two
        // doc_id halves share no hashed token has exact_inter = 0 and
        // a degenerate one exact_union = 0 — both error ratios pin to
        // 0 instead of NaN/Inf (cross-engine NaN never matches)
        when(col("exact_union") === 0, lit(0.0))
          .otherwise(floor(abs((col("est_union") - col("exact_union"))
            .cast("double")) / col("exact_union") * 1000000 + lit(0.5))
            / 1000000).as("err_union"),
        when(col("exact_inter") === 0, lit(0.0))
          .otherwise(floor(abs((estInter - col("exact_inter"))
            .cast("double")) / col("exact_inter") * 1000000 + lit(0.5))
            / 1000000).as("err_inter"))
  }

  val all: Seq[Q] = Seq(kmeansEmbed, clusterTopics, oovRate, cmsFreq, rpReduce,
    embedDimProfile, bestSplit, semDedup, amsF2, pcaPower, kmvDistinct,
    kmvSetOps, knnClassify, rocchioClassify, f1Report, treeDepth2, ransacFit,
    daviesBouldin)
}
