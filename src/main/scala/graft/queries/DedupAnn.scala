package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ann.{AnnIvf, AnnLsh, ProductQuantizer}
import graft.dedup.{CosineDedup, MinHashLSH, SimHash}

/** Declared queries for the probabilistic dedup / ANN operators.
  *
  * minhash_dedup_pairs and minhash_keepfirst ARE oracle-checked: the
  * LSH verify step computes EXACT shingle Jaccard, so the output equals
  * the exact ≥-threshold pair set as long as banding recalls every true
  * pair — with the fixture's pair distribution (true pairs at J ≥ 0.9,
  * noise < 0.07; 16 bands × 4 rows) the miss probability is < 1e-7 per
  * pair. simhash_dup_pairs is oracle-checked too (portable integer
  * token hash → full DuckDB signature replica), as is
  * cosine_dedup_stats (exact post-verify → brute-force oracle). As of
  * round 5 the two ANN top-k queries are ALSO fully oracle-checked:
  * sign-LSH uses seeded ±1 hyperplanes whose literals are re-emitted
  * into the oracle SQL (bucket assignment = ordered ±v[i] sums, exact
  * in both engines), and the declared IVF query uses the seeded-medoid
  * quantizer (portable integer-hash seed choice + exact cosine
  * assignment) instead of Lloyd means, whose float accumulation order
  * no replica could reproduce. Recall of the trained Lloyd path stays
  * gated in AnnSuite.
  */
object DedupAnn {

  private val mhParams = MinHashLSH.Params(
    numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.8)

  /** Near-dup pairs via MinHash-LSH, verified with exact Jaccard. */
  val minhashPairs: Q = Q(
    "minhash_dedup_pairs",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(a.grams || b.grams)) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    MinHashLSH.dedupPairs(Tables.documents(s, d), "doc_id", "text", mhParams)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Duplicate clusters: MinHash pair edges → connected components
    * (min-label propagation; oracle = DuckDB recursive-CTE transitive
    * closure over the same exact-Jaccard edge set). Turns pairwise
    * output into the keep-one-per-cluster grouping a pipeline needs. */
  val dedupComponents: Q = Q(
    "dedup_components",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |e AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.8),
      |sym AS (SELECT id_a AS src, id_b AS dst FROM e
      |        UNION SELECT id_b, id_a FROM e),
      |reach AS (
      |  SELECT src AS node, src AS r FROM sym
      |  UNION
      |  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
      |lbl AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
      |sz AS (SELECT component, CAST(count(*) AS INTEGER) AS csize
      |       FROM lbl GROUP BY component)
      |SELECT doc_id, component, csize FROM lbl JOIN sz USING (component)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = MinHashLSH.dedupPairs(Tables.documents(s, d), "doc_id", "text", mhParams)
    val lbl = graft.dedup.ConnectedComponents.components(pairs)
      .select(col("id").as("doc_id"), col("label").as("component"))
    val sz = lbl.groupBy("component").agg(count(lit(1)).cast("int").as("csize"))
    lbl.join(sz, "component")
      .select(col("doc_id"), col("component"), col("csize"))
      .orderBy("doc_id")
  }

  /** Keep-BEST near-dedup: one survivor per duplicate cluster, chosen
    * by quality (longest text, doc_id tie-break) rather than smallest
    * id — the policy real pipelines want (keep the canonical copy, not
    * the first-crawled one). Clusters from ConnectedComponents; docs in
    * no cluster survive untouched. Oracle replays the clustering with a
    * recursive CTE and the same argmax. */
  val dedupKeepBest: Q = Q(
    "dedup_keep_best",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |e AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.8),
      |sym AS (SELECT id_a AS src, id_b AS dst FROM e
      |        UNION SELECT id_b, id_a FROM e),
      |reach AS (
      |  SELECT src AS node, src AS r FROM sym
      |  UNION
      |  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
      |lbl AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
      |dropped AS (
      |  SELECT doc_id FROM (
      |    SELECT l.doc_id,
      |      row_number() OVER (PARTITION BY l.component
      |        ORDER BY length(d.text) DESC, l.doc_id) AS rk
      |    FROM lbl l JOIN documents d USING (doc_id)) t
      |  WHERE rk > 1)
      |SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
      |FROM documents d
      |WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = MinHashLSH.dedupPairs(docs, "doc_id", "text", mhParams)
    val lbl = graft.dedup.ConnectedComponents.components(pairs)
      .select(col("id").as("doc_id"), col("label").as("component"))
    // argmax per cluster: longest text wins, smallest doc_id on ties
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(length(col("text")).desc, col("doc_id").asc)
    val dropped = lbl.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select("doc_id")
    docs.join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), length(col("text")).as("n_chars"))
      .orderBy("doc_id")
  }

  /** Keep-first near-dedup: corpus size before/after — the end-to-end
    * dedup operator a pipeline would run. */
  val minhashKeepFirst: Q = Q(
    "minhash_keepfirst",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |dups AS (
      |  SELECT DISTINCT b.doc_id AS drop_id
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.8)
      |SELECT count(*) AS n_docs,
      |  count(*) - (SELECT count(*) FROM dups) AS n_kept
      |FROM documents""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val kept = MinHashLSH.dedupKeepFirst(docs, "doc_id", "text", mhParams)
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
  }

  /** SimHash near-dup pairs at Hamming ≤ 3 of 64 bits — the standard
    * web-dedup threshold (Manku/Jain/Sarma WWW'07), giving 4 16-bit
    * pigeonhole chunks (exhaustive, selective buckets). Fully
    * oracle-checked: the token hash is pure BIGINT-safe integer math
    * (graft.functions.SimHash64.tokenHash), so the oracle replays the
    * entire 64-bit signature and Hamming join in DuckDB SQL — the
    * pigeonhole candidate join is exhaustive, so bucketing vs the
    * oracle's all-pairs scan cannot diverge. Planted-duplicate recall
    * stays gated in DedupSuite; higher maxDist remains available
    * (maxDist+1 chunks). Bit 63 is packed via the two's-complement
    * constant because `1::BIGINT << 63` overflows in DuckDB. */
  val simhashPairs: Q = Q(
    "simhash_dup_pairs",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |th0 AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(7 AS BIGINT), cps),
      |      (ph, cp) -> (ph * 31 + cp) % 2147483647) AS h1,
      |    list_reduce(list_prepend(CAST(11 AS BIGINT), cps),
      |      (ph, cp) -> (ph * 131 + cp) % 2147483647) AS h2
      |  FROM (SELECT doc_id, list_transform(range(1, length(tok) + 1),
      |          i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT)) AS cps
      |        FROM toks)),
      |th1 AS (SELECT doc_id, h1, h2,
      |    (h1 * 2654435761 + h2) % 2147483647 AS x0,
      |    (h2 * 2246822519 + h1) % 2147483647 AS y0 FROM th0),
      |th2 AS (SELECT doc_id, h1, h2,
      |    (x0 * x0 + h1) % 2147483647 AS x1,
      |    (y0 * y0 + h2) % 2147483647 AS y1 FROM th1),
      |th3 AS (SELECT doc_id,
      |    (x1 * x1 + h2) % 2147483647 AS x,
      |    (y1 * y1 + h1) % 2147483647 AS y FROM th2),
      |th AS (SELECT doc_id, x, y,
      |    (((x * 65599 + y) % 2147483647) * ((x * 65599 + y) % 2147483647)
      |      + x) % 2147483647 AS z FROM th3),
      |bits AS (
      |  SELECT doc_id, b.bit,
      |    SUM(CASE WHEN (CASE WHEN b.bit < 31 THEN x >> b.bit
      |                        WHEN b.bit < 62 THEN y >> (b.bit - 31)
      |                        ELSE z >> (b.bit - 62) END) & 1 = 1
      |             THEN 1 ELSE -1 END) AS c
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
      |  GROUP BY doc_id, b.bit),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN c > 0 THEN
      |        CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |             ELSE CAST(CAST(1 AS BIGINT) << CAST(bit AS INT) AS HUGEINT) END
      |      ELSE 0 END) AS BIGINT) AS sh
      |  FROM bits GROUP BY doc_id)
      |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
      |  CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS dist
      |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
      |WHERE bit_count(xor(x.sh, y.sh)) <= 3
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    SimHash.dedupPairs(Tables.documents(s, d), "doc_id", "text", maxDist = 3)
      .orderBy("id_a", "id_b")
  }

  /** VALUES rows `(t, b, plane)` for the seeded ±1 LSH hyperplanes —
    * the exact literals the Spark plan hashes with, re-emitted for the
    * DuckDB oracle so both engines bucket identically. */
  private def planeValuesSql: String =
    AnnLsh.hyperplanes(AnnLsh.Params()).zipWithIndex.flatMap {
      case (tbl, t) => tbl.zipWithIndex.map { case (plane, b) =>
        plane.map(x => if (x > 0) "1" else "-1")
          .mkString(s"($t, $b, CAST([", ",", "] AS DOUBLE[]))")
      }
    }.mkString(",\n")

  /** LSH-bucketed approximate top-5 cosine neighbours for 5 query
    * vectors — the sub-linear variant of cosine_topk. Fully
    * oracle-checked: ±1 hyperplanes make each bucket bit the sign of
    * an ordered ±v[i] sum (bit-exact in any engine that folds the
    * array in index order), so the oracle replays bucketing, candidate
    * join, and rounded-cosine rerank verbatim. Recall stays gated in
    * AnnSuite. */
  val annTopK: Q = Q(
    "ann_cosine_topk",
    s"""WITH planes(t, b, p) AS (VALUES
      |${planeValuesSql}),
      |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      |      FROM embeddings WHERE vec_id < 5),
      |csig AS (
      |  SELECT id, t, SUM(CASE WHEN list_dot_product(v, p) > 0
      |    THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS bucket
      |  FROM c CROSS JOIN planes GROUP BY id, t),
      |qsig AS (
      |  SELECT qid, t, SUM(CASE WHEN list_dot_product(qv, p) > 0
      |    THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS bucket
      |  FROM q CROSS JOIN planes GROUP BY qid, t),
      |cand AS (
      |  SELECT DISTINCT qs.qid, cs.id
      |  FROM qsig qs JOIN csig cs ON qs.t = cs.t AND qs.bucket = cs.bucket
      |  WHERE cs.id <> qs.qid),
      |scored AS (
      |  SELECT cand.qid, cand.id,
      |    round(list_dot_product(q.qv, c.v)
      |      / (sqrt(list_dot_product(q.qv, q.qv))
      |         * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
      |  FROM cand JOIN c ON cand.id = c.id JOIN q ON cand.qid = q.qid)
      |SELECT qid, id, cos, rn FROM (
      |  SELECT qid, id, cos,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id)
      |      AS INTEGER) AS rn
      |  FROM scored) r
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    AnnLsh.topK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy("qid", "rn")
  }

  /** Embedding-cosine near-dedup over embeddings: pair/keep counts at
    * the 0.95 threshold. The LSH stage only generates CANDIDATES — the
    * exact-cosine verify makes the surviving pair set exact, so the
    * oracle is the brute-force all-pairs ≥ 0.95 scan (viable at the
    * oracle's sf0.01; this fixture plants no embedding dups — max
    * unrelated cosine ≈ 0.51 — and planted-duplicate recall is gated
    * in CosineDedupSuite). An LSH recall miss would fail this gate,
    * which is the right failure mode. */
  val cosineDedupStats: Q = Q(
    "cosine_dedup_stats",
    """WITH p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95),
      |n AS (SELECT count(*) AS n_vectors FROM embeddings)
      |SELECT n.n_vectors,
      |  (SELECT count(*) FROM p) AS n_dup_pairs,
      |  n.n_vectors - (SELECT count(DISTINCT id_b) FROM p) AS n_kept
      |FROM n""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    // one dedupPairs pass; kept = vectors minus distinct dropped ids
    // (identical to dedupKeepFirst's count without re-running the index)
    val pairs = CosineDedup.dedupPairs(emb, "vec_id", "embedding", 0.95)
    emb.agg(count(lit(1)).as("n_vectors"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_dup_pairs"),
        countDistinct(col("id_b")).as("n_dropped")))
      .select(col("n_vectors"), col("n_dup_pairs"),
        (col("n_vectors") - col("n_dropped")).as("n_kept"))
  }

  /** IVF approximate top-5 — the cluster-quantizer scale path beside
    * LSH, declared with the seeded-medoid coarse quantizer (AnnIvf
    * .medoids: k=8 cells, nProbe=3) so cell assignment is exact
    * replicable math. The oracle replays seed selection (portable
    * multiplicative hash, 31-bit pre-mask), argmax-cosine assignment
    * with cell-index tie-break, probe ranking, and the rounded-cosine
    * rerank. The trained Lloyd path keeps its recall gate in
    * AnnSuite. */
  val ivfTopK: Q = Q(
    "ivf_cosine_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CAST(vec_id AS BIGINT) * 2654435761) & 2147483647 AS h
      |  FROM embeddings),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS j,
      |         v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 8) s0),
      |casn AS (
      |  SELECT id, cell FROM (
      |    SELECT e.vec_id AS id, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN seeds s) t
      |  WHERE rk = 1),
      |qprobe AS (
      |  SELECT qid, cell FROM (
      |    SELECT e.vec_id AS qid, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN seeds s WHERE e.vec_id < 5) t
      |  WHERE rk <= 3),
      |cand AS (
      |  SELECT DISTINCT qp.qid, ca.id
      |  FROM qprobe qp JOIN casn ca USING (cell)
      |  WHERE ca.id <> qp.qid),
      |scored AS (
      |  SELECT cand.qid, cand.id,
      |    round(list_dot_product(qe.v, ce.v)
      |      / (sqrt(list_dot_product(qe.v, qe.v))
      |         * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
      |  FROM cand JOIN e ce ON cand.id = ce.vec_id
      |            JOIN e qe ON cand.qid = qe.vec_id)
      |SELECT qid, id, cos, rn FROM (
      |  SELECT qid, id, cos,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id)
      |      AS INTEGER) AS rn
      |  FROM scored) r
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val cents = AnnIvf.medoids(emb, "vec_id", "embedding", k = 8)
    AnnIvf.topKWith(cents, emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 5, nProbe = 3)
      .orderBy("qid", "rn")
  }

  /** Product quantization: 64-dim embeddings → 8 sub-codes from
    * 16-codeword seeded-medoid codebooks (32× compression; the memory
    * format a 100 TB re-rank table actually stores). Fully
    * oracle-checked: the oracle replays seed selection (portable
    * multiplicative hash), the ordered squared-L2 fold per (vector,
    * subspace, codeword), and the argmin with code tie-break. Codes
    * emitted as a comma-joined string so the compare is
    * representation-stable. Assignment is map-only — codebooks ride as
    * literals; no shuffle. */
  val pqEncode: Q = Q(
    "pq_encode",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CAST(vec_id AS BIGINT) * 2654435761) & 2147483647 AS h
      |  FROM embeddings WHERE len(embedding) = 64),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS j,
      |         v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 16) s0),
      |sub AS (
      |  SELECT e.vec_id AS id, sp.s AS sp, seeds.j AS code,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (e.v[CAST(sp.s*8 + i AS INT)] - seeds.sv[CAST(sp.s*8 + i AS INT)])
      |         * (e.v[CAST(sp.s*8 + i AS INT)] - seeds.sv[CAST(sp.s*8 + i AS INT)])))
      |      AS dist
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sp CROSS JOIN seeds),
      |asn AS (SELECT id, sp, code FROM (
      |    SELECT id, sp, code,
      |      row_number() OVER (PARTITION BY id, sp ORDER BY dist, code) AS rk
      |    FROM sub) t WHERE rk = 1)
      |SELECT id AS vec_id,
      |  array_to_string(list(code ORDER BY sp), ',') AS code_str
      |FROM asn GROUP BY id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val emb64 = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64)
    val books = ProductQuantizer.codebooks(emb64, "vec_id", "embedding",
      m = 8, k = 16)
    ProductQuantizer.encode(emb64, "vec_id", "embedding", books)
      .select(col("id").as("vec_id"), col("code_str"))
      .orderBy("vec_id")
  }

  /** PQ asymmetric-distance top-5 — the search half of product
    * quantization (pq_encode is the build half): each query's
    * approximate squared-L2 to a corpus row is the sum of per-subspace
    * squared distances to that row's ASSIGNED CODEWORDS, never the raw
    * corpus vector — the scan a 100 TB re-rank actually runs (codes
    * are 8 bytes/row; full vectors stay cold). 5 query vectors
    * broadcast against the code table (bounded-by-design nested loop,
    * same shape as cosine_topk); native PqAdc expression per pair. The
    * oracle replays seed selection, code assignment, and the ordered
    * two-level distance fold (in-order list_sum of in-order subspace
    * list_sums). Recall vs exact L2 is gated in PqSuite. */
  val pqAdcTopK: Q = Q(
    "pq_adc_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CAST(vec_id AS BIGINT) * 2654435761) & 2147483647 AS h
      |  FROM embeddings WHERE len(embedding) = 64),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS j,
      |         v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 16) s0),
      |sub AS (
      |  SELECT e.vec_id AS id, sp.s AS sp, seeds.j AS code,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (e.v[CAST(sp.s*8 + i AS INT)] - seeds.sv[CAST(sp.s*8 + i AS INT)])
      |         * (e.v[CAST(sp.s*8 + i AS INT)] - seeds.sv[CAST(sp.s*8 + i AS INT)])))
      |      AS dist
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sp CROSS JOIN seeds),
      |asn AS (SELECT id, sp, code FROM (
      |    SELECT id, sp, code,
      |      row_number() OVER (PARTITION BY id, sp ORDER BY dist, code) AS rk
      |    FROM sub) t WHERE rk = 1),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |qsub AS (
      |  SELECT q.qid, asn.id, asn.sp,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (q.qv[CAST(asn.sp*8 + i AS INT)] - seeds.sv[CAST(asn.sp*8 + i AS INT)])
      |         * (q.qv[CAST(asn.sp*8 + i AS INT)] - seeds.sv[CAST(asn.sp*8 + i AS INT)])))
      |      AS ds
      |  FROM q CROSS JOIN asn JOIN seeds ON seeds.j = asn.code
      |  WHERE asn.id <> q.qid),
      |scored AS (
      |  SELECT qid, id, list_sum(list(ds ORDER BY sp)) AS dist_exact
      |  FROM qsub GROUP BY qid, id)
      |SELECT qid, id, round(dist_exact, 6) AS dist, rn FROM (
      |  SELECT qid, id, dist_exact,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist_exact, id)
      |      AS INTEGER) AS rn
      |  FROM scored) r
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val emb64 = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64)
    val books = ProductQuantizer.codebooks(emb64, "vec_id", "embedding",
      m = 8, k = 16)
    val codes = ProductQuantizer.encode(emb64, "vec_id", "embedding", books)
      .select(col("id"), col("codes"))
    val queries = emb64.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dist_exact").asc, col("id").asc)
    codes.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .withColumn("dist_exact",
        ProductQuantizer.adcCol(col("qv"), col("codes"), books))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("id"),
        round(col("dist_exact"), 6).as("dist"), col("rn"))
      .orderBy("qid", "rn")
  }

  /** IVF + PQ — the production ANN composition at 100 TB: the coarse
    * quantizer prunes the corpus to nProbe cells (partition-pruned
    * scans once the index is stored partitioned by cell), and the scan
    * inside a cell touches only 8-byte PQ codes via asymmetric
    * distance, never raw vectors. Every stage is the seeded exact math
    * already oracle-checked piecewise (ivf_cosine_topk's cell
    * assignment/probing + pq_adc_topk's code assignment/ADC), replayed
    * here end-to-end in one DuckDB statement. Candidates come from an
    * equi-join on cell — no cartesian; the 5 probing queries
    * broadcast. */
  val ivfpqTopK: Q = Q(
    "ivfpq_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CAST(vec_id AS BIGINT) * 2654435761) & 2147483647 AS h
      |  FROM embeddings WHERE len(embedding) = 64),
      |cseeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS j,
      |         v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 8) s0),
      |pseeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS j,
      |         v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 16) s0),
      |casn AS (
      |  SELECT id, cell FROM (
      |    SELECT e.vec_id AS id, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN cseeds s) t
      |  WHERE rk = 1),
      |sub AS (
      |  SELECT e.vec_id AS id, sp.s AS sp, pseeds.j AS code,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (e.v[CAST(sp.s*8 + i AS INT)] - pseeds.sv[CAST(sp.s*8 + i AS INT)])
      |         * (e.v[CAST(sp.s*8 + i AS INT)] - pseeds.sv[CAST(sp.s*8 + i AS INT)])))
      |      AS dist
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sp CROSS JOIN pseeds),
      |asn AS (SELECT id, sp, code FROM (
      |    SELECT id, sp, code,
      |      row_number() OVER (PARTITION BY id, sp ORDER BY dist, code) AS rk
      |    FROM sub) t WHERE rk = 1),
      |qprobe AS (
      |  SELECT qid, cell FROM (
      |    SELECT e.vec_id AS qid, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN cseeds s WHERE e.vec_id < 5) t
      |  WHERE rk <= 3),
      |cand AS (
      |  SELECT DISTINCT qp.qid, ca.id
      |  FROM qprobe qp JOIN casn ca USING (cell)
      |  WHERE ca.id <> qp.qid),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |qsub AS (
      |  SELECT c.qid, c.id, asn.sp,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (q.qv[CAST(asn.sp*8 + i AS INT)] - pseeds.sv[CAST(asn.sp*8 + i AS INT)])
      |         * (q.qv[CAST(asn.sp*8 + i AS INT)] - pseeds.sv[CAST(asn.sp*8 + i AS INT)])))
      |      AS ds
      |  FROM cand c JOIN q ON q.qid = c.qid
      |       JOIN asn ON asn.id = c.id
      |       JOIN pseeds ON pseeds.j = asn.code),
      |scored AS (
      |  SELECT qid, id, list_sum(list(ds ORDER BY sp)) AS dist_exact
      |  FROM qsub GROUP BY qid, id)
      |SELECT qid, id, round(dist_exact, 6) AS dist, rn FROM (
      |  SELECT qid, id, dist_exact,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist_exact, id)
      |      AS INTEGER) AS rn
      |  FROM scored) r
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val emb64 = Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64)
    val cents = AnnIvf.medoids(emb64, "vec_id", "embedding", k = 8)
    val books = ProductQuantizer.codebooks(emb64, "vec_id", "embedding",
      m = 8, k = 16)
    // stored index shape: (id, cell, codes) — 8 bytes of codes per row,
    // partitionable by cell; raw vectors never enter the search join
    val corpusIdx = AnnIvf.index(emb64, "vec_id", "embedding", cents)
      .select(col("id"), col("cell"),
        ProductQuantizer.encodeCol(col("vec"), books).as("codes"))
    val queryCells = emb64.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec"))
      .withColumn("cell",
        explode(AnnIvf.probeCells(col("qvec"), cents, nProbe = 3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("dist_exact").asc, col("id").asc)
    corpusIdx.join(broadcast(queryCells), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("dist_exact",
        ProductQuantizer.adcCol(col("qvec"), col("codes"), books))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("id"),
        round(col("dist_exact"), 6).as("dist"), col("rn"))
      .orderBy("qid", "rn")
  }

  /** EXACT set-similarity self-join (all document pairs with word-bigram
    * Jaccard ≥ 0.9) via PPJoin-style prefix filtering (Chaudhuri/Ganti/
    * Kaushik 2006; Xiao et al. 2008 — public literature). MinHash-LSH
    * (minhash_dedup_pairs) answers this approximately; this operator is
    * the exact counterpart, and the naive exact plan is an all-pairs
    * O(n²) join no cluster survives. Prefix filtering makes it linear-ish:
    * order every doc's shingles by ascending global document frequency
    * (rarest first — a per-doc Window, never a global one), keep only the
    * first |T| − ⌈τ|T|⌉ + 1 as the doc's PREFIX, and equi-join docs on
    * prefix shingles — any pair with Jaccard ≥ τ provably shares a prefix
    * shingle, and prefixes are built from RARE shingles, so the candidate
    * fan-out is small even on this corpus's adversarially tiny shingle
    * universe (~1k distinct bigrams for 5k docs at sf0.1). Two more
    * PPJoin prunes run before verification: the length filter
    * (τ·|A| ≤ |B| ≤ |A|/τ) and the POSITIONAL filter — a prefix match at
    * rank i of A can lead to overlap at most |A| − i + 1, which must
    * reach α = ⌈τ(|A|+|B|)/(1+τ)⌉, the minimum intersection any τ-pair
    * needs. All arithmetic that decides membership is integer
    * (⌈9n/10⌉ = (9n+9) div 10; α = (9(na+nb)+18) div 19; threshold as
    * 10·∩ ≥ 9·∪), so engines can't disagree at the boundary. Every stage
    * is a keyed shuffle join or a per-doc window — the plan runs
    * unchanged on 10⁹ docs. */
  val setsimJoin: Q = Q(
    "setsim_join",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws
      |            FROM documents
      |            WHERE len(string_split(text, ' ')) >= 2),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)),
      |         i -> ws[i] || ' ' || ws[i+1])) AS grams FROM tk),
      |tok AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g FROM sh),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |            a.n AS na, b.n AS nb, count(*) AS c
      |          FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2, 3, 4)
      |SELECT id_a, id_b, c AS n_common,
      |  floor(CAST(c AS DOUBLE) / (na + nb - c) * 1000000 + 0.5) / 1000000
      |    AS jaccard
      |FROM inter WHERE 10 * c >= 9 * (na + nb - c)
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val ws = split(col("text"), " ")
    val grams = array_distinct(expr(
      "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))"))
    // PERSISTED: sh is read three times (token stream + both sides of
    // the verification join) and prefix twice (both sides of the
    // candidate join). Unpersisted, Catalyst's projection collapse
    // inlines the split/transform/array_distinct gram construction into
    // every consumer and re-runs it per use — measured 2× the whole
    // query. The battery harness reset() clears the cache between
    // queries (same discipline as pagerank's adjacency).
    val sh = Tables.documents(s, d)
      .filter(size(ws) >= 2)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), grams.as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tok = sh.select(col("doc_id"), size(col("grams")).as("n"),
      explode(col("grams")).as("g"))
    val dfreq = tok.groupBy("g").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val prefLen = (col("n") - floor((col("n") * 9 + 9) / 10) + 1).cast("int")
    val prefix = tok.join(dfreq, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .filter(col("rn") <= prefLen)
      .select(col("doc_id"), col("n"), col("rn"), col("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // α: the smallest |A∩B| any Jaccard-≥0.9 pair can have. A prefix hit
    // at rank rn leaves at most n − rn + 1 tokens that can still match.
    val alpha = floor(((col("na") + col("nb")) * 9 + 18) / 19)
    val cand = prefix.select(col("doc_id").as("id_a"), col("n").as("na"),
        col("rn").as("ra"), col("g"))
      .join(prefix.select(col("doc_id").as("id_b"), col("n").as("nb"),
        col("rn").as("rb"), col("g")), "g")
      .filter(col("id_a") < col("id_b")
        && col("na") * 9 <= col("nb") * 10 && col("nb") * 9 <= col("na") * 10
        && col("na") - col("ra") + 1 >= alpha
        && col("nb") - col("rb") + 1 >= alpha)
      .select("id_a", "id_b", "na", "nb").distinct()
    // Verification: join the two gram ARRAYS onto each candidate (two
    // doc-id-keyed shuffle joins) and intersect map-side — ~|cand| rows
    // cross the exchanges, not |cand| × |grams| exploded tokens (the
    // token-rejoin formulation moved 9M rows here and dominated the
    // query's cost).
    val inter = cand
      .join(sh.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
      .select(col("id_a"), col("id_b"), col("na"), col("nb"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("c"))
    inter.filter(col("c") * 10 >= (col("na") + col("nb") - col("c")) * 9)
      .select(col("id_a"), col("id_b"), col("c").as("n_common"),
        (floor(col("c").cast("double")
          / (col("na") + col("nb") - col("c")) * 1000000 + lit(0.5))
          / 1000000).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Exact duplicated-SUBSTRING detection (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * operator, public literature): for every document, count its w-token
    * rolling windows (w = 5) and how many of those windows also occur
    * elsewhere in the corpus (another position of any doc, including
    * itself). Document-level dedup (exact/MinHash) misses partially-
    * copied text — boilerplate, quoted passages, template prose — which
    * is exactly what this op surfaces; the per-doc dup-span ratio is the
    * removal signal. The suffix-array formulation of the paper is
    * replaced by the shuffle-native equivalent: explode every position's
    * w-gram, count occurrences per gram (two-phase, map-side combined),
    * keep only grams with count ≥ 2 — the DUP SET, which is tiny next to
    * the span stream (unique spans never cross the second exchange) —
    * and re-join positions against it. Per-doc span totals are computed
    * map-only (size(ws) − w + 1), so the expensive path carries
    * |positions| rows once for the count and |dup hits| rows for the
    * recount, not 2×|positions|. At 100 TB the only change is hashing
    * the w-gram to 128 bits before the exchange (collision-safe at
    * corpus scale) instead of shuffling the raw strings. */
  val dupSpans: Q = Q(
    "dup_spans",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws
      |            FROM documents),
      |sp AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS s
      |       FROM tk, unnest(range(1, len(ws) - 3)) AS t(i)
      |       WHERE len(ws) >= 5),
      |g AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
      |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
      |      FROM sp JOIN g USING (s) GROUP BY doc_id)
      |SELECT tk.doc_id, CAST(len(tk.ws) - 4 AS BIGINT) AS n_spans,
      |  CAST(coalesce(d.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
      |FROM tk LEFT JOIN d ON tk.doc_id = d.doc_id
      |WHERE len(tk.ws) >= 5
      |ORDER BY tk.doc_id""".stripMargin) { (s, d) =>
    val ws = split(col("text"), " ")
    val tk = Tables.documents(s, d)
      .filter(size(ws) >= 5)
      .select(col("doc_id"), ws.as("ws"))
    val sp = tk.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"))
      .as("s"))
    val dup = sp.groupBy("s").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("s")
    val dupPerDoc = sp.join(dup, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    tk.select(col("doc_id"), (size(col("ws")) - 4).cast("long").as("n_spans"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .orderBy("doc_id")
  }

  /** Exact duplicated-substring SPAN BOUNDARIES (Lee et al. 2022's
    * ExactSubstr at suffix-array fidelity, r10 verdict #7): per doc,
    * the maximal token intervals covered by ANY substring of length
    * ≥ w (w = 5) that occurs verbatim elsewhere in the corpus — the
    * exact removal set Lee's suffix-array pass computes, with exact
    * boundaries. No suffix array is needed for this output, by a
    * two-line equivalence the suite re-checks by brute force: token t
    * lies inside a duplicated substring of length ≥ w ⟺ some
    * duplicated w-window contains t. (⇐ a duplicated w-window IS such
    * a substring; ⇒ a duplicated substring [a, b] with b−a+1 ≥ w has
    * every w-window inside [a, b] duplicated, and some w-window
    * within an interval of length ≥ w contains t.) So the union of
    * duplicated w-windows [i, i+w−1], merged per doc, IS the
    * suffix-array answer. Plan: one gram-count shuffle (map-side
    * combined; at 100 TB hash grams to 128 bits first), the dup-hit
    * join carrying only (doc_id, i) pairs, then a DOC-PARTITIONED
    * island window for the interval merge — never a partition-less
    * window, never all-pairs. */
  val dupSpanBounds: Q = Q(
    "dup_span_bounds",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws
      |            FROM documents),
      |sp AS (SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS s
      |       FROM tk, unnest(range(1, len(ws) - 3)) AS t(i)
      |       WHERE len(ws) >= 5),
      |g AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
      |h AS (SELECT doc_id, i FROM sp JOIN g USING (s)),
      |m AS (SELECT doc_id, i,
      |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
      |      OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
      |      THEN 1 ELSE 0 END AS brk FROM h),
      |sid AS (SELECT doc_id, i, sum(brk)
      |      OVER (PARTITION BY doc_id ORDER BY i
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |  CAST(max(i) + 4 AS BIGINT) AS span_end,
      |  CAST(max(i) - min(i) + 5 AS BIGINT) AS span_tokens,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM sid GROUP BY doc_id, sid
      |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ws = split(col("text"), " ")
    val tk = Tables.documents(s, d)
      .filter(size(ws) >= 5)
      .select(col("doc_id"), ws.as("ws"))
    val sp = tk.select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))")))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("s"))
    val dup = sp.groupBy("s").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("s")
    val hits = sp.join(dup, "s").select("doc_id", "i")
    val wd = Window.partitionBy("doc_id").orderBy("i")
    val m = hits
      .withColumn("lag_i", lag(col("i"), 1).over(wd))
      .withColumn("brk",
        when(col("lag_i").isNull || col("i") - col("lag_i") > 5, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    m.groupBy("doc_id", "sid")
      .agg(min("i").cast("long").as("span_start"),
        (max("i") + 4).cast("long").as("span_end"),
        (max("i") - min("i") + 5).cast("long").as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
      .orderBy("doc_id", "span_start")
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking: greedily pick 5 of the top-20 cosine
    * candidates maximizing 0.7·relevance − 0.3·max-similarity-to-
    * already-picked. This is the production retrieval shape: the HEAVY
    * stage (top-20 candidate generation) is the existing distributed
    * scan/top-k; the greedy loop then runs on the BOUNDED shortlist
    * (20 rows, persisted), so its 20×20 similarity matrix and five
    * 1-row argmaxes are whitelisted bounded work no matter the corpus
    * size. Determinism: relevance and pairwise sims are rounded to
    * 1e-6 BEFORE the greedy arithmetic, so both engines compare
    * identical doubles; ties break by vec_id. The oracle replays the
    * greedy selection as a recursive CTE carrying the picked-id list. */
  val mmrRerank: Q = Q(
    "q95_mmr_rerank",
    """WITH RECURSIVE
      |c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
      |rel AS (SELECT id, round(list_dot_product(qv, v)
      |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS rel
      |        FROM c, q WHERE id <> 0
      |        ORDER BY rel DESC, id LIMIT 20),
      |sim AS (SELECT a.id AS ia, b.id AS ib,
      |          round(list_dot_product(ca.v, cb.v)
      |            / (sqrt(list_dot_product(ca.v, ca.v)) * sqrt(list_dot_product(cb.v, cb.v))), 6) AS sim
      |        FROM rel a JOIN rel b ON a.id <> b.id
      |        JOIN c ca ON ca.id = a.id JOIN c cb ON cb.id = b.id),
      |pick(rank, ids) AS (
      |  SELECT 1, [id] FROM (SELECT id FROM rel ORDER BY rel DESC, id LIMIT 1)
      |  UNION ALL
      |  SELECT rank + 1, list_append(ids, (
      |      SELECT r.id FROM rel r WHERE NOT list_contains(pick.ids, r.id)
      |      ORDER BY 0.7 * r.rel - 0.3 * (SELECT max(s.sim) FROM sim s
      |          WHERE s.ia = r.id AND list_contains(pick.ids, s.ib)) DESC, r.id
      |      LIMIT 1))
      |  FROM pick WHERE rank < 5)
      |SELECT CAST(t.i AS INT) AS rank, ids[CAST(t.i AS INT)] AS vec_id,
      |  (SELECT rel FROM rel WHERE rel.id = ids[CAST(t.i AS INT)]) AS rel
      |FROM (SELECT ids FROM pick WHERE rank = 5), range(1, 6) t(i)
      |ORDER BY rank""".stripMargin) { (s, d) =>
    val c = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val qv = c.filter(col("id") === 0).select(col("v").as("qv"))
    val rel = c.filter(col("id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("id"), round(VectorOps.cosine(col("qv"), col("v")), 6).as("rel"),
        col("v"))
      .orderBy(col("rel").desc, col("id")).limit(20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val relOnly = rel.select("id", "rel")
    val sim = rel.as("a").join(rel.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        round(VectorOps.cosine(col("a.v"), col("b.v")), 6).as("sim"))
    // Greedy loop following the bpe_train_rounds precedent: k=5
    // single-row argmaxes over the persisted 20-row shortlist are the
    // ONLY driver traffic (a lazy union-of-limit(1) tree re-executes
    // the candidate DAG ~2^k times; measured 6.4s vs 0.4s at sf0.1).
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val first = relOnly.orderBy(col("rel").desc, col("id")).limit(1).head()
    picked += ((1, first.getLong(0), first.getDouble(1)))
    for (r <- 2 to 5) {
      val selIds: Seq[Any] = picked.toSeq.map(_._2)
      val maxsim = sim.filter(col("ib").isin(selIds: _*))
        .groupBy(col("ia")).agg(max("sim").as("msim"))
      val next = relOnly.filter(!col("id").isin(selIds: _*))
        .join(maxsim, col("id") === col("ia"))
        .select(col("id"), col("rel"),
          (lit(0.7) * col("rel") - lit(0.3) * col("msim")).as("mmr"))
        .orderBy(col("mmr").desc, col("id")).limit(1).head()
      picked += ((r, next.getLong(0), next.getDouble(1)))
    }
    import s.implicits._
    picked.toSeq.toDF("rank", "vec_id", "rel").orderBy("rank")
  }

  /** Golden-record survivorship — the MDM step after clustering: for
    * each duplicate cluster (the SAME MinHash→CC composition
    * dedup_components pins), build the canonical record with field-
    * level survivorship rules, each deterministic: representative doc
    * = longest text (doc_id tie-break), lang = modal value (count
    * desc, lang asc), n_chars = max, provenance = distinct source
    * count. Per-cluster argmaxes are struct-min aggregates (map-side
    * partial, one row per cluster crosses the exchange), never a
    * window over the whole corpus. Top-15 clusters by size. */
  val goldenRecord: Q = Q(
    "golden_record",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |e AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.8),
      |sym AS (SELECT id_a AS src, id_b AS dst FROM e
      |        UNION SELECT id_b, id_a FROM e),
      |reach AS (
      |  SELECT src AS node, src AS r FROM sym
      |  UNION
      |  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
      |lbl AS (SELECT node AS doc_id, min(r) AS component FROM reach
      |        GROUP BY node),
      |m AS (SELECT lbl.component, d.doc_id, d.lang, d.source, d.n_chars,
      |        length(d.text) AS tlen
      |      FROM lbl JOIN documents d ON d.doc_id = lbl.doc_id),
      |rep AS (SELECT component, doc_id AS golden_doc, tlen AS golden_len
      |  FROM (SELECT component, doc_id, tlen,
      |      row_number() OVER (PARTITION BY component
      |        ORDER BY tlen DESC, doc_id) AS rn FROM m) WHERE rn = 1),
      |lm AS (SELECT component, lang AS mode_lang
      |  FROM (SELECT component, lang, count(*) AS c,
      |      row_number() OVER (PARTITION BY component
      |        ORDER BY count(*) DESC, lang) AS rn
      |    FROM m GROUP BY component, lang) WHERE rn = 1),
      |st AS (SELECT component, CAST(count(*) AS BIGINT) AS csize,
      |    CAST(min(doc_id) AS BIGINT) AS canonical_id,
      |    CAST(max(n_chars) AS BIGINT) AS max_chars,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |  FROM m GROUP BY component)
      |SELECT st.component, csize, canonical_id, golden_doc,
      |  CAST(golden_len AS BIGINT) AS golden_len, mode_lang, max_chars,
      |  n_sources
      |FROM st JOIN rep ON rep.component = st.component
      |JOIN lm ON lm.component = st.component
      |ORDER BY csize DESC, st.component LIMIT 15""".stripMargin) { (s, d) =>
    val pairs = MinHashLSH.dedupPairs(
      Tables.documents(s, d), "doc_id", "text", mhParams)
    val lbl = graft.dedup.ConnectedComponents.components(pairs)
      .select(col("id").as("mid"), col("label").as("component"))
    val m = Tables.documents(s, d)
      .join(lbl, col("doc_id") === col("mid"))
      .select(col("component"), col("doc_id"), col("lang"), col("source"),
        col("n_chars"), length(col("text")).cast("long").as("tlen"))
    val rep = m
      .select(col("component"),
        struct((-col("tlen")).as("nl"), col("doc_id"), col("tlen")).as("sc"))
      .groupBy("component").agg(min("sc").as("r"))
      .select(col("component").as("rc"), col("r.doc_id").as("golden_doc"),
        col("r.tlen").as("golden_len"))
    val lm = m.groupBy("component", "lang").agg(count(lit(1)).as("c"))
      .select(col("component"),
        struct((-col("c")).as("nc"), col("lang")).as("sc"))
      .groupBy("component").agg(min("sc").as("r"))
      .select(col("component").as("lc"), col("r.lang").as("mode_lang"))
    val st = m.groupBy("component")
      .agg(count(lit(1)).as("csize"), min("doc_id").as("canonical_id"),
        max("n_chars").as("max_chars"),
        countDistinct("source").as("n_sources"))
    st.join(rep, col("component") === col("rc"))
      .join(lm, col("component") === col("lc"))
      .select(col("component"), col("csize"), col("canonical_id"),
        col("golden_doc"), col("golden_len"), col("mode_lang"),
        col("max_chars"), col("n_sources"))
      .orderBy(col("csize").desc, col("component")).limit(15)
  }

  /** B-cubed clustering evaluation (Bagga & Baldwin 1998) of a LOOSE
    * dedup threshold against the gold one — the metric that answers
    * "if I cut the near-dup threshold from 0.8 to 0.02 Jaccard, how
    * much do I over-merge?" per DOCUMENT (B³ weights by item, so one
    * giant wrong cluster is penalized in proportion to its size,
    * unlike pair-F1). Both clusterings run on the ≤80-doc audit slice
    * (bounded, like ngram_jaccard_pairs); thresholds compare as EXACT
    * integer cross-products (inter·50 ≥ union ⟺ J ≥ 0.02; inter·5 ≥
    * union·4 ⟺ J ≥ 0.8) so no double ever decides an edge; labels
    * come from the shared ConnectedComponents fixpoint; and the B³
    * sums Σ m²/n_cluster fold (sys, gold)-sorted so both engines add
    * identical doubles in identical order. */
  val bcubedEval: Q = Q(
    "bcubed_eval",
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t
      |  WHERE doc_id < 80),
      |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS i,
      |    CAST(len(list_distinct(a.grams || b.grams)) AS BIGINT) AS u
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |se AS (SELECT id_a, id_b FROM pr WHERE i * 50 >= u),
      |ge AS (SELECT id_a, id_b FROM pr WHERE i * 5 >= u * 4),
      |ssym AS (SELECT id_a AS src, id_b AS dst FROM se
      |         UNION SELECT id_b, id_a FROM se),
      |sreach AS (SELECT src AS node, src AS r FROM ssym
      |  UNION SELECT sreach.node, ssym.dst
      |  FROM sreach JOIN ssym ON sreach.r = ssym.src),
      |slbl AS (SELECT node AS doc_id, min(r) AS sc FROM sreach
      |         GROUP BY node),
      |gsym AS (SELECT id_a AS src, id_b AS dst FROM ge
      |         UNION SELECT id_b, id_a FROM ge),
      |greach AS (SELECT src AS node, src AS r FROM gsym
      |  UNION SELECT greach.node, gsym.dst
      |  FROM greach JOIN gsym ON greach.r = gsym.src),
      |glbl AS (SELECT node AS doc_id, min(r) AS gc FROM greach
      |         GROUP BY node),
      |t AS (SELECT sh.doc_id, COALESCE(slbl.sc, sh.doc_id) AS sc,
      |    COALESCE(glbl.gc, sh.doc_id) AS gc
      |  FROM sh LEFT JOIN slbl ON slbl.doc_id = sh.doc_id
      |  LEFT JOIN glbl ON glbl.doc_id = sh.doc_id),
      |cells AS (SELECT sc, gc, CAST(count(*) AS BIGINT) AS m
      |          FROM t GROUP BY 1, 2),
      |nsc AS (SELECT sc, CAST(sum(m) AS BIGINT) AS ns FROM cells
      |        GROUP BY sc),
      |ngc AS (SELECT gc, CAST(sum(m) AS BIGINT) AS ng FROM cells
      |        GROUP BY gc),
      |one AS (SELECT CAST(sum(c.m) AS BIGINT) AS n,
      |    CAST(count(DISTINCT c.sc) AS BIGINT) AS n_sys,
      |    CAST(count(DISTINCT c.gc) AS BIGINT) AS n_gold,
      |    list(c.m ORDER BY c.sc, c.gc) AS ms,
      |    list(s.ns ORDER BY c.sc, c.gc) AS nss,
      |    list(g.ng ORDER BY c.sc, c.gc) AS ngs
      |  FROM cells c JOIN nsc s ON s.sc = c.sc
      |  JOIN ngc g ON g.gc = c.gc),
      |sums AS (SELECT n, n_sys, n_gold,
      |    list_aggregate(list_transform(range(1, len(ms) + 1),
      |      i -> CAST(ms[i] * ms[i] AS DOUBLE) / nss[i]), 'sum') AS psum,
      |    list_aggregate(list_transform(range(1, len(ms) + 1),
      |      i -> CAST(ms[i] * ms[i] AS DOUBLE) / ngs[i]), 'sum') AS rsum
      |  FROM one)
      |SELECT n AS n_docs, n_sys AS n_sys_clusters, n_gold AS n_gold_clusters,
      |  floor(psum / n * 1000000 + 0.5) / 1000000 AS b3_precision,
      |  floor(rsum / n * 1000000 + 0.5) / 1000000 AS b3_recall,
      |  floor(2 * (psum / n) * (rsum / n) / (psum / n + rsum / n)
      |    * 1000000 + 0.5) / 1000000 AS b3_f1
      |FROM sums""".stripMargin) { (s, d) =>
    val sh = Tables.documents(s, d).filter(col("doc_id") < 80)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, greatest(size(ts) - 3, 0) + 1), " +
          "i -> concat_ws(' ', ts[i - 1], ts[i], ts[i + 1])))").as("grams"))
    val a = sh.select(col("doc_id").as("id_a"), col("grams").as("ga"))
    val b = sh.select(col("doc_id").as("id_b"), col("grams").as("gb"))
    val pr = a.join(b, col("id_a") < col("id_b")) // <80-doc audit slice
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("i"),
        size(array_union(col("ga"), col("gb"))).cast("long").as("u"))
    val se = pr.filter(col("i") * 50 >= col("u")).select("id_a", "id_b")
    val ge = pr.filter(col("i") * 5 >= col("u") * 4).select("id_a", "id_b")
    val slbl = graft.dedup.ConnectedComponents.components(se)
      .select(col("id").as("doc_id"), col("label").as("sc"))
    val glbl = graft.dedup.ConnectedComponents.components(ge)
      .select(col("id").as("doc_id"), col("label").as("gc"))
    val t = sh.select("doc_id")
      .join(slbl, Seq("doc_id"), "left")
      .join(glbl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sc"), col("doc_id")).as("sc"),
        coalesce(col("gc"), col("doc_id")).as("gc"))
    val cells = t.groupBy("sc", "gc").agg(count(lit(1)).as("m"))
    val nsc = cells.groupBy("sc").agg(sum("m").as("ns"))
    val ngc = cells.groupBy("gc").agg(sum("m").as("ng"))
    val one = cells.join(nsc, "sc").join(ngc, "gc")
      .agg(sum("m").as("n"),
        countDistinct("sc").as("n_sys"), countDistinct("gc").as("n_gold"),
        expr("array_sort(collect_list(struct(sc, gc, m, ns, ng)))")
          .as("cl"))
      .withColumn("psum", expr("aggregate(cl, 0D, (a, t) -> " +
        "a + CAST(t.m * t.m AS DOUBLE) / t.ns)"))
      .withColumn("rsum", expr("aggregate(cl, 0D, (a, t) -> " +
        "a + CAST(t.m * t.m AS DOUBLE) / t.ng)"))
    one.select(col("n").as("n_docs"), col("n_sys").as("n_sys_clusters"),
      col("n_gold").as("n_gold_clusters"),
      (floor(col("psum") / col("n") * 1000000 + lit(0.5)) / 1000000)
        .as("b3_precision"),
      (floor(col("rsum") / col("n") * 1000000 + lit(0.5)) / 1000000)
        .as("b3_recall"),
      (floor(lit(2) * (col("psum") / col("n")) * (col("rsum") / col("n"))
        / (col("psum") / col("n") + col("rsum") / col("n"))
        * 1000000 + lit(0.5)) / 1000000).as("b3_f1"))
  }

  /** LSH banding planner — the parameter sweep run BEFORE committing
    * a MinHash-LSH configuration (this library's own (16, 4) included):
    * for every (bands, rows) factorization of the 64-hash signature,
    * the S-curve threshold estimate (1/b)^(1/r) and the collision
    * probability 1 − (1 − s^r)^b at similarity 0.5 and 0.8. The
    * integer-exponent powers run as EXPLICIT multiply folds (never
    * libm pow — both engines execute the identical multiplication
    * sequence); the fractional-exponent threshold goes through
    * exp(ln·)/engine-established ln parity. Pure bounded math — the
    * planner costs nothing at any scale. */
  val lshPlanner: Q = Q(
    "lsh_planner",
    """WITH grid(b, r) AS (VALUES (64, 1), (32, 2), (16, 4), (8, 8),
      |  (4, 16), (2, 32), (1, 64)),
      |p AS (SELECT b, r,
      |    exp(ln(CAST(b AS DOUBLE)) * (-1.0 / r)) AS t_est,
      |    1 - list_reduce(list_transform(range(0, b), i ->
      |      1 - list_reduce(list_transform(range(0, r),
      |        j -> CAST(0.5 AS DOUBLE)), (a, x) -> a * x)),
      |      (a, x) -> a * x) AS p05,
      |    1 - list_reduce(list_transform(range(0, b), i ->
      |      1 - list_reduce(list_transform(range(0, r),
      |        j -> CAST(0.8 AS DOUBLE)), (a, x) -> a * x)),
      |      (a, x) -> a * x) AS p08
      |  FROM grid)
      |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows,
      |  floor(t_est * 10000 + 0.5) / 10000 AS t_est,
      |  floor(p05 * 1000000 + 0.5) / 1000000 AS p_at_05,
      |  floor(p08 * 1000000 + 0.5) / 1000000 AS p_at_08
      |FROM p ORDER BY bands DESC""".stripMargin) { (s, d) =>
    def pcol(sim: String): String =
      "1.0D - aggregate(sequence(1, b), 1.0D, (a, i) -> a * " +
        s"(1.0D - aggregate(sequence(1, r), 1.0D, (a2, j) -> a2 * $sim)))"
    s.range(1)
      .select(explode(expr("array(struct(64 AS b, 1 AS r), " +
        "struct(32 AS b, 2 AS r), struct(16 AS b, 4 AS r), " +
        "struct(8 AS b, 8 AS r), struct(4 AS b, 16 AS r), " +
        "struct(2 AS b, 32 AS r), struct(1 AS b, 64 AS r))")).as("g"))
      .select(col("g.b").as("b"), col("g.r").as("r"))
      .select(col("b").cast("long").as("bands"),
        col("r").cast("long").as("rows"),
        (floor(expr("exp(ln(CAST(b AS DOUBLE)) * (-1.0D / r))")
          * 10000 + lit(0.5)) / 10000).as("t_est"),
        (floor(expr(pcol("0.5D")) * 1000000 + lit(0.5)) / 1000000)
          .as("p_at_05"),
        (floor(expr(pcol("0.8D")) * 1000000 + lit(0.5)) / 1000000)
          .as("p_at_08"))
      .orderBy(col("bands").desc)
  }

  /** Train/val/test LEAKAGE audit: near-duplicate pairs that straddle
    * split boundaries — the eval-integrity failure document-level
    * random splits cannot see (a test doc whose near-copy sits in
    * train inflates every metric). Composes the minhash_dedup_pairs
    * edge set with split_assign's deterministic hash split and counts
    * pairs per (split, split) cell; every off-diagonal row IS leakage.
    * Same oracle validity argument as minhash_dedup_pairs (exact
    * Jaccard on fixture pairs far from the 0.8 threshold). */
  lazy val splitLeakage: Q = Q(
    "split_leakage",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.8),
      |sp AS (SELECT doc_id,
      |  CASE WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 800 THEN 'train'
      |       WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM documents),
      |lab AS (SELECT least(sa.split, sb.split) AS split_a,
      |    greatest(sa.split, sb.split) AS split_b
      |  FROM pr JOIN sp sa ON sa.doc_id = pr.id_a
      |          JOIN sp sb ON sb.doc_id = pr.id_b)
      |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CASE WHEN split_a <> split_b THEN 'LEAK' ELSE 'ok' END AS verdict
      |FROM lab GROUP BY split_a, split_b
      |ORDER BY split_a, split_b""".stripMargin) { (s, d) =>
    val pairs = MinHashLSH.dedupPairs(Tables.documents(s, d), "doc_id",
      "text", mhParams).select(col("id_a"), col("id_b"))
    val r = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2246822519L)) % 1000
    val sp = Tables.documents(s, d).select(col("doc_id"),
      when(r < 800, "train").when(r < 900, "val").otherwise("test")
        .as("split"))
    pairs
      .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("verdict",
        when(col("split_a") =!= col("split_b"), "LEAK").otherwise("ok"))
      .orderBy("split_a", "split_b")
  }

  /** Perceptual IMAGE near-dup pairs — the multimodal→dedup bridge
    * (r8 verdict #4): every BMP in the corpus plus a re-encode
    * rendition of it (global +30 brightness, channel-0 salt +9 on
    * every 37th pixel — the damage profile of a re-published
    * thumbnail) is aHash-64 fingerprinted from its REAL decoded
    * planes ([[graft.dedup.PerceptualHash]]), and pairs within
    * Hamming ≤ 5 come out of the same pigeonhole chunk join as
    * simhash_dup_pairs (6 chunks ⇒ exhaustive at maxDist 5, never
    * all-pairs). aHash is exactly invariant to the affine brightness
    * part, so only salt-touched blocks can flip: planted (img, 0)–
    * (img, 1) renditions measure ≤ 5 bits apart (sf0.001/sf0.01)
    * while unrelated cross-image pairs sit ≥ 14 (sf0.01) — threshold
    * 5 splits them with a ≥ 9-bit margin. Fully oracle-checked: the fixture BMP
    * pixel is a pure formula of (doc_id, text), so DuckDB replays
    * gray planes, both renditions, all 64 block comparisons, and the
    * all-pairs Hamming scan bit-for-bit — a bug in the BMP codec
    * round-trip, the hash fold, or the banding breaks the match.
    * Plan: decode + hash are per-row expressions (payloads never
    * shuffle); only (id, hash) reaches the chunk join. */
  val phashPairs: Q = Q(
    "phash_dup_pairs",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             16 + 2*(doc_id % 8) AS w, 16 + 2*((doc_id // 8) % 8) AS h
      |           FROM documents WHERE doc_id % 3 = 0),
      |r AS (SELECT doc_id, 0 AS rend, w, h, text, len FROM d
      |      UNION ALL
      |      SELECT doc_id, 1 AS rend, w, h, text, len FROM d),
      |px AS (SELECT doc_id, rend, w, h, text, len,
      |         unnest(range(0, w*h)) AS p FROM r),
      |g AS (SELECT doc_id, rend, w, h, (p % w) AS x, (p // w) AS y,
      |        list_sum(list_transform(range(0,3), c ->
      |          unicode(substr(text, CAST((p*3 + c) % len AS INT)+1, 1))))
      |        + CASE WHEN rend = 1
      |               THEN 90 + CASE WHEN p % 37 = 0 THEN 9 ELSE 0 END
      |               ELSE 0 END AS gray
      |      FROM px),
      |blk AS (SELECT doc_id, rend, (y*8)//h AS r, (x*8)//w AS c, gray
      |        FROM g),
      |bs AS (SELECT doc_id, rend, r, c, sum(gray) AS s, count(*) AS n
      |       FROM blk GROUP BY 1,2,3,4),
      |tot AS (SELECT doc_id, rend, sum(s) AS t, sum(n) AS nn
      |        FROM bs GROUP BY 1,2),
      |bits AS (SELECT bs.doc_id, bs.rend, r*8+c AS bit,
      |           CASE WHEN bs.s * tot.nn > tot.t * bs.n THEN 1 ELSE 0 END AS b
      |         FROM bs JOIN tot USING (doc_id, rend)),
      |sig AS (SELECT doc_id, rend,
      |    CAST(SUM(CASE WHEN b = 1 THEN
      |        CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |             ELSE CAST(CAST(1 AS BIGINT) << CAST(bit AS INT) AS HUGEINT)
      |        END ELSE 0 END) AS BIGINT) AS ph
      |  FROM bits GROUP BY 1,2)
      |SELECT a.doc_id AS img_a, CAST(a.rend AS INTEGER) AS rend_a,
      |  b.doc_id AS img_b, CAST(b.rend AS INTEGER) AS rend_b,
      |  CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS dist
      |FROM sig a JOIN sig b
      |  ON (a.doc_id * 2 + a.rend) < (b.doc_id * 2 + b.rend)
      |WHERE bit_count(xor(a.ph, b.ph)) <= 5
      |ORDER BY img_a, rend_a, img_b, rend_b""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    // Modality is selected on doc_id BEFORE fabrication (id%3=0 ⇒ every
    // payload IS a bmp): a post-hoc format filter left the non-BMP rows
    // in the plan, and the banded join's derived isnotnull(chunk_key)
    // predicates — chunk_key is a function of the decode — push below a
    // commuting filter, evaluating bmpDecode on WAV bytes (throws).
    // Filtering the generator column is both the fix and cheaper: the
    // other modalities' payloads are never fabricated at all.
    val media = graft.multimodal.Multimodal
      .fabricateMedia(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text")
    val dec = media.select(col("media_id"), bmpDecode(col("payload")).as("dec"))
      .select(col("media_id"), col("dec.width").as("w"),
        col("dec.height").as("h"), col("dec.pixels").as("px"))
    // rendition 1: positive-affine brightness (+30/channel) + sparse
    // salt (+9 on channel 0 of every 37th pixel), applied in the
    // decoded plane domain — the aHash contract says the affine part
    // is distance-free and only salt blocks may flip
    val rends = dec
      .select(col("media_id"), lit(0).as("rend"), col("w"), col("h"), col("px"))
      .unionAll(dec.select(col("media_id"), lit(1).as("rend"), col("w"),
        col("h"),
        expr("transform(px, (v, j) -> v + 30 + " +
          "IF(j % 3 = 0 AND (j DIV 3) % 37 = 0, 9, 0))").as("px")))
    val sigs = rends.select(
      (col("media_id") * 2 + col("rend")).as("id"),
      graft.dedup.PerceptualHash.aHash64("px", "w", "h").as("sh"))
    graft.dedup.SimHash.bandedPairs(sigs, maxDist = 5)
      .select(expr("id_a DIV 2").as("img_a"),
        (col("id_a") % 2).cast("int").as("rend_a"),
        expr("id_b DIV 2").as("img_b"),
        (col("id_b") % 2).cast("int").as("rend_b"),
        col("dist").cast("int").as("dist"))
      .orderBy("img_a", "rend_a", "img_b", "rend_b")
  }

  /** Perceptual AUDIO near-dup pairs — the WAV half of the
    * multimodal→dedup bridge (r9 verdict #5; phash_dup_pairs closed
    * the image half): every PCM-WAV clip in the corpus plus a
    * re-encode rendition of it (gain ×2, +999 click on every 53rd
    * sample — the damage profile of a re-levelled, lightly corrupted
    * re-publication) is energy-hash-64 fingerprinted from its REAL
    * decoded samples ([[graft.dedup.PerceptualHash.energyHash64]]),
    * and pairs within Hamming ≤ 5 come out of the same pigeonhole
    * chunk join as simhash/phash (6 chunks ⇒ exhaustive at maxDist 5,
    * never all-pairs). |2s| = 2|s| makes the gain part exactly
    * distance-free, so only click-touched time blocks can flip.
    * Fully oracle-checked: the fixture sample is a pure formula of
    * (doc_id, text) — s[i] = unicode(text[i % len])·257 − 16384 — so
    * DuckDB replays both renditions, all 64 block comparisons, and
    * the all-pairs Hamming scan bit-for-bit; a bug in the WAV codec
    * round-trip, the hash fold, or the banding breaks the match.
    * Plan: decode + hash are per-row expressions (payloads never
    * shuffle); only (id, hash) reaches the chunk join. */
  val audioPairs: Q = Q(
    "audio_dup_pairs",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             200 + doc_id % 100 AS n
      |           FROM documents WHERE doc_id % 3 = 1),
      |r AS (SELECT doc_id, 0 AS rend, text, len, n FROM d
      |      UNION ALL
      |      SELECT doc_id, 1 AS rend, text, len, n FROM d),
      |sm AS (SELECT doc_id, rend, n, text, len,
      |         unnest(range(0, n)) AS i FROM r),
      |v AS (SELECT doc_id, rend, n, i,
      |        abs((unicode(substr(text, CAST(i % len AS INT) + 1, 1))
      |               * 257 - 16384)
      |            * CASE WHEN rend = 1 THEN 2 ELSE 1 END
      |            + CASE WHEN rend = 1 AND i % 53 = 0 THEN 999 ELSE 0 END)
      |          AS av
      |      FROM sm),
      |blk AS (SELECT doc_id, rend, (i * 64) // n AS b, av FROM v),
      |bs AS (SELECT doc_id, rend, b, sum(av) AS s, count(*) AS cnt
      |       FROM blk GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, rend, sum(s) AS t, sum(cnt) AS nn
      |        FROM bs GROUP BY 1, 2),
      |bits AS (SELECT bs.doc_id, bs.rend, b AS bit,
      |           CASE WHEN bs.s * tot.nn > tot.t * bs.cnt
      |                THEN 1 ELSE 0 END AS bv
      |         FROM bs JOIN tot USING (doc_id, rend)),
      |sig AS (SELECT doc_id, rend,
      |    CAST(SUM(CASE WHEN bv = 1 THEN
      |        CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |             ELSE CAST(CAST(1 AS BIGINT) << CAST(bit AS INT) AS HUGEINT)
      |        END ELSE 0 END) AS BIGINT) AS ah
      |  FROM bits GROUP BY 1, 2)
      |SELECT a.doc_id AS aud_a, CAST(a.rend AS INTEGER) AS rend_a,
      |  b.doc_id AS aud_b, CAST(b.rend AS INTEGER) AS rend_b,
      |  CAST(bit_count(xor(a.ah, b.ah)) AS INTEGER) AS dist
      |FROM sig a JOIN sig b
      |  ON (a.doc_id * 2 + a.rend) < (b.doc_id * 2 + b.rend)
      |WHERE bit_count(xor(a.ah, b.ah)) <= 5
      |ORDER BY aud_a, rend_a, aud_b, rend_b""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    // id%3=1 selected BEFORE fabrication (same reasoning as
    // phash_dup_pairs: every payload IS a wav, so a pushed-down
    // decode-derived predicate can never meet foreign bytes, and the
    // other modalities are never fabricated)
    val media = graft.multimodal.Multimodal
      .fabricateMedia(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 1),
        "doc_id", "text")
    val dec = media.select(col("media_id"),
      wavDecode(col("payload")).getField("samples").as("sm"))
    // rendition 1: positive gain (×2, exactly distance-free for the
    // energy hash) + sparse click (+999 on every 53rd sample), applied
    // in the decoded sample domain — only click-touched blocks may flip
    val rends = dec
      .select(col("media_id"), lit(0).as("rend"),
        expr("transform(sm, v -> CAST(v AS BIGINT))").as("sm"))
      .unionAll(dec.select(col("media_id"), lit(1).as("rend"),
        expr("transform(sm, (v, i) -> CAST(v AS BIGINT) * 2 + " +
          "IF(i % 53 = 0, 999, 0))").as("sm")))
    val sigs = rends.select(
      (col("media_id") * 2 + col("rend")).as("id"),
      graft.dedup.PerceptualHash.energyHash64("sm").as("sh"))
    graft.dedup.SimHash.bandedPairs(sigs, maxDist = 5)
      .select(expr("id_a DIV 2").as("aud_a"),
        (col("id_a") % 2).cast("int").as("rend_a"),
        expr("id_b DIV 2").as("aud_b"),
        (col("id_b") % 2).cast("int").as("rend_b"),
        col("dist").cast("int").as("dist"))
      .orderBy("aud_a", "rend_a", "aud_b", "rend_b")
  }

  /** Perceptual VIDEO near-dup pairs — the Y4M third of the
    * multimodal→dedup bridge, completing the image/audio/video triple:
    * every video's decoded luma frames are TEMPORALLY POOLED into one
    * per-pixel sum plane (the integer-exact form of the mean frame —
    * the classic temporally-pooled frame-hash construction), that
    * plane is aHash-64 fingerprinted through the same shared gray core
    * as phash ([[graft.dedup.PerceptualHash.aHash64Gray]]), and pairs
    * within Hamming ≤ 5 come out of the same pigeonhole chunk join.
    * Rendition 1 re-encodes every frame with a positive affine luma
    * map (y → 2y + 5; pooled plane becomes 2·pool + 5·nf — still
    * affine, so exactly distance-free) plus sparse salt (+7 on every
    * 97th pixel of frame 0 only — ≤ 3 of the 64 blocks can flip).
    * Fully oracle-checked from the fixture formula
    * (y[f·256+j] = unicode(text[(f·256+j) % len])): DuckDB replays the
    * pooling, both renditions, all 64 block comparisons, and the
    * all-pairs Hamming scan bit-for-bit. Plan: decode + pool + hash
    * are ONE per-row expression — frames never shuffle, only
    * (id, hash) reaches the banded join. */
  val videoPairs: Q = Q(
    "video_dup_pairs",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             1 + doc_id % 8 AS nf
      |           FROM documents WHERE doc_id % 3 = 2),
      |r AS (SELECT doc_id, 0 AS rend, text, len, nf FROM d
      |      UNION ALL
      |      SELECT doc_id, 1 AS rend, text, len, nf FROM d),
      |cell AS (SELECT doc_id, rend, nf, text, len,
      |           unnest(range(0, 256)) AS j FROM r),
      |pool AS (SELECT doc_id, rend, j,
      |    list_sum(list_transform(range(0, nf), f ->
      |      unicode(substr(text, CAST((f * 256 + j) % len AS INT) + 1, 1))
      |        * CASE WHEN rend = 1 THEN 2 ELSE 1 END
      |      + CASE WHEN rend = 1 THEN 5 ELSE 0 END
      |      + CASE WHEN rend = 1 AND f = 0 AND j % 97 = 0
      |             THEN 7 ELSE 0 END)) AS g
      |  FROM cell),
      |blk AS (SELECT doc_id, rend,
      |          ((j // 16) // 2) * 8 + ((j % 16) // 2) AS bit, g
      |        FROM pool),
      |bs AS (SELECT doc_id, rend, bit, sum(g) AS s, count(*) AS n
      |       FROM blk GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, rend, sum(s) AS t, sum(n) AS nn
      |        FROM bs GROUP BY 1, 2),
      |bits AS (SELECT bs.doc_id, bs.rend, bit,
      |           CASE WHEN bs.s * tot.nn > tot.t * bs.n
      |                THEN 1 ELSE 0 END AS bv
      |         FROM bs JOIN tot USING (doc_id, rend)),
      |sig AS (SELECT doc_id, rend,
      |    CAST(SUM(CASE WHEN bv = 1 THEN
      |        CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |             ELSE CAST(CAST(1 AS BIGINT) << CAST(bit AS INT) AS HUGEINT)
      |        END ELSE 0 END) AS BIGINT) AS vh
      |  FROM bits GROUP BY 1, 2)
      |SELECT a.doc_id AS vid_a, CAST(a.rend AS INTEGER) AS rend_a,
      |  b.doc_id AS vid_b, CAST(b.rend AS INTEGER) AS rend_b,
      |  CAST(bit_count(xor(a.vh, b.vh)) AS INTEGER) AS dist
      |FROM sig a JOIN sig b
      |  ON (a.doc_id * 2 + a.rend) < (b.doc_id * 2 + b.rend)
      |WHERE bit_count(xor(a.vh, b.vh)) <= 5
      |ORDER BY vid_a, rend_a, vid_b, rend_b""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    // id%3=2 selected BEFORE fabrication (the phash/audio discipline:
    // every payload IS a y4m)
    val media = graft.multimodal.Multimodal
      .fabricateMedia(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 2),
        "doc_id", "text")
    val dec = media.select(col("media_id"),
      y4mDecode(col("payload")).as("dec"))
      .select(col("media_id"), col("dec.width").as("w"),
        col("dec.height").as("h"), col("dec.frames").as("frames"))
    // rendition 1: per-frame positive affine luma map + sparse salt on
    // frame 0, applied in the decoded frame domain
    val rends = dec
      .select(col("media_id"), lit(0).as("rend"), col("w"), col("h"),
        col("frames"))
      .unionAll(dec.select(col("media_id"), lit(1).as("rend"), col("w"),
        col("h"),
        expr("""transform(frames, (fr, f) -> transform(fr, (v, j) ->
               |  v * 2 + 5 + IF(f = 0 AND j % 97 = 0, 7, 0)))"""
          .stripMargin).as("frames")))
    // temporal pooling + hash as one per-row expression: pooled[j] =
    // Σ_f frames[f][j] in BIGINT, then the shared gray aHash core
    val pooledGs =
      """aggregate(frames,
        |  array_repeat(CAST(0 AS BIGINT), CAST(w * h AS INT)),
        |  (acc, fr) -> zip_with(acc, fr, (a, b) -> a + b))""".stripMargin
    val sigs = rends.select(
      (col("media_id") * 2 + col("rend")).as("id"),
      graft.dedup.PerceptualHash.aHash64Gray(pooledGs, "w", "h").as("sh"))
    graft.dedup.SimHash.bandedPairs(sigs, maxDist = 5)
      .select(expr("id_a DIV 2").as("vid_a"),
        (col("id_a") % 2).cast("int").as("rend_a"),
        expr("id_b DIV 2").as("vid_b"),
        (col("id_b") % 2).cast("int").as("rend_b"),
        col("dist").cast("int").as("dist"))
      .orderBy("vid_a", "rend_a", "vid_b", "rend_b")
  }

  /** INCREMENTAL near-dedup (round 13): dedup a NEW BATCH against the
    * EXISTING CORPUS — the shape a production 100 TB pipeline runs
    * daily (the corpus is already deduped; only batch×corpus pairs may
    * be generated, never corpus×corpus, which would re-pay the whole
    * history every day — see [[graft.dedup.MinHashLSH.dedupPairsAgainst]]).
    * Fixture split: even doc_ids are the corpus, odd doc_ids the
    * arriving batch. Output: for every batch document that
    * near-duplicates (exact Jaccard ≥ 0.8 after LSH banding) at least
    * one corpus document, its BEST corpus match (max Jaccard, min
    * corpus_id tie-break) — exactly the "is this new doc already in
    * the corpus, and where" answer ingestion needs. The oracle replays
    * the exact cross-parity Jaccard join and the same argmax; both
    * engines compute identical doubles from identical integer set
    * sizes, so the rank is deterministic. */
  lazy val minhashIncremental: Q = Q(
    "minhash_incremental",
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ts)-3, 0) + 2),
      |    i -> array_to_string(ts[i:i+2], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t),
      |pairs AS (
      |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
      |    CAST(len(list_intersect(b.grams, c.grams)) AS DOUBLE)
      |      / len(list_distinct(b.grams || c.grams)) AS j
      |  FROM sh b JOIN sh c ON b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
      |  WHERE CAST(len(list_intersect(b.grams, c.grams)) AS DOUBLE)
      |      / len(list_distinct(b.grams || c.grams)) >= 0.8),
      |best AS (SELECT batch_id, corpus_id, j,
      |    row_number() OVER (PARTITION BY batch_id
      |      ORDER BY j DESC, corpus_id) AS rk
      |  FROM pairs)
      |SELECT batch_id, corpus_id, round(j, 6) AS jaccard
      |FROM best WHERE rk = 1 ORDER BY batch_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val pairs = graft.dedup.MinHashLSH
      .dedupPairsAgainst(corpus, batch, "doc_id", "text", mhParams)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("batch_id")
      .orderBy(col("jaccard").desc, col("corpus_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("batch_id"), col("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("batch_id")
  }

  /** INCREMENTAL embedding-space dedup (round 13) — the vector sibling
    * of [[minhashIncremental]]: a newly-arrived batch of embeddings
    * deduped against the existing corpus via the sign-LSH bucket join
    * (same seeded hyperplanes on both sides; never corpus×corpus),
    * exact-cosine verified at ≥ 0.95. The batch is the RE-CRAWL
    * scenario: every corpus vector re-appears under a new id
    * (vec_id + 1e6) with a small deterministic encoder drift (+0.01 on
    * every coordinate — worst-case angle 4.6° on the unit-norm
    * fixture, cosine ≥ 0.9968, while all cross-document cosines stay
    * ≤ ~0.53), so the op must flag EVERY batch vector and rank its
    * own source first — a recall miss or a wrong argmax fails the
    * gate, which makes this the non-vacuous embedding-dedup gate the
    * raw fixture (no near-dup pairs at any SF) cannot express. Output:
    * each batch vector's best corpus match. Both engines compute the
    * identical perturbed floats and the identical double cosine
    * (ordered dot product / norms — the ivf_cosine_topk contract). */
  lazy val cosineIncremental: Q = Q(
    "cosine_incremental",
    """WITH c AS (SELECT vec_id AS corpus_id,
      |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id + 1000000 AS batch_id,
      |    CAST(list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) + 0.01 AS FLOAT)) AS DOUBLE[]) AS v
      |  FROM embeddings),
      |cn AS (SELECT corpus_id, v, sqrt(list_dot_product(v, v)) AS nv FROM c),
      |bn AS (SELECT batch_id, v, sqrt(list_dot_product(v, v)) AS nv FROM b),
      |p AS (SELECT bn.batch_id, cn.corpus_id,
      |    list_dot_product(bn.v, cn.v) / (bn.nv * cn.nv) AS cs
      |  FROM bn, cn
      |  WHERE list_dot_product(bn.v, cn.v) / (bn.nv * cn.nv) >= 0.95),
      |best AS (SELECT batch_id, corpus_id, cs,
      |    row_number() OVER (PARTITION BY batch_id
      |      ORDER BY cs DESC, corpus_id) AS rk
      |  FROM p)
      |SELECT batch_id, corpus_id, round(cs, 6) AS cos
      |FROM best WHERE rk = 1 ORDER BY batch_id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val batch = emb.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.01D AS FLOAT))")
        .as("embedding"))
    val pairs = CosineDedup.dedupPairsAgainst(
      emb, batch, "vec_id", "embedding", 0.95)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("batch_id")
      .orderBy(col("cos").desc, col("corpus_id"))
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("batch_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("batch_id")
  }

  val all: Seq[Q] = Seq(minhashIncremental, cosineIncremental,
    minhashPairs, minhashKeepFirst, dedupComponents,
    dedupKeepBest, simhashPairs, annTopK, cosineDedupStats, ivfTopK,
    pqEncode, pqAdcTopK, ivfpqTopK, setsimJoin, dupSpans, dupSpanBounds,
    mmrRerank,
    goldenRecord, bcubedEval, lshPlanner, splitLeakage, lshRecall,
    ivfProbeSweep, phashPairs, audioPairs, videoPairs)

  /** IVF tuning curve — lsh_recall's vector-side sibling: recall@5 of
    * the seeded-medoid IVF index against the brute-force ground truth
    * as nprobe sweeps 1 → 3, the accuracy-vs-cost table that decides
    * a deployment's probe budget. Everything reuses the
    * ivf_cosine_topk protocol (portable multiplicative-hash seeds,
    * exact cosine assignment, rounded-rank ties), so the oracle
    * replays all three sweeps plus the exact leg verbatim. Plan: the
    * 8-row centroid matrix rides as literals, the corpus is scanned
    * once per sweep (map-only assignment + bounded probe join), and
    * the ground truth is cosine_topk's broadcast brute force. */
  lazy val ivfProbeSweep: Q = Q(
    "ivf_probe_sweep",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CAST(vec_id AS BIGINT) * 2654435761) & 2147483647 AS h
      |  FROM embeddings),
      |seeds AS (
      |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1
      |      AS j, v AS sv
      |  FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 8) s0),
      |casn AS (
      |  SELECT id, cell FROM (
      |    SELECT e.vec_id AS id, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN seeds s) t
      |  WHERE rk = 1),
      |nps AS (SELECT unnest([1, 2, 3]) AS np),
      |qprobe AS (
      |  SELECT nps.np, t.qid, t.cell FROM (
      |    SELECT e.vec_id AS qid, s.j AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv)
      |          / (sqrt(list_dot_product(e.v, e.v))
      |             * sqrt(list_dot_product(s.sv, s.sv))) DESC, s.j) AS rk
      |    FROM e CROSS JOIN seeds s WHERE e.vec_id < 5) t
      |  JOIN nps ON t.rk <= nps.np),
      |ivf AS (SELECT np, qid, id FROM (
      |    SELECT c.np, c.qid, c.id,
      |      row_number() OVER (PARTITION BY c.np, c.qid
      |        ORDER BY c.cos DESC, c.id) AS rn
      |    FROM (
      |      SELECT DISTINCT qp.np, qp.qid, ca.id,
      |        round(list_dot_product(qe.v, ce.v)
      |          / (sqrt(list_dot_product(qe.v, qe.v))
      |             * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
      |      FROM qprobe qp JOIN casn ca USING (cell)
      |        JOIN e ce ON ca.id = ce.vec_id
      |        JOIN e qe ON qp.qid = qe.vec_id
      |      WHERE ca.id <> qp.qid) c) r
      |  WHERE rn <= 5),
      |bf AS (SELECT qid, id FROM (
      |    SELECT q.vec_id AS qid, c.vec_id AS id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_dot_product(q.v, c.v)
      |          / (sqrt(list_dot_product(q.v, q.v))
      |             * sqrt(list_dot_product(c.v, c.v))), 6) DESC, c.vec_id)
      |        AS rn
      |    FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) t
      |  WHERE rn <= 5),
      |hit AS (SELECT nps.np,
      |    CAST(COALESCE(sum(CASE WHEN bf.qid IS NOT NULL THEN 1 ELSE 0
      |      END), 0) AS BIGINT) AS n_hits
      |  FROM nps LEFT JOIN ivf ON ivf.np = nps.np
      |    LEFT JOIN bf ON bf.qid = ivf.qid AND bf.id = ivf.id
      |  GROUP BY nps.np)
      |SELECT CAST(np AS BIGINT) AS nprobe, n_hits,
      |  floor(CAST(n_hits AS DOUBLE) / 25 * 1000000 + 0.5) / 1000000
      |    AS recall_at_5
      |FROM hit ORDER BY nprobe""".stripMargin) { (s, d) =>
    graft.functions.GraftFunctions.ensureRegistered(s)
    import graft.functions.GraftFunctions.cosineNative
    val emb = Tables.embeddings(s, d)
    val cents = graft.ann.AnnIvf.medoids(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id") < 5)
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("id"))
    val bf = c.join(broadcast(q), col("qid") =!= col("id"))
      .withColumn("cos", round(cosineNative(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("id")).withColumn("hit", lit(1))
    val perNp = (1 to 3).map { np =>
      graft.ann.AnnIvf.topKWith(cents, emb, queries, "vec_id",
        "embedding", k = 5, nProbe = np)
        .select(col("qid"), col("id")).withColumn("np", lit(np.toLong))
    }.reduce(_ unionAll _)
    perNp.join(bf, Seq("qid", "id"), "left_outer")
      .groupBy("np")
      .agg(coalesce(sum(when(col("hit").isNotNull, 1L).otherwise(0L)),
        lit(0L)).as("n_hits"))
      .select(col("np").as("nprobe"), col("n_hits"),
        (floor(col("n_hits").cast("double") / 25 * 1000000 + lit(0.5))
          / 1000000).as("recall_at_5"))
      .orderBy("nprobe")
  }

  /** Fixed seeded affine coefficients for lsh_recall, emitted as
    * literals into BOTH engines (the sign-LSH precedent): 16 hashes =
    * 8 bands × 2 rows at τ = 0.5 — a regime where banding genuinely
    * misses pairs, unlike the production 64×16 setting whose recall
    * at 0.8 rounds to 1. */
  private lazy val lrCoef: (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(20260815L)
    (Seq.fill(16)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Seq.fill(16)(rnd.nextInt(Int.MaxValue).toLong))
  }
  private def lrAs: Seq[Long] = lrCoef._1
  private def lrBs: Seq[Long] = lrCoef._2

  /** MEASURED banding recall/precision — lsh_planner predicts the
    * candidate-capture probability from (bands, rows); this measures
    * it against exact corpus-wide ground truth at τ = 0.5. The whole
    * pipeline is engine-portable: shingle hash = the ascii-polynomial
    * score hash (nb_langid's device) mod 2³¹−1, 16 seeded affine
    * minhashes with the (a, b) literals above re-emitted into the
    * SQL, band key = the 2-row signature slice packed into one
    * BIGINT. Spark plan: map-side shingle→sig, band explode +
    * band-key self-join for candidates (never all-pairs); the exact
    * leg is setsim_join's PPJoin prefix filter re-derived for τ = 0.5
    * (prefix = n − ⌈n/2⌉ + 1 on df-rare-first order, size ratio ≥ ½,
    * positional α = ⌈(na+nb)/3⌉) with the integer verify 3c ≥ na+nb —
    * exact and sub-quadratic, so the ground-truth leg scales; the
    * brute-force all-pairs form lives only in the DuckDB oracle. */
  lazy val lshRecall: Q = {
    val asLit = lrAs.mkString("[", ", ", "]")
    val bsLit = lrBs.mkString("[", ", ", "]")
    Q(
      "lsh_recall",
      s"""WITH sm AS (SELECT doc_id, ts FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '),
        |      w -> len(w) > 0) AS ts FROM documents)
        |  WHERE len(ts) >= 4),
        |wp AS (SELECT doc_id, list_transform(ts, w ->
        |      list_sum(list_transform(
        |        range(0, CAST(least(length(w), 8) AS BIGINT)),
        |        j -> ascii(substring(w, CAST(j + 1 AS INTEGER), 1))
        |             * CAST(pow(31, j) AS BIGINT))) % 2147483647) AS whs
        |  FROM sm),
        |hs AS (SELECT doc_id,
        |    list_transform(range(1, len(whs) - 2), i ->
        |      ((((whs[CAST(i AS INTEGER)] * 1000003
        |          + whs[CAST(i + 1 AS INTEGER)]) % 2147483647) * 1000003
        |          + whs[CAST(i + 2 AS INTEGER)]) % 2147483647 * 1000003
        |          + whs[CAST(i + 3 AS INTEGER)]) % 2147483647) AS hh
        |  FROM wp),
        |hd AS (SELECT doc_id, list_distinct(hh) AS hhd, hh FROM hs),
        |sig AS (SELECT doc_id,
        |    list_transform(range(0, 16), k ->
        |      list_min(list_transform(hh, h ->
        |        (($asLit)[CAST(k + 1 AS INTEGER)] * h
        |          + ($bsLit)[CAST(k + 1 AS INTEGER)]) % 2147483647)))
        |      AS sig
        |  FROM hd),
        |band AS (SELECT doc_id, bi AS band_idx,
        |    sig[CAST(2 * bi + 1 AS INTEGER)] * 2147483648
        |      + sig[CAST(2 * bi + 2 AS INTEGER)] AS band_key
        |  FROM sig, unnest(range(0, 8)) AS t(bi)),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM band x JOIN band y ON x.band_idx = y.band_idx
        |    AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        |ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hd a JOIN hd b ON a.doc_id < b.doc_id
        |    AND len(a.hhd) * 2 >= len(b.hhd)
        |    AND len(b.hhd) * 2 >= len(a.hhd)
        |  WHERE 3 * len(list_intersect(a.hhd, b.hhd))
        |      >= len(a.hhd) + len(b.hhd)),
        |m AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cand JOIN ex
        |       ON ex.id_a = cand.id_a AND ex.id_b = cand.id_b) AS n_hit)
        |SELECT n_exact, n_cand, n_hit,
        |  CASE WHEN n_exact > 0 THEN
        |    floor(CAST(n_hit AS DOUBLE) / n_exact * 1000000 + 0.5)
        |      / 1000000 END AS recall,
        |  CASE WHEN n_cand > 0 THEN
        |    floor(CAST(n_hit AS DOUBLE) / n_cand * 1000000 + 0.5)
        |      / 1000000 END AS precision
        |FROM m""".stripMargin) { (s, d) =>
      // collision-resistant portable gram hash: exact 8-char word
      // polynomials (every fixture token is <= 8 chars) chained with
      // R = 1000003 mod P per 4-token window. The hashed-shingle SET
      // (hhd) is the similarity universe for BOTH legs — long-array
      // ops, no string grams anywhere past the word split.
      // Empty tokens (consecutive spaces) are dropped BEFORE hashing:
      // Spark's sequence(0, length('')-1) yields a descending [0,-1]
      // (hash 0) where DuckDB's range(0, 0) is empty (NULL sum) — the
      // one token shape where the two word hashes diverge (r8 advice).
      val hs = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), w -> length(w) > 0)").as("ts"))
        .filter(size(col("ts")) >= 4)
        .withColumn("whs", expr(
          "transform(ts, w -> aggregate(" +
            "sequence(0, least(length(w), 8) - 1), 0L, " +
            "(acc, j) -> acc + ascii(substring(w, CAST(j + 1 AS INT), 1)) " +
            "* CAST(pow(31, j) AS BIGINT)) % 2147483647)"))
        .withColumn("hh", expr(
          "transform(sequence(1, size(whs) - 3), i -> " +
            "((((element_at(whs, CAST(i AS INT)) * 1000003L " +
            "+ element_at(whs, CAST(i + 1 AS INT))) % 2147483647L) " +
            "* 1000003L + element_at(whs, CAST(i + 2 AS INT))) " +
            "% 2147483647L * 1000003L " +
            "+ element_at(whs, CAST(i + 3 AS INT))) % 2147483647L)"))
        .withColumn("hhd", expr("array_distinct(hh)"))
        .select("doc_id", "hh", "hhd")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val asArr = lrAs.mkString("array(", "L, ", "L)")
      val bsArr = lrBs.mkString("array(", "L, ", "L)")
      val sig = hs.withColumn("sig", expr(
        s"zip_with($asArr, $bsArr, (a, b) -> " +
          "array_min(transform(hh, h -> (a * h + b) % 2147483647)))"))
      val band = sig.select(col("doc_id"),
          explode(expr("transform(sequence(0, 7), i -> struct(i AS band_idx, " +
            "element_at(sig, 2 * i + 1) * 2147483648L " +
            "+ element_at(sig, 2 * i + 2) AS band_key))")).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_key"))
      val cand = band.as("x")
        .join(band.as("y"),
          col("x.band_idx") === col("y.band_idx")
            && col("x.band_key") === col("y.band_key")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      // exact leg: PPJoin prefix filter at tau = 0.5 over the hashed
      // shingle set (setsim_join's machinery re-derived: prefix =
      // n - ceil(n/2) + 1 on df-rare-first order, size ratio >= 1/2,
      // positional alpha = ceil((na+nb)/3)) — exact and sub-quadratic,
      // so the ground-truth leg scales; the brute-force all-pairs form
      // lives only in the DuckDB oracle.
      val tok = hs.select(col("doc_id"), size(col("hhd")).as("n"),
        explode(col("hhd")).as("g"))
      val dfreq = tok.groupBy("g").agg(count(lit(1)).as("df"))
      val prefLen = (col("n") - floor((col("n") + 1) / 2) + 1).cast("int")
      val prefix = tok.join(dfreq, "g")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("df"), col("g"))))
        .filter(col("rn") <= prefLen)
        .select(col("doc_id"), col("n"), col("rn"), col("g"))
      val alpha = floor((col("na") + col("nb") + 2) / 3)
      val candEx = prefix.select(col("doc_id").as("id_a"),
          col("n").as("na"), col("rn").as("ra"), col("g"))
        .join(prefix.select(col("doc_id").as("id_b"), col("n").as("nb"),
          col("rn").as("rb"), col("g")), "g")
        .filter(col("id_a") < col("id_b")
          && col("na") * 2 >= col("nb") && col("nb") * 2 >= col("na")
          && col("na") - col("ra") + 1 >= alpha
          && col("nb") - col("rb") + 1 >= alpha)
        .select("id_a", "id_b", "na", "nb").distinct()
      val ex = candEx
        .join(hs.select(col("doc_id").as("id_a"), col("hhd").as("ga")),
          "id_a")
        .join(hs.select(col("doc_id").as("id_b"), col("hhd").as("gb")),
          "id_b")
        .filter(lit(3) * size(array_intersect(col("ga"), col("gb")))
          >= col("na") + col("nb"))
        .select(col("id_a"), col("id_b"))
      val nEx = ex.agg(count(lit(1)).as("n_exact"))
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      val nHit = cand.join(ex, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_hit"))
      nEx.crossJoin(broadcast(nCand)).crossJoin(broadcast(nHit))
        .select(col("n_exact"), col("n_cand"), col("n_hit"),
          when(col("n_exact") > 0,
            floor(col("n_hit").cast("double") / col("n_exact") * 1000000
              + lit(0.5)) / 1000000).as("recall"),
          when(col("n_cand") > 0,
            floor(col("n_hit").cast("double") / col("n_cand") * 1000000
              + lit(0.5)) / 1000000).as("precision"))
    }
  }
}
