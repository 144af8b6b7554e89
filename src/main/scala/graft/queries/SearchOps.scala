package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Tables

/** Retrieval and validation ops: positional phrase search (the
  * inverted-index query BM25's bag-of-words can't answer) and an
  * order-independent table content fingerprint (cross-system data
  * validation — the primitive behind "did the migration copy every
  * row unchanged"). */
object SearchOps {

  /** Exact phrase search ("hash join") via positional posting-list
    * intersection: tokenize once into (doc, term, position) postings,
    * then adjacent-position self-intersection — the classic
    * inverted-index phrase query. The join is vocabulary-selective
    * (only the two query terms' postings leave the scan — at 100 TB an
    * actual index would serve these lists directly; here the filter
    * prunes before the shuffle so the exchange carries only candidate
    * postings, not the corpus). Counts are exact integers. */
  val phraseSearch: Q = Q(
    "phrase_search",
    """WITH tok AS (SELECT doc_id, t.i AS pos, ts[t.i] AS w FROM (
      |    SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |    LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) t(i)),
      |p1 AS (SELECT doc_id, pos FROM tok WHERE w = 'hash'),
      |p2 AS (SELECT doc_id, pos FROM tok WHERE w = 'join')
      |SELECT p1.doc_id AS doc_id, count(*) AS n_hits
      |FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
      |GROUP BY p1.doc_id
      |ORDER BY n_hits DESC, p1.doc_id""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
    val p1 = tok.filter(col("w") === "hash").select(col("doc_id"), col("pos"))
    val p2 = tok.filter(col("w") === "join")
      .select(col("doc_id").as("d2"), col("pos").as("pos2"))
    p1.join(p2, col("doc_id") === col("d2") && col("pos2") === col("pos") + 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
  }

  /** Order-independent table content fingerprint for lineitem + orders:
    * each row canonicalizes to a '|'-joined string, hashes through md5,
    * and the table fingerprint is the exact integer SUM of a
    * 31-polynomial over each digest's first 8 hex chars — commutative,
    * so partitioning/row order is irrelevant, and any single changed
    * row moves the sum. This is the engine-portable validation check a
    * migration runs on source and target (the corpus' established
    * md5 + poly31 primitives; sum bounded: rows × 10^6 ≪ 2^63). */
  val tableFingerprint: Q = Q(
    "table_fingerprint",
    """WITH l AS (SELECT md5(concat_ws('|', l_orderkey, l_linenumber,
      |    l_partkey, l_suppkey, CAST(round(l_extendedprice * 100) AS BIGINT),
      |    l_returnflag)) AS h FROM lineitem),
      |o AS (SELECT md5(concat_ws('|', o_orderkey, o_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus)) AS h
      |  FROM orders),
      |fp AS (SELECT 'lineitem' AS tbl, count(*) AS n_rows,
      |    CAST(sum(list_aggregate(list_transform(range(0, 8),
      |      j -> ascii(substring(h, CAST(j + 1 AS INTEGER), 1))
      |           * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003) AS BIGINT)
      |      AS fingerprint
      |  FROM l
      |  UNION ALL
      |  SELECT 'orders', count(*),
      |    CAST(sum(list_aggregate(list_transform(range(0, 8),
      |      j -> ascii(substring(h, CAST(j + 1 AS INTEGER), 1))
      |           * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003) AS BIGINT)
      |  FROM o)
      |SELECT tbl, n_rows, fingerprint FROM fp ORDER BY tbl""".stripMargin) { (s, d) =>
    // Unrolled 31-polynomial (optimization round 13, guide §"expressions
    // and codegen"): the former aggregate(transform(sequence(0,7),...))
    // higher-order form is interpreted per ROW (lambda eval + a boxed
    // 8-element array per digest — 750k rows/scan here); eight flat
    // ascii(substring) terms whole-stage-codegen. Exact-integer sum, so
    // the result is bit-identical (addition order is irrelevant for
    // BIGINTs) — oracle re-verified at both SFs in the same commit.
    val pow31 = Array.iterate(1L, 8)(_ * 31L)
    val poly = (h: org.apache.spark.sql.Column) =>
      (0 until 8).map(j => ascii(substring(h, j + 1, 1)).cast("long") * lit(pow31(j)))
        .reduce(_ + _) % lit(1000003L)
    def fp(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), sum(poly(col("h"))).as("fingerprint"))
        .select(lit(name).as("tbl"), col("n_rows"), col("fingerprint"))
    val l = Tables.lineitem(s, d).select(md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_suppkey"), round(col("l_extendedprice") * 100).cast("long"),
      col("l_returnflag"))).as("h"))
    val o = Tables.orders(s, d).select(md5(concat_ws("|",
      col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long"),
      col("o_orderstatus"))).as("h"))
    fp("lineitem", l).unionAll(fp("orders", o)).orderBy("tbl")
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001, μ=2000) — the language-modeling ranker beside
    * bm25_topdocs' probabilistic one. The naive form scores EVERY doc
    * against every query term; decomposing
    *   score(d) = Σ_t ln(μ·cf_t/C) − |q|·ln(len_d + μ)
    *            + Σ_{t: tf>0} ln(1 + tf·C/(μ·cf_t))
    * makes the per-doc base a pure map over (doc, len) and keeps only
    * MATCHED (doc, term) rows in the join — the same
    * vocabulary-selective shuffle discipline as bm25/phrase_search, so
    * the exchange never carries the corpus. Both the 4-term query
    * constant and each doc's matched contributions fold in term-sorted
    * order (identical double sequences cross-engine); ln parity is
    * corpus-established (lm_perplexity). */
  val qlDirichlet: Q = Q(
    "ql_dirichlet",
    """WITH qt(term) AS (VALUES ('spark'), ('vector'), ('stream'), ('window')),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |         FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks
      |       GROUP BY doc_id),
      |ctot AS (SELECT CAST(sum(len) AS DOUBLE) AS c FROM dl),
      |cf AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS cf FROM toks
      |       JOIN qt ON tok = qt.term GROUP BY tok),
      |qconst AS (SELECT list_sum(list(ln(2000.0 * cf / c) ORDER BY term))
      |             AS qc FROM cf CROSS JOIN ctot),
      |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks JOIN qt ON tok = qt.term GROUP BY doc_id, tok),
      |m AS (SELECT tf.doc_id,
      |        list_sum(list(ln(1 + tf * c / (2000.0 * cf)) ORDER BY term))
      |          AS matched
      |      FROM tf JOIN cf USING (term) CROSS JOIN ctot GROUP BY tf.doc_id),
      |scored AS (SELECT dl.doc_id,
      |    round(qc - 4 * ln(len + 2000.0) + coalesce(matched, 0), 6) AS score
      |  FROM dl LEFT JOIN m ON m.doc_id = dl.doc_id CROSS JOIN qconst)
      |SELECT doc_id, score FROM scored
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    val qTerms = Seq("spark", "vector", "stream", "window")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val ctot = dl.agg(sum("len").cast("double").as("c"))
    val cf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("tok").as("term")).agg(count(lit(1)).as("cf"))
    def sortedFold(terms: Column, field: String): Column = aggregate(
      array_sort(terms), lit(0.0), (acc, x) => acc + x.getField(field))
    val qconst = cf.crossJoin(broadcast(ctot)) // 1-row total
      .select(col("term"), log(lit(2000.0) * col("cf") / col("c")).as("v"))
      .agg(sortedFold(collect_list(struct(col("term"), col("v"))), "v")
        .as("qc"))
    val tf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val m = tf.join(broadcast(cf), "term").crossJoin(broadcast(ctot))
      .select(col("doc_id"), col("term"),
        log(lit(1) + col("tf") * col("c") / (lit(2000.0) * col("cf")))
          .as("v"))
      .groupBy("doc_id")
      .agg(sortedFold(collect_list(struct(col("term"), col("v"))), "v")
        .as("matched"))
    dl.join(m, Seq("doc_id"), "left").crossJoin(broadcast(qconst))
      .select(col("doc_id"),
        round(col("qc") - lit(4) * log(col("len") + lit(2000.0))
          + coalesce(col("matched"), lit(0.0)), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
  }

  /** Entity-resolution near-match over part names with the native
    * TRUE Damerau–Levenshtein expression (graft.functions
    * .DamerauLevenshtein — unrestricted transpositions, the variant
    * q70's plain levenshtein under-scores on swapped tokens; DuckDB's
    * damerau_levenshtein is the same TRUE metric, so the integer
    * distances gate bit-for-bit). Blocking: names collapse to their
    * DISTINCT forms (a data-constant vocabulary — the adjective×noun
    * grid), pair within the same last-token block via a plain
    * equi-join, score with the codegen'd expression, keep dl ≤ 3.
    * Per-name part counts ride along so a merge step knows each
    * cluster's weight. The expression is the SCORER; the blocked
    * equi-join is the bounded candidate generator — the ER discipline
    * that survives 100 TB (never all-pairs, never a cartesian). */
  val dlMatch: Q = Q(
    "dl_match",
    """WITH names AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
      |      FROM part GROUP BY p_name),
      |blk AS (SELECT p_name, n_parts,
      |      string_split(p_name, ' ')[-1] AS block FROM names)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  a.n_parts AS n_a, b.n_parts AS n_b,
      |  CAST(damerau_levenshtein(a.p_name, b.p_name) AS INTEGER) AS dl
      |FROM blk a JOIN blk b
      |  ON a.block = b.block AND a.p_name < b.p_name
      |WHERE damerau_levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY dl, name_a, name_b LIMIT 20""".stripMargin) { (s, d) =>
    val names = Tables.part(s, d)
      .groupBy("p_name").agg(count(lit(1)).as("n_parts"))
    val blk = names.select(col("p_name"), col("n_parts"),
      element_at(split(col("p_name"), " "), -1).as("block"))
    val a = blk.select(col("p_name").as("name_a"), col("n_parts").as("n_a"),
      col("block").as("ba"))
    val b = blk.select(col("p_name").as("name_b"), col("n_parts").as("n_b"),
      col("block").as("bb"))
    val dl = graft.functions.DamerauLevenshtein
      .dl(col("name_a"), col("name_b"))
    a.join(b, col("ba") === col("bb") && col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        dl.as("dl"))
      .filter(col("dl") <= 3)
      .orderBy(col("dl"), col("name_a"), col("name_b")).limit(20)
  }

  /** Jaro–Winkler name matching with the native graft_jaro_winkler
    * expression — the census-bureau scorer for SHORT names where edit
    * distance over-penalizes (dl_match's complement: DL counts edits,
    * JW rewards shared prefixes and tolerates transpositions
    * smoothly). Same ER discipline, opposite block: pairs share their
    * FIRST token (adjective) where dl_match blocked on the last
    * (noun), so the two queries exercise different candidate
    * generators over the same bounded name vocabulary. Scores
    * floor-round to the 1e-6 grid BEFORE ranking (the integer m/t
    * counts make both engines' jaro equal to the last ulp; the grid
    * absorbs library-order residue). */
  val jwMatch: Q = Q(
    "jw_match",
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |blk AS (SELECT p_name, string_split(p_name, ' ')[1] AS block
      |      FROM names)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000 + 0.5)
      |    / 1000000 AS jw
      |FROM blk a JOIN blk b
      |  ON a.block = b.block AND a.p_name < b.p_name
      |ORDER BY jw DESC, name_a, name_b LIMIT 20""".stripMargin) { (s, d) =>
    val names = Tables.part(s, d).select("p_name").distinct()
    val blk = names.select(col("p_name"),
      element_at(split(col("p_name"), " "), 1).as("block"))
    val a = blk.select(col("p_name").as("name_a"), col("block").as("ba"))
    val b = blk.select(col("p_name").as("name_b"), col("block").as("bb"))
    a.join(b, col("ba") === col("bb") && col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        (floor(graft.functions.JaroWinkler.jw(col("name_a"), col("name_b"))
          * 1000000 + lit(0.5)) / 1000000).as("jw"))
      .orderBy(col("jw").desc, col("name_a"), col("name_b")).limit(20)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    * two lexical retrievers over the same 4-term query: hybrid search's
    * standard rank combiner, RRF(d) = Σᵢ 1/(60 + rankᵢ(d)). Both input
    * rankings reuse the exact scoring pipelines their own declared
    * queries pin (bm25_topdocs' Okapi fold over matched docs,
    * ql_dirichlet's smoothed likelihood over ALL docs); the global
    * ranks come from the distributed PrefixScan over (score DESC,
    * doc_id) — two range shuffles, never a partition-less window —
    * so the fusion is scale-correct over the full population, with a
    * left join QL→BM25 (the BM25 ranking only contains matched docs;
    * absent docs contribute 0). Every RRF term is one exact integer
    * division; the two-term sum is a single addition of bit-identical
    * doubles on both engines. */
  val rrfFusion: Q = Q(
    "rrf_fusion",
    """WITH qt(term) AS (VALUES ('spark'), ('vector'), ('stream'), ('window')),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |         FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks
      |       GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs,
      |                 avg(CAST(len AS DOUBLE)) AS avg_len FROM dl),
      |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks JOIN qt ON tok = qt.term GROUP BY doc_id, tok),
      |bdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
      |        GROUP BY term),
      |bcontrib AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / avg_len)) AS c
      |  FROM tf JOIN bdf USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats),
      |bscore AS (SELECT doc_id,
      |    round(list_sum(list(c ORDER BY term)), 6) AS score
      |  FROM bcontrib GROUP BY doc_id),
      |brank AS (SELECT doc_id,
      |    row_number() OVER (ORDER BY score DESC, doc_id) AS r_bm25
      |  FROM bscore),
      |ctot AS (SELECT CAST(sum(len) AS DOUBLE) AS c FROM dl),
      |cf AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS cf FROM toks
      |       JOIN qt ON tok = qt.term GROUP BY tok),
      |qconst AS (SELECT list_sum(list(ln(2000.0 * cf / c) ORDER BY term))
      |             AS qc FROM cf CROSS JOIN ctot),
      |m AS (SELECT tf.doc_id,
      |        list_sum(list(ln(1 + tf * c / (2000.0 * cf)) ORDER BY term))
      |          AS matched
      |      FROM tf JOIN cf USING (term) CROSS JOIN ctot
      |      GROUP BY tf.doc_id),
      |qscore AS (SELECT dl.doc_id,
      |    round(qc - 4 * ln(len + 2000.0) + coalesce(matched, 0), 6) AS score
      |  FROM dl LEFT JOIN m ON m.doc_id = dl.doc_id CROSS JOIN qconst),
      |qrank AS (SELECT doc_id,
      |    row_number() OVER (ORDER BY score DESC, doc_id) AS r_ql
      |  FROM qscore),
      |fused AS (SELECT q.doc_id, b.r_bm25, q.r_ql,
      |    coalesce(1.0 / (60 + b.r_bm25), 0.0) + 1.0 / (60 + q.r_ql)
      |      AS rrf_raw
      |  FROM qrank q LEFT JOIN brank b ON b.doc_id = q.doc_id)
      |SELECT doc_id, r_bm25, r_ql,
      |  floor(rrf_raw * 1000000 + 0.5) / 1000000 AS rrf
      |FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT 15""".stripMargin) {
    (s, d) =>
    val qTerms = Seq("spark", "vector", "stream", "window")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("len").cast("double")).as("avg_len"))
    val tf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    def sortedFold(terms: Column, field: String): Column = aggregate(
      array_sort(terms), lit(0.0), (acc, x) => acc + x.getField(field))
    // --- BM25 over the matched-doc population (bm25_topdocs' fold) ---
    val bdf = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val bscore = tf.join(broadcast(bdf), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // 1-row corpus stats
      .select(col("doc_id"), col("term"),
        (log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(1) - 0.75
            + lit(0.75) * col("len") / col("avg_len")))).as("c"))
      .groupBy("doc_id")
      .agg(sortedFold(collect_list(struct(col("term"), col("c"))), "c")
        .as("raw"))
      .select(col("doc_id"), round(col("raw"), 6).as("score"))
      .withColumn("one", lit(1L))
    val (bmScan, _) = graft.ops.PrefixScan.withCumSums(
      bscore, Seq(col("score").desc, col("doc_id")), Seq("one"))
    val brank = bmScan.select(col("doc_id"), col("cum_one").as("r_bm25"))
    // --- Dirichlet QL over ALL docs (ql_dirichlet's fold) ---
    val ctot = dl.agg(sum("len").cast("double").as("c"))
    val cf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("tok").as("term")).agg(count(lit(1)).as("cf"))
    val qconst = cf.crossJoin(broadcast(ctot)) // 1-row total
      .select(col("term"), log(lit(2000.0) * col("cf") / col("c")).as("v"))
      .agg(sortedFold(collect_list(struct(col("term"), col("v"))), "v")
        .as("qc"))
    val matched = tf.join(broadcast(cf), "term").crossJoin(broadcast(ctot))
      .select(col("doc_id"), col("term"),
        log(lit(1) + col("tf") * col("c") / (lit(2000.0) * col("cf")))
          .as("v"))
      .groupBy("doc_id")
      .agg(sortedFold(collect_list(struct(col("term"), col("v"))), "v")
        .as("matched"))
    val qscore = dl.join(matched, Seq("doc_id"), "left")
      .crossJoin(broadcast(qconst)) // 1-row query constant
      .select(col("doc_id"),
        round(col("qc") - lit(4) * log(col("len") + lit(2000.0))
          + coalesce(col("matched"), lit(0.0)), 6).as("score"))
      .withColumn("one", lit(1L))
    val (qlScan, _) = graft.ops.PrefixScan.withCumSums(
      qscore, Seq(col("score").desc, col("doc_id")), Seq("one"))
    val qrank = qlScan.select(col("doc_id"), col("cum_one").as("r_ql"))
    qrank.join(brank, Seq("doc_id"), "left")
      .select(col("doc_id"), col("r_bm25"), col("r_ql"),
        (coalesce(lit(1.0) / (lit(60) + col("r_bm25")), lit(0.0))
          + lit(1.0) / (lit(60) + col("r_ql"))).as("rrf_raw"))
      .orderBy(col("rrf_raw").desc, col("doc_id"))
      .limit(15)
      .select(col("doc_id"), col("r_bm25"), col("r_ql"),
        (floor(col("rrf_raw") * 1000000 + lit(0.5)) / 1000000).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969) between the customer and supplier registries — the ER
    * scoring model on top of the string-distance layer (dl_match /
    * jw_match): block on nation (the realistic block-join shape — an
    * equi-join, never all pairs), compare two fields per candidate
    * (name Jaro–Winkler ≥ 0.85; account-balance thousand-band), and
    * sum per-field log-likelihood ratios ln(m/u) for agreement /
    * ln((1−m)/(1−u)) for disagreement with fixed published-style m/u
    * priors. All weights are ln of literals (identical doubles), the
    * JW comes from the native expression whose DuckDB parity jw_match
    * pins, and ties order by raw jw then keys. Top-15 candidate links. */
  val fsLinkage: Q = Q(
    "fs_linkage",
    """WITH p AS (SELECT c_custkey, s_suppkey,
      |    jaro_winkler_similarity(c_name, s_name) AS jw,
      |    CASE WHEN floor(c_acctbal / 1000) = floor(s_acctbal / 1000)
      |         THEN 1 ELSE 0 END AS band
      |  FROM customer JOIN supplier ON c_nationkey = s_nationkey),
      |w AS (SELECT c_custkey, s_suppkey, jw, band,
      |    (CASE WHEN jw >= 0.85 THEN ln(0.9 / 0.05)
      |          ELSE ln(0.1 / 0.95) END)
      |    + (CASE WHEN band = 1 THEN ln(0.3 / 0.1)
      |            ELSE ln(0.7 / 0.9) END) AS wt
      |  FROM p)
      |SELECT c_custkey, s_suppkey,
      |  floor(jw * 1000000 + 0.5) / 1000000 AS jw, band,
      |  floor(wt * 1000000 + 0.5) / 1000000 AS fs_weight
      |FROM w
      |ORDER BY wt DESC, jw DESC, c_custkey, s_suppkey LIMIT 15""".stripMargin) {
    (s, d) =>
    val p = Tables.customer(s, d)
      .join(Tables.supplier(s, d), col("c_nationkey") === col("s_nationkey"))
      .select(col("c_custkey"), col("s_suppkey"),
        graft.functions.JaroWinkler.jw(col("c_name"), col("s_name")).as("jw"),
        when(floor(col("c_acctbal") / 1000) === floor(col("s_acctbal") / 1000),
          1).otherwise(0).as("band"))
    val w = p.select(col("c_custkey"), col("s_suppkey"), col("jw"),
      col("band"),
      (when(col("jw") >= 0.85, log(lit(0.9) / 0.05))
        .otherwise(log(lit(0.1) / 0.95))
        + when(col("band") === 1, log(lit(0.3) / 0.1))
          .otherwise(log(lit(0.7) / 0.9))).as("wt"))
    w.orderBy(col("wt").desc, col("jw").desc, col("c_custkey"),
        col("s_suppkey")).limit(15)
      .select(col("c_custkey"), col("s_suppkey"),
        (floor(col("jw") * 1000000 + lit(0.5)) / 1000000).as("jw"),
        col("band"),
        (floor(col("wt") * 1000000 + lit(0.5)) / 1000000).as("fs_weight"))
      .orderBy(col("fs_weight").desc, col("jw").desc, col("c_custkey"),
        col("s_suppkey"))
  }

  /** Best-passage extraction (snippet generation) — the retrieval
    * last mile: for a multi-term query, find each document's best
    * width-10 token window by (distinct query terms covered, total
    * hits, earliest start) and emit the top 15 with the passage text.
    * The optimum window always starts AT a query-term hit, so
    * candidates are anchored on the match postings, never on every
    * position: the per-doc range self-join touches only the
    * vocabulary-selective match stream (like phrase_search, the
    * exchange carries candidate postings, not the corpus), and the
    * winner pick is a doc-partitioned window. Passage text is sliced
    * from the original tokens only for the 15 finalists. */
  val bestPassage: Q = Q(
    "best_passage",
    """WITH tok AS (SELECT doc_id, t.i AS pos, ts[t.i] AS w FROM (
      |    SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |    LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) t(i)),
      |m AS (SELECT doc_id, pos, w FROM tok
      |      WHERE w IN ('hash', 'join', 'sort', 'merge')),
      |cand AS (SELECT a.doc_id, a.pos AS s,
      |    CAST(count(DISTINCT b.w) AS BIGINT) AS coverage,
      |    CAST(count(*) AS BIGINT) AS n_hits
      |  FROM m a JOIN m b ON b.doc_id = a.doc_id
      |    AND b.pos >= a.pos AND b.pos <= a.pos + 9
      |  GROUP BY 1, 2),
      |best AS (SELECT doc_id, s, coverage, n_hits,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY coverage DESC, n_hits DESC, s) AS rn
      |  FROM cand)
      |SELECT b.doc_id AS doc_id, CAST(b.s AS BIGINT) AS win_start, b.coverage,
      |  b.n_hits,
      |  array_to_string((string_split(d.text, ' '))[b.s:b.s + 9], ' ')
      |    AS passage
      |FROM best b JOIN documents d ON d.doc_id = b.doc_id
      |WHERE rn = 1
      |ORDER BY coverage DESC, n_hits DESC, b.doc_id LIMIT 15""".stripMargin) {
    (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
    val m = tok.filter(col("w").isin("hash", "join", "sort", "merge"))
    val cand = m.select(col("doc_id"), col("pos").as("s"))
      .join(m.select(col("doc_id").as("d2"), col("pos").as("p2"), col("w")),
        col("doc_id") === col("d2")
          && col("p2") >= col("s") && col("p2") <= col("s") + 9)
      .groupBy("doc_id", "s")
      .agg(countDistinct("w").as("coverage"), count(lit(1)).as("n_hits"))
    val best = cand.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("coverage").desc, col("n_hits").desc, col("s"))))
      .filter(col("rn") === 1)
    best.join(Tables.documents(s, d).select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("s").cast("long").as("win_start"),
        col("coverage"), col("n_hits"),
        expr("array_join(slice(split(text, ' '), CAST(s AS INT), 10), ' ')")
          .as("passage"))
      .orderBy(col("coverage").desc, col("n_hits").desc, col("doc_id"))
      .limit(15)
  }

  /** Entity-resolution blocking audit — the quality report run before
    * trusting a blocked matcher at scale: for q70's length-band
    * blocking over the capped customer slice, report the REDUCTION
    * RATIO (share of the quadratic pair space the blocks prune) and
    * PAIR COMPLETENESS (share of true matches — levenshtein ≤ 2 —
    * that survive blocking), the two standing ER metrics
    * (Christen 2012). The full pair space is evaluated only on the
    * ≤200-entity audit slice (bounded by design, like q70); at
    * production scale completeness is estimated on exactly such a
    * capped sample while the reduction ratio comes free from block
    * sizes. Pure integer counts, two final divisions. */
  val erBlockMetrics: Q = Q(
    "er_block_metrics",
    """WITH c AS (SELECT c_custkey AS id, c_name AS nm,
      |    length(c_name) AS ln
      |  FROM customer WHERE c_custkey <= 200),
      |p AS (SELECT a.id AS ia, b.id AS ib,
      |    CASE WHEN abs(a.ln - b.ln) <= 2 THEN 1 ELSE 0 END AS blocked,
      |    CASE WHEN levenshtein(a.nm, b.nm) <= 2 THEN 1 ELSE 0 END
      |      AS istrue
      |  FROM c a JOIN c b ON a.id < b.id),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |    CAST(sum(blocked) AS BIGINT) AS nc,
      |    CAST(sum(istrue) AS BIGINT) AS nt,
      |    CAST(sum(blocked * istrue) AS BIGINT) AS ntb FROM p)
      |SELECT np AS n_pairs, nc AS n_candidates,
      |  floor((1 - CAST(nc AS DOUBLE) / np) * 1000000 + 0.5) / 1000000
      |    AS reduction_ratio,
      |  nt AS n_true, ntb AS n_true_blocked,
      |  floor(CAST(ntb AS DOUBLE) / nt * 1000000 + 0.5) / 1000000
      |    AS pair_completeness
      |FROM m""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("id"), col("c_name").as("nm"),
        length(col("c_name")).as("ln"))
    val a = c.select(col("id").as("ia"), col("nm").as("na"),
      col("ln").as("la"))
    val b = c.select(col("id").as("ib"), col("nm").as("nb"),
      col("ln").as("lb"))
    a.join(b, col("ia") < col("ib")) // <=200-entity capped audit slice
      .select(
        when(abs(col("la") - col("lb")) <= 2, 1L).otherwise(0L)
          .as("blocked"),
        when(levenshtein(col("na"), col("nb")) <= 2, 1L).otherwise(0L)
          .as("istrue"))
      .agg(count(lit(1)).as("np"),
        sum("blocked").as("nc"), sum("istrue").as("nt"),
        sum(col("blocked") * col("istrue")).as("ntb"))
      .select(col("np").as("n_pairs"), col("nc").as("n_candidates"),
        (floor((lit(1) - col("nc").cast("double") / col("np")) * 1000000
          + lit(0.5)) / 1000000).as("reduction_ratio"),
        col("nt").as("n_true"), col("ntb").as("n_true_blocked"),
        (floor(col("ntb").cast("double") / col("nt") * 1000000 + lit(0.5))
          / 1000000).as("pair_completeness"))
  }

  /** Rocchio pseudo-relevance-feedback query expansion (Rocchio 1971
    * — the classic PRF loop): BM25-rank the corpus for the seed query
    * {spark, vector}, take the top-5 docs as pseudo-relevant, and
    * emit the 5 best NEW expansion terms by summed tf·idf weight over
    * that feedback set. The feedback set is a 5-row broadcast, so the
    * expansion scan touches only feedback-doc tokens; BM25 reuses the
    * established bm25_topdocs algebra (term-sorted folds, ln parity);
    * expansion weights fold doc-sorted per term. */
  val rocchioExpand: Q = Q(
    "rocchio_expand",
    """WITH qt(term) AS (VALUES ('spark'), ('vector')),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |         FROM documents),
      |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs,
      |                 avg(CAST(len AS DOUBLE)) AS avg_len FROM dl),
      |tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks
      |       JOIN qt ON tok = qt.term GROUP BY doc_id, tok),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
      |       GROUP BY term),
      |contrib AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / avg_len)) AS c
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats),
      |scored AS (
      |  SELECT doc_id, round(list_sum(list(c ORDER BY term)), 6) AS score
      |  FROM contrib GROUP BY doc_id),
      |rel AS (SELECT doc_id FROM scored
      |        ORDER BY score DESC, doc_id LIMIT 5),
      |alldf AS (SELECT tok AS term, CAST(count(DISTINCT doc_id) AS BIGINT)
      |      AS df FROM toks GROUP BY tok),
      |rtf AS (SELECT t.tok AS term, t.doc_id,
      |      CAST(count(*) AS BIGINT) AS tf
      |  FROM toks t JOIN rel ON rel.doc_id = t.doc_id
      |  WHERE t.tok <> '' AND t.tok NOT IN (SELECT term FROM qt)
      |  GROUP BY 1, 2),
      |wt AS (SELECT r.term, any_value(a.df) AS df,
      |    list_aggregate(list_transform(list(r.tf ORDER BY r.doc_id),
      |      x -> CAST(x AS DOUBLE)), 'sum')
      |      * ln(CAST((SELECT n_docs FROM stats) AS DOUBLE)
      |           / any_value(a.df)) AS w
      |  FROM rtf r JOIN alldf a ON a.term = r.term
      |  GROUP BY r.term)
      |SELECT term, df, floor(w * 1000000 + 0.5) / 1000000 AS weight
      |FROM wt ORDER BY w DESC, term LIMIT 5""".stripMargin) { (s, d) =>
    val qTerms = Seq("spark", "vector")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("len").cast("double")).as("avg_len"))
    val tf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val contrib = tf.join(broadcast(df), "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(1) - 0.75
            + lit(0.75) * col("len") / col("avg_len")))).as("c"),
        col("term"))
    val rel = contrib.groupBy("doc_id")
      .agg(round(expr("aggregate(transform(array_sort(collect_list(" +
        "struct(term, c))), t -> t.c), 0D, (a, x) -> a + x)"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(5)
      .select("doc_id")
    val alldf = toks.groupBy(col("tok").as("term"))
      .agg(countDistinct("doc_id").as("adf"))
    val rtf = toks
      .join(broadcast(rel), "doc_id")
      .filter(col("tok") =!= "" && !col("tok").isin(qTerms: _*))
      .groupBy(col("tok").as("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    rtf.join(alldf, "term")
      .crossJoin(broadcast(stats.select("n_docs")))
      .groupBy("term")
      .agg(first("adf").as("df"),
        (expr("aggregate(transform(array_sort(collect_list(" +
          "struct(doc_id, tf))), t -> CAST(t.tf AS DOUBLE)), 0D, " +
          "(a, x) -> a + x)")
          * log(first("n_docs").cast("double") / first("adf"))).as("w"))
      .select(col("term"), col("df"),
        (floor(col("w") * 1000000 + lit(0.5)) / 1000000).as("weight"))
      .orderBy(col("w").desc, col("term")).limit(5)
  }

  val all: Seq[Q] = Seq(phraseSearch, tableFingerprint, qlDirichlet, dlMatch,
    jwMatch, rrfFusion, fsLinkage, bestPassage, erBlockMetrics,
    rocchioExpand)
}
