package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-prep operators, round 3 continued: fixed-budget document
  * chunking with overlap, contiguous sequence packing, int8 embedding
  * quantization, and text normalization. All oracle-checked; all pure
  * map / single-window shapes that scale linearly.
  */
object TrainingPrep {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  /** Sliding-window chunking: each doc becomes ceil(n/48) chunks of up
    * to 64 tokens with 16-token overlap (stride 48) — the standard
    * context-window prep for long documents. Explode over a generated
    * start sequence: map-side only, no shuffle except the output sort;
    * at 100 TB chunking parallelizes per input split. */
  val docChunk: Q = Q(
    "doc_chunk",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |c AS (SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_tokens,
      |        CAST(s AS INTEGER) AS start,
      |        array_to_string(ts[CAST(s + 1 AS INTEGER):CAST(least(s + 64, len(ts)) AS INTEGER)], ' ')
      |          AS chunk
      |      FROM t, unnest(range(0, greatest(len(ts), 1), 48)) AS u(s))
      |SELECT doc_id, start, n_tokens,
      |  CAST(len(string_split(chunk, ' ')) AS INTEGER) AS chunk_tokens, chunk
      |FROM c ORDER BY doc_id, start""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    docs(s, d)
      .select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"), size(col("ts")).as("n_tokens"),
        explode(expr("sequence(0, greatest(size(ts) - 1, 0), 48)")).as("start"),
        col("ts"))
      .select(col("doc_id"), col("start").cast("int").as("start"),
        col("n_tokens"),
        expr("concat_ws(' ', slice(ts, start + 1, 64))").as("chunk"))
      .select(col("doc_id"), col("start"), col("n_tokens"),
        size(split(col("chunk"), " ")).as("chunk_tokens"), col("chunk"))
      .orderBy("doc_id", "start")
  }

  /** Contiguous sequence packing: per source, docs in doc_id order fill
    * 2048-token bins — bin = floor(running-token-prefix / 2048), the
    * deterministic relational form of pack-short-docs-into-fixed-
    * context batches. One shuffle on the stratum key + a window
    * running sum; bins and stats are exact integers. */
  val packSequences: Q = Q(
    "pack_sequences",
    """WITH t AS (SELECT doc_id, source,
      |             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
      |           FROM documents),
      |p AS (SELECT doc_id, source, n_tokens,
      |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
      |          ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          // 2048 AS INTEGER) AS bin
      |      FROM t)
      |SELECT source, bin, CAST(count(*) AS INTEGER) AS n_docs,
      |  CAST(sum(n_tokens) AS INTEGER) AS bin_tokens
      |FROM p GROUP BY source, bin ORDER BY source, bin""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum("n_tokens").over(w), lit(0)) / 2048).cast("int"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum("n_tokens").cast("int").as("bin_tokens"))
      .orderBy("source", "bin")
  }

  /** Symmetric int8 embedding quantization + reconstruction error —
    * the storage/serving compression step for embedding corpora.
    * scale = 127 / max|x|; q = floor(x·scale + 0.5) (identical integer
    * rounding in both engines — round() on halfway doubles is not).
    * Array folds are ordered in both engines, so the error sums are
    * bit-deterministic. Pure map at scale. */
  val embedQuantize: Q = Q(
    "embed_quantize",
    """WITH m AS (SELECT vec_id, embedding,
      |             CAST(list_max(list_transform(embedding, x -> abs(x)))
      |               AS DOUBLE) AS mx
      |           FROM embeddings),
      |q AS (SELECT vec_id, embedding, mx,
      |        list_transform(embedding,
      |          x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5)
      |               AS INTEGER)) AS qv
      |      FROM m WHERE mx > 0)
      |SELECT vec_id,
      |  CAST(list_min(qv) AS INTEGER) AS q_min,
      |  CAST(list_max(qv) AS INTEGER) AS q_max,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  round(list_sum(list_transform(range(1, len(qv) + 1),
      |    i -> pow(CAST(embedding[i] AS DOUBLE) - qv[i] * (mx / 127.0), 2)))
      |    / len(qv), 12) AS mse
      |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)")
          .as("mx"))
      .filter(col("mx") > 0)
      .withColumn("qv", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0d / mx) + 0.5d) AS INT))"))
      .select(col("vec_id"),
        expr("array_min(qv)").as("q_min"),
        expr("array_max(qv)").as("q_max"),
        expr("aggregate(qv, 0L, (a, x) -> a + x)").as("q_sum"),
        round(expr(
          """aggregate(zip_with(embedding, qv,
            |  (e, q) -> pow(CAST(e AS DOUBLE) - q * (mx / 127.0d), 2)),
            |  0.0d, (a, x) -> a + x)""".stripMargin) / size(col("qv")), 12)
          .as("mse"))
      .orderBy("vec_id")
  }

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace — the canonicalization pass before hashing/dedup.
    * Pure map; patterns in the RE2 ∩ Java dialect. */
  val textNormalize: Q = Q(
    "text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |    ' +', ' ', 'g')) AS norm,
      |  CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS INTEGER)
      |    AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    docs(s, d)
      .select(col("doc_id"), norm.as("norm"),
        size(split(norm, " ")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Dataset mixture allocation: split a global token budget (half the
    * corpus) across sources by mixture weight, then fill each source's
    * allocation in deterministic hash order — the mixing step that
    * builds a training set from weighted sources. All-integer math;
    * the only shuffles are one tiny weight/total aggregate (broadcast
    * back) and the per-source window. */
  val mixtureAllocate: Q = Q(
    "mixture_allocate",
    """WITH t AS (SELECT doc_id, source,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |             ((doc_id & 2147483647) * 1099087573) % 1000003 AS hkey
      |           FROM documents),
      |w AS (SELECT source, sum(n_tokens) AS src_tokens,
      |        CASE WHEN source IN ('src0', 'src1', 'src2') THEN 3 ELSE 1 END
      |          AS wt
      |      FROM t GROUP BY source),
      |g AS (SELECT sum(src_tokens) // 2 AS budget, sum(wt) AS total_wt FROM w),
      |a AS (SELECT source, wt, budget * wt // total_wt AS alloc FROM w, g),
      |c AS (SELECT t.doc_id, t.source, t.n_tokens, a.alloc,
      |        sum(t.n_tokens) OVER (PARTITION BY t.source
      |          ORDER BY t.hkey, t.doc_id) AS cum
      |      FROM t JOIN a USING (source))
      |SELECT source, CAST(max(alloc) AS BIGINT) AS alloc,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
      |FROM c WHERE cum <= alloc
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      ((col("doc_id").bitwiseAND(lit(2147483647L)) * lit(1099087573L)) % 1000003).as("hkey"))
    val w = t.groupBy("source")
      .agg(sum("n_tokens").as("src_tokens"))
      .withColumn("wt",
        when(col("source").isin("src0", "src1", "src2"), 3L).otherwise(1L))
    val g = w.agg((sum("src_tokens") / 2).cast("long").as("budget"),
      sum("wt").as("total_wt"))
    val a = w.crossJoin(broadcast(g))
      .select(col("source"), (col("budget") * col("wt") / col("total_wt"))
        .cast("long").as("alloc"))
    val cumW = Window.partitionBy("source").orderBy("hkey", "doc_id")
    t.join(broadcast(a), "source")
      .withColumn("cum", sum("n_tokens").over(cumW))
      .filter(col("cum") <= col("alloc"))
      .groupBy("source")
      .agg(max("alloc").as("alloc"), count(lit(1)).as("n_docs"),
        sum("n_tokens").as("kept_tokens"))
      .orderBy("source")
  }

  /** Skip-gram training-pair generation with deterministic negative
    * sampling (word2vec's data-prep stage, Mikolov 2013): positives
    * are (center, context) pairs within a ±2 window — two lead
    * columns from ONE doc-partitioned pass, never a self-join — and
    * each positive draws one negative from the sorted vocabulary by a
    * position-keyed multiplicative hash (reproducible across runs and
    * engines; the real pipeline's seeded sampler). The gate pins the
    * ENTIRE generated multiset, not just counts: the output carries
    * an order-independent md5+poly31 fingerprint per label (the
    * table_fingerprint device), so one wrong pair anywhere breaks the
    * hash match. Vocabulary is a 1-row broadcast; generation is
    * map-only. */
  val skipgramPairs: Q = Q(
    "skipgram_pairs",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
      |           FROM documents),
      |tok AS (SELECT doc_id, q.i AS pos, ts[q.i] AS w FROM t,
      |  LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) q(i)),
      |led AS (SELECT doc_id, pos, w AS center,
      |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
      |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2
      |  FROM tok),
      |vocab AS (SELECT list(w ORDER BY w) AS vl,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM (SELECT DISTINCT w FROM tok)),
      |pos1 AS (
      |  SELECT doc_id, pos, center, c1 AS ctx, 1 AS off FROM led
      |  WHERE c1 IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, pos, center, c2, 2 FROM led WHERE c2 IS NOT NULL),
      |pairs AS (
      |  SELECT center, ctx, CAST(1 AS BIGINT) AS lbl FROM pos1
      |  UNION ALL
      |  SELECT p.center,
      |    vl[CAST(((p.doc_id % 524287) * 8191 + p.pos * 131
      |      + p.off * 7919) % 1000003 % v + 1 AS BIGINT)],
      |    CAST(0 AS BIGINT)
      |  FROM pos1 p CROSS JOIN vocab),
      |h AS (SELECT lbl, center, ctx,
      |    md5(center || '|' || ctx || '|' || CAST(lbl AS VARCHAR)) AS hh
      |  FROM pairs)
      |SELECT lbl, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT center || '|' || ctx) AS BIGINT) AS n_distinct,
      |  CAST(sum(list_aggregate(list_transform(range(0, 8),
      |    j -> ascii(substring(hh, CAST(j + 1 AS INTEGER), 1))
      |         * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003) AS BIGINT)
      |    AS fingerprint
      |FROM h GROUP BY lbl ORDER BY lbl""".stripMargin) { (s, d) =>
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
    val led = tok.select(col("doc_id"), col("pos"), col("w").as("center"),
      lead("w", 1).over(wDoc).as("c1"), lead("w", 2).over(wDoc).as("c2"))
    val pos1 = led.filter(col("c1").isNotNull)
      .select(col("doc_id"), col("pos"), col("center"),
        col("c1").as("ctx"), lit(1).as("off"))
      .unionAll(led.filter(col("c2").isNotNull)
        .select(col("doc_id"), col("pos"), col("center"),
          col("c2").as("ctx"), lit(2).as("off")))
    val vocab = tok.select("w").distinct()
      .agg(expr("array_sort(collect_list(w))").as("vl"),
        count(lit(1)).as("v"))
    val pairs = pos1.select(col("center"), col("ctx"), lit(1L).as("lbl"))
      .unionAll(pos1.crossJoin(broadcast(vocab)) // 1-row vocabulary
        .select(col("center"),
          expr("element_at(vl, CAST(((doc_id % 524287) * 8191 + pos * 131 " +
            "+ off * 7919) % 1000003 % v + 1 AS INT))").as("ctx"),
          lit(0L).as("lbl")))
    val poly = expr("aggregate(transform(sequence(0, 7), " +
      "j -> ascii(substring(hh, CAST(j + 1 AS INT), 1)) " +
      "* CAST(pow(31, j) AS BIGINT)), 0L, (a, x) -> a + x) % 1000003")
    pairs
      .withColumn("hh", md5(concat_ws("|", col("center"), col("ctx"),
        col("lbl"))))
      .groupBy("lbl")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(concat_ws("|", col("center"), col("ctx")))
          .as("n_distinct"),
        sum(poly).as("fingerprint"))
      .orderBy("lbl")
  }

  /** T5-style SPAN-CORRUPTION masking statistics (Raffel et al. 2020) —
    * the pretraining-objective prep step: every token position draws a
    * DETERMINISTIC uniform (the weighted_sample Knuth-hash convention,
    * keyed on doc_id·131071 + position so every position is an
    * independent portable draw); positions with u < 0.05 START a
    * 3-token corruption span, and a position is MASKED iff any of
    * {pos, pos−1, pos−2} started a span — ~15% expected corruption in
    * ~3-token spans, the T5 default shape. Output per doc: token
    * count, span-start count, masked count, and the realized
    * corruption rate (4-dp floor rounding both engines). The overlap
    * union (spans that collide merge implicitly) is handled by the
    * 3-way disjunction, NOT a sequential scan — so the whole op is one
    * posexplode + integer hash arithmetic + a per-doc re-aggregate:
    * map-shaped, embarrassingly parallel at 100 TB, and the seeded
    * draw swaps for a cryptographic PRF without touching the plan. */
  lazy val spanMaskStats: Q = Q(
    "span_mask_stats",
    """WITH t AS (SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tokens FROM documents),
      |m AS (SELECT doc_id, n_tokens,
      |    list_sum(list_transform(range(1, n_tokens + 1), p ->
      |      CASE WHEN (((doc_id * 131071 + p) & 2147483647) * 2654435761)
      |          % 1000003 + 1 < 0.05 * 1000004.0 THEN 1 ELSE 0 END))
      |      AS n_spans,
      |    list_sum(list_transform(range(1, n_tokens + 1), p ->
      |      CASE WHEN
      |        ((((doc_id * 131071 + p) & 2147483647) * 2654435761)
      |          % 1000003 + 1 < 0.05 * 1000004.0)
      |        OR (p >= 2 AND
      |          (((doc_id * 131071 + p - 1) & 2147483647) * 2654435761)
      |            % 1000003 + 1 < 0.05 * 1000004.0)
      |        OR (p >= 3 AND
      |          (((doc_id * 131071 + p - 2) & 2147483647) * 2654435761)
      |            % 1000003 + 1 < 0.05 * 1000004.0)
      |      THEN 1 ELSE 0 END)) AS n_masked
      |  FROM t WHERE n_tokens >= 1)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_spans AS BIGINT) AS n_spans,
      |  CAST(n_masked AS BIGINT) AS n_masked,
      |  floor(n_masked * 10000.0 / n_tokens + 0.5) / 10000 AS mask_rate
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    // integer-only start test: u < 0.05 ⟺ hashResidue + 1 < 0.05·1000004
    // (both sides exact — no double division in the hot loop)
    def startsAt(p: org.apache.spark.sql.Column) =
      (((col("doc_id") * 131071 + p).bitwiseAND(lit(2147483647L))
        * lit(2654435761L)) % 1000003 + 1) < lit(0.05 * 1000004.0)
    val toks = docs(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      // pin the empty-document behavior on BOTH engines (oracle has the
      // matching WHERE): sequence(1, 0) in Spark defaults to step -1 and
      // yields [1, 0], while DuckDB's range(1, 1) is empty — currently
      // unreachable (split never returns 0 tokens for non-null text) but
      // a latent parity divergence if null/empty docs enter the fixture
      // (r12 advisor).
      .filter(col("n_tokens") >= 1)
    toks.select(col("doc_id"), col("n_tokens"),
        posexplode(sequence(lit(1), col("n_tokens"))).as(Seq("i", "p")))
      .select(col("doc_id"), col("n_tokens"),
        startsAt(col("p")).cast("long").as("st"),
        (startsAt(col("p")) ||
          (col("p") >= 2 && startsAt(col("p") - 1)) ||
          (col("p") >= 3 && startsAt(col("p") - 2))).cast("long").as("mk"))
      .groupBy("doc_id", "n_tokens")
      .agg(sum("st").as("n_spans"), sum("mk").as("n_masked"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("n_spans"), col("n_masked"),
        (floor(col("n_masked") * 10000.0 / col("n_tokens") + lit(0.5)) / 10000)
          .as("mask_rate"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(docChunk, packSequences, embedQuantize, textNormalize,
    mixtureAllocate, skipgramPairs, spanMaskStats)
}
