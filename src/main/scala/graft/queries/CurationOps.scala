package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsofJoin

/** Training-data curation operators, round 3: point-in-time (as-of)
  * join, benchmark decontamination by n-gram overlap, deterministic
  * stratified sampling + per-group quotas, PII scrubbing, and
  * repetition scoring (Gopher-style quality rule). All oracle-checked.
  */
object CurationOps {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  /** As-of join: each purchase event picks up the user's latest view at
    * or before it (`AsofJoin.backward` — single shuffle, no range-join
    * explosion). Right side pre-aggregated to one row per (user, ts) so
    * "latest" is well defined; oracle uses DuckDB's native ASOF LEFT
    * JOIN. Epoch-millis output avoids timestamp formatting drift. */
  val asofJoin: Q = Q(
    "asof_join",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts, max(event_id) AS view_id FROM events
      |      WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id,
      |  epoch_ms(p.ts) AS purchase_ms,
      |  epoch_ms(v.ts) AS view_ms,
      |  epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms,
      |  v.view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("view_id"))
    AsofJoin.backward(purchases, views, "user_id", "ts", Seq("ts", "view_id"))
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts)").as("purchase_ms"),
        expr("unix_millis(asof_ts)").as("view_ms"),
        (expr("unix_millis(ts)") - expr("unix_millis(asof_ts)")).as("gap_ms"),
        col("asof_view_id").as("view_id"))
      .orderBy("event_id")
  }

  /** As-of join with a staleness cap (`merge_asof(tolerance=)`): a view
    * more than one hour before the purchase no longer qualifies — the
    * match nulls out rather than filling with arbitrarily stale state.
    * Oracle: DuckDB's nearest-match ASOF, with the same gap cap applied
    * as a post-predicate. */
  val asofJoinTolerance: Q = Q(
    "asof_join_tolerance",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts, max(event_id) AS view_id FROM events
      |      WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id,
      |  epoch_ms(p.ts) AS purchase_ms,
      |  CASE WHEN epoch_ms(p.ts) - epoch_ms(v.ts) <= 3600000
      |       THEN epoch_ms(v.ts) END AS view_ms,
      |  CASE WHEN epoch_ms(p.ts) - epoch_ms(v.ts) <= 3600000
      |       THEN v.view_id END AS view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("view_id"))
    AsofJoin.backward(purchases, views, "user_id", "ts", Seq("ts", "view_id"),
      tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts)").as("purchase_ms"),
        expr("unix_millis(asof_ts)").as("view_ms"),
        col("asof_view_id").as("view_id"))
      .orderBy("event_id")
  }

  /** FORWARD as-of join — each purchase picks up the user's EARLIEST
    * view at or after it (the "what did they do next" direction;
    * pandas merge_asof(direction='forward')). Same single-shuffle
    * union-scan machinery as the backward form with the scan order
    * reversed; DuckDB's native ASOF understands the direction from the
    * `<=` inequality. */
  val asofJoinForward: Q = Q(
    "asof_join_forward",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts, max(event_id) AS view_id FROM events
      |      WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id,
      |  epoch_ms(p.ts) AS purchase_ms,
      |  epoch_ms(v.ts) AS view_ms,
      |  epoch_ms(v.ts) - epoch_ms(p.ts) AS gap_ms,
      |  v.view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max("event_id").as("view_id"))
    AsofJoin.forward(purchases, views, "user_id", "ts", Seq("ts", "view_id"))
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts)").as("purchase_ms"),
        expr("unix_millis(asof_ts)").as("view_ms"),
        (expr("unix_millis(asof_ts)") - expr("unix_millis(ts)")).as("gap_ms"),
        col("asof_view_id").as("view_id"))
      .orderBy("event_id")
  }

  /** Benchmark decontamination: flag training docs sharing any token
    * 5-gram with the eval split (doc_id % 97 == 0 stands in for the
    * benchmark). Eval grams are a small distinct set → broadcast join
    * against exploded train grams; at 100 TB the benchmark side stays
    * tiny while the scan side streams. The standard n-gram-overlap
    * decontamination pass (public recipe, e.g. GPT-3/PaLM appendices). */
  val decontamOverlap: Q = Q(
    "decontam_overlap",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |g AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, len(ts) - 3),
      |          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
      |               ts[i+3] || ' ' || ts[i+4])) AS grams
      |      FROM t WHERE len(ts) >= 5),
      |e AS (SELECT list_distinct(flatten(list(grams))) AS eg FROM g
      |      WHERE doc_id % 97 = 0),
      |c AS (SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
      |        CAST(len(list_intersect(grams, eg)) AS INTEGER) AS n_hit
      |      FROM g, e WHERE doc_id % 97 <> 0)
      |SELECT doc_id, n_grams, n_hit,
      |  round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS frac
      |FROM c WHERE n_hit > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Native ShingleSet == array_distinct(transform(...5-gram concat))
    // for docs with >= 5 tokens (parity pinned in ShingleSuite); the HOF
    // form runs interpreted and was 10s at sf0.1 vs ~0.3s native.
    val g = docs(s, d).filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingles(col("text"), 5).as("grams"))
    val evalGrams = g.filter(col("doc_id") % 97 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    g.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).cast("int").as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("frac"))
      .orderBy("doc_id")
  }

  /** Sketch-accelerated decontamination: SAME exact result as
    * decontam_overlap (identical oracle SQL), but the exploded train
    * gram stream first passes a Bloom-filter membership test built
    * from the eval grams — at 100 TB the bloom prunes ~all non-
    * matching grams map-side with zero network BEFORE the join, so
    * join input is proportional to true contamination, not corpus
    * size. False positives are removed by the exact broadcast join
    * that follows, which is what keeps a probabilistic sketch under
    * the deterministic rows+schema+hash gate. The bloom build is the
    * distributed `bloom_filter_agg` two-phase aggregate (partial
    * sketches merge executor-side; only the final ~64KB sketch reaches
    * the driver), and the membership probe is Spark's native
    * `might_contain` expression over that sketch as a literal — fully
    * inside whole-stage codegen, no per-row Scala on the hot path
    * (round-6 verdict #6 replaced the scalar-UDF probe). */
  val decontamBloom: Q = Q(
    "decontam_bloom",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |g AS (SELECT doc_id,
      |        list_distinct(list_transform(range(1, len(ts) - 3),
      |          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
      |               ts[i+3] || ' ' || ts[i+4])) AS grams
      |      FROM t WHERE len(ts) >= 5),
      |e AS (SELECT list_distinct(flatten(list(grams))) AS eg FROM g
      |      WHERE doc_id % 97 = 0),
      |c AS (SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
      |        CAST(len(list_intersect(grams, eg)) AS INTEGER) AS n_hit
      |      FROM g, e WHERE doc_id % 97 <> 0)
      |SELECT doc_id, n_grams, n_hit,
      |  round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS frac
      |FROM c WHERE n_hit > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val g = docs(s, d).filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingles(col("text"), 5).as("grams"))
    val evalGrams = g.filter(col("doc_id") % 97 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val bloomBytes = evalGrams
      .select(graft.functions.BloomBridge
        .bloomFilterAgg(col("gram"), 1L << 16, fpp = 0.03).as("bf"))
      .head().getAs[Array[Byte]](0)
    g.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
      .filter(graft.functions.BloomBridge
        .mightContain(bloomBytes, col("gram"))) // sketch prefilter, map-side, codegen'd
      .join(broadcast(evalGrams), "gram") // exact verify: FPs drop here
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).cast("int").as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("frac"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified Bernoulli sampling: keep a doc iff its
    * multiplicative hash bucket (Knuth constant) falls under the
    * per-language rate. Pure map — no shuffle, reproducible across
    * runs/engines, the scalable way to downsample a 100 TB corpus with
    * per-stratum rates. The id is masked to 31 bits BEFORE multiplying
    * so the product provably fits signed 64-bit: without the mask,
    * ids above ~2^32 silently wrap in Spark (negative bucket — always
    * kept) but RAISE in DuckDB — the engines would diverge exactly
    * where a 100 TB id space lives. 2^31 * 2654435761 < 2^63. */
  val sampleStratified: Q = Q(
    "sample_stratified",
    """SELECT doc_id, lang, source,
      |  CAST(((doc_id & 2147483647) * 2654435761) % 100 AS INTEGER) AS bucket
      |FROM documents
      |WHERE ((doc_id & 2147483647) * 2654435761) % 100 <
      |  CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 30 END
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bucket = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % 100
    val rate = expr(
      "CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 30 END")
    docs(s, d).filter(bucket < rate)
      .select(col("doc_id"), col("lang"), col("source"),
        bucket.cast("int").as("bucket"))
      .orderBy("doc_id")
  }

  /** Per-group quota sampling: at most 5 docs per source, chosen by a
    * deterministic hash order (not "first 5 in file order", which is
    * ingest-dependent). One shuffle on the stratum key + window; at
    * scale the quota bounds every group's output regardless of skew.
    * Same 31-bit pre-mask as sample_stratified (overflow-proof hash). */
  val sampleQuota: Q = Q(
    "sample_quota",
    """SELECT doc_id, source, rn FROM (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY ((doc_id & 2147483647) * 1099087573) % 1000003, doc_id) AS INTEGER) AS rn
      |  FROM documents) t
      |WHERE rn <= 5 ORDER BY source, rn""".stripMargin) { (s, d) =>
    val hkey = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(1099087573L)) % 1000003
    val w = Window.partitionBy("source").orderBy(hkey.asc, col("doc_id").asc)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        row_number().over(w).cast("int").as("rn"))
      .filter(col("rn") <= 5)
      .orderBy("source", "rn")
  }

  /** Deterministic train/val/test split: every doc lands in exactly one
    * split by hash bucket (80/10/10), independent of ingest order, run,
    * or cluster layout — the assignment a training pipeline must be
    * able to recompute years later from the id alone. Pure map, no
    * shuffle. Distinct multiplier from the sampling queries so split
    * membership does not correlate with sample membership; same 31-bit
    * pre-mask (overflow-proof in both engines, see sample_stratified). */
  val splitAssign: Q = Q(
    "split_assign",
    """SELECT doc_id, lang,
      |  CASE WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 800 THEN 'train'
      |       WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val r = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2246822519L)) % 1000
    docs(s, d).select(col("doc_id"), col("lang"),
      when(r < 800, "train").when(r < 900, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** PII scrubbing: regex-redact emails and phone numbers, counting
    * redactions. The fixtures are synthetic word salad, so deterministic
    * PII is appended per doc before scrubbing — the scrub itself (global
    * regexp_replace + match counting, map-only at scale) is the operator
    * under test. Patterns kept in the RE2 ∩ Java-regex dialect so both
    * engines match identically. */
  val piiScrub: Q = Q(
    "pii_scrub",
    """WITH f AS (SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@mail.example.com or call +1-555-' ||
      |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS full_text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(full_text,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(full_text, '\+1-555-[0-9]{4}')) AS INTEGER)
      |    AS n_phones,
      |  regexp_replace(regexp_replace(full_text,
      |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
      |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val full = concat(col("text"), lit(" contact user"), col("doc_id"),
      lit("@mail.example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
    docs(s, d).select(col("doc_id"), full.as("full_text"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("full_text"), lit(emailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("full_text"), lit(phoneRe), lit(0)))
          .as("n_phones"),
        regexp_replace(regexp_replace(col("full_text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("scrubbed"))
      .orderBy("doc_id")
  }

  /** Repetition scoring (Gopher-style quality rule): distinct-token
    * fraction and the most-frequent-bigram share per document. Explode +
    * two-phase aggregation — map-side partials keep the shuffle at
    * one (doc_id, gram) row per distinct gram, linear at 100 TB. */
  val repetitionScore: Q = Q(
    "repetition_score",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |tok AS (SELECT doc_id, n_tokens,
      |          CAST(count(DISTINCT u) AS INTEGER) AS n_distinct
      |        FROM (SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_tokens,
      |                unnest(ts) AS u FROM t)
      |        GROUP BY 1, 2),
      |bg AS (SELECT doc_id, g, count(*) AS c
      |       FROM (SELECT doc_id,
      |               unnest(list_transform(range(1, len(ts)),
      |                 i -> ts[i] || ' ' || ts[i+1])) AS g FROM t)
      |       GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS top_cnt FROM bg GROUP BY 1)
      |SELECT doc_id, n_tokens,
      |  round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_frac,
      |  round(CAST(top_cnt AS DOUBLE) / (n_tokens - 1), 6) AS top_bigram_frac
      |FROM tok JOIN top USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val base = docs(s, d).filter(size(ts) >= 2)
      .select(col("doc_id"), ts.as("ts"))
    val tok = base
      .select(col("doc_id"), size(col("ts")).as("n_tokens"),
        explode(col("ts")).as("tok"))
      .groupBy("doc_id", "n_tokens")
      .agg(countDistinct("tok").cast("int").as("n_distinct"))
    val top = base
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))"))
        .as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_cnt"))
    tok.join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("distinct_frac"),
        round(col("top_cnt").cast("double") / (col("n_tokens") - 1), 6)
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Language-model perplexity scoring (the CCNet-style quality
    * filter): a char-bigram LM with add-1 smoothing is trained on the
    * corpus itself, then every document is scored by its perplexity
    * under that model — high-ppl docs are the gibberish/boilerplate
    * candidates a curation pipeline drops or down-weights.
    *
    * P(c2|c1) = (count(c1c2) + 1) / (count(c1·) + V), V = distinct
    * chars; ppl = exp(-mean ln P). Two passes over the corpus, both
    * scale-shaped: training is explode → two-phase count on a key
    * space bounded by V² (map-side combine collapses each partition to
    * ≤V² rows, and the model table is broadcast back — it never
    * shuffles the corpus); scoring is explode → broadcast-join →
    * per-doc mean (one doc_id-keyed shuffle of partial sums). A real
    * deployment would persist the tiny model table and score
    * incrementally; the final round(…, 4) absorbs cross-engine libm
    * and summation-order ulps (per the verify notes' float rules). */
  val lmPerplexity: Q = Q(
    "lm_perplexity",
    """WITH pos AS (SELECT doc_id, text, length(text) AS len
      |             FROM documents WHERE length(text) >= 2),
      |bg AS (SELECT doc_id, substr(text, CAST(j AS INT), 2) AS b
      |       FROM pos, LATERAL (SELECT unnest(range(1, len)) AS j) u),
      |cnt AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
      |pre AS (SELECT substr(b, 1, 1) AS c1, sum(c) AS tot
      |        FROM cnt GROUP BY 1),
      |v AS (SELECT count(DISTINCT substr(text, CAST(j AS INT), 1)) AS vsize
      |      FROM pos, LATERAL (SELECT unnest(range(1, len + 1)) AS j) u)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |  round(exp(-avg(ln((cnt.c + 1.0) / (pre.tot + v.vsize)))), 4) AS ppl
      |FROM bg JOIN cnt USING (b)
      |        JOIN pre ON substr(bg.b, 1, 1) = pre.c1
      |        CROSS JOIN v
      |GROUP BY bg.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // One native pass per doc compacts occurrences to (distinct bigram,
    // count) — everything downstream (train counts, score join, per-doc
    // mean) is a weighted sum over ~V²-bounded rows per doc instead of
    // one row per character of the corpus. Totals are identical; only
    // float summation grouping differs, absorbed by the round(…, 4).
    val base = docs(s, d).filter(length(col("text")) >= 2)
    val bgc = base.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.charNgramCounts(col("text"), 2))
        .as(Seq("b", "k")))
    val cnt = bgc.groupBy("b").agg(sum("k").as("c"))
    val pre = cnt.groupBy(substring(col("b"), 1, 1).as("c1"))
      .agg(sum(col("c")).as("tot"))
    val v = base.select(
      explode(graft.functions.GraftFunctions.charNgramCounts(col("text"), 1))
        .as(Seq("ch", "kc")))
      .agg(countDistinct(col("ch")).as("vsize"))
    bgc.join(broadcast(cnt), "b")
      .join(broadcast(pre), substring(col("b"), 1, 1) === col("c1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        round(exp(-(sum(col("k") *
            log((col("c") + 1.0) / (col("tot") + col("vsize"))))
          / sum(col("k")))), 4).as("ppl"))
      .orderBy("doc_id")
  }

  /** Model-based quality classification (fastText/DCLM-style): hashed
    * bag-of-tokens linear scorer, label = sign of the score. The
    * "model" is a deterministic weight formula over 1024 hash buckets,
    * so both engines replay it exactly — the engine shape (pure map
    * over documents, one native codegen'd expression per row, zero
    * shuffle before the output sort) is precisely a real classifier's;
    * swapping trained weights for the formula changes one literal
    * table. Scoring runs in graft.functions.HashedLinearScore — the
    * composable aggregate(transform(...)) form is two levels of
    * interpreted lambda per token (parity pinned in its suite). */
  val qualityClassify: Q = Q(
    "quality_classify",
    """WITH t AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
      |  FROM documents),
      |s AS (SELECT doc_id, lang, CAST(len(ts) AS INTEGER) AS n_tokens,
      |  list_sum(list_transform(ts, tok ->
      |    ((((list_sum(list_transform(
      |          range(0, CAST(least(length(tok), 8) AS BIGINT)),
      |          j -> ascii(substring(tok, CAST(j + 1 AS INTEGER), 1))
      |               * CAST(pow(31, j) AS BIGINT))) % 1024)
      |       * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS score
      |  FROM t WHERE len(ts) > 0)
      |SELECT doc_id, lang, n_tokens, round(score, 6) AS score,
      |  CAST(score > 0 AS INTEGER) AS keep
      |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = filter(split(col("text"), " "), x => x =!= "")
    docs(s, d)
      .select(col("doc_id"), col("lang"), size(ts).as("n_tokens"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("lang"),
        col("n_tokens").cast("int").as("n_tokens"),
        round(col("raw"), 6).as("score"),
        (col("raw") > 0).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Weighted sampling by priority order (Ohlsson sequential-Poisson /
    * priority sampling): each doc draws a deterministic hash-uniform
    * u ∈ (0,1] and competes with priority u / weight — here weight =
    * n_chars, so longer documents win proportionally more slots. Take
    * the 3 smallest priorities per source. Every arithmetic step is an
    * exactly-rounded division of exact integers, so both engines order
    * identically (no libm pow/ln in the selection path, unlike
    * exponential-key reservoir schemes). One shuffle on the stratum
    * key; the quota bounds each group's output under any skew. */
  val samplePriority: Q = Q(
    "sample_priority",
    """SELECT source, doc_id, n_chars, rn FROM (
      |  SELECT source, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY
      |      ((((doc_id & 2147483647) * 48271) % 1000003 + 1) / 1000003.0)
      |        / n_chars, doc_id) AS INTEGER) AS rn
      |  FROM documents) t
      |WHERE rn <= 3 ORDER BY source, rn""".stripMargin) { (s, d) =>
    val u = ((col("doc_id").bitwiseAND(lit(2147483647L)) * lit(48271L))
      % 1000003 + 1) / lit(1000003.0)
    val w = Window.partitionBy("source")
      .orderBy((u / col("n_chars")).asc, col("doc_id").asc)
    docs(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        row_number().over(w).cast("int").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("source", "rn")
  }

  /** Word-bigram LM scoring with stupid backoff (Brants et al. 2007,
    * the web-scale LM score CCNet-style filters run at corpus size):
    * S(w2|w1) = c12/c1 when the bigram was seen in training, else
    * 0.4·(c2+1)/(N+V) (add-1 on the unigram backoff so unseen words
    * score finite). Train/eval split is doc_id % 10 (80/20) — scoring
    * held-out documents is what makes the backoff branch real.
    *
    * Engine shape: training counts are explode → two-phase partial
    * aggregation (vocabulary-bounded); eval bigrams LEFT JOIN the
    * bigram and unigram tables on the word key (shuffle joins at
    * corpus scale, AQE broadcasts when the model fits); the 1-row
    * (N, V) aggregate broadcasts. Per-doc mean ln S shuffles one
    * partial-sum row per doc. round(4) absorbs cross-engine libm and
    * summation-order ulps. */
  val lmBackoffScore: Q = Q(
    "lm_backoff_score",
    """WITH tr AS (SELECT string_split(text, ' ') AS ts FROM documents
      |            WHERE doc_id % 10 < 8),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |       WHERE doc_id % 10 >= 8 AND len(string_split(text, ' ')) >= 2),
      |uni AS (SELECT u AS w, count(*) AS c
      |        FROM (SELECT unnest(ts) AS u FROM tr) GROUP BY 1),
      |big AS (SELECT g AS b, count(*) AS c12
      |        FROM (SELECT unnest(list_transform(range(1, len(ts)),
      |                i -> ts[i] || ' ' || ts[i+1])) AS g
      |              FROM tr WHERE len(ts) >= 2)
      |        GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS ntok, count(*) AS vsize
      |      FROM uni),
      |eb AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |         i -> ts[i] || ' ' || ts[i+1])) AS b FROM ev),
      |sc AS (SELECT eb.doc_id,
      |         CASE WHEN big.c12 IS NOT NULL
      |              THEN ln(CAST(big.c12 AS DOUBLE) / u1.c)
      |              ELSE ln(0.4 * (COALESCE(u2.c, 0) + 1.0)
      |                      / (n.ntok + n.vsize)) END AS lp
      |       FROM eb
      |       LEFT JOIN big ON eb.b = big.b
      |       LEFT JOIN uni u1 ON split_part(eb.b, ' ', 1) = u1.w
      |       LEFT JOIN uni u2 ON split_part(eb.b, ' ', 2) = u2.w
      |       CROSS JOIN n)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(avg(lp), 4) AS backoff_lp
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val tr = docs(s, d).filter(col("doc_id") % 10 < 8).select(ts.as("ts"))
    val ev = docs(s, d).filter(col("doc_id") % 10 >= 8 && size(ts) >= 2)
      .select(col("doc_id"), ts.as("ts"))
    val uni = tr.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val big = tr.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))"))
        .as("b"))
      .groupBy("b").agg(count(lit(1)).as("c12"))
    val n = uni.agg(sum("c").as("ntok"), count(lit(1)).as("vsize"))
    val eb = ev.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))"))
      .as("b"))
    eb
      .join(big, Seq("b"), "left")
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"),
        expr("split_part(b, ' ', 1) = w1"), "left")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"),
        expr("split_part(b, ' ', 2) = w2"), "left")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        when(col("c12").isNotNull,
          log(col("c12").cast("double") / col("c1")))
          .otherwise(log(lit(0.4) * (coalesce(col("c2"), lit(0L)) + 1.0)
            / (col("ntok") + col("vsize")))).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg("lp"), 4).as("backoff_lp"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance weights (Xie et al. 2023, public
    * literature): rank raw documents by how target-like their hashed
    * n-gram profile is — the data-selection step before importance
    * RESAMPLING decides what enters the training mix. Target = the
    * 'en' slice; features = unigrams hashed into 1024 buckets with the
    * repo's portable 31-polynomial (first 8 chars — powers < 2^35,
    * exact in both engines); weight(doc) = Σ c_b·[ln p̂_target(b) −
    * ln p̂_raw(b)] with add-1 smoothing. Both bucket models are ≤
    * 1024-row broadcasts and the totals are 1-row broadcasts, so at
    * 100 TB the corpus streams twice (model build + scoring) and the
    * token stream never shuffles wider than (doc, bucket) collapse.
    * Per-doc folds run bucket-sorted (nb_langid's determinism
    * discipline); weights floor-round at 1e-6 BEFORE ranking. */
  val dsirWeights: Q = Q(
    "dsir_weights",
    """WITH tk AS (SELECT doc_id, lang, w FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |hb AS (SELECT doc_id, lang,
      |    list_aggregate(list_transform(range(0, least(length(w), 8)),
      |      j -> ascii(substring(w, CAST(j + 1 AS INT), 1))
      |           * CAST(pow(31, j) AS BIGINT)), 'sum') % 1024 AS b
      |  FROM tk),
      |db AS (SELECT doc_id, lang, b, count(*) AS cdw FROM hb GROUP BY 1, 2, 3),
      |rcnt AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM hb GROUP BY b),
      |tcnt AS (SELECT b AS tb, CAST(count(*) AS BIGINT) AS tc FROM hb
      |  WHERE lang = 'en' GROUP BY b),
      |rt AS (SELECT CAST(sum(rc) AS BIGINT) AS rt FROM rcnt),
      |tt AS (SELECT CAST(sum(tc) AS BIGINT) AS tt FROM tcnt),
      |terms AS (SELECT doc_id, lang, db.b AS b,
      |    cdw * (ln((COALESCE(tc, 0) + 1.0) / (tt + 1024.0))
      |         - ln((rc + 1.0) / (rt + 1024.0))) AS contrib
      |  FROM db JOIN rcnt ON rcnt.b = db.b
      |  LEFT JOIN tcnt ON tcnt.tb = db.b
      |  CROSS JOIN rt CROSS JOIN tt),
      |wts AS (SELECT doc_id, lang,
      |    floor(list_aggregate(list(contrib ORDER BY b), 'sum') * 1000000
      |      + 0.5) / 1000000 AS dsir_w
      |  FROM terms GROUP BY doc_id, lang)
      |SELECT doc_id, lang, dsir_w FROM wts
      |ORDER BY dsir_w DESC, doc_id LIMIT 15""".stripMargin) { (s, d) =>
    val tk = docs(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // Unrolled 8-char 31-polynomial bucket (optimization round 13, guide
    // §"expressions and codegen"): the higher-order fold ran interpreted
    // per TOKEN (every word of every document); eight flat
    // ascii(substring) terms whole-stage-codegen. Positions past the
    // word's end contribute ascii('') = 0 — exactly the terms the old
    // least(length(w), 8) bound excluded — so the BIGINT bucket is
    // bit-identical (exact-integer sum, order irrelevant).
    val hb = tk.withColumn("b", {
      val pow31 = Array.iterate(1L, 8)(_ * 31L)
      (0 until 8).map(j =>
        ascii(substring(col("w"), j + 1, 1)).cast("long") * lit(pow31(j)))
        .reduce(_ + _) % lit(1024L)
    })
    val db = hb.groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("cdw"))
    val rcnt = hb.groupBy("b").agg(count(lit(1)).as("rc"))
    val tcnt = hb.filter(col("lang") === "en")
      .groupBy(col("b").as("tb")).agg(count(lit(1)).as("tc"))
    val rt = rcnt.agg(sum("rc").as("rt"))
    val tt = tcnt.agg(sum("tc").as("tt"))
    val terms = db
      .join(broadcast(rcnt), "b")
      .join(broadcast(tcnt), col("b") === col("tb"), "left")
      .crossJoin(broadcast(rt)) // 1-row raw-total
      .crossJoin(broadcast(tt)) // 1-row target-total
      .select(col("doc_id"), col("lang"), col("b"),
        (col("cdw") * (log((coalesce(col("tc"), lit(0L)) + lit(1.0))
            / (col("tt") + lit(1024.0)))
          - log((col("rc") + lit(1.0)) / (col("rt") + lit(1024.0)))))
          .as("contrib"))
    terms.groupBy("doc_id", "lang")
      .agg(expr("aggregate(transform(array_sort(collect_list(" +
        "struct(b, contrib))), t -> t.contrib), 0D, (a, x) -> a + x)")
        .as("wt"))
      .select(col("doc_id"), col("lang"),
        (floor(col("wt") * 1000000 + lit(0.5)) / 1000000).as("dsir_w"))
      .orderBy(col("dsir_w").desc, col("doc_id"))
      .limit(15)
  }

  /** Classifier-score calibration table (reliability diagram) — bin
    * the quality classifier's per-token-normalized margin into 10
    * fixed-width bins and report each bin's empirical positive rate
    * ('en' docs): the audit run before a filter threshold ships.
    * Binning happens on the per-doc score double (bit-identical cross-
    * engine — established by quality_classify's oracle); per-bin
    * aggregates are pure integer counts with ONE final division, so no
    * accumulation-order drift can touch the output. Full scan + 10-row
    * shuffle at any scale. The fixture scorer is hash-random, so the
    * gate pins the calibration arithmetic, not model quality
    * (nb_langid's caveat). */
  val scoreCalibration: Q = Q(
    "score_calibration",
    """WITH t AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
      |  FROM documents),
      |s AS (SELECT doc_id, lang, CAST(len(ts) AS INTEGER) AS n_tokens,
      |  list_sum(list_transform(ts, tok ->
      |    ((((list_sum(list_transform(
      |          range(0, CAST(least(length(tok), 8) AS BIGINT)),
      |          j -> ascii(substring(tok, CAST(j + 1 AS INTEGER), 1))
      |               * CAST(pow(31, j) AS BIGINT))) % 1024)
      |       * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS score
      |  FROM t WHERE len(ts) > 0),
      |b AS (SELECT least(greatest(
      |      CAST(floor((score / n_tokens + 0.5) * 10) AS BIGINT), 0), 9) AS bin,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM s)
      |SELECT bin, count(*) AS n_docs, CAST(sum(pos) AS BIGINT) AS n_pos,
      |  floor(CAST(sum(pos) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
      |    AS pos_rate
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    val ts = filter(split(col("text"), " "), x => x =!= "")
    docs(s, d)
      .select(col("lang"), size(ts).as("n_tokens"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("n_tokens") > 0)
      .select(
        least(greatest(
          floor((col("raw") / col("n_tokens") + lit(0.5)) * 10).cast("long"),
          lit(0L)), lit(9L)).as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"),
        (floor(sum("pos").cast("double") / count(lit(1)) * 1000000 + lit(0.5))
          / 1000000).as("pos_rate"))
      .orderBy("bin")
  }

  /** Sample-ratio-mismatch (SRM) audit of the train/val/test split —
    * the first thing checked when an experiment or data split smells
    * wrong: do the observed branch sizes match the intended 80/10/10
    * within sampling noise? One 3-group count aggregate (split_assign's
    * portable multiplicative hash), a 1-row total broadcast, and
    * per-branch χ² terms (obs − n·p)²/(n·p) over exact integers. The
    * 2-df χ² sum is the SRM alarm; the gate pins the arithmetic. */
  val srmCheck: Q = Q(
    "ab_srm_check",
    """WITH a AS (SELECT
      |    CASE WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 800
      |         THEN 'train'
      |         WHEN ((doc_id & 2147483647) * 2246822519) % 1000 < 900
      |         THEN 'val' ELSE 'test' END AS split
      |  FROM documents),
      |c AS (SELECT split, count(*) AS n_docs FROM a GROUP BY split),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM c),
      |e AS (SELECT split, n_docs, n,
      |    CASE WHEN split = 'train' THEN 0.8
      |         WHEN split = 'val' THEN 0.1 ELSE 0.1 END AS p
      |  FROM c, t)
      |SELECT split, n_docs,
      |  floor((n_docs - n * p) * (n_docs - n * p) / (n * p) * 1000000 + 0.5)
      |    / 1000000 AS chi2_term
      |FROM e ORDER BY split""".stripMargin) { (s, d) =>
    val r = (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2246822519L)) % 1000
    val a = docs(s, d).select(
      when(r < 800, "train").when(r < 900, "val").otherwise("test").as("split"))
    val c = a.groupBy("split").agg(count(lit(1)).as("n_docs"))
    val t = c.agg(sum("n_docs").as("n"))
    val p = when(col("split") === "train", 0.8)
      .when(col("split") === "val", 0.1).otherwise(0.1)
    c.crossJoin(broadcast(t)) // 1-row total
      .withColumn("p", p)
      .select(col("split"), col("n_docs"),
        (floor((col("n_docs") - col("n") * col("p"))
          * (col("n_docs") - col("n") * col("p"))
          / (col("n") * col("p")) * 1000000 + lit(0.5)) / 1000000)
          .as("chi2_term"))
      .orderBy("split")
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1998) — the smoothing that actually ships in n-gram LMs,
    * completing the family next to stupid backoff (lm_backoff_score)
    * and Good–Turing (good_turing): P(w|v) = max(c(vw)−D,0)/c(v) +
    * D·N₁₊(v·)/c(v) · Pcont(w), D = 0.75 (exact binary), with the
    * continuation distribution Pcont(w) = (N₁₊(·w)+1)/(N₁₊(··)+V)
    * Laplace-floored so unseen continuations stay scoreable. All model
    * quantities are exact counts from TWO aggregations of the train
    * bigram relation (c(vw); per-context c(v)+N₁₊(v·) in one pass;
    * per-continuation N₁₊(·w)); every P is a fixed-form combination of
    * identical integers, and per-doc log-probs fold (v,w)-sorted so
    * both engines add identical doubles in identical order — never
    * avg() over an engine-ordered stream. Eval bigrams whose context
    * never occurred in training are reported as skipped, not guessed.
    * Scale: model tables are vocab/bigram-type-bounded; the eval
    * stream joins them word-keyed (AQE broadcasts when the model
    * fits — the lm_backoff_score claim, bench-verified). */
  val kneserNey: Q = Q(
    "kneser_ney",
    """WITH tr AS (SELECT string_split(text, ' ') AS ts FROM documents
      |            WHERE doc_id % 10 < 8 AND len(string_split(text, ' ')) >= 2),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |       WHERE doc_id % 10 >= 8 AND len(string_split(text, ' ')) >= 2),
      |big AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS v,
      |           unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w
      |    FROM tr) GROUP BY v, w),
      |ctx AS (SELECT v, CAST(sum(c12) AS BIGINT) AS c1,
      |        CAST(count(*) AS BIGINT) AS n1f FROM big GROUP BY v),
      |cont AS (SELECT w, CAST(count(*) AS BIGINT) AS n1b FROM big GROUP BY w),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n1pp FROM big),
      |vv AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS vsize
      |       FROM (SELECT unnest(ts) AS u FROM tr)),
      |eb AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS v,
      |    unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w
      |  FROM ev),
      |sc AS (SELECT eb.doc_id, eb.v, eb.w,
      |    CASE WHEN ctx.c1 IS NOT NULL THEN
      |      ln(greatest(COALESCE(big.c12, 0) - 0.75, 0.0) / ctx.c1
      |        + 0.75 * ctx.n1f / ctx.c1
      |          * (COALESCE(cont.n1b, 0) + 1.0) / (nn.n1pp + vv.vsize))
      |    END AS lp
      |  FROM eb
      |  LEFT JOIN ctx ON ctx.v = eb.v
      |  LEFT JOIN big ON big.v = eb.v AND big.w = eb.w
      |  LEFT JOIN cont ON cont.w = eb.w
      |  CROSS JOIN nn CROSS JOIN vv)
      |SELECT doc_id,
      |  CAST(count(lp) AS BIGINT) AS n_scored,
      |  CAST(count(*) - count(lp) AS BIGINT) AS n_skipped,
      |  CASE WHEN count(lp) > 0 THEN
      |    floor(list_aggregate(list(lp ORDER BY v, w)
      |        FILTER (WHERE lp IS NOT NULL), 'sum')
      |      / count(lp) * 10000 + 0.5) / 10000
      |  END AS kn_lp
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val pairs = expr(
      "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS v, ts[i+1] AS w))")
    val tr = docs(s, d).filter(col("doc_id") % 10 < 8 && size(ts) >= 2)
      .select(ts.as("ts"))
    val ev = docs(s, d).filter(col("doc_id") % 10 >= 8 && size(ts) >= 2)
      .select(col("doc_id"), ts.as("ts"))
    val big = tr.select(explode(pairs).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy("v")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val cont = big.groupBy("w").agg(count(lit(1)).as("n1b"))
    val nn = big.agg(count(lit(1)).as("n1pp"))
    val vv = tr.select(explode(col("ts")).as("u"))
      .agg(countDistinct("u").as("vsize"))
    val eb = ev.select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.v").as("v"), col("p.w").as("w"))
    val sc = eb
      .join(ctx.withColumnRenamed("v", "cv"), col("cv") === col("v"), "left")
      .join(big.withColumnRenamed("v", "bv").withColumnRenamed("w", "bw"),
        col("bv") === col("v") && col("bw") === col("w"), "left")
      .join(cont.withColumnRenamed("w", "kw"), col("kw") === col("w"), "left")
      .crossJoin(broadcast(nn)) // 1-row bigram-type total
      .crossJoin(broadcast(vv)) // 1-row train vocab size
      .select(col("doc_id"), col("v"), col("w"),
        when(col("c1").isNotNull,
          log(greatest(coalesce(col("c12"), lit(0L)) - 0.75, lit(0.0))
            / col("c1")
            + lit(0.75) * col("n1f") / col("c1")
              * (coalesce(col("n1b"), lit(0L)) + 1.0)
              / (col("n1pp") + col("vsize")))).as("lp"))
    sc.groupBy("doc_id")
      .agg(count(col("lp")).as("n_scored"),
        (count(lit(1)) - count(col("lp"))).as("n_skipped"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "CASE WHEN lp IS NOT NULL THEN struct(v, w, lp) END)), " +
          "t -> t.lp), 0D, (a, x) -> a + x)").as("lpsum"))
      .select(col("doc_id"), col("n_scored"), col("n_skipped"),
        when(col("n_scored") > 0,
          floor(col("lpsum") / col("n_scored") * 10000 + lit(0.5)) / 10000)
          .as("kn_lp"))
      .orderBy("doc_id")
  }

  /** Temperature-scaled mixture weights (the multilingual-LM sampling
    * rule, T=2): w_s ∝ p_s^(1/T) over per-source token shares — the
    * standard up-weighting of tail sources before training-data
    * mixing, reported beside the raw shares and the per-source
    * effective epoch count w_s·N/t_s. Exact token counts; each
    * p_s^(1/2) is one sqrt of an exact ratio; the normalizing sum
    * folds source-sorted (20 terms); every output is floor-rounded.
    * One token-count aggregate + a 1-row total broadcast. */
  val temperatureMix: Q = Q(
    "temperature_mix",
    """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(list_filter(string_split(text, ' '),
      |      x -> x <> ''))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM s),
      |r AS (SELECT source, n_docs, tokens,
      |    CAST(tokens AS DOUBLE) / tt AS p,
      |    sqrt(CAST(tokens AS DOUBLE) / tt) AS pt
      |  FROM s CROSS JOIN t),
      |z AS (SELECT list_aggregate(list(pt ORDER BY source), 'sum') AS z
      |      FROM r)
      |SELECT source, n_docs, tokens,
      |  floor(p * 1000000 + 0.5) / 1000000 AS raw_share,
      |  floor(pt / z * 1000000 + 0.5) / 1000000 AS t2_share,
      |  floor((pt / z) / p * 10000 + 0.5) / 10000 AS epochs
      |FROM r CROSS JOIN z ORDER BY source""".stripMargin) { (s, d) =>
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val src = docs(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(ts).cast("long")).as("tokens"))
    val t = src.agg(sum("tokens").as("tt"))
    val r = src.crossJoin(broadcast(t)) // 1-row token total
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("tt")).as("p"),
        sqrt(col("tokens").cast("double") / col("tt")).as("pt"))
    val z = r.agg(expr(
      "aggregate(transform(array_sort(collect_list(struct(source, pt))), " +
        "x -> x.pt), 0D, (a, x) -> a + x)").as("z"))
    r.crossJoin(broadcast(z)) // 1-row normalizer
      .select(col("source"), col("n_docs"), col("tokens"),
        (floor(col("p") * 1000000 + lit(0.5)) / 1000000).as("raw_share"),
        (floor(col("pt") / col("z") * 1000000 + lit(0.5)) / 1000000)
          .as("t2_share"),
        (floor((col("pt") / col("z")) / col("p") * 10000 + lit(0.5))
          / 10000).as("epochs"))
      .orderBy("source")
  }

  /** Weight-proportional sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"): each
    * doc draws a deterministic uniform u from the multiplicative hash
    * (same 31-bit pre-mask as sample_stratified), and the k docs per
    * source with the smallest key −ln(u)/w — equivalently the largest
    * u^(1/w) — are an exact weighted sample without replacement,
    * weights = n_chars (longer docs proportionally likelier). This is
    * the A-ES one-pass form: key assignment is a pure map, selection
    * is per-stratum top-k (one shuffle on source + bounded window),
    * the mixture-sampling step a 100 TB curation pipeline runs per
    * shard with NO reservoir state shared across executors. u is an
    * exact integer ratio so both engines feed IDENTICAL doubles to the
    * one libm call (ln parity established by lm_perplexity); doc_id
    * breaks order ties. */
  val weightedSample: Q = Q(
    "weighted_sample",
    """SELECT source, rn, doc_id, n_chars FROM (
      |  SELECT source, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY -ln((((doc_id & 2147483647) * 2654435761) % 1000003 + 1)
      |                   / 1000004.0) / n_chars,
      |        doc_id) AS INTEGER) AS rn
      |  FROM documents WHERE n_chars > 0) t
      |WHERE rn <= 8 ORDER BY source, rn""".stripMargin) { (s, d) =>
    val u = ((col("doc_id").bitwiseAND(lit(2147483647L)) * lit(2654435761L))
      % 1000003 + 1) / lit(1000004.0)
    val key = -log(u) / col("n_chars")
    val w = Window.partitionBy("source").orderBy(key.asc, col("doc_id").asc)
    docs(s, d).filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        row_number().over(w).cast("int").as("rn"))
      .filter(col("rn") <= 8)
      .select("source", "rn", "doc_id", "n_chars")
      .orderBy("source", "rn")
  }

  /** ε-DIFFERENTIAL-PRIVACY noisy count release (Dwork et al. 2006
    * Laplace mechanism) — the aggregate-publication step of a privacy
    * pipeline, completing the audit family (k_anonymity / l_diversity
    * / t_closeness measure the RAW data's risk; this op RELEASES a
    * protected statistic): per-source document counts (sensitivity 1 —
    * one document moves one count by one) plus Laplace(Δf/ε) noise at
    * ε = 0.5, i.e. scale b = 2. The noise draw is the inverse-CDF
    * transform b·sign(u−½)·ln(1−2|u−½|) of a DETERMINISTIC
    * Knuth-multiplicative-hash uniform on the source index (the
    * weighted_sample convention) — portable to the oracle, seeded like
    * production DP systems seed their per-release PRNG; a cryptographic
    * source swaps in without touching the plan. The utility audit
    * (per-group |noise|) ships beside the release, as a DP system
    * must. Pure map over the grouped result: at 100 TB the noise cost
    * is per RELEASED AGGREGATE, not per row. 4-dp floor-rounding on
    * both engines.
    *
    * NOT A REAL DP RELEASE AS WRITTEN: the exact `n` and `abs_err`
    * columns are published beside `noisy_n` purely as the oracle-
    * portability / utility-audit device, and the Laplace draw is a
    * deterministic hash of the group name. A production release MUST
    * drop the `n`/`abs_err` columns and swap the seeded draw for
    * fresh cryptographic randomness — only `noisy_n` leaves the
    * trust boundary. */
  lazy val dpCountNoise: Q = Q(
    "dp_count_noise",
    """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
      |    CAST(substr(source, 4) AS BIGINT) AS k
      |  FROM documents GROUP BY source),
      |u AS (SELECT source, n,
      |    (((k & 2147483647) * 2654435761) % 1000003 + 1) / 1000004.0 AS uu
      |  FROM g),
      |nz AS (SELECT source, n,
      |    -2.0 * sign(uu - 0.5) * ln(1 - 2 * abs(uu - 0.5)) AS noise
      |  FROM u)
      |SELECT source, n,
      |  floor((n + noise) * 10000 + 0.5) / 10000 AS noisy_n,
      |  floor(abs(noise) * 10000 + 0.5) / 10000 AS abs_err
      |FROM nz ORDER BY source""".stripMargin) { (s, d) =>
    val g = docs(s, d).groupBy("source")
      .agg(count(lit(1)).as("n"))
      // 2-arg substring (position → end), matching the oracle's
      // unbounded substr(source, 4) — a fixed length cap would
      // silently diverge on source ids longer than the cap (r12
      // advisor).
      .withColumn("k", expr("substring(source, 4)").cast("long"))
    val u = ((col("k").bitwiseAND(lit(2147483647L)) * lit(2654435761L))
      % 1000003 + 1) / lit(1000004.0)
    val noise = lit(-2.0) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    g.select(col("source"), col("n"),
        (floor((col("n") + noise) * 10000 + lit(0.5)) / 10000).as("noisy_n"),
        (floor(abs(noise) * 10000 + lit(0.5)) / 10000).as("abs_err"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(asofJoin, asofJoinTolerance, asofJoinForward,
    decontamOverlap,
    decontamBloom, sampleStratified, sampleQuota, splitAssign, piiScrub,
    repetitionScore, lmPerplexity, qualityClassify, samplePriority,
    lmBackoffScore, dsirWeights, scoreCalibration, srmCheck, kneserNey,
    temperatureMix, fairnessParity, boilerplatePrefix, hamiltonApportion,
    weightedSample, dpCountNoise)

  /** Hamilton (largest-remainder) apportionment of a fixed sampling
    * budget across sources — the allocation step a mixture pipeline
    * runs AFTER choosing weights: S = 100000 slots split proportional
    * to token mass must land on integers that sum EXACTLY to S
    * (floor-everything undershoots; round-everything drifts). Pure
    * integer arithmetic end-to-end: base = S·tk DIV T, remainder
    * ranks break ties by source, and the leftover L = S − Σbase goes
    * to the top-L remainders. Ranking is a k-source bounded pair
    * cross (k = |sources|), never data-sized. */
  lazy val hamiltonApportion: Q = Q(
    "hamilton_apportion",
    """WITH tk AS (SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM tk),
      |q AS (SELECT source, tokens,
      |    (100000 * tokens) // tt AS base,
      |    (100000 * tokens) % tt AS rem
      |  FROM tk CROSS JOIN t),
      |l AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS left_over FROM q),
      |r AS (SELECT a.source, a.tokens, a.base, a.rem,
      |    CAST(count(b.source) AS BIGINT) AS rk
      |  FROM q a LEFT JOIN q b
      |    ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
      |  GROUP BY a.source, a.tokens, a.base, a.rem)
      |SELECT source, tokens, CAST(base AS BIGINT) AS base,
      |  CAST(rem AS BIGINT) AS rem,
      |  CAST(base + CASE WHEN rk < l.left_over THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc
      |FROM r CROSS JOIN l ORDER BY source""".stripMargin) { (s, d) =>
    val tk = graft.Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("tokens"))
    val t = tk.agg(sum("tokens").as("tt"))
    val q = tk.crossJoin(broadcast(t))
      .select(col("source"), col("tokens"),
        expr("(100000 * tokens) div tt").as("base"), // exact integer div
        pmod(lit(100000L) * col("tokens"), col("tt")).as("rem"))
    val l = q.agg((lit(100000L) - sum("base")).as("left_over"))
    val r = q.as("a").join(q.as("b"),
        col("b.rem") > col("a.rem") ||
          (col("b.rem") === col("a.rem") && col("b.source") < col("a.source")),
        "left_outer")
      .groupBy(col("a.source").as("source"), col("a.tokens").as("tokens"),
        col("a.base").as("base"), col("a.rem").as("rem"))
      .agg(count(col("b.source")).as("rk"))
    r.crossJoin(broadcast(l))
      .select(col("source"), col("tokens"), col("base"), col("rem"),
        (col("base") + when(col("rk") < col("left_over"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("source")
  }

  /** Boilerplate/template detection by shared leading-token
    * fingerprint: documents opening with the SAME first-8-token prefix
    * are template instances (mirror dumps, scraped headers, generated
    * spam) — the cheap screen run before shingle-level near-dedup.
    * One groupBy on the prefix fingerprint; only cluster summaries
    * come out (md5 keeps the wide prefix text off the wire). */
  lazy val boilerplatePrefix: Q = Q(
    "boilerplate_prefix",
    """WITH p AS (SELECT doc_id,
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS ph
      |  FROM documents),
      |g AS (SELECT ph, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(min(doc_id) AS BIGINT) AS min_doc
      |  FROM p GROUP BY ph HAVING count(*) > 1)
      |SELECT ph, n_docs, min_doc FROM g
      |ORDER BY n_docs DESC, ph""".stripMargin) { (s, d) =>
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        md5(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("ph"))
      .groupBy("ph")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("ph"))
  }


  /** Filter-disparity (four-fifths rule) audit of the quality
    * classifier across languages — the fairness check an LLM curation
    * pipeline owes its corpus: per-language pass rates of the
    * normalized-margin filter (threshold 0, score_calibration's
    * bit-identical score), each language's selection ratio vs the
    * most-selected language, and the adverse-impact flag at the
    * EEOC 0.8 bound. Exact counts; one guarded division per row; the
    * reference max rate broadcasts as one row. */
  lazy val fairnessParity: Q = Q(
    "fairness_parity",
    """WITH t AS (SELECT lang,
      |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
      |  FROM documents),
      |s AS (SELECT lang, CAST(len(ts) AS INTEGER) AS n_tokens,
      |  list_sum(list_transform(ts, tok ->
      |    ((((list_sum(list_transform(
      |          range(0, CAST(least(length(tok), 8) AS BIGINT)),
      |          j -> ascii(substring(tok, CAST(j + 1 AS INTEGER), 1))
      |               * CAST(pow(31, j) AS BIGINT))) % 1024)
      |       * 2654435761) % 1000003) / 1000003.0 - 0.5))) AS score
      |  FROM t WHERE len(ts) > 0),
      |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN score / n_tokens >= 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_pass
      |  FROM s GROUP BY lang),
      |r AS (SELECT lang, n_docs, n_pass,
      |    CAST(n_pass AS DOUBLE) / n_docs AS rate FROM g),
      |mx AS (SELECT max(rate) AS mr FROM r)
      |SELECT lang, n_docs, n_pass,
      |  floor(rate * 1000000 + 0.5) / 1000000 AS pass_rate,
      |  floor(rate / mr * 1000000 + 0.5) / 1000000 AS selection_ratio,
      |  CASE WHEN rate / mr < 0.8 THEN 1 ELSE 0 END AS adverse_impact
      |FROM r CROSS JOIN mx ORDER BY lang""".stripMargin) { (s, d) =>
    val ts = filter(split(col("text"), " "), x => x =!= "")
    val scored = docs(s, d)
      .select(col("lang"), size(ts).as("n_tokens"),
        graft.functions.GraftFunctions.linearScore(col("text"), 1024)
          .as("raw"))
      .filter(col("n_tokens") > 0)
      .select(col("lang"), (col("raw") / col("n_tokens")).as("v"))
    val g = scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("v") >= 0, 1L).otherwise(0L)).as("n_pass"))
      .withColumn("rate", col("n_pass").cast("double") / col("n_docs"))
    val mx = g.agg(max("rate").as("mr"))
    g.crossJoin(broadcast(mx)) // 1-row reference-rate broadcast
      .select(col("lang"), col("n_docs"), col("n_pass"),
        (floor(col("rate") * 1000000 + lit(0.5)) / 1000000).as("pass_rate"),
        (floor(col("rate") / col("mr") * 1000000 + lit(0.5)) / 1000000)
          .as("selection_ratio"),
        when(col("rate") / col("mr") < 0.8, 1).otherwise(0)
          .as("adverse_impact"))
      .orderBy("lang")
  }
}
