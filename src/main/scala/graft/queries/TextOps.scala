package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text / LLM-pipeline operators over the `documents` table (SURVEY.md §2.B
  * "LLM-pipeline ops" + the north-star training-data operators): word count
  * (the reference's one demo job, `/root/reference/test/user_tasks.cc:12-33`),
  * text statistics, quality scoring, exact dedup, document fingerprinting,
  * TF-IDF scoring, and n-gram Jaccard similarity.
  *
  * Probabilistic ops (MinHash-LSH, SimHash) live in graft.dedup with
  * ScalaTest gates — they are deliberately NOT oracle-declared.
  */
object TextOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Escape a learned token for splicing into a Spark SQL single-quoted
    * string literal. Quotes double; backslashes double too, because
    * Spark's parser (unlike DuckDB's and unlike the naive Scala-side
    * replay) treats `\` as an escape character inside literals — the r9
    * advisor's latent cross-engine divergence for a token containing a
    * backslash. */
  private[queries] def sqlLit(t: String): String =
    t.replace("\\", "\\\\").replace("'", "''")

  /** The (count DESC, w1, w2) argmax adjacent pair of a tokenized
    * corpus — the shared BPE-training step. Fails with a descriptive
    * message on a degenerate corpus (no document with ≥ 2 tokens)
    * instead of a bare NoSuchElementException (r9 advisor; the DuckDB
    * oracle degrades to NULL there, so the loud require keeps the two
    * engines' failure modes aligned by making the Spark leg explicit). */
  private[queries] def topAdjacentPair(cur: org.apache.spark.sql.DataFrame): (String, String) = {
    val ws = split(col("text"), " ")
    val top = cur.filter(size(ws) >= 2)
      .select(ws.as("ws"))
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(1).collect().headOption
    require(top.nonEmpty,
      "BPE training found no adjacent token pair: no document has >= 2 whitespace tokens")
    (top.get.getString(0), top.get.getString(1))
  }

  /** The reference's demo tokenizer: split on space , . " ' and drop empty
    * tokens (strtok semantics, `/root/reference/test/user_tasks.cc:15-20`). */
  val RefDelims = "[ ,.'\"]"

  /** Ref-faithful word count (S1+S3+S4+S5+S6+S8): tokenize every document
    * on the demo delimiter set, count per token, key-ordered output.
    * Scale shape: explode → partial map-side count → shuffle by token →
    * final count. Vocabulary-bounded shuffle, the canonical MR job. */
  val wcWords: Q = Q(
    "wc_words",
    """SELECT tok AS word, count(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(text, '[ ,.''"]')) AS tok FROM documents) t
      |WHERE tok <> '' GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(explode(split(col("text"), RefDelims)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** Per-document token statistics: counts, distinct ratio, mean token
    * length — narrow map-only plan (no shuffle except the output sort). */
  val textStats: Q = Q(
    "text_stats",
    """SELECT doc_id, n_chars,
      | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_types,
      | round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')), 6) AS type_token_ratio,
      | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |   / len(string_split(text, ' ')), 6) AS avg_tok_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    docs(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_types"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 6)
          .as("type_token_ratio"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double")
          / size(toks), 6).as("avg_tok_len"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio, char-length band, repetition — the
    * heuristics a pretraining filter applies per document. Pure map. */
  val textQuality: Q = Q(
    "text_quality",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts, n_chars FROM documents)
      |SELECT doc_id,
      | round(CAST(len(list_filter(ts, x -> x IN ('the','a'))) AS DOUBLE) / len(ts), 6)
      |   AS stopword_ratio,
      | round(1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS repetition,
      | CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS len_ok
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    docs(s, d)
      .select(col("doc_id"),
        round(size(filter(ts, x => x.isin("the", "a"))).cast("double") / size(ts), 6)
          .as("stopword_ratio"),
        round(lit(1.0) - size(array_distinct(ts)).cast("double") / size(ts), 6)
          .as("repetition"),
        when(col("n_chars").between(200, 2000), 1).otherwise(0).as("len_ok"))
      .orderBy("doc_id")
  }

  /** Corpus profile per language — the "language filter" aggregate view. */
  val textLangProfile: Q = Q(
    "text_lang_profile",
    """SELECT lang, count(*) AS n_docs,
      | round(avg(n_chars), 2) AS avg_chars,
      | count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    docs(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 2).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** Exact dedup by content hash (md5 of raw text): corpus-level dup stats.
    * Scale shape: map-side partial agg on a 128-bit hash — the standard
    * exact-dedup pass over 100 TB (hash first, never shuffle raw text). */
  val dedupExactStats: Q = Q(
    "dedup_exact_stats",
    """SELECT count(*) AS n_docs,
      | count(DISTINCT md5(text)) AS n_distinct,
      | count(*) - count(DISTINCT md5(text)) AS n_dup_docs
      |FROM documents""".stripMargin) { (s, d) =>
    docs(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"))
  }

  /** Exact dedup, keep-first policy: survivor doc_id per distinct content
    * hash (min doc_id wins) — the actual dedup operator, not just stats. */
  val dedupExactKeep: Q = Q(
    "dedup_exact_keep",
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin) { (s, d) =>
    docs(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")
  }

  /** Document fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive content signature (bag-of-words fingerprint). */
  val docFingerprint: Q = Q(
    "doc_fingerprint",
    """SELECT doc_id,
      | md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("fp"))
      .orderBy("doc_id")
  }

  /** TF-IDF: top-3 terms per document (docs 0-99) with idf = ln(N/df) over
    * the full corpus. Scale shape: token explode → (term,doc) tf agg →
    * term-level df agg broadcast back (vocab is bounded) → per-doc top-k
    * window. Ranking uses the ROUNDED score so both engines order alike. */
  val tfidfTop: Q = Q(
    "tfidf_top_terms",
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x
      |  GROUP BY doc_id, tok),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, score FROM (
      |  SELECT doc_id, term, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM scored WHERE doc_id < 100) t
      |WHERE rn <= 3 ORDER BY doc_id, score DESC, term""".stripMargin) { (s, d) =>
    val tf = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.filter(col("doc_id") < 100)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "term", "score")
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  /** BM25 retrieval (Okapi, k1=1.2, b=0.75, Lucene's always-positive
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5))): top-10 documents for a
    * fixed query term set — the ranked-retrieval operator beside
    * TF-IDF's per-doc term weighting. Scale shape: token explode →
    * (doc, term) tf agg restricted to the query terms (tiny) + doc-
    * length agg; df and the corpus constants broadcast back; per-doc
    * score = ORDERED fold over the term contributions (sort_array +
    * aggregate in Spark, list_sum(list(... ORDER BY term)) in DuckDB)
    * so float summation order is pinned in both engines. */
  val bm25TopDocs: Q = Q(
    "bm25_topdocs",
    """WITH qt(term) AS (VALUES ('spark'), ('vector'), ('stream'), ('window')),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |         FROM documents),
      |dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs,
      |                 avg(CAST(len AS DOUBLE)) AS avg_len FROM dl),
      |tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM toks
      |       JOIN qt ON tok = qt.term GROUP BY doc_id, tok),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / avg_len)) AS c
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      |scored AS (
      |  SELECT doc_id, round(list_sum(list(c ORDER BY term)), 6) AS score
      |  FROM contrib GROUP BY doc_id)
      |SELECT doc_id, score FROM scored
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    val qTerms = Seq("spark", "vector", "stream", "window")
    val toks = docs(s, d)
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
      .select(col("doc_id"), col("term"),
        (log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(1) - 0.75 + lit(0.75) * col("len") / col("avg_len"))))
          .as("c"))
    contrib.groupBy("doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("raw"))
      .select(col("doc_id"), round(col("raw"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
  }

  /** Token-trigram Jaccard similarity over candidate pairs (docs 0-49,
    * lower-triangle). The deterministic near-dup kernel that MinHash-LSH
    * approximates; at scale candidates come from LSH buckets, never from
    * an all-pairs cross join (this query bounds the pair set explicitly). */
  val ngramJaccard: Q = Q(
    "ngram_jaccard_pairs",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(ts) - 1, 1)),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |        WHERE doc_id < 50 AND len(string_split(text, ' ')) >= 3) t)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val grams = array_distinct(expr(
      "transform(sequence(0, size(ts) - 3), i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))"))
    val sh = docs(s, d)
      .filter(col("doc_id") < 50 && size(ts) >= 3)
      .select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"), grams.as("grams"))
    val a = sh.select(col("doc_id").as("id_a"), col("grams").as("ga"))
    val b = sh.select(col("doc_id").as("id_b"), col("grams").as("gb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ga"), col("gb"))).cast("double")
          / size(array_union(col("ga"), col("gb"))), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Directional n-gram CONTAINMENT over the candidate pair set —
    * |A∩B| / |A|, the asymmetric cousin of Jaccard that catches "doc A
    * is mostly inside doc B" (quotes, boilerplate wrapping, short-dup-
    * of-long) which symmetric Jaccard under-scores when |B| ≫ |A|.
    * Same bounded candidate discipline as ngram_jaccard_pairs (at
    * scale, candidates come from LSH buckets); emits BOTH directions
    * of every pair, ranked: top-20 by containment (the ranking is on
    * single exact-integer divisions, ties by ids) with exact
    * shared/src gram counts. */
  val containmentPairs: Q = Q(
    "containment_pairs",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, greatest(len(ts) - 1, 1)),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |        WHERE doc_id < 50 AND len(string_split(text, ' ')) >= 3) t)
      |SELECT id_src, id_sup, n_shared, n_src,
      |  round(CAST(n_shared AS DOUBLE) / n_src, 6) AS containment
      |FROM (SELECT a.doc_id AS id_src, b.doc_id AS id_sup,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_shared,
      |    CAST(len(a.grams) AS BIGINT) AS n_src
      |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
      |ORDER BY CAST(n_shared AS DOUBLE) / n_src DESC, id_src, id_sup
      |LIMIT 20""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val grams = array_distinct(expr(
      "transform(sequence(0, size(ts) - 3), i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))"))
    val sh = docs(s, d)
      .filter(col("doc_id") < 50 && size(ts) >= 3)
      .select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"), grams.as("grams"))
    val a = sh.select(col("doc_id").as("id_src"), col("grams").as("ga"))
    val b = sh.select(col("doc_id").as("id_sup"), col("grams").as("gb"))
    a.join(b, col("id_src") =!= col("id_sup"))
      .select(col("id_src"), col("id_sup"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_shared"),
        size(col("ga")).cast("long").as("n_src"))
      .orderBy((col("n_shared").cast("double") / col("n_src")).desc,
        col("id_src"), col("id_sup"))
      .limit(20)
      .select(col("id_src"), col("id_sup"), col("n_shared"), col("n_src"),
        round(col("n_shared").cast("double") / col("n_src"), 6)
          .as("containment"))
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken 2003, public
    * literature): polynomial rolling hash over character 8-grams, then
    * the minimum hash of every 16-hash window, deduplicated — the
    * standard local-fingerprint scheme plagiarism/near-dup systems use.
    * All-integer math (base 31 powers < 2^35, mod 1000003) so both
    * engines compute identical values exactly. Map-only at scale. */
  val winnowFingerprint: Q = Q(
    "winnow_fingerprint",
    """WITH h AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(length(text) - 7, 1) + 1),
      |      i -> list_aggregate(list_transform(range(0, 8),
      |             j -> ascii(substring(text, CAST(i + j AS INTEGER), 1))
      |                  * CAST(pow(31, j) AS BIGINT)), 'sum') % 1000003) AS hs
      |  FROM documents WHERE length(text) >= 8),
      |w AS (
      |  SELECT doc_id,
      |    list_sort(list_distinct(
      |      list_transform(range(1, greatest(len(hs) - 15, 1) + 1),
      |        i -> list_aggregate(hs[i:i+15], 'min')))) AS fps
      |  FROM h)
      |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp,
      |  md5(array_to_string(fps, ',')) AS fp_md5
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Native expression (graft.functions.WinnowFingerprint): the
    // equivalent nested transform/aggregate HOF pipeline is interpreted
    // (CodegenFallback) and ~30× slower — see WinnowSuite for the
    // semantic-parity gate between the two forms.
    graft.functions.GraftFunctions.ensureRegistered(s)
    docs(s, d)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.winnowNative(col("text")).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).as("n_fp"),
        md5(expr("concat_ws(',', transform(fps, x -> CAST(x AS STRING)))"))
          .as("fp_md5"))
      .orderBy("doc_id")
  }

  /** Exact corpus heavy hitters: top-20 tokens by frequency with
    * corpus share. Explode → two-phase count (map-side partial, tiny
    * vocabulary-bounded shuffle) → 1-row total broadcast back for the
    * share — the exact path, viable while the vocabulary fits a hash
    * aggregate. For the bounded-memory path see heavy_hitters_mg. */
  val heavyHitters: Q = Q(
    "heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
      |              FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks WHERE tok <> ''
      |      GROUP BY tok),
      |tot AS (SELECT sum(cnt) AS n FROM c)
      |SELECT tok, cnt, round(CAST(cnt AS DOUBLE) / n, 6) AS share
      |FROM c CROSS JOIN tot
      |ORDER BY cnt DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
    val toks = docs(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val c = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = c.agg(sum("cnt").as("n"))
    c.crossJoin(broadcast(tot))
      .select(col("tok"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("share"))
      .orderBy(col("cnt").desc, col("tok")).limit(20)
  }

  /** Heavy hitters through a bounded-memory Misra-Gries sketch
    * (graft.functions.MisraGriesAgg, k = 64): map-side summaries of ≤ k
    * counters (NOT the full token stream) merge into a candidate set,
    * which broadcasts back to filter an exact recount. MG's superset
    * guarantee — every token with count > n/(k+1) survives the sketch —
    * makes the final top-20 EXACTLY equal to heavy_hitters' whenever
    * the 20th hitter clears that bar (at fixture scale trivially: the
    * vocabulary fits in k, so no decrement ever fires; at 100 TB the
    * Zipf head clears n/(k+1) by orders of magnitude). The shuffle
    * carries k rows per partition in pass 1 and only candidate-token
    * rows in pass 2 — exact answer, sketch-bounded traffic. */
  val heavyHittersMg: Q = Q(
    "heavy_hitters_mg",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
      |              FROM documents)
      |SELECT tok, count(*) AS cnt FROM toks WHERE tok <> ''
      |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin) { (s, d) =>
    val toks = docs(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val cand = toks
      .agg(graft.functions.MisraGriesAgg.misraGries(col("tok"), 64).as("mg"))
      .select(explode(map_keys(col("mg"))).as("tok"))
    toks.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20)
  }

  /** Per-document character-entropy profile — the classic gibberish /
    * binary-junk detector (low entropy = repeated filler, high entropy
    * = random bytes; both are drop candidates in a pretraining filter).
    *
    * H = ln n − (Σ k·ln k)/n over the per-doc char histogram, computed
    * from ONE native CharNgramCounts pass per document: the explode
    * yields one row per DISTINCT char per doc (≤ V ≈ alphabet size),
    * so the doc_id shuffle is V-bounded per doc — never one row per
    * character. Pure map + one bounded shuffle at any corpus size. */
  val entropyProfile: Q = Q(
    "entropy_profile",
    """WITH ch AS (SELECT doc_id, substr(text, CAST(j AS INT), 1) AS ch
      |            FROM (SELECT doc_id, text, length(text) AS len
      |                  FROM documents WHERE length(text) >= 1) t,
      |            LATERAL (SELECT unnest(range(1, len + 1)) AS j) u),
      |c AS (SELECT doc_id, ch, count(*) AS k FROM ch GROUP BY 1, 2),
      |e AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
      |        sum(k * ln(k)) AS kl, count(*) AS nd
      |      FROM c GROUP BY 1)
      |SELECT doc_id, CAST(nd AS INTEGER) AS n_distinct_chars,
      |  round(ln(n) - kl / n, 6) AS char_entropy
      |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d).filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.charNgramCounts(col("text"), 1))
          .as(Seq("ch", "k")))
      .groupBy("doc_id")
      .agg(sum("k").as("n"),
        sum(col("k") * log(col("k"))).as("kl"),
        count(lit(1)).cast("int").as("n_distinct_chars"))
      .select(col("doc_id"), col("n_distinct_chars"),
        round(log(col("n")) - col("kl") / col("n"), 6).as("char_entropy"))
      .orderBy("doc_id")
  }

  /** Collocation mining: top word pairs by pointwise mutual information,
    * PMI = ln(c12·N / (c1·c2)), c12 ≥ 5 — the corpus-analysis pass that
    * surfaces multi-word expressions ("new york") for tokenizer vocab
    * and phrase-aware dedup. Engine shape: occurrence explodes feed
    * two-phase vocabulary-bounded counts; the bigram table joins the
    * unigram table twice ON THE WORD KEY (shuffle joins at scale, AQE
    * broadcasts at fixture scale) and the 1-row corpus total broadcasts.
    * Ties at the cut are broken by bigram text, so top-50 is total. */
  val pmiCollocations: Q = Q(
    "pmi_collocations",
    """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |uni AS (SELECT u AS w, count(*) AS c
      |        FROM (SELECT unnest(ts) AS u FROM t) WHERE u <> ''
      |        GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS ntok FROM uni),
      |big AS (SELECT g AS b, count(*) AS c12
      |        FROM (SELECT unnest(list_transform(range(1, len(ts)),
      |                i -> ts[i] || ' ' || ts[i+1])) AS g
      |              FROM t WHERE len(ts) >= 2)
      |        GROUP BY 1 HAVING count(*) >= 5)
      |SELECT b, c12,
      |  round(ln(CAST(c12 AS DOUBLE) * n.ntok / (u1.c * u2.c)), 6) AS pmi
      |FROM big
      |JOIN uni u1 ON split_part(b, ' ', 1) = u1.w
      |JOIN uni u2 ON split_part(b, ' ', 2) = u2.w
      |CROSS JOIN n
      |WHERE split_part(b, ' ', 1) <> '' AND split_part(b, ' ', 2) <> ''
      |ORDER BY pmi DESC, b LIMIT 50""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val t = docs(s, d).select(ts.as("ts"))
    val uni = t.select(explode(col("ts")).as("w")).filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c").as("ntok"))
    val big = t.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i+1]))"))
        .as("b"))
      .groupBy("b").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 5)
      .filter(expr("split_part(b, ' ', 1) <> '' AND split_part(b, ' ', 2) <> ''"))
    big
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"),
        expr("split_part(b, ' ', 1) = w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"),
        expr("split_part(b, ' ', 2) = w2"))
      .crossJoin(broadcast(n))
      .select(col("b"), col("c12"),
        round(log(col("c12").cast("double") * col("ntok") / (col("c1") * col("c2"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("b")).limit(50)
  }

  /** One BPE merge round (Sennrich et al. 2016 — the tokenizer-training
    * kernel, word-level): count every ADJACENT token pair corpus-wide,
    * pick the most frequent (ties broken lexicographically), fuse its
    * occurrences, and report per-document token counts before/after.
    * Full BPE training is k repetitions of exactly this step. Engine
    * shape: pair counting is one explode → two-phase groupBy (map-side
    * combine bounds the shuffle at |vocab²∩seen| per partition, not
    * |corpus|); the argmax is a TakeOrderedAndProject to ONE row — the
    * only driver traffic; the merge itself is a map-only literal
    * `replace` (both engines substitute leftmost non-overlapping, so
    * 'a a a' fuses once). Docs with one token bypass pair generation —
    * Spark's sequence(0, -1) would DESCEND, not return empty. */
  val bpeMergeStep: Q = Q(
    "bpe_merge_step",
    """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS ws
      |            FROM documents),
      |pairs AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |          FROM tk, unnest(range(1, len(ws))) AS t(i)
      |          WHERE len(ws) >= 2),
      |top AS (SELECT w1, w2 FROM (
      |          SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2)
      |        ORDER BY c DESC, w1, w2 LIMIT 1)
      |SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_tok_before,
      |  CAST(len(string_split(replace(text,
      |      (SELECT w1 FROM top) || ' ' || (SELECT w2 FROM top),
      |      (SELECT w1 FROM top) || '_' || (SELECT w2 FROM top)), ' '))
      |    AS INTEGER) AS n_tok_after
      |FROM tk ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = split(col("text"), " ")
    val base = docs(s, d).select(col("doc_id"), col("text"), ws.as("ws"))
    val (w1, w2) = topAdjacentPair(base)
    def q(t: String) = sqlLit(t)
    base.select(col("doc_id"), size(col("ws")).as("n_tok_before"),
        size(split(expr(
          s"replace(text, '${q(w1)} ${q(w2)}', '${q(w1)}_${q(w2)}')"),
          " ")).as("n_tok_after"))
      .orderBy("doc_id")
  }

  /** THREE chained BPE merge rounds — the actual tokenizer-training
    * loop, not just its kernel (bpe_merge_step): each round's pair
    * counts run over the text produced by the previous round's fuse, so
    * merged tokens ('a_b') participate in later merges exactly as real
    * BPE vocabulary entries do. Engine shape per round is unchanged
    * (explode → two-phase count → 1-row argmax → map-only replace); the
    * driver sees exactly 3 single-row argmax results across the whole
    * query, and round r's lineage re-derives rounds 1..r−1's replaces
    * as map-only narrow stages — nothing iterative ever shuffles twice.
    * The oracle replays the same three rounds as chained CTEs. */
  val bpeTrainRounds: Q = Q(
    "bpe_train_rounds",
    """WITH t0 AS (SELECT doc_id, text FROM documents),
      |p1 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t0) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top1 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p1 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t1 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top1) || ' ' || (SELECT w2 FROM top1),
      |         (SELECT w1 FROM top1) || '_' || (SELECT w2 FROM top1)) AS text
      |       FROM t0),
      |p2 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t1) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top2 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p2 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t2 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top2) || ' ' || (SELECT w2 FROM top2),
      |         (SELECT w1 FROM top2) || '_' || (SELECT w2 FROM top2)) AS text
      |       FROM t1),
      |p3 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t2) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top3 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p3 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t3 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top3) || ' ' || (SELECT w2 FROM top3),
      |         (SELECT w1 FROM top3) || '_' || (SELECT w2 FROM top3)) AS text
      |       FROM t2)
      |SELECT t0.doc_id,
      |  CAST(len(string_split(t0.text, ' ')) AS INTEGER) AS n_tok_before,
      |  CAST(len(string_split(t3.text, ' ')) AS INTEGER) AS n_tok_after
      |FROM t0 JOIN t3 ON t0.doc_id = t3.doc_id
      |ORDER BY t0.doc_id""".stripMargin) { (s, d) =>
    def q(t: String) = sqlLit(t)
    val base = docs(s, d).select(col("doc_id"), col("text"))
    var cur = base
    for (_ <- 1 to 3) {
      val (w1, w2) = topAdjacentPair(cur)
      cur = cur.withColumn("text", expr(
        s"replace(text, '${q(w1)} ${q(w2)}', '${q(w1)}_${q(w2)}')"))
    }
    base.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok_before"))
      .join(cur.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok_after")), "doc_id")
      .orderBy("doc_id")
  }

  /** Apply-BPE tokenizer INFERENCE (r8 verdict #5) — the other half of
    * bpe_train_rounds: the merge table learned by the 3-round training
    * loop is applied to the corpus in rank order (greedy
    * leftmost-non-overlapping, exactly the convention training fused
    * with), and the usage accounting a tokenizer deployment needs
    * comes out: per merge rank, the fused token, how many documents it
    * fired in, corpus-wide occurrence count, the running corpus token
    * count, and fertility (BPE tokens per whitespace token) against
    * the rank-0 whitespace baseline. Engine shape: training is the
    * same 3 × (explode → two-phase count → 1-row argmax) protocol;
    * INFERENCE is one map-only projection per doc (a chain of 3
    * literal replaces — the learned table rides in the plan, nothing
    * iterative shuffles), collapsed by a single partial-aggregable
    * 7-sum pass; the 4-row report is built from that one aggregate
    * row. At 100 TB: 3 single-row argmax collects + one narrow scan.
    * The oracle replays training, application, and the accounting
    * with the same chained CTEs. */
  val bpeApply: Q = Q(
    "bpe_apply",
    """WITH t0 AS (SELECT doc_id, text FROM documents),
      |p1 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t0) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top1 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p1 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t1 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top1) || ' ' || (SELECT w2 FROM top1),
      |         (SELECT w1 FROM top1) || '_' || (SELECT w2 FROM top1)) AS text
      |       FROM t0),
      |p2 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t1) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top2 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p2 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t2 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top2) || ' ' || (SELECT w2 FROM top2),
      |         (SELECT w1 FROM top2) || '_' || (SELECT w2 FROM top2)) AS text
      |       FROM t1),
      |p3 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      |       FROM (SELECT string_split(text, ' ') AS ws FROM t2) s,
      |         unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
      |top3 AS (SELECT w1, w2 FROM (
      |           SELECT w1, w2, count(*) AS c FROM p3 GROUP BY 1, 2)
      |         ORDER BY c DESC, w1, w2 LIMIT 1),
      |t3 AS (SELECT doc_id, replace(text,
      |         (SELECT w1 FROM top3) || ' ' || (SELECT w2 FROM top3),
      |         (SELECT w1 FROM top3) || '_' || (SELECT w2 FROM top3)) AS text
      |       FROM t2),
      |n AS (SELECT t0.doc_id,
      |        len(string_split(t0.text, ' ')) AS n0,
      |        len(string_split(t1.text, ' ')) AS n1,
      |        len(string_split(t2.text, ' ')) AS n2,
      |        len(string_split(t3.text, ' ')) AS n3
      |      FROM t0 JOIN t1 USING (doc_id) JOIN t2 USING (doc_id)
      |        JOIN t3 USING (doc_id)),
      |a AS (SELECT sum(n0) AS s0, sum(n1) AS s1, sum(n2) AS s2,
      |        sum(n3) AS s3,
      |        sum(CASE WHEN n1 < n0 THEN 1 ELSE 0 END) AS d1,
      |        sum(CASE WHEN n2 < n1 THEN 1 ELSE 0 END) AS d2,
      |        sum(CASE WHEN n3 < n2 THEN 1 ELSE 0 END) AS d3
      |      FROM n)
      |SELECT 0 AS rank, '' AS merge_token,
      |  CAST(0 AS BIGINT) AS n_docs_fired, CAST(0 AS BIGINT) AS n_occurrences,
      |  CAST(s0 AS BIGINT) AS corpus_tokens, CAST(1.0 AS DOUBLE) AS fertility
      |FROM a
      |UNION ALL
      |SELECT 1, (SELECT w1 || '_' || w2 FROM top1), CAST(d1 AS BIGINT),
      |  CAST(s0 - s1 AS BIGINT), CAST(s1 AS BIGINT),
      |  floor(CAST(s1 AS DOUBLE) / s0 * 1000000 + 0.5) / 1000000 FROM a
      |UNION ALL
      |SELECT 2, (SELECT w1 || '_' || w2 FROM top2), CAST(d2 AS BIGINT),
      |  CAST(s1 - s2 AS BIGINT), CAST(s2 AS BIGINT),
      |  floor(CAST(s2 AS DOUBLE) / s0 * 1000000 + 0.5) / 1000000 FROM a
      |UNION ALL
      |SELECT 3, (SELECT w1 || '_' || w2 FROM top3), CAST(d3 AS BIGINT),
      |  CAST(s2 - s3 AS BIGINT), CAST(s3 AS BIGINT),
      |  floor(CAST(s3 AS DOUBLE) / s0 * 1000000 + 0.5) / 1000000 FROM a
      |ORDER BY rank""".stripMargin) { (s, d) =>
    def q(t: String) = sqlLit(t)
    val base = docs(s, d).select(col("doc_id"), col("text"))
    // train: identical protocol to bpe_train_rounds — 3 chained
    // (pair-count → 1-row argmax → corpus fuse) rounds
    var cur = base
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to 3) {
      val (w1, w2) = topAdjacentPair(cur)
      merges += ((w1, w2))
      cur = cur.withColumn("text", expr(
        s"replace(text, '${q(w1)} ${q(w2)}', '${q(w1)}_${q(w2)}')"))
    }
    // inference: ONE map-only projection chaining the learned literal
    // replaces, then a single 7-sum partial aggregate
    val staged = merges.zipWithIndex.foldLeft(
      base.withColumn("t0", col("text"))) { case (df, ((w1, w2), i)) =>
      df.withColumn(s"t${i + 1}", expr(
        s"replace(t$i, '${q(w1)} ${q(w2)}', '${q(w1)}_${q(w2)}')"))
    }
    val counted = staged.select(
      (0 to 3).map(i => size(split(col(s"t$i"), " ")).as(s"n$i")): _*)
    val a = counted.agg(
      sum("n0").as("s0"), sum("n1").as("s1"), sum("n2").as("s2"),
      sum("n3").as("s3"),
      sum(when(col("n1") < col("n0"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("n2") < col("n1"), 1L).otherwise(0L)).as("d2"),
      sum(when(col("n3") < col("n2"), 1L).otherwise(0L)).as("d3"))
    def fert(sc: org.apache.spark.sql.Column) =
      floor(sc.cast("double") / col("s0") * 1000000 + lit(0.5)) / 1000000
    def mt(i: Int) = lit(merges(i)._1 + "_" + merges(i)._2)
    val r0 = a.select(lit(0).as("rank"), lit("").as("merge_token"),
      lit(0L).as("n_docs_fired"), lit(0L).as("n_occurrences"),
      col("s0").as("corpus_tokens"), lit(1.0).as("fertility"))
    val r1 = a.select(lit(1).as("rank"), mt(0).as("merge_token"),
      col("d1").as("n_docs_fired"), (col("s0") - col("s1")).as("n_occurrences"),
      col("s1").as("corpus_tokens"), fert(col("s1")).as("fertility"))
    val r2 = a.select(lit(2).as("rank"), mt(1).as("merge_token"),
      col("d2").as("n_docs_fired"), (col("s1") - col("s2")).as("n_occurrences"),
      col("s2").as("corpus_tokens"), fert(col("s2")).as("fertility"))
    val r3 = a.select(lit(3).as("rank"), mt(2).as("merge_token"),
      col("d3").as("n_docs_fired"), (col("s2") - col("s3")).as("n_occurrences"),
      col("s3").as("corpus_tokens"), fert(col("s3")).as("fertility"))
    r0.unionAll(r1).unionAll(r2).unionAll(r3).orderBy("rank")
  }

  /** Zipf's-law fit: least-squares slope of log(freq) vs log(rank) over
    * the corpus rank-frequency table. The global rank comes from
    * [[graft.ops.DistributedNtile.withGlobalRank]] (range shuffle +
    * reused-shuffle zipWithIndex) — NOT a partition-less window — so
    * ranking a 100M-type vocabulary stays data-parallel. The fit itself
    * is one partial-aggregable pass (Σx, Σy, Σxy, Σx²): a 5-number
    * sketch per partition, no matter the vocabulary size. */
  val zipfFit: Q = Q(
    "zipf_fit",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |f AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS rnk FROM f),
      |l AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM r)
      |SELECT CAST(count(*) AS BIGINT) AS vocab,
      | CAST(floor((count(*) * sum(x*y) - sum(x) * sum(y))
      |   / (count(*) * sum(x*x) - sum(x) * sum(x)) * 10000 + 0.5) / 10000
      |   AS DOUBLE) AS zipf_slope
      |FROM l""".stripMargin) { (s, d) =>
    val f = docs(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ranked = graft.ops.DistributedNtile.withGlobalRank(
      f, Seq(col("cnt").desc, col("w").asc))
    ranked
      .select(log(col("global_rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("vocab"),
        (floor((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx"))
          * 10000 + lit(0.5)) / 10000).cast("double").as("zipf_slope"))
  }

  /** Heaps'-law curve: cumulative (tokens seen, distinct types seen) at
    * TEN fixed corpus checkpoints. Types are attributed to the bucket
    * of their FIRST occurrence (min doc_id per type — one aggregate),
    * so the cumulative distinct count at checkpoint c is a plain sum of
    * per-bucket first-seen counts ≤ c: no giant distinct-per-prefix
    * recomputation. The cumulation runs as a ≤10×10 theta join on the
    * pre-aggregated bucket rows — checkpoint count is FIXED (10), not
    * data-sized, which is what keeps the quadratic bounded at 100 TB.
    * The doc count that sizes the buckets is parquet-metadata-only. */
  val heapsLaw: Q = Q(
    "heaps_law",
    """WITH p AS (SELECT CAST(ceil(count(*) / 10.0) AS BIGINT) AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |bt AS (SELECT (doc_id // w) * w + w - 1 AS cp, count(*) AS toks
      |       FROM tok, p WHERE t <> '' GROUP BY 1),
      |fs AS (SELECT t, min(doc_id) AS fd FROM tok WHERE t <> '' GROUP BY t),
      |bv AS (SELECT (fd // w) * w + w - 1 AS cp, count(*) AS nv
      |       FROM fs, p GROUP BY 1),
      |per AS (SELECT bt.cp, toks, COALESCE(nv, 0) AS nv
      |        FROM bt LEFT JOIN bv ON bt.cp = bv.cp)
      |SELECT c.cp AS checkpoint, CAST(sum(per.toks) AS BIGINT) AS cum_tokens,
      |  CAST(sum(per.nv) AS BIGINT) AS cum_vocab
      |FROM (SELECT cp FROM per) c JOIN per ON per.cp <= c.cp
      |GROUP BY 1 ORDER BY checkpoint""".stripMargin) { (s, d) =>
    val nDocs = docs(s, d).count() // parquet metadata count
    val w = (nDocs + 9) / 10
    val cpOf = (c: org.apache.spark.sql.Column) =>
      (c - pmod(c, lit(w)) + lit(w - 1)).as("cp")
    val tok = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val bt = tok.groupBy(cpOf(col("doc_id"))).agg(count(lit(1)).as("toks"))
    val bv = tok.groupBy("t").agg(min("doc_id").as("fd"))
      .groupBy(cpOf(col("fd"))).agg(count(lit(1)).as("nv"))
    val per = bt.join(bv, Seq("cp"), "left")
      .select(col("cp"), col("toks"), coalesce(col("nv"), lit(0L)).as("nv"))
    per.select(col("cp").as("checkpoint"))
      .join(broadcast(per), col("cp") <= col("checkpoint"))
      .groupBy("checkpoint")
      .agg(sum("toks").as("cum_tokens"), sum("nv").as("cum_vocab"))
      .orderBy("checkpoint")
  }

  /** First-order Markov next-word model: top-3 continuations of every
    * word with MLE transition probability. Bigram extraction is the
    * LM-standard in-document transform (bounded fan-out: n-1 bigrams
    * per n-token doc); counts collapse map-side; the rank window
    * partitions by the PREVIOUS word, so no task ever sees more than
    * one word's continuation set (vocabulary-bounded, Zipf-skewed —
    * the hot word's distinct-continuation row count, not the corpus,
    * is the task bound). */
  val markovNext: Q = Q(
    "markov_next",
    """WITH big AS (SELECT split_part(b, ' ', 1) AS prev,
      |    split_part(b, ' ', 2) AS nxt, count(*) AS c
      |  FROM (SELECT unnest(list_transform(range(1, len(ts)),
      |          i -> ts[i] || ' ' || ts[i+1])) AS b
      |        FROM (SELECT string_split(text, ' ') AS ts FROM documents)
      |        WHERE len(ts) >= 2)
      |  GROUP BY 1, 2),
      |tot AS (SELECT prev, CAST(sum(c) AS BIGINT) AS tc FROM big GROUP BY prev),
      |r AS (SELECT big.prev, nxt, c, tc, row_number() OVER
      |        (PARTITION BY big.prev ORDER BY c DESC, nxt ASC) AS rn
      |      FROM big JOIN tot ON big.prev = tot.prev)
      |SELECT prev, nxt, CAST(c AS BIGINT) AS cnt,
      |  CAST(floor(CAST(c AS DOUBLE) / tc * 1000000 + 0.5) / 1000000
      |    AS DOUBLE) AS prob, CAST(rn AS INT) AS rn
      |FROM r WHERE rn <= 3 ORDER BY prev, rn""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val big = docs(s, d).filter(size(ts) >= 2).select(ts.as("ts"))
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS prev, ts[i+1] AS nxt))"))
        .as("p"))
      .groupBy(col("p.prev").as("prev"), col("p.nxt").as("nxt"))
      .agg(count(lit(1)).as("c"))
    val tot = big.groupBy("prev").agg(sum("c").as("tc"))
    big.join(tot, Seq("prev"))
      .withColumn("rn", row_number().over(Window.partitionBy("prev")
        .orderBy(col("c").desc, col("nxt").asc)))
      .filter(col("rn") <= 3)
      .select(col("prev"), col("nxt"), col("c").as("cnt"),
        (floor(col("c").cast("double") / col("tc") * 1000000 + lit(0.5))
          / 1000000).cast("double").as("prob"), col("rn"))
      .orderBy("prev", "rn")
  }

  /** Cross-source contamination audit: source pairs sharing ≥3 distinct
    * 5-gram shingles — the "did my test split leak into training data"
    * sweep, run source-against-source instead of doc-against-doc. The
    * join key is md5(gram) (identical bytes in both engines), so the
    * shuffle carries 32-byte digests, not raw shingles; the per-source
    * DISTINCT collapses repeated grams before the exchange, and the
    * self-join is EQUI on the digest with src<src as a residual — at
    * 100 TB a hot shingle ("the end of the") fans out only within its
    * own hash bucket, ordinary AQE-splittable skew. */
  val crossContam: Q = Q(
    "cross_contam_5gram",
    """WITH g AS (SELECT DISTINCT source, md5(gm) AS h
      |  FROM (SELECT source, unnest(list_transform(range(1, len(ts) - 3),
      |          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
      |               ts[i+3] || ' ' || ts[i+4])) AS gm
      |        FROM (SELECT source, string_split(text, ' ') AS ts FROM documents)
      |        WHERE len(ts) >= 5))
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(count(*) AS BIGINT) AS shared
      |FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY shared DESC, src_a, src_b""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val g = docs(s, d).filter(size(ts) >= 5)
      .select(col("source"), ts.as("ts"))
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(ts) - 5),
          |  i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2], ' ', ts[i+3], ' ', ts[i+4]))"""
          .stripMargin)).as("gm"))
      .select(col("source"), md5(col("gm")).as("h"))
      .distinct()
    val a = g.select(col("source").as("src_a"), col("h"))
    val b = g.select(col("source").as("src_b"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
      .orderBy(col("shared").desc, col("src_a"), col("src_b"))
  }

  /** χ² term-vs-language feature selection (the classic text-
    * classification feature ranking): for every (word, lang) cell, the
    * 2×2 contingency χ² from four partial-aggregable counts, top-5
    * terms per language. All four margins come from ONE token pass
    * (cell counts) re-aggregated two ways (per-word, per-lang) plus a
    * 1-row corpus total — vocabulary-sized joins after the first
    * collapse, never a second corpus scan. Counts go to DOUBLE before
    * the χ² arithmetic so both engines run identical IEEE ops (DuckDB
    * would otherwise compute HUGEINT-exact products). */
  val chi2Terms: Q = Q(
    "q96_chi2_terms",
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (SELECT lang, w, CAST(count(*) AS DOUBLE) AS o11
      |        FROM tok WHERE w <> '' GROUP BY 1, 2),
      |wl AS (SELECT w, CAST(sum(o11) AS DOUBLE) AS wtot FROM cnt GROUP BY w),
      |lt AS (SELECT lang, CAST(sum(o11) AS DOUBLE) AS ltot FROM cnt GROUP BY lang),
      |n AS (SELECT CAST(sum(o11) AS DOUBLE) AS nn FROM cnt),
      |x AS (SELECT cnt.lang, cnt.w, o11, wtot - o11 AS o12, ltot - o11 AS o21,
      |        nn - wtot - ltot + o11 AS o22, nn
      |      FROM cnt JOIN wl ON cnt.w = wl.w
      |      JOIN lt ON cnt.lang = lt.lang CROSS JOIN n),
      |c2 AS (SELECT lang, w,
      |        round(nn * (o11*o22 - o12*o21) * (o11*o22 - o12*o21)
      |          / ((o11+o12) * (o11+o21) * (o12+o22) * (o21+o22)), 4) AS chi2
      |       FROM x),
      |r AS (SELECT lang, w, chi2,
      |        row_number() OVER (PARTITION BY lang ORDER BY chi2 DESC, w) AS rn
      |      FROM c2)
      |SELECT lang, w, chi2, CAST(rn AS INT) AS rn FROM r
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin) { (s, d) =>
    val cnt = docs(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).cast("double").as("o11"))
    val wl = cnt.groupBy("w").agg(sum("o11").as("wtot"))
    val lt = cnt.groupBy("lang").agg(sum("o11").as("ltot"))
    val n = cnt.agg(sum("o11").as("nn"))
    val num = col("o11") * col("o22") - col("o12") * col("o21")
    cnt.join(wl, "w").join(lt, "lang").crossJoin(broadcast(n))
      .withColumn("o12", col("wtot") - col("o11"))
      .withColumn("o21", col("ltot") - col("o11"))
      .withColumn("o22", col("nn") - col("wtot") - col("ltot") + col("o11"))
      .select(col("lang"), col("w"),
        round(col("nn") * num * num
          / ((col("o11") + col("o12")) * (col("o11") + col("o21"))
            * (col("o12") + col("o22")) * (col("o21") + col("o22"))), 4)
          .as("chi2"))
      .withColumn("rn", row_number().over(Window.partitionBy("lang")
        .orderBy(col("chi2").desc, col("w"))))
      .filter(col("rn") <= 5)
      .orderBy("lang", "rn")
  }

  /** Pairwise Jensen-Shannon divergence between source unigram
    * distributions — the mixture-balancing audit ("how different are
    * my corpus slices"). The token pass collapses to (source, word)
    * cells once; the JSD then runs on a (source-pair × vocabulary)
    * grid — both dimensions BOUNDED (20 sources → 190 pairs; the
    * vocabulary, not the corpus) — with absent words contributing a
    * zero term via the p>0 guards. Whitelisted bounded cross join;
    * divergences rounded to 1e-6 (31-term sum order drift ~1e-16). */
  val jsDivergence: Q = Q(
    "q97_js_divergence",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(c) AS DOUBLE) AS n FROM cnt GROUP BY source),
      |p AS (SELECT cnt.source, w, c / n AS p FROM cnt
      |      JOIN tot ON cnt.source = tot.source),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b
      |          FROM tot a JOIN tot b ON a.source < b.source),
      |vocab AS (SELECT DISTINCT w FROM cnt),
      |grid AS (SELECT src_a, src_b, w FROM pairs CROSS JOIN vocab),
      |j AS (SELECT g.src_a, g.src_b, coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
      |      FROM grid g
      |      LEFT JOIN p pa ON pa.source = g.src_a AND pa.w = g.w
      |      LEFT JOIN p pb ON pb.source = g.src_b AND pb.w = g.w)
      |SELECT src_a, src_b, round(sum(
      |   CASE WHEN pa > 0 THEN 0.5 * pa * ln(2*pa/(pa+pb)) ELSE 0 END
      | + CASE WHEN pb > 0 THEN 0.5 * pb * ln(2*pb/(pa+pb)) ELSE 0 END), 6) AS jsd
      |FROM j GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val cnt = docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source").agg(sum("c").cast("double").as("n"))
    val p = cnt.join(tot, "source")
      .select(col("source"), col("w"), (col("c") / col("n")).as("p"))
    val pairs = tot.select(col("source").as("src_a"))
      .join(tot.select(col("source").as("src_b")), col("src_a") < col("src_b"))
    val vocab = cnt.select("w").distinct()
    val grid = pairs.crossJoin(broadcast(vocab))
    val pa = p.select(col("source").as("src_a"), col("w"), col("p").as("pa"))
    val pb = p.select(col("source").as("src_b"), col("w"), col("p").as("pb"))
    val term = (pc: org.apache.spark.sql.Column, po: org.apache.spark.sql.Column) =>
      when(pc > 0, lit(0.5) * pc * log(lit(2) * pc / (pc + po))).otherwise(lit(0.0))
    grid.join(pa, Seq("src_a", "w"), "left")
      .join(pb, Seq("src_b", "w"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("pa"), lit(0.0)).as("pa"),
        coalesce(col("pb"), lit(0.0)).as("pb"))
      .groupBy("src_a", "src_b")
      .agg(round(sum(term(col("pa"), col("pb")) + term(col("pb"), col("pa"))), 6)
        .as("jsd"))
      .orderBy("src_a", "src_b")
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; each word scores deg/freq (deg =
    * Σ lengths of phrases containing it, freq = its occurrence count in
    * phrases); a phrase scores the sum of its word scores. Corpus-wide
    * top-15 phrases by score. The engine shape is all doc-keyed or
    * word-keyed: phrase segmentation is one per-doc window (running
    * count of stopword breaks), word stats one vocabulary-keyed
    * aggregate, and the phrase score folds word scores in POSITION
    * order through the repo's sorted-fold idiom so both engines add
    * the same doubles in the same sequence. Nothing is quadratic:
    * work is linear in corpus tokens + distinct phrases. */
  val rakeKeywords: Q = Q(
    "q112_rake_keywords",
    """WITH tok AS (SELECT doc_id, t.i AS pos, ts[t.i] AS w FROM (
      |    SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |    LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) t(i)
      |  WHERE ts[t.i] <> ''),
      |m AS (SELECT doc_id, pos, w,
      |    CASE WHEN w IN ('a','the') THEN 1 ELSE 0 END AS is_stop,
      |    CAST(sum(CASE WHEN w IN ('a','the') THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS phrase_id
      |  FROM tok),
      |inst AS (SELECT doc_id, phrase_id,
      |    list(w ORDER BY pos) AS ws,
      |    string_agg(w, ' ' ORDER BY pos) AS phrase,
      |    count(*) AS plen
      |  FROM m WHERE is_stop = 0 GROUP BY doc_id, phrase_id),
      |wstat AS (SELECT u.w AS w, count(*) AS freq,
      |    CAST(sum(plen) AS BIGINT) AS deg
      |  FROM inst, LATERAL (SELECT unnest(ws) AS w) u(w) GROUP BY u.w),
      |ph AS (SELECT phrase, count(*) AS n_occ, any_value(ws) AS ws
      |  FROM inst GROUP BY phrase),
      |pw AS (SELECT ph.phrase, ph.n_occ, t.i AS pos, ws[t.i] AS w
      |  FROM ph, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t(i)),
      |sc AS (SELECT pw.phrase, any_value(pw.n_occ) AS n_occ,
      |    list_aggregate(list(CAST(s.deg AS DOUBLE) / s.freq ORDER BY pw.pos),
      |      'sum') AS raw
      |  FROM pw JOIN wstat s ON s.w = pw.w GROUP BY pw.phrase)
      |SELECT phrase, n_occ,
      |  floor(raw * 1000000 + 0.5) / 1000000 AS score
      |FROM sc ORDER BY score DESC, phrase LIMIT 15""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
    val run = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inst = tok
      .withColumn("is_stop", col("w").isin("a", "the"))
      .withColumn("phrase_id", sum(col("is_stop").cast("int")).over(run))
      .filter(!col("is_stop"))
      .groupBy("doc_id", "phrase_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, w))), t -> t.w)")
        .as("ws"))
      .select(col("doc_id"), col("ws"),
        concat_ws(" ", col("ws")).as("phrase"), size(col("ws")).as("plen"))
    val wstat = inst.select(explode(col("ws")).as("w"), col("plen"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").cast("long").as("deg"))
      .select(col("w"), (col("deg").cast("double") / col("freq")).as("wscore"))
    val ph = inst.groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), first(col("ws")).as("ws"))
    val pw = ph.select(col("phrase"), col("n_occ"),
        posexplode(col("ws")).as(Seq("p0", "w")))
      .select(col("phrase"), col("n_occ"), (col("p0") + 1).as("pos"), col("w"))
    pw.join(wstat, "w")
      .groupBy("phrase")
      .agg(first(col("n_occ")).as("n_occ"),
        expr("aggregate(transform(array_sort(collect_list(struct(pos, wscore))), " +
          "t -> t.wscore), 0D, (a, x) -> a + x)").as("raw"))
      .select(col("phrase"), col("n_occ"),
        (floor(col("raw") * 1000000 + lit(0.5)) / 1000000).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(15)
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1,
    * adapted to the fixture's newline-free word corpus): word-count
    * band, mean-word-length band, ≥2 required stopwords, ≥80%
    * alphabetic words. Emits the per-rule failure funnel plus the
    * all-rules pass rate — the corpus report a pretraining filter
    * publishes before dropping anything. Pure map + 1-row collapse
    * (counts are exact integers; the only doubles are per-doc
    * single divisions compared against band constants — identical
    * IEEE compares cross-engine). */
  val gopherRules: Q = Q(
    "gopher_rules",
    """WITH t AS (SELECT string_split(text, ' ') AS ts,
      |    length(replace(text, ' ', '')) AS nc FROM documents),
      |r AS (SELECT len(ts) AS nw,
      |    CAST(nc AS DOUBLE) / len(ts) AS mwl,
      |    len(list_filter(ts, x -> x IN ('the','a','and','of','to')))
      |      AS nstop,
      |    len(list_filter(ts, x -> regexp_matches(x, '[a-z]'))) AS nalpha
      |  FROM t)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) FILTER (NOT (nw BETWEEN 50 AND 100000)) AS BIGINT)
      |    AS n_fail_wordcount,
      |  CAST(count(*) FILTER (NOT (mwl BETWEEN 3 AND 10)) AS BIGINT)
      |    AS n_fail_wordlen,
      |  CAST(count(*) FILTER (nstop < 2) AS BIGINT) AS n_fail_stopword,
      |  CAST(count(*) FILTER (nalpha * 10 < nw * 8) AS BIGINT)
      |    AS n_fail_alpha,
      |  CAST(count(*) FILTER (nw BETWEEN 50 AND 100000
      |    AND mwl BETWEEN 3 AND 10 AND nstop >= 2
      |    AND nalpha * 10 >= nw * 8) AS BIGINT) AS n_pass_all,
      |  floor(CAST(count(*) FILTER (nw BETWEEN 50 AND 100000
      |      AND mwl BETWEEN 3 AND 10 AND nstop >= 2
      |      AND nalpha * 10 >= nw * 8) AS DOUBLE) / count(*)
      |    * 1000000 + 0.5) / 1000000 AS pass_rate
      |FROM r""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val r = docs(s, d).select(
      size(ts).as("nw"),
      (length(regexp_replace(col("text"), " ", "")).cast("double")
        / size(ts)).as("mwl"),
      size(filter(ts, x => x.isin("the", "a", "and", "of", "to")))
        .as("nstop"),
      size(filter(ts, x => x.rlike("[a-z]"))).as("nalpha"))
    val wcOk = col("nw").between(50, 100000)
    val mwlOk = col("mwl").between(3, 10)
    val stopOk = col("nstop") >= 2
    val alphaOk = col("nalpha") * 10 >= col("nw") * 8
    val passAll = wcOk && mwlOk && stopOk && alphaOk
    r.agg(count(lit(1)).as("n_docs"),
      count(when(!wcOk, 1)).as("n_fail_wordcount"),
      count(when(!mwlOk, 1)).as("n_fail_wordlen"),
      count(when(!stopOk, 1)).as("n_fail_stopword"),
      count(when(!alphaOk, 1)).as("n_fail_alpha"),
      count(when(passAll, 1)).as("n_pass_all"),
      (floor(count(when(passAll, 1)).cast("double") / count(lit(1))
        * 1000000 + lit(0.5)) / 1000000).as("pass_rate"))
  }

  /** Tokenizer fertility per language — subword-ish tokens per
    * whitespace word and chars per token, the multilingual
    * tokenizer-efficiency report (high fertility = the tokenizer
    * fragments that language's words). Exact integer token counts per
    * doc (token_counts' regex pre-tokenizer), one 5-group collapse,
    * single exact divisions. */
  val tokenFertility: Q = Q(
    "token_fertility",
    """WITH t AS (SELECT lang,
      |    len(string_split(text, ' ')) AS nw,
      |    len(regexp_extract_all(text,
      |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS nt,
      |    length(replace(text, ' ', '')) AS nc FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  floor(CAST(sum(CAST(nt AS BIGINT)) AS DOUBLE) / sum(CAST(nw AS BIGINT))
      |    * 1000000 + 0.5) / 1000000 AS fertility,
      |  floor(CAST(sum(CAST(nc AS BIGINT)) AS DOUBLE) / sum(CAST(nt AS BIGINT))
      |    * 1000000 + 0.5) / 1000000 AS chars_per_token
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        size(expr(
          "regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("long").as("nt"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        (floor(sum("nt").cast("double") / sum("nw") * 1000000 + lit(0.5))
          / 1000000).as("fertility"),
        (floor(sum("nc").cast("double") / sum("nt") * 1000000 + lit(0.5))
          / 1000000).as("chars_per_token"))
      .orderBy("lang")
  }

  /** Good–Turing frequency smoothing (Good 1953) over the token
    * stream — the unseen-mass estimator under every classic LM
    * smoother (and the quantity lm_backoff_score's fixed backoff
    * approximates): p₀ = N₁/N is the probability the NEXT event is
    * novel, and r* = (r+1)·S(r+1)/S(r) re-estimates each low count
    * from the frequency-of-frequencies curve. Runs over TRIGRAMS —
    * the fixture's unigram vocabulary is tiny and saturated (no count
    * below 29, so unigram GT is vacuous), while the trigram space has
    * the real Zipf tail (9.4k hapax at sf0.001). Two collapses (type
    * counts, then count-of-counts — the second is at most √(2N) rows
    * by a counting argument) and every output is ONE division of
    * exact BIGINTs. Rows r = 1..5, where GT smoothing matters. */
  val goodTuring: Q = Q(
    "good_turing",
    """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |tok AS (SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS w
      |      FROM t, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i)
      |        q(i)),
      |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY w),
      |ff AS (SELECT r, CAST(count(*) AS BIGINT) AS s FROM wc GROUP BY r),
      |tot AS (SELECT CAST(sum(r * s) AS BIGINT) AS n,
      |       CAST(sum(s) AS BIGINT) AS v,
      |       CAST(sum(CASE WHEN r = 1 THEN s ELSE 0 END) AS BIGINT) AS n1
      |  FROM ff)
      |SELECT f.r, f.s AS n_types,
      |  floor((f.r + 1) * CAST(COALESCE(f2.s, 0) AS DOUBLE) / f.s
      |    * 10000 + 0.5) / 10000 AS r_star,
      |  floor(CAST(n1 AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS p_unseen
      |FROM ff f LEFT JOIN ff f2 ON f2.r = f.r + 1 CROSS JOIN tot
      |WHERE f.r <= 5 ORDER BY f.r""".stripMargin) { (s, d) =>
    val wc = docs(s, d)
      .select(split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 3), " +
          "i -> concat_ws(' ', ts[i], ts[i + 1], ts[i + 2]))")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("r"))
    val ff = wc.groupBy("r").agg(count(lit(1)).as("s"))
    val tot = ff.agg(sum(col("r") * col("s")).as("n"), sum("s").as("v"),
      sum(when(col("r") === 1, col("s")).otherwise(0L)).as("n1"))
    val f2 = ff.select((col("r") - 1).as("r"), col("s").as("s2"))
    ff.filter(col("r") <= 5)
      .join(f2, Seq("r"), "left")
      .crossJoin(broadcast(tot)) // 1-row corpus totals
      .select(col("r"), col("s").as("n_types"),
        (floor((col("r") + 1) * coalesce(col("s2"), lit(0L)).cast("double")
          / col("s") * 10000 + lit(0.5)) / 10000).as("r_star"),
        (floor(col("n1").cast("double") / col("n") * 1000000 + lit(0.5))
          / 1000000).as("p_unseen"))
      .orderBy("r")
  }

  /** Term burstiness (Church & Gale 1995): the variance-to-mean
    * dispersion of each term's per-document count — the statistic that
    * separates topical terms (bursty: absent from most docs, dense in
    * a few) from function words (Poisson-like, D ≈ 1), which raw
    * frequency cannot. The whole score stays ONE exact-integer
    * division: D = Var/Mean = (N·Σtf² − cf²)/(N·cf) after multiplying
    * through by N (zero-count docs enter via N, never materialize).
    * Corpus crossed once; per-term moments are a vocab-sized
    * map-side-partial collapse; top-15 among terms with cf ≥ 100,
    * floor-rounded BEFORE ranking. */
  val termBurstiness: Q = Q(
    "term_burstiness",
    """WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents),
      |dt AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tf
      |      WHERE w <> '' GROUP BY w, doc_id),
      |m AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf,
      |      CAST(sum(tf * tf) AS BIGINT) AS s2 FROM dt GROUP BY w),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
      |SELECT w, cf,
      |  floor(CAST(nd * s2 - cf * cf AS DOUBLE) / (nd * cf)
      |    * 1000000 + 0.5) / 1000000 AS burstiness
      |FROM m CROSS JOIN n WHERE cf >= 100
      |ORDER BY burstiness DESC, w LIMIT 15""".stripMargin) { (s, d) =>
    val dt = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
    val m = dt.groupBy("w").agg(sum("tf").as("cf"),
      sum(col("tf") * col("tf")).as("s2"))
    val n = docs(s, d).agg(count(lit(1)).as("nd"))
    m.crossJoin(broadcast(n)) // 1-row doc count
      .filter(col("cf") >= 100)
      .select(col("w"), col("cf"),
        (floor((col("nd") * col("s2") - col("cf") * col("cf")).cast("double")
          / (col("nd") * col("cf")) * 1000000 + lit(0.5)) / 1000000)
          .as("burstiness"))
      .orderBy(col("burstiness").desc, col("w")).limit(15)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — the graph
    * counterpart to RAKE (q112): build the corpus-wide word
    * co-occurrence graph (adjacent content words, length ≥ 4,
    * undirected with co-occurrence weights), run 3 damped power
    * iterations WS(w) = 0.15 + 0.85·Σ_u c(u,w)/wdeg(u)·WS(u), and
    * report the top-20 keywords. Unlike pagerank_bipartite's
    * low-degree per-node sums, vocabulary nodes here can have
    * thousands of neighbors, so every per-node contribution sum folds
    * NEIGHBOR-SORTED on both engines (the repo's sortedFold device) —
    * no engine-ordered double accumulation anywhere. Each iteration is
    * one edges ⋈ rank-vector equi-join (vocab-keyed, AQE-broadcastable
    * rank side) + a grouped fold; the edge relation is built once from
    * a single bigram aggregation. */
  val textrankKeywords: Q = Q(
    "textrank_keywords",
    """WITH tr AS (SELECT string_split(text, ' ') AS ts FROM documents
      |            WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS v,
      |           unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w
      |    FROM tr)
      |  WHERE length(v) >= 4 AND length(w) >= 4 AND v <> w GROUP BY v, w),
      |ed AS (SELECT u, w, CAST(sum(c) AS BIGINT) AS c FROM (
      |    SELECT v AS u, w, c FROM bg
      |    UNION ALL SELECT w AS u, v AS w, c FROM bg) GROUP BY u, w),
      |dg AS (SELECT u, CAST(sum(c) AS BIGINT) AS wdeg FROM ed GROUP BY u),
      |r0 AS (SELECT u, CAST(1.0 AS DOUBLE) AS r FROM dg),
      |r1 AS (SELECT e.w AS u, 0.15 + 0.85 * list_aggregate(
      |    list(r.r * e.c / dg.wdeg ORDER BY e.u), 'sum') AS r
      |  FROM ed e JOIN dg ON dg.u = e.u JOIN r0 r ON r.u = e.u
      |  GROUP BY e.w),
      |r2 AS (SELECT e.w AS u, 0.15 + 0.85 * list_aggregate(
      |    list(r.r * e.c / dg.wdeg ORDER BY e.u), 'sum') AS r
      |  FROM ed e JOIN dg ON dg.u = e.u JOIN r1 r ON r.u = e.u
      |  GROUP BY e.w),
      |r3 AS (SELECT e.w AS u, 0.15 + 0.85 * list_aggregate(
      |    list(r.r * e.c / dg.wdeg ORDER BY e.u), 'sum') AS r
      |  FROM ed e JOIN dg ON dg.u = e.u JOIN r2 r ON r.u = e.u
      |  GROUP BY e.w)
      |SELECT u AS keyword, floor(r * 1000000 + 0.5) / 1000000 AS score
      |FROM r3 ORDER BY r DESC, u LIMIT 20""".stripMargin) { (s, d) =>
    val ts = split(col("text"), " ")
    val pairs = expr(
      "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS v, ts[i+1] AS w))")
    val bg = docs(s, d).filter(size(ts) >= 2).select(ts.as("ts"))
      .select(explode(pairs).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
      .filter(length(col("v")) >= 4 && length(col("w")) >= 4 &&
        col("v") =!= col("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("c"))
    val ed = bg.select(col("v").as("u"), col("w"), col("c"))
      .unionAll(bg.select(col("w").as("u"), col("v").as("w"), col("c")))
      .groupBy("u", "w").agg(sum("c").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dg = ed.groupBy("u").agg(sum("c").as("wdeg"))
    val r0 = dg.select(col("u"), lit(1.0).as("r"))
    def step(prev: DataFrame): DataFrame =
      ed.join(dg, "u").join(prev.select(col("u"), col("r")), "u")
        .select(col("w"), col("u"),
          (col("r") * col("c") / col("wdeg")).as("t"))
        .groupBy(col("w"))
        .agg(expr("aggregate(transform(array_sort(collect_list(" +
          "struct(u, t))), x -> x.t), 0D, (a, x) -> a + x)").as("contrib"))
        .select(col("w").as("u"), (lit(0.15) + lit(0.85) * col("contrib"))
          .as("r"))
    val r3 = step(step(step(r0)))
    r3.orderBy(col("r").desc, col("u")).limit(20)
      .select(col("u").as("keyword"),
        (floor(col("r") * 1000000 + lit(0.5)) / 1000000).as("score"))
      .orderBy(col("score").desc, col("keyword"))
  }

  /** Sparse TF-IDF cosine similarity — the SPARSE-vector counterpart
    * of the dense embedding cosine (cosine_pairs): documents as
    * tf·idf term vectors, pairwise similarity via a TERM-KEYED join
    * (only shared terms ever meet — the inverted-index shape that
    * scales where dense all-pairs cannot), norms and dot products
    * folded term-sorted so both engines add identical doubles in
    * identical order. Candidate set bounded (doc_id < 50, the
    * cosine_pairs convention); idf = ln((N+1)/(df+1)) over the FULL
    * corpus so the weights are the production ones. Top-20 pairs. */
  val tfidfCosinePairs: Q = Q(
    "tfidf_cosine_pairs",
    """WITH toks AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents) WHERE tok <> '' GROUP BY doc_id, tok),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
      |       FROM documents),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks
      |       GROUP BY tok),
      |w AS (SELECT doc_id, toks.tok,
      |    tf * ln((n + 1.0) / (df + 1.0)) AS w
      |  FROM toks JOIN df ON df.tok = toks.tok CROSS JOIN nd
      |  WHERE doc_id < 50),
      |nrm AS (SELECT doc_id,
      |    sqrt(list_aggregate(list(w * w ORDER BY tok), 'sum')) AS nm
      |  FROM w GROUP BY doc_id),
      |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    list_aggregate(list(a.w * b.w ORDER BY a.tok), 'sum') AS dt
      |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |sim AS (SELECT id_a, id_b,
      |    dt / (na.nm * nb.nm) AS cos
      |  FROM dots JOIN nrm na ON na.doc_id = id_a
      |  JOIN nrm nb ON nb.doc_id = id_b)
      |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
      |FROM sim ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin) {
    (s, d) =>
    val toks = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val nd = docs(s, d).agg(countDistinct("doc_id").as("n"))
    val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = toks.filter(col("doc_id") < 50)
      .join(dfT.withColumnRenamed("tok", "dtok"),
        col("tok") === col("dtok"))
      .crossJoin(broadcast(nd)) // 1-row corpus doc count
      .select(col("doc_id"), col("tok"),
        (col("tf") * log((col("n") + 1.0) / (col("df") + 1.0))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def tokFold(field: String): org.apache.spark.sql.Column =
      expr(s"aggregate(transform(array_sort(collect_list(struct(tok, $field))), " +
        s"t -> t.$field), 0D, (a, x) -> a + x)")
    val nrm = w.select(col("doc_id"), col("tok"),
        (col("w") * col("w")).as("w2"))
      .groupBy("doc_id").agg(sqrt(tokFold("w2")).as("nm"))
    val dots = w.select(col("doc_id").as("id_a"), col("tok"),
        col("w").as("wa"))
      .join(w.select(col("doc_id").as("id_b"), col("tok").as("tokb"),
        col("w").as("wb")),
        col("tok") === col("tokb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("tok"),
        (col("wa") * col("wb")).as("p"))
      .groupBy("id_a", "id_b").agg(tokFold("p").as("dt"))
    dots
      .join(nrm.select(col("doc_id").as("na_id"), col("nm").as("na")),
        col("id_a") === col("na_id"))
      .join(nrm.select(col("doc_id").as("nb_id"), col("nm").as("nb")),
        col("id_b") === col("nb_id"))
      .select(col("id_a"), col("id_b"),
        (col("dt") / (col("na") * col("nb"))).as("cosr"))
      .orderBy(col("cosr").desc, col("id_a"), col("id_b")).limit(20)
      .select(col("id_a"), col("id_b"),
        (floor(col("cosr") * 1000000 + lit(0.5)) / 1000000).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
  }

  /** Chao1 unseen-species estimate (Chao 1984, bias-corrected form
    * Chao1 = V + F1(F1−1)/(2(F2+1))) + Good–Turing sample coverage
    * over word TRIGRAMS — "how many trigram types has this corpus NOT
    * seen yet", the question behind tokenizer sizing and crawl-more
    * decisions (heaps_law's model-free sibling; the unigram vocabulary
    * is closed on this fixture so trigrams are the open species
    * space). Only the frequency-of-frequencies head is needed, so the
    * whole estimate is ONE conditional aggregation over the trigram
    * counts: every input is exact-integer and each estimate a single
    * division; the corrected form is defined even at F2 = 0. */
  val chao1Vocab: Q = Q(
    "chao1_vocab",
    """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |tok AS (SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS w
      |      FROM t, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i)
      |        q(i)),
      |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
      |m AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM wc)
      |SELECT n_tokens, vocab, f1, f2,
      |  floor((vocab + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)))
      |    * 10000 + 0.5) / 10000 AS chao1,
      |  floor((1 - CAST(f1 AS DOUBLE) / n_tokens) * 1000000 + 0.5)
      |    / 1000000 AS coverage
      |FROM m""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 3), " +
          "i -> concat_ws(' ', ts[i], ts[i + 1], ts[i + 2]))")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        (floor((col("vocab") + (col("f1") * (col("f1") - 1)).cast("double")
          / (lit(2) * (col("f2") + 1))) * 10000 + lit(0.5)) / 10000)
          .as("chao1"),
        (floor((lit(1) - col("f1").cast("double") / col("n_tokens"))
          * 1000000 + lit(0.5)) / 1000000).as("coverage"))
  }

  /** Optimal prefix-code lengths for the corpus vocabulary (Huffman
    * 1952) — "how many bits/token would an entropy coder spend", the
    * compression-ratio bound a tokenizer design is judged against.
    * The corpus-scale work is ONE word-count aggregate; the tree then
    * builds on the BOUNDED vocabulary collapsed to a single row, with
    * the V−1 merge rounds as a pure expression fold (each round sorts
    * the node list by (weight, member-set) — a total, engine-agreed
    * order — and merges the two smallest; the oracle replays the
    * identical rounds in a recursive CTE). Exact integer weights
    * throughout; avg-bits and the Shannon bound are the only doubles,
    * folded word-sorted. Spec pins Kraft equality and the
    * H ≤ avg < H+1 sandwich. */
  val huffmanCodes: Q = Q(
    "huffman_codes",
    """WITH RECURSIVE wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |base AS (SELECT list(w ORDER BY w) AS words,
      |    list(c ORDER BY w) AS ws,
      |    CAST(count(*) AS BIGINT) AS v, CAST(sum(c) AS BIGINT) AS n
      |  FROM wc),
      |rec AS (
      |  SELECT 0 AS i, v, n, words, ws,
      |    list_transform(range(0, v), k ->
      |      {'w': ws[CAST(k + 1 AS BIGINT)], 'ms': [k]}) AS nodes,
      |    list_transform(range(0, v), k -> CAST(0 AS BIGINT)) AS depths
      |  FROM base
      |  UNION ALL
      |  SELECT i + 1, v, n, words, ws,
      |    list_concat(srt[3:], [{'w': srt[1].w + srt[2].w,
      |      'ms': list_concat(srt[1].ms, srt[2].ms)}]),
      |    list_transform(range(0, v), k -> depths[CAST(k + 1 AS BIGINT)]
      |      + CASE WHEN list_contains(srt[1].ms, k)
      |          OR list_contains(srt[2].ms, k) THEN 1 ELSE 0 END)
      |  FROM (SELECT i, v, n, words, ws, list_sort(nodes) AS srt, depths
      |        FROM rec) WHERE i < v - 1),
      |fin AS (SELECT v, n, words, ws, depths FROM rec WHERE i = v - 1),
      |per AS (SELECT unnest(words) AS word, unnest(ws) AS cnt,
      |    unnest(depths) AS code_len, v, n FROM fin),
      |s AS (SELECT total_bits,
      |    list_aggregate(list_transform(range(1, len(cs) + 1), i ->
      |      -(CAST(cs[i] AS DOUBLE) / nmax)
      |        * (ln(CAST(cs[i] AS DOUBLE) / nmax) / ln(2.0))), 'sum')
      |      AS entropy
      |  FROM (SELECT CAST(sum(cnt * code_len) AS BIGINT) AS total_bits,
      |          list(cnt ORDER BY word) AS cs,
      |          any_value(n) AS nmax FROM per))
      |SELECT p.word, p.cnt, p.code_len,
      |  floor(CAST(s.total_bits AS DOUBLE) / p.n * 10000 + 0.5) / 10000
      |    AS avg_bits,
      |  floor(s.entropy * 10000 + 0.5) / 10000 AS entropy_bits
      |FROM per p CROSS JOIN s ORDER BY p.word""".stripMargin) { (s, d) =>
    val wc = docs(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val base = wc.agg(
      expr("transform(array_sort(collect_list(struct(w, c))), t -> t.w)")
        .as("words"),
      expr("transform(array_sort(collect_list(struct(w, c))), t -> t.c)")
        .as("ws"),
      count(lit(1)).as("v"), sum("c").as("n"))
    val folded = base.withColumn("fin", expr(
      "aggregate(sequence(1, CAST(v AS INT) - 1), " +
        "struct(transform(sequence(0, CAST(v AS INT) - 1), " +
        "k -> struct(ws[k] AS w, array(k) AS ms)) AS nodes, " +
        "transform(sequence(0, CAST(v AS INT) - 1), k -> 0L) AS depths), " +
        "(st, it) -> struct(" +
        "concat(slice(array_sort(st.nodes), 3, size(st.nodes) - 2), " +
        "array(struct(" +
        "element_at(array_sort(st.nodes), 1).w " +
        "+ element_at(array_sort(st.nodes), 2).w AS w, " +
        "concat(element_at(array_sort(st.nodes), 1).ms, " +
        "element_at(array_sort(st.nodes), 2).ms) AS ms))) AS nodes, " +
        "transform(sequence(0, CAST(v AS INT) - 1), " +
        "k -> st.depths[k] + IF(" +
        "array_contains(element_at(array_sort(st.nodes), 1).ms, k) OR " +
        "array_contains(element_at(array_sort(st.nodes), 2).ms, k), " +
        "1L, 0L)) AS depths))"))
      .withColumn("total_bits", expr("aggregate(sequence(0, " +
        "CAST(v AS INT) - 1), 0L, (a, k) -> a + ws[k] * fin.depths[k])"))
      .withColumn("entropy", expr("aggregate(sequence(0, " +
        "CAST(v AS INT) - 1), 0D, (a, k) -> a - (CAST(ws[k] AS DOUBLE) / n)" +
        " * (ln(CAST(ws[k] AS DOUBLE) / n) / ln(2.0D)))"))
    folded
      .select(col("n"), col("total_bits"), col("entropy"),
        posexplode(arrays_zip(col("words"), col("ws"), col("fin.depths")))
          .as(Seq("k", "z")))
      .select(col("z.words").as("word"), col("z.ws").as("cnt"),
        col("z.depths").as("code_len"),
        (floor(col("total_bits").cast("double") / col("n") * 10000
          + lit(0.5)) / 10000).as("avg_bits"),
        (floor(col("entropy") * 10000 + lit(0.5)) / 10000)
          .as("entropy_bits"))
      .orderBy("word")
  }

  /** Flesch reading-ease per document — the readability band a quality
    * pipeline filters on (too-low = legalese/spam, implausibly-high =
    * word salad). Syllables are the standard vowel-group heuristic
    * (runs of [aeiouy], min 1 per word), sentences are terminal-punct
    * runs (min 1 — the synthetic fixture has none, so each doc is one
    * sentence; the formula and its gate are corpus-agnostic). Pure
    * map + per-doc arithmetic: zero shuffles, trivially 100 TB-safe. */
  val readabilityFlesch: Q = Q(
    "readability_flesch",
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
      |             1) AS n_sent,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
      |      AS BIGINT) AS syls
      |  FROM documents)
      |SELECT doc_id, n_words, n_sent, syls,
      |  floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
      |    - 84.6 * (CAST(syls AS DOUBLE) / n_words)) * 10000 + 0.5) / 10000
      |    AS flesch
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
          .cast("long"), lit(1L)).as("n_sent"),
        expr("""aggregate(transform(split(text, ' '),
              |  w -> greatest(size(regexp_extract_all(w, '[aeiouy]+', 0)), 1)),
              |  0L, (a, x) -> a + x)""".stripMargin).as("syls"))
      .select(col("doc_id"), col("n_words"), col("n_sent"), col("syls"),
        (floor((lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sent"))
          - lit(84.6) * (col("syls").cast("double") / col("n_words")))
          * 10000 + lit(0.5)) / 10000).as("flesch"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    wcWords, textStats, textQuality, textLangProfile, dedupExactStats,
    dedupExactKeep, docFingerprint, winnowFingerprint, tfidfTop, ngramJaccard,
    bm25TopDocs, heavyHitters, heavyHittersMg, entropyProfile, pmiCollocations,
    bpeMergeStep, bpeTrainRounds, bpeApply, zipfFit, heapsLaw, markovNext, crossContam,
    chi2Terms, jsDivergence, rakeKeywords, containmentPairs, gopherRules,
    tokenFertility, goodTuring, termBurstiness, textrankKeywords,
    tfidfCosinePairs, chao1Vocab, huffmanCodes, readabilityFlesch,
    ngramNovelty, distinctNgrams, topicCoherence)

  /** UMass topic coherence (Mimno 2011) treating each SOURCE as a
    * topic: score = Σ_{i<j} ln((D(wᵢ,wⱼ)+1)/D(wᵢ)) over the source's
    * top-5 tf-idf terms in rank order — the denominator is the
    * document frequency of the HIGHER-ranked word of the pair
    * (Mimno's D(v_l), l < m), per the canonical definition — the standard "are these top
    * words actually about one thing" gate for any topic/cluster
    * output (cluster_topics emits the words; this scores them).
    * Term selection reuses tfidf_top_terms' rounded-score ranking at
    * source granularity; D() counts ride the per-doc distinct term
    * table (gram-keyed joins against the ≤200-row pair panel,
    * broadcast); the ≤10 ln terms per source fold (i, j)-sorted. */
  lazy val topicCoherence: Q = Q(
    "topic_coherence",
    """WITH dt AS (SELECT DISTINCT doc_id, source,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |stf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' '))
      |          AS term FROM documents)
      |  GROUP BY source, term),
      |sdf AS (SELECT term, CAST(count(DISTINCT source) AS BIGINT) AS sdf
      |  FROM stf GROUP BY term),
      |ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns
      |  FROM documents),
      |top5 AS (SELECT source, term, rk FROM (
      |    SELECT stf.source, stf.term,
      |      row_number() OVER (PARTITION BY stf.source
      |        ORDER BY round(stf.tf * ln(CAST(ns.ns AS DOUBLE) / sdf.sdf),
      |          6) DESC, stf.term) AS rk
      |    FROM stf JOIN sdf USING (term) CROSS JOIN ns) t
      |  WHERE rk <= 5),
      |pairs AS (SELECT a.source, a.rk AS ri, b.rk AS rj,
      |    a.term AS wi, b.term AS wj
      |  FROM top5 a JOIN top5 b
      |    ON a.source = b.source AND a.rk < b.rk),
      |dfw AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt
      |  GROUP BY term),
      |cooc AS (SELECT p.source, p.ri, p.rj, p.wj,
      |    CAST(count(*) AS BIGINT) AS dij
      |  FROM pairs p JOIN dt a ON a.term = p.wi
      |    JOIN dt b ON b.term = p.wj AND b.doc_id = a.doc_id
      |  GROUP BY p.source, p.ri, p.rj, p.wj),
      |terms AS (SELECT p.source, p.ri, p.rj,
      |    ln((COALESCE(c.dij, 0) + 1.0) / dfw.df) AS v
      |  FROM pairs p
      |    LEFT JOIN cooc c ON c.source = p.source AND c.ri = p.ri
      |      AND c.rj = p.rj
      |    JOIN dfw ON dfw.term = p.wi)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
      |  floor(list_aggregate(list(v ORDER BY ri, rj), 'sum') * 1000000
      |    + 0.5) / 1000000 AS coherence
      |FROM terms GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val toks = docs(s, d).select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("term"))
    val dt = toks.select("doc_id", "term").distinct()
    val stf = toks.groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val sdf = stf.groupBy("term").agg(countDistinct("source").as("sdf"))
    val ns = docs(s, d).agg(countDistinct("source").as("ns"))
    val w = Window.partitionBy("source")
      .orderBy(round(col("tf") * log(col("ns").cast("double") / col("sdf")),
        6).desc, col("term"))
    val top5 = stf.join(broadcast(sdf), "term").crossJoin(broadcast(ns))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("source", "term", "rk")
    val pairs = top5.as("a")
      .join(top5.select(col("source"), col("term").as("wj"),
        col("rk").as("rj")), "source")
      .filter(col("rk") < col("rj"))
      .select(col("source"), col("rk").as("ri"), col("rj"),
        col("term").as("wi"), col("wj"))
    val dfw = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val cooc = broadcast(pairs)
      .join(dt.select(col("term").as("wi"), col("doc_id")), "wi")
      .join(dt.select(col("term").as("wj"), col("doc_id")),
        Seq("wj", "doc_id"))
      .groupBy("source", "ri", "rj").agg(count(lit(1)).as("dij"))
    val terms = pairs
      .join(cooc, Seq("source", "ri", "rj"), "left_outer")
      .join(dfw.select(col("term").as("wi"), col("df")), "wi")
      .select(col("source"), col("ri"), col("rj"),
        log((coalesce(col("dij"), lit(0L)) + 1.0) / col("df")).as("v"))
    terms.groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        (floor(expr("aggregate(array_sort(collect_list(struct(ri, rj, " +
          "v AS x))), 0D, (acc, t) -> acc + t.x)") * 1000000 + lit(0.5))
          / 1000000).as("coherence"))
      .orderBy("source")
  }

  /** Trigram novelty of the held-out split vs the training split —
    * the memorization-vs-generalization census a data team reads
    * before trusting an eval set: how much of val's 3-gram space did
    * train already cover? Same deterministic 80/20 hash split as
    * nb_langid; grams shuffle once on the gram key for the distinct
    * and once for the anti-join (both map-side combined; the gram
    * space, not the corpus, bounds state at 100 TB). */
  lazy val ngramNovelty: Q = Q(
    "ngram_novelty",
    """WITH s AS (SELECT doc_id, source, text,
      |    ((doc_id & 2147483647) * 1442695041) % 100 < 80 AS is_train
      |  FROM documents),
      |tg AS (SELECT doc_id, source, is_train, g FROM (
      |    SELECT doc_id, source, is_train,
      |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> string_split(text, ' ')[i] || ' ' ||
      |             string_split(text, ' ')[i + 1] || ' ' ||
      |             string_split(text, ' ')[i + 2])) AS g
      |    FROM s)),
      |tr AS (SELECT DISTINCT g FROM tg WHERE is_train),
      |vg AS (SELECT DISTINCT source, g FROM tg WHERE NOT is_train),
      |nv AS (SELECT vg.source,
      |    CAST(count(*) AS BIGINT) AS n_val_grams,
      |    CAST(sum(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_novel
      |  FROM vg LEFT JOIN tr ON tr.g = vg.g GROUP BY vg.source)
      |SELECT source, n_val_grams, n_novel,
      |  floor(CAST(n_novel AS DOUBLE) / n_val_grams * 1000000 + 0.5)
      |    / 1000000 AS novelty
      |FROM nv ORDER BY source""".stripMargin) { (s, d) =>
    val base = docs(s, d).withColumn("is_train",
      (col("doc_id").bitwiseAND(lit(2147483647L)) * lit(1442695041L)) % 100 < 80)
      .withColumn("t", split(col("text"), " "))
      .select(col("source"), col("is_train"),
        explode(expr("transform(sequence(1, size(t) - 2), i -> " +
          "concat_ws(' ', element_at(t, i), element_at(t, i + 1), " +
          "element_at(t, i + 2)))")).as("g"))
    val tr = base.filter(col("is_train")).select("g").distinct()
    val vg = base.filter(!col("is_train")).select("source", "g").distinct()
    vg.join(tr.withColumn("hit", lit(1)), Seq("g"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_val_grams"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("source"), col("n_val_grams"), col("n_novel"),
        (floor(col("n_novel").cast("double") / col("n_val_grams") * 1000000
          + lit(0.5)) / 1000000).as("novelty"))
      .orderBy("source")
  }

  /** Distinct-n diversity (distinct-1/2/3 ratios) per source — the
    * standard degeneration/diversity metric for generated or scraped
    * corpora (Li 2016): unique n-grams over total n-grams. One
    * explode per n, gram-keyed distinct counts vs token totals; all
    * integer until three final divisions. */
  lazy val distinctNgrams: Q = Q(
    "distinct_ngrams",
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ts
      |  FROM documents),
      |u AS (SELECT source, CAST(sum(len(ts)) AS BIGINT) AS total1,
      |    CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS total2,
      |    CAST(sum(greatest(len(ts) - 2, 0)) AS BIGINT) AS total3
      |  FROM t GROUP BY source),
      |d1 AS (SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS d1
      |  FROM (SELECT source, unnest(ts) AS g FROM t) GROUP BY source),
      |d2 AS (SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS d2
      |  FROM (SELECT source, unnest(list_transform(range(1, len(ts)),
      |      i -> ts[i] || ' ' || ts[i + 1])) AS g FROM t)
      |  GROUP BY source),
      |d3 AS (SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS d3
      |  FROM (SELECT source, unnest(list_transform(range(1, len(ts) - 1),
      |      i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS g
      |    FROM t) GROUP BY source)
      |SELECT u.source, u.total1 AS n_tokens,
      |  floor(CAST(d1.d1 AS DOUBLE) / u.total1 * 1000000 + 0.5) / 1000000
      |    AS distinct1,
      |  floor(CAST(d2.d2 AS DOUBLE) / u.total2 * 1000000 + 0.5) / 1000000
      |    AS distinct2,
      |  floor(CAST(d3.d3 AS DOUBLE) / u.total3 * 1000000 + 0.5) / 1000000
      |    AS distinct3
      |FROM u JOIN d1 ON d1.source = u.source
      |  JOIN d2 ON d2.source = u.source JOIN d3 ON d3.source = u.source
      |ORDER BY u.source""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("source"), split(col("text"), " ").as("ts"))
    // Denominators clamp at 0 (greatest): a doc with fewer than n tokens
    // contributes zero n-grams, not a negative count — and the gram
    // transform is guarded the same way, because Spark's
    // sequence(1, 0) yields a DESCENDING [1, 0] rather than the empty
    // sequence DuckDB's range(1, 1) gives.
    val u = t.groupBy("source").agg(
      sum(size(col("ts"))).as("total1"),
      sum(greatest(size(col("ts")) - 1, lit(0))).as("total2"),
      sum(greatest(size(col("ts")) - 2, lit(0))).as("total3"))
    def dn(n: Int, out: String): DataFrame = {
      val g =
        if (n == 1) t.select(col("source"), explode(col("ts")).as("g"))
        else t.select(col("source"), explode(expr(
          s"CASE WHEN size(ts) >= $n THEN " +
            s"transform(sequence(1, size(ts) - ${n - 1}), i -> concat_ws(' ', " +
            (0 until n).map(k => s"element_at(ts, i + $k)").mkString(", ")
            + s")) ELSE CAST(array() AS ARRAY<STRING>) END")).as("g"))
      g.groupBy("source").agg(countDistinct("g").as(out))
    }
    u.join(dn(1, "d1"), "source").join(dn(2, "d2"), "source")
      .join(dn(3, "d3"), "source")
      .select(col("source"), col("total1").as("n_tokens"),
        (floor(col("d1").cast("double") / col("total1") * 1000000
          + lit(0.5)) / 1000000).as("distinct1"),
        (floor(col("d2").cast("double") / col("total2") * 1000000
          + lit(0.5)) / 1000000).as("distinct2"),
        (floor(col("d3").cast("double") / col("total3") * 1000000
          + lit(0.5)) / 1000000).as("distinct3"))
      .orderBy("source")
  }

}
