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

  val all: Seq[Q] = Seq(docChunk, packSequences, embedQuantize, textNormalize,
    mixtureAllocate)
}
