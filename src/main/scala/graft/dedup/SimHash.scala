package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection — the complementary sketch to
  * MinHash (Charikar 2002 / the Google-crawl dedup construction, both
  * public literature): a single 64-bit signature whose Hamming distance
  * tracks cosine similarity of the token multiset.
  *
  * Signature: for bit j, sum +1/-1 over every token whose 64-bit hash
  * has bit j set/clear; bit j of the signature = sign of the sum. The
  * token hash is the engine-portable quadratic mix of
  * [[graft.functions.SimHash64.tokenHash]] (two code-point poly hashes
  * mod 2^31-1, squared-mixed, packed) — pure BIGINT-safe integer math,
  * so a DuckDB oracle can replay the whole signature bit-for-bit.
  * Computed with `aggregate`/`zip_with` over a 64-wide int array — no
  * UDF, one narrow pass.
  *
  * Candidate generation at scale (pigeonhole / multi-index Hamming
  * search): split the 64 bits into maxDist+1 chunks — two signatures
  * within Hamming distance maxDist differ in at most maxDist chunks, so
  * they must agree exactly on at least one chunk → self-join per chunk
  * on the chunk value, then filter by exact Hamming distance. Exhaustive
  * for any maxDist < 64; never an all-pairs comparison.
  */
object SimHash {

  /** One 31-bit polynomial code-point hash of lambda-bound token `t`
    * as a SQL fragment — `(h*m + cp) % (2^31-1)` folded over
    * `ascii(substr(t, i, 1))`. Guarded for the empty token (Spark's
    * `sequence(1, 0)` would count DOWN, not produce an empty range). */
  private def polyHashSql(seed: Int, mult: Int): String =
    s"""IF(t = '', CAST($seed AS BIGINT),
       |  aggregate(
       |    transform(sequence(1, char_length(t)),
       |      i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)),
       |    CAST($seed AS BIGINT),
       |    (ph, cp) -> (ph * $mult + cp) % 2147483647))""".stripMargin

  /** Portable 64-bit token hash (HOF form) — the quadratic-mix
    * construction of [[graft.functions.SimHash64.tokenHash]], parity-
    * pinned in SimHashNativeSuite. Intermediates are bound by chaining
    * named_struct stages (a SQL lambda cannot declare locals, and each
    * squaring uses its input twice). Kept free of line-leading `|`:
    * the enclosing template's stripMargin would re-strip them. */
  private val tokenHashSql: String = {
    val p = "2147483647"
    s"aggregate(array(named_struct(" +
      s"'h1', ${polyHashSql(7, 31)}, 'h2', ${polyHashSql(11, 131)}))," +
      " CAST(NULL AS BIGINT)," +
      " (ig, s) -> aggregate(" +
      "   array(named_struct(" +
      "     'h1', s.h1, 'h2', s.h2," +
      s"    'x0', (s.h1 * 2654435761 + s.h2) % $p," +
      s"    'y0', (s.h2 * 2246822519 + s.h1) % $p))," +
      "   CAST(NULL AS BIGINT)," +
      "   (ig2, u) -> aggregate(" +
      "     array(named_struct(" +
      "       'h1', u.h1, 'h2', u.h2," +
      s"      'x1', (u.x0 * u.x0 + u.h1) % $p," +
      s"      'y1', (u.y0 * u.y0 + u.h2) % $p))," +
      "     CAST(NULL AS BIGINT)," +
      "     (ig3, v) -> aggregate(" +
      "       array(named_struct(" +
      s"        'x', (v.x1 * v.x1 + v.h2) % $p," +
      s"        'y', (v.y1 * v.y1 + v.h1) % $p))," +
      "       CAST(NULL AS BIGINT)," +
      "       (ig4, w) -> aggregate(" +
      s"        array(named_struct('x', w.x, 'y', w.y," +
      s"          'z0', (w.x * 65599 + w.y) % $p))," +
      "         CAST(NULL AS BIGINT)," +
      "         (ig5, q) -> q.x | shiftleft(q.y, 31)" +
      s"          | shiftleft(((q.z0 * q.z0 + q.x) % $p) & 3, 62))))))"
  }

  /** 64-bit SimHash of a whitespace-tokenized text column (SQL-expr
    * form: bit-shift lambdas are native in SQL higher-order functions).
    * `textCol` must be a plain column name. */
  def simhashExpr(textCol: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    aggregate(
       |      transform(split($textCol, ' '), t -> ($tokenHashSql)),
       |      array_repeat(CAST(0 AS BIGINT), 64),
       |      (acc, h) -> zip_with(acc,
       |        transform(sequence(0, 63),
       |          i -> IF((shiftright(h, i) & 1) = 1, CAST(1 AS BIGINT), CAST(-1 AS BIGINT))),
       |        (a, b) -> a + b)),
       |    sequence(0, 63),
       |    (c, i) -> IF(c > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
       |  CAST(0 AS BIGINT), (acc, x) -> acc | x)""".stripMargin)

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (id, simhash) for every document — via the native SimHash64
    * expression (the SQL-expr form above is interpreted and allocates a
    * 64-array per token; bit-equality is pinned in SimHashNativeSuite). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.simhashNative(col(textCol)).as("sh"))
  }

  /** Near-duplicate pairs with Hamming distance ≤ maxDist. Uses
    * maxDist+1 signature chunks so the pigeonhole candidate join is
    * exhaustive (a pair at distance ≤ maxDist shares at least one whole
    * chunk); smaller maxDist → wider chunks → fewer, more selective
    * buckets. */
  def dedupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    bandedPairs(signatures(docs, idCol, textCol), maxDist)

  /** Pigeonhole Hamming self-join over PRECOMPUTED 64-bit signatures
    * `(id, sh)` — the hash-agnostic core of [[dedupPairs]], shared with
    * the perceptual image hash ([[PerceptualHash]]): any 64-bit sketch
    * whose Hamming distance tracks similarity can ride the same
    * exhaustive chunk-bucket join. Never an all-pairs comparison.
    *
    * This core does NOT cache (the r9 advisor: a cache() here leaked a
    * persisted copy per invocation with no unpersist hook — lazy
    * results give the library no materialization point to release it).
    * Instead the incoming signature pipeline is cut at an RDD
    * boundary: without it, CollapseProject inlines the signature
    * expression into every chunk-key expression AND the join's
    * distance recheck (~8 copies per side), and higher-order-function
    * expressions don't enter whole-stage codegen, so no subexpression
    * elimination rescues the duplicates — an expensive hash (decode +
    * aHash) measured 180× slower uncached. The LogicalRDD leaf
    * guarantees the hash evaluates once per row PER SCAN (the
    * self-join's two sides each scan it — a bounded 2×), and doubles
    * as a hard optimizer fence: no join-derived predicate can be
    * pushed into the signature pipeline. */
  def bandedPairs(signatures: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      "maxDist+1 chunks must each be at least 1 bit wide")
    val session = signatures.sparkSession
    import session.implicits._
    val sigs = signatures
      .select(col("id").cast("long"), col("sh").cast("long"))
      .as[(Long, Long)].rdd.toDF("id", "sh")
    // maxDist+1 chunk keys partitioning the 64 signature bits; the
    // first (64 % n) chunks take the extra bit.
    val nChunks = maxDist + 1
    var offset = 0
    val chunkCols = (0 until nChunks).map { i =>
      val width = 64 / nChunks + (if (i < 64 % nChunks) 1 else 0)
      val mask = if (width == 64) -1L else (1L << width) - 1
      val c = struct(lit(i).as("chunk_idx"),
        shiftright(col("sh"), offset).bitwiseAND(lit(mask)).as("chunk_key"))
      offset += width
      c
    }
    val chunked = sigs.select(col("id"), col("sh"),
      explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("sh"), col("c.chunk_idx"), col("c.chunk_key"))
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx")
          && col("x.chunk_key") === col("y.chunk_key")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming(col("x.sh"), col("y.sh")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
