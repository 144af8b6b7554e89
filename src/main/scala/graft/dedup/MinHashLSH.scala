package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (north-star LLM-pipeline op;
  * SURVEY.md §2.B last row).
  *
  * Pipeline (all DataFrame-native, one narrow pass per stage):
  *   1. shingle: token n-grams per document (the reference's tokenize
  *      idiom, generalized);
  *   2. hash shingles to ints; k seeded affine hashes (a·x+b mod p) give
  *      the k-wide MinHash signature — computed with codegen'd
  *      higher-order functions, no UDFs;
  *   3. LSH banding: split the signature into b bands of r rows, hash
  *      each band → explode to (doc, band_idx, band_key);
  *   4. candidate pairs = self-join on (band_idx, band_key) with
  *      id_a < id_b — this is the reference's own hash-partition idiom
  *      (`/root/reference/src/mr_tasks.h:24-32`) applied to bands, and
  *      the ONLY scalable shape: never an all-pairs cross join;
  *   5. verify candidates with EXACT shingle-set Jaccard ≥ threshold —
  *      LSH can produce false positives, the verify join removes them,
  *      so output precision is exact and only recall is probabilistic.
  *
  * At 100 TB: stages 1-3 are map-only; stage 4 shuffles (band_idx,
  * band_key) — bounded by bucket sizes (skew guard: `maxBucket` drops
  * degenerate buckets, the standard trick for near-constant shingles);
  * stage 5 joins shingle sets only for surviving candidates.
  */
object MinHashLSH {

  /** p = 2^31-1 (Mersenne prime) — the classic universal-hash modulus.
    * Shingle hashes and coefficients live in [0, p), so a·x+b < 2^62
    * (no signed-64 overflow) while wrapping p many times (a hash that
    * barely wraps its modulus is monotone in x, which would make every
    * "independent" min pick the same element and wreck LSH recall). */
  private val P = 2147483647L
  private val HashSpace = 2147483647L

  final case class Params(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      seed: Long = 42L,
      maxBucket: Int = 1000) {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    def rows: Int = numHashes / bands
  }

  /** Token n-gram shingle set (distinct) of a text column. Documents
    * shorter than n tokens get their full token sequence as the single
    * shingle. Native expression (graft.functions.ShingleSet) — the
    * composable `array_distinct(transform(sequence(...), i ->
    * concat_ws(' ', slice(split(text,' '), i+1, n))))` is interpreted
    * and allocates per shingle; parity pinned in ShingleSuite. */
  def shingleSet(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.shingles(text, n)

  /** (id, shingles, sig) for every document. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = {
    val rnd = new scala.util.Random(p.seed)
    val as = Seq.fill(p.numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Seq.fill(p.numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    // Signature via the native MinHashSig expression — the composable
    // form `zip_with(lit(as), lit(bs), (a,b) -> array_min(transform(hs,
    // x -> pmod(a*x+b, P))))` is interpreted (CodegenFallback) and walks
    // the shingle array k times; the native k-min single pass is
    // bit-identical (same positive integer math). See MinHashSigSuite.
    docs
      .select(col(idCol).as("id"), shingleSet(col(textCol), p.shingleSize).as("shingles"))
      // native per-element hash (== transform(shingles, s ->
      // pmod(xxhash64(s), HashSpace)), which is interpreted per shingle)
      .withColumn("hs",
        graft.functions.GraftFunctions.arrayHashMod(col("shingles"), HashSpace))
      .withColumn("sig",
        graft.functions.GraftFunctions.minhashSig(col("hs"), as, bs, P))
      .drop("hs")
  }

  /** (id, band_idx, band_key) — one row per document per band. */
  def bands(sigs: DataFrame, p: Params): DataFrame =
    sigs.select(col("id"),
      explode(
        transform(sequence(lit(0), lit(p.bands - 1)),
          i => struct(i.as("band_idx"),
            xxhash64(slice(col("sig"), i * p.rows + lit(1), lit(p.rows)), i)
              .as("band_key")))).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_key"))

  /** Verified near-duplicate pairs: (id_a, id_b, jaccard) with exact
    * Jaccard ≥ threshold, id_a < id_b.
    *
    * Cache note: the signature relation is cache()d (read by the band
    * join and the verify join). Spark SQL's CacheManager holds it until
    * `spark.catalog.clearCache()`/unpersist — long-lived sessions that
    * call this repeatedly should clear between invocations, as
    * Verify/Bench do. */
  def dedupPairs(docs: DataFrame, idCol: String, textCol: String,
      p: Params = Params()): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, p).cache()
    val bnd = bands(sigs, p)
    // Skew guard: drop degenerate buckets (near-universal bands).
    val smallBuckets = bnd.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("n")).filter(col("n") <= p.maxBucket)
      .select("band_idx", "band_key")
    val pruned = bnd.join(smallBuckets, Seq("band_idx", "band_key"))
    val candidates = pruned.as("x")
      .join(pruned.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_key") === col("y.band_key")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val withSets = candidates
      .join(sigs.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    withSets
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= p.threshold)
  }

  /** INCREMENTAL near-dedup: verified near-duplicate pairs between a
    * NEW BATCH and an EXISTING CORPUS — (batch_id, corpus_id, jaccard)
    * with exact Jaccard ≥ threshold. This is the shape a production
    * pipeline runs daily: yesterday's corpus is already deduped, and
    * only batch×corpus (plus batch×batch, handled separately by
    * [[dedupPairs]] over the batch) pairs are ever generated — NEVER
    * corpus×corpus, which would re-pay the whole history every day.
    * Candidates come from the band-bucket join of batch bands against
    * corpus bands; the skew guard counts COMBINED bucket occupancy so
    * a degenerate band key is dropped no matter which side bloats it.
    * At 100 TB the corpus signatures are computed once and persisted
    * beside the corpus (signature computation is map-only, so inline
    * recompute — as here — costs one corpus scan; a real deployment
    * stores the (id, shingles, sig) relation and this function's
    * corpus scan becomes a narrow parquet read). */
  def dedupPairsAgainst(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, p: Params = Params()): DataFrame = {
    val cs = signatures(corpus, idCol, textCol, p).cache()
    val bs = signatures(batch, idCol, textCol, p).cache()
    val cb = bands(cs, p)
    val bb = bands(bs, p)
    val smallBuckets = cb.unionAll(bb).groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("n")).filter(col("n") <= p.maxBucket)
      .select("band_idx", "band_key")
    val prunedC = cb.join(smallBuckets, Seq("band_idx", "band_key"))
    val candidates = bb.as("x")
      .join(prunedC.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_key") === col("y.band_key"))
      .select(col("x.id").as("batch_id"), col("y.id").as("corpus_id"))
      .distinct()
    candidates
      .join(bs.select(col("id").as("batch_id"), col("shingles").as("sh_a")),
        "batch_id")
      .join(cs.select(col("id").as("corpus_id"), col("shingles").as("sh_b")),
        "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= p.threshold)
  }

  /** Keep-first dedup: drops every document that near-duplicates a
    * lower-id document (single-link, one hop — the standard streaming
    * approximation of connected components). */
  def dedupKeepFirst(docs: DataFrame, idCol: String, textCol: String,
      p: Params = Params()): DataFrame = {
    val drop = dedupPairs(docs, idCol, textCol, p)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
