package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLSH
import graft.text.LangId

/** End-to-end training-corpus curation — the composite operator a
  * pretraining pipeline runs over raw documents, built entirely from
  * this engine's primitives:
  *
  *   1. language filter (LangId confidence ≥ floor),
  *   2. quality filter (stopword ratio + repetition + length band),
  *   3. exact dedup (md5 keep-first),
  *   4. near-dedup (MinHash-LSH keep-first),
  *   5. token accounting for the surviving corpus.
  *
  * Stage order matters at scale: cheap map-only filters (1-2) shrink
  * the corpus before the hash shuffle (3) and the LSH self-join (4) —
  * the same cost discipline a 100 TB run needs.
  */
object Curate {

  final case class Params(
      minLangConfidence: Double = 0.02,
      maxRepetition: Double = 0.6,
      minChars: Long = 100,
      maxChars: Long = 100000,
      minhash: MinHashLSH.Params = MinHashLSH.Params(threshold = 0.8))

  /** A curated corpus plus the pipeline's persisted stage boundaries.
    * Call [[release]] once the final action over [[result]] (or any
    * derived frame) has run — library callers must not depend on a
    * session-wide `clearCache()` sweep to free the two cached
    * relations. */
  final case class Curated(result: DataFrame, cached: Seq[DataFrame]) {
    def release(): Unit = cached.foreach(_.unpersist(false))
  }

  /** Surviving documents with per-doc metadata (lang, n_tokens), with
    * a release handle for the two persisted boundaries. */
  def curateDetailed(docs: DataFrame, p: Params = Params()): Curated = {
    val ts = split(col("text"), " ")
    // 1+2: map-only filters. Language is an inline COLUMN
    // (LangId.detectNative), not a classify-then-join — the join form
    // scanned the corpus twice for what is a per-row computation.
    // The filtered relation is persisted because it feeds BOTH the md5
    // keep-first aggregate and the survivor join below.
    val filtered = docs
      .withColumn("__lp", LangId.detectNative(col("text")))
      .filter(col("__lp.confidence") >= p.minLangConfidence)
      .withColumn("lang_pred", col("__lp.lang"))
      .drop("__lp")
      .withColumn("repetition",
        lit(1.0) - size(array_distinct(ts)).cast("double") / size(ts))
      .filter(col("repetition") <= p.maxRepetition
        && col("n_chars").between(p.minChars, p.maxChars))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3: exact dedup, keep min doc_id per content hash
    val keepExact = filtered
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // Second materialized stage boundary: exactDeduped feeds BOTH the
    // MinHash signature pass and the final keep-anti-join — unpersisted,
    // the md5 shuffle + survivor join would run twice. With `filtered`
    // cached above, the raw corpus parquet is scanned exactly ONCE with
    // data columns (PLANS.md pins this); a production 100 TB run writes
    // these boundaries to parquet between stages — in-session
    // MEMORY_AND_DISK is the same idea. Freed by clearCache / the
    // Verify-Bench persist sweep.
    val exactDeduped = filtered.join(keepExact, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 4: near-dedup over the survivors
    val deduped = MinHashLSH.dedupKeepFirst(
      exactDeduped, "doc_id", "text", p.minhash)
    // 5: token accounting
    val result = deduped.select(col("doc_id"), col("lang_pred"),
      size(split(col("text"), " ")).as("n_tokens"))
    Curated(result, Seq(filtered, exactDeduped))
  }

  /** Convenience form without the release handle. The two persisted
    * boundaries stay cached until `Curated.release` semantics are
    * applied by the caller — Verify/Bench do this with their
    * between-query persist sweep; other callers should prefer
    * [[curateDetailed]]. */
  def curate(docs: DataFrame, p: Params = Params()): DataFrame =
    curateDetailed(docs, p).result

  /** Corpus-level report: docs in/out per stage + surviving tokens.
    * The n_raw aggregate prunes every column (ReadSchema struct<>), so
    * for a parquet-backed corpus it touches footers/row-group counts,
    * not data pages — it is NOT a second full scan of the text. */
  def report(docs: DataFrame, p: Params = Params()): DataFrame = {
    val out = curate(docs, p)
    docs.agg(count(lit(1)).as("n_raw"))
      .crossJoin(out.agg(count(lit(1)).as("n_kept"),
        sum("n_tokens").as("total_tokens")))
  }
}
