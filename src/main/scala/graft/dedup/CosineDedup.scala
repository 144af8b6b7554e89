package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ann.AnnLsh
import graft.functions.GraftFunctions

/** Embedding-cosine near-duplicate detection — the third dedup sketch
  * (beside MinHash and SimHash), for corpora deduplicated in embedding
  * space rather than token space.
  *
  * Candidates come from the ANN module's sign-LSH buckets (same index
  * relation, self-joined), then exact cosine ≥ minCosine verifies — so
  * precision is exact and only recall is probabilistic. For near-dups
  * (cosine ≥ 0.95, angle ≤ 18°) the per-table collision probability is
  * (1-θ/π)^bits; across the default 12 tables the miss probability is
  * negligible. Never an all-pairs cross join. */
object CosineDedup {

  def dedupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95,
      p: AnnLsh.Params = AnnLsh.Params(bitsPerTable = 8, tables = 12)): DataFrame = {
    // cached: the self-join reads the index twice, and the signature
    // pass (tables × bits hyperplane dots per vector) is the expensive
    // stage — at scale this materializes as a stored index instead.
    // The session-parallelism spread that r12 added here (single-file
    // fixtures computed the signature pass on ONE core) now lives in
    // AnnLsh.index itself (optimization round 13), so every index
    // consumer gets it and this call site stays repartition-free.
    val idx = AnnLsh.index(vectors, idCol, vecCol, p).drop("vec").cache()
    val candidates = idx.as("x")
      .join(idx.as("y"),
        col("x.table") === col("y.table")
          && col("x.bucket") === col("y.bucket")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val vecs = vectors.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    candidates
      .join(vecs.select(col("vid").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("vid").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        GraftFunctions.cosineNative(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** INCREMENTAL embedding-space near-dedup: verified near-duplicate
    * pairs between a NEW BATCH and the EXISTING CORPUS — the vector
    * sibling of [[graft.dedup.MinHashLSH.dedupPairsAgainst]], and the
    * daily production shape (embedding dedup of arriving documents
    * against an already-deduped corpus; never corpus×corpus). Both
    * sides index with the SAME seeded hyperplanes (AnnLsh.Params is
    * deterministic), so bucket keys are comparable across the two
    * index relations; candidates are the batch×corpus bucket join,
    * then exact cosine ≥ minCosine verifies. At 100 TB the corpus
    * index is computed once and persisted; the batch index is a
    * map-only pass over the day's arrivals. */
  def dedupPairsAgainst(corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, minCosine: Double = 0.95,
      p: AnnLsh.Params = AnnLsh.Params(bitsPerTable = 8, tables = 12))
      : DataFrame = {
    // Session-parallelism spread now inside AnnLsh.index (round 13).
    val ci = AnnLsh.index(corpus, idCol, vecCol, p).drop("vec").cache()
    val bi = AnnLsh.index(batch, idCol, vecCol, p).drop("vec").cache()
    val candidates = bi.as("x")
      .join(ci.as("y"),
        col("x.table") === col("y.table")
          && col("x.bucket") === col("y.bucket"))
      .select(col("x.id").as("batch_id"), col("y.id").as("corpus_id"))
      .distinct()
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val cv = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("vc"))
    val bv = batch.select(col(idCol).as("batch_id"),
      col(vecCol).cast("array<double>").as("vb"))
    candidates
      .join(bv, "batch_id")
      .join(cv, "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        GraftFunctions.cosineNative(col("vb"), col("vc")).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Keep-first policy, mirroring MinHashLSH.dedupKeepFirst. */
  def dedupKeepFirst(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95): DataFrame = {
    val drop = dedupPairs(vectors, idCol, vecCol, minCosine)
      .select(col("id_b").as(idCol)).distinct()
    vectors.join(drop, Seq(idCol), "left_anti")
  }
}
