package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.VectorOps

/** Approximate nearest neighbour search over an embedding column via
  * random-hyperplane (sign) LSH — the scale path beside the brute-force
  * baseline (VectorOps.cosineTopK).
  *
  * Index: `tables` independent hash tables, each hashing a vector to a
  * `bitsPerTable`-bit signature (sign of dot(v, r_i) for seeded random
  * hyperplanes r_i). Collision probability per bit is 1 - θ/π — vectors
  * at small angle collide with high probability.
  *
  * The hyperplanes are seeded Rademacher (±1) vectors rather than
  * gaussians: sign-projection quality is equivalent (Achlioptas-style
  * database-friendly random projections), and ±1 entries make the
  * bucket assignment EXACT integer-free arithmetic on the embedding
  * values — dot(v, r) = Σ ±v[i] accumulated in index order — which an
  * independent SQL engine replays bit-for-bit. That turns the whole
  * ANN query (bucket → probe → exact rerank) into an oracle-checkable
  * relational program; see DedupAnn.annTopK.
  *
  * Query at scale: corpus bucketed once (map-only, then ONE shuffle by
  * (table, bucket)); each query probes its `tables` buckets — a join on
  * bucket keys, never a cross join — and only bucket members are
  * exactly re-ranked by cosine. Recall is tuned by (bitsPerTable ↓,
  * tables ↑); the ScalaTest gate measures recall@k against brute force.
  *
  * 100 TB note: for a production IVF variant the bucketing column is
  * also the partition/bucketBy key of the stored index, making probes
  * partition-pruned scans; the plumbing here is the same plan shape.
  */
object AnnLsh {

  final case class Params(
      dim: Int = 64,
      bitsPerTable: Int = 8,
      tables: Int = 8,
      seed: Long = 42L)

  /** Deterministic seeded hyperplanes: tables × bits × dim Rademacher
    * ±1 entries. Public so the oracle SQL generator can embed the SAME
    * plane literals it hands to the Spark plan. */
  def hyperplanes(p: Params): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(p.seed)
    Seq.fill(p.tables, p.bitsPerTable, p.dim)(
      if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Signature of one table: bits packed into a long. Hyperplane dots
    * go through the native ArrayDot expression — the HOF fold is
    * interpreted and this is the index's hot loop (tables × bits dots
    * per corpus vector). */
  private def tableSig(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      when(graft.functions.GraftFunctions.dotNative(vec, typedlit(plane)) > 0,
        shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** (id, table, bucket, vec) — the LSH index relation, one row per
    * vector per table. */
  def index(vectors: DataFrame, idCol: String, vecCol: String,
      p: Params = Params()): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(vectors.sparkSession)
    val hp = hyperplanes(p)
    val v = col(vecCol).cast("array<double>")
    val buckets = array(hp.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("table"), tableSig(v, planes).as("bucket"))
    }: _*)
    // Spread the signature pass across the session's parallelism
    // (optimization round 13 — the CosineDedup r12 discipline, moved
    // into the index itself so EVERY consumer gets it): the pass is
    // tables × bits hyperplane dots per vector — the index's hot loop —
    // and a single-file fixture otherwise computes it on one core
    // (measured: ann_cosine_topk's corpus signatures single-task). The
    // repartition moves only (id, vec) rows; at production file counts
    // the scan is already wide and this is a no-op-sized safety net.
    vectors
      .repartition(vectors.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), v.as("vec"),
        explode(buckets).as("tb"))
      .select(col("id"), col("tb.table"), col("tb.bucket"), col("vec"))
  }

  /** Approximate top-k neighbours for each query vector: probe the
    * query's buckets across all tables, union members, exact-rerank by
    * cosine. Queries and corpus share the same index transformation.
    *
    * Plan shape: candidate generation joins ONLY (id, table, bucket)
    * triples — the 64-dim vectors never ride through the band explode
    * and bucket shuffle (at 100 TB that's the difference between
    * shuffling 8×corpus keys and 8×corpus full vectors). Vectors join
    * back once: corpus side by id for the surviving candidates, query
    * side as a broadcast (the query set is small by contract). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, p: Params = Params()): DataFrame = {
    val corpusIdx = index(corpus, idCol, vecCol, p).drop("vec")
    val queryIdx = index(queries, idCol, vecCol, p).drop("vec")
      .withColumnRenamed("id", "qid")
    val candidates = corpusIdx.join(broadcast(queryIdx), Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
      .dropDuplicates("qid", "id")
    val corpusVecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val queryVecs = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // Rank on the ROUNDED cosine (6 dp) with id tie-break — same
    // discipline as VectorOps.cosineTopK, so an independent engine
    // computing the identical float math agrees on the ordering.
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    candidates
      .join(corpusVecs, "id")
      .join(broadcast(queryVecs), "qid")
      .withColumn("cos", round(
        graft.functions.GraftFunctions.cosineNative(col("qvec"), col("vec")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rn"))
  }
}
