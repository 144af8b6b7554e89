package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbour search — the
  * cluster-based scale path beside sign-LSH (AnnLsh): a small k-means
  * coarse quantizer assigns every vector to its nearest centroid (by
  * cosine); queries probe only the nProbe nearest cells and exact-rerank
  * cell members.
  *
  * Training is Lloyd's algorithm with deterministic seeded init
  * (xxhash64-ordered sample): assignments are computed distributed
  * (k native dots per vector), only the k×dim centroid matrix ever
  * reaches the driver. At scale the cell id becomes the stored index's
  * partition key, making probes partition-pruned scans — same plan
  * shape as the bucketed-join spec in ScaleOpsSuite.
  */
object AnnIvf {

  final case class Params(
      k: Int = 8,
      iters: Int = 5,
      nProbe: Int = 3,
      seed: Long = 42L)

  /** argmax-cosine cell assignment as a Column: array_min over
    * (negated cosine, cell) structs — lexicographic struct ordering
    * gives min distance with deterministic cell tie-break. */
  private def nearestCell(vec: Column, cents: Seq[Seq[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct((lit(0.0) - GraftFunctions.cosineNative(vec, typedlit(c)))
        .as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** Lloyd's k-means on the unit sphere (cosine assignment, mean
    * update). Returns the k×dim centroid matrix. */
  def train(vectors: DataFrame, vecCol: String, p: Params = Params()): Seq[Seq[Double]] = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val v = vectors.select(col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0).cache()
    // deterministic init: first k vectors in xxhash64 order of content
    var cents: Seq[Seq[Double]] = v
      .withColumn("h", xxhash64(col("v").cast("string"), lit(p.seed)))
      .orderBy("h").limit(p.k)
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    var it = 0
    while (it < p.iters) {
      val assigned = v.withColumn("cell", nearestCell(col("v"), cents))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1))
              .map(r => r.getDouble(2) / r.getLong(3)).toSeq
          case None => cents(c) // empty cell keeps its centroid
        }
      }
      it += 1
    }
    v.unpersist()
    cents
  }

  /** Seeded-medoid coarse quantizer: the k corpus vectors with the
    * smallest portable multiplicative hash of their id — i.e. Lloyd's
    * "deterministic seeded init" with zero update iterations, using
    * actual data points as cell centres. Unlike the trained path (whose
    * centroid means depend on float accumulation order across tasks),
    * every step here — seed choice, cosine assignment, probe order — is
    * exact integer/IEEE math an independent SQL engine replays
    * bit-for-bit, which is what makes ivf_cosine_topk oracle-checkable.
    * The 31-bit pre-mask keeps the hash in safe positive BIGINT range
    * on both engines. */
  def medoids(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Seq[Double]] = {
    vectors
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) > 0)
      .withColumn("h",
        (col("id") * lit(2654435761L)).bitwiseAND(lit(2147483647L)))
      .orderBy(col("h"), col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
  }

  /** (id, cell, vec) index relation. */
  def index(vectors: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val v = col(vecCol).cast("array<double>")
    vectors.select(col(idCol).as("id"), v.as("vec"),
      nearestCell(v, cents).as("cell"))
  }

  /** nProbe cells per query vector (public: ivfpq_topk composes it
    * with PQ-ADC re-rank). */
  def probeCells(vec: Column, cents: Seq[Seq[Double]],
      nProbe: Int): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct((lit(0.0) - GraftFunctions.cosineNative(vec, typedlit(c)))
        .as("d"), lit(i).as("i"))
    }: _*)
    slice(array_sort(scored), 1, nProbe).getField("i")
  }

  /** Approximate top-k against a PRE-BUILT centroid matrix: probe
    * nProbe cells, exact-rerank members. Ranking uses the ROUNDED
    * cosine (6 dp) with id tie-break (see VectorOps.cosineTopK). */
  def topKWith(cents: Seq[Seq[Double]], corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val corpusIdx = index(corpus, idCol, vecCol, cents)
    val queryCells = queries
      .select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("cell",
        explode(probeCells(col("qvec"), cents, nProbe)))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    corpusIdx.join(broadcast(queryCells), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("cos",
        round(GraftFunctions.cosineNative(col("qvec"), col("vec")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rn"))
  }

  /** Approximate top-k with a freshly TRAINED quantizer (Lloyd). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, p: Params = Params()): DataFrame =
    topKWith(train(corpus, vecCol, p), corpus, queries, idCol, vecCol,
      k, p.nProbe)
}
