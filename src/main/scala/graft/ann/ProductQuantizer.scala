package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-side companion to the IVF /
  * LSH search paths: each embedding is split into `m` contiguous
  * subvectors and every subvector is replaced by the index of its
  * nearest codeword in a per-subspace codebook, compressing a
  * dim-float vector to m small ints (here 64×4B → 8×1B, 32×). At
  * 100 TB this is what makes a candidate re-rank table fit in memory:
  * the full vectors stay in cold storage, scans carry only codes, and
  * asymmetric distance computation reconstructs approximate distances
  * from a k×m lookup table per query.
  *
  * Codebooks here are seeded MEDOIDS — the same portable-hash seed
  * selection as [[AnnIvf.medoids]] (multiplicative hash, 31-bit
  * pre-mask, id tie-break) taking the k hash-first corpus vectors'
  * subvectors as codewords. That keeps every step (seed choice,
  * ordered squared-L2 fold, argmin with code tie-break) exact math an
  * independent engine replays bit-for-bit, so `pq_encode` sits under
  * the full rows+schema+hash oracle gate; a Lloyd-trained codebook
  * variant would share all the plumbing but lose the oracle (same
  * trade documented on [[AnnIvf]]).
  *
  * Assignment is map-only: codebooks ride as a driver-side constant
  * (m·k·sub doubles), each row computes its m·k ordered squared-L2
  * folds inside ONE native codegen expression
  * ([[graft.functions.PqEncode]]) — no shuffle, no UDF, no
  * interpreted HOFs. (The original composable form used
  * `aggregate(zip_with(...))` per codeword; Spark's array HOFs are
  * CodegenFallback, so that planned 128 interpreted folds per row —
  * kept as [[encodeHof]] purely as the parity reference the suite
  * checks the native expression against.)
  */
object ProductQuantizer {

  /** m codebooks of k codewords each: subvector s of the k seeded
    * medoid vectors (medoid selection identical to AnnIvf.medoids). */
  def codebooks(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val seeds = AnnIvf.medoids(vectors, idCol, vecCol, k)
    require(seeds.nonEmpty, "empty corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    (0 until m).map(s => seeds.map(_.slice(s * sub, (s + 1) * sub)))
  }

  /** Squared L2 between a sliced subvector column and a codeword
    * literal, folded in index order (bit-identical in any engine that
    * folds arrays left-to-right). */
  private def sqDist(subVec: Column, codeword: Seq[Double]): Column =
    aggregate(
      zip_with(subVec, typedlit(codeword), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  private def flatten(books: Seq[Seq[Seq[Double]]]): Array[Double] =
    books.flatten.flatten.toArray

  /** The codes column through the native one-pass expression. */
  def encodeCol(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val k = books.head.length
    val sub = books.head.head.length
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(
          vec.cast("array<double>")),
        flatten(books), m, k, sub))
  }

  /** Approximate squared-L2 between a raw query vector and a code
    * array (asymmetric distance), through the native expression. */
  def adcCol(queryVec: Column, codes: Column,
      books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val k = books.head.length
    val sub = books.head.head.length
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqAdc(
        org.apache.spark.sql.GraftColumnBridge.expression(
          queryVec.cast("array<double>")),
        org.apache.spark.sql.GraftColumnBridge.expression(codes),
        flatten(books), m, k, sub))
  }

  /** (id, codes: array<int>, code_str) — one code per subspace,
    * argmin squared-L2 with lowest-code tie-break, computed by the
    * native [[graft.functions.PqEncode]] expression (bit-identical to
    * [[encodeHof]], which PqSuite asserts). */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.length
    val sub = books.head.head.length
    vectors
      .filter(size(col(vecCol)) === lit(m * sub))
      .select(col(idCol).as("id"),
        encodeCol(col(vecCol), books).as("codes"))
      .withColumn("code_str", array_join(col("codes"), ","))
  }

  /** The original composable-HOF encode (interpreted: Spark array HOFs
    * are CodegenFallback) — retained ONLY as the parity reference for
    * the native expression; production paths use [[encode]]. */
  def encodeHof(vectors: DataFrame, idCol: String, vecCol: String,
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.length
    val sub = books.head.head.length
    val v = col(vecCol).cast("array<double>")
    val codes = array((0 until m).map { s =>
      val subVec = slice(v, s * sub + 1, sub)
      array_min(array(books(s).zipWithIndex.map { case (cw, j) =>
        struct(sqDist(subVec, cw).as("d"), lit(j).as("i"))
      }: _*)).getField("i")
    }: _*)
    vectors
      .filter(size(col(vecCol)) === lit(m * sub))
      .select(col(idCol).as("id"), codes.as("codes"))
      .withColumn("code_str", array_join(col("codes"), ","))
  }
}
