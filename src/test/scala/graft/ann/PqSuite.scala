package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantizer spec: code range, self-encoding of the medoid
  * seeds, and that PQ reconstruction actually approximates vectors
  * better than a constant-code baseline (i.e. the codes carry
  * geometry, not just valid indices). */
class PqSuite extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // deterministic spread-out vectors, dim 16
    (0L until 60L).map { id =>
      val v = Array.tabulate(16)(i =>
        math.sin(id * 0.7 + i * 1.3).toFloat + (if (id % 7 == 0) 2f else 0f))
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  test("codes are in range and every vector encodes") {
    val df = fixture
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    assert(books.length === 4 && books.forall(_.length === 8) &&
      books.forall(_.forall(_.length === 4)))
    val enc = ProductQuantizer.encode(df, "vec_id", "embedding", books)
    assert(enc.count() === 60)
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c >= 8)).count()
    assert(bad === 0)
  }

  test("medoid seeds encode to themselves (zero distance per subspace)") {
    val df = fixture
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val enc = ProductQuantizer.encode(df, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // reconstruct each vector from its codes; a seed must reconstruct
    // exactly, so its squared error is 0
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val seedIds = vecs.keys.toSeq
      .sortBy(id => ((id * 2654435761L) & 2147483647L, id)).take(8)
    for (id <- seedIds) {
      val err = reconstructionErr(vecs(id), enc(id), books)
      assert(err === 0.0, s"seed $id should self-encode")
    }
    // and codes beat an all-zeros-code baseline on average
    val pqErr = vecs.map { case (id, v) =>
      reconstructionErr(v, enc(id), books) }.sum / vecs.size
    val constErr = vecs.map { case (id, v) =>
      reconstructionErr(v, Seq.fill(4)(0), books) }.sum / vecs.size
    assert(pqErr < constErr,
      s"PQ codes ($pqErr) should beat constant code ($constErr)")
  }

  private def reconstructionErr(v: Seq[Double], codes: Seq[Int],
      books: Seq[Seq[Seq[Double]]]): Double = {
    val sub = v.length / books.length
    books.indices.map { s =>
      val cw = books(s)(codes(s))
      (0 until sub).map(i => math.pow(v(s * sub + i) - cw(i), 2)).sum
    }.sum
  }
}
