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

  test("native PqEncode is bit-identical to the composable HOF form") {
    val df = fixture
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    def strs(enc: org.apache.spark.sql.DataFrame): Map[Long, String] =
      enc.select("id", "code_str").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = strs(ProductQuantizer.encode(df, "vec_id", "embedding", books))
    val hof = strs(ProductQuantizer.encodeHof(df, "vec_id", "embedding", books))
    assert(native.size === 60)
    assert(native === hof)
  }

  test("PqEncode runs inside whole-stage codegen (the point of the native form)") {
    // A doGenCode bug makes Spark silently fall back to interpreted
    // eval for the whole stage — the exact regression this expression
    // exists to prevent. Pin: the Project stage carrying the encode is
    // codegen'd AND actually contains the expression.
    // repartition defeats ConvertToLocalRelation (which would fold the
    // projection driver-side and never exercise generated code)
    val df = fixture.repartition(2)
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val enc = df.select(
      ProductQuantizer.encodeCol(org.apache.spark.sql.functions.col("embedding"),
        books).as("codes"))
    enc.collect() // force execution so AQE finalizes the plan
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_encode"), plan)
    assert(plan.split('\n').exists(l =>
      l.contains("*(") && l.contains("Project")), s"encode Project lost codegen:\n$plan")
  }

  test("ADC distance matches driver-side math exactly and ranks sanely") {
    val df = fixture
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val enc = ProductQuantizer.encode(df, "vec_id", "embedding", books)
    import org.apache.spark.sql.functions._
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val got = enc.crossJoin(broadcast(queries))
      .select(col("qid"), col("id"),
        ProductQuantizer.adcCol(col("qv"), col("codes"), books).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val sub = 4
    for (q <- 0L until 3L; id <- vecs.keys) {
      var total = 0.0
      for (s <- 0 until 4) {
        val cw = books(s)(codes(id)(s))
        var d = 0.0
        for (i <- 0 until sub) {
          val diff = vecs(q)(s * sub + i) - cw(i)
          d += diff * diff
        }
        total += d
      }
      assert(got((q, id)) === total, s"ADC mismatch for q=$q id=$id")
    }
    // ADC is approximate but must carry geometry: each query's own
    // row (exact reconstruction distance) must land in its ADC top-5
    for (q <- 0L until 3L) {
      val top5 = vecs.keys.toSeq.sortBy(id => (got((q, id)), id)).take(5)
      assert(top5.contains(q), s"query $q not in own ADC top-5: $top5")
    }
  }

  test("ADC top-5 recall vs exact squared-L2 top-5") {
    val df = fixture
    val books = ProductQuantizer.codebooks(df, "vec_id", "embedding", m = 4, k = 8)
    val enc = ProductQuantizer.encode(df, "vec_id", "embedding", books)
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def sqL2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def adc(q: Array[Double], cs: Seq[Int]): Double =
      books.indices.map { s =>
        val cw = books(s)(cs(s)).toArray
        (0 until cw.length).map(i => {
          val d = q(s * cw.length + i) - cw(i); d * d
        }).sum
      }.sum
    val others = (id: Long) => vecs.keys.filter(_ != id)
    val recalls = (0L until 10L).map { q =>
      val exact = others(q).toSeq
        .sortBy(id => (sqL2(vecs(q), vecs(id)), id)).take(5).toSet
      val approx = others(q).toSeq
        .sortBy(id => (adc(vecs(q), codes(id)), id)).take(5).toSet
      exact.intersect(approx).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean ADC recall@5 over 10 queries: $mean%.2f")
    assert(mean >= 0.5, s"ADC recall@5 degraded: $mean (per-query: $recalls)")
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
