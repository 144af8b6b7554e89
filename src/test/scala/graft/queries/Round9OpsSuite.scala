package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property / naive-replay pins for the round-9 operators, at sf0.001 —
  * the spec leg of the oracle+spec+plan discipline. Each test checks
  * an algebraic invariant or recomputes the answer with an independent
  * driver-side naive algorithm over collected fixture rows (small at
  * this SF), so a bug that happened to fool the SQL oracle's
  * formulation is still caught. */
class Round9OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  /** Naive aHash-64 replay straight from the fixture generation
    * formula — no Spark, no codec: gray(p) = Σ_ch text[(3p+ch) % len],
    * rendition 1 adds the affine +90 and channel-0 salt +9 on every
    * 37th pixel, and bit r·8+c compares the block sum cross-multiplied
    * against the image total. */
  private def naiveAHash(text: String, w: Int, h: Int, rend: Int): Long = {
    val len = text.length
    val gs = Array.tabulate(w * h) { p =>
      var g = 0L
      var c = 0
      while (c < 3) { g += text.charAt((p * 3 + c) % len).toInt; c += 1 }
      if (rend == 1) g += 90 + (if (p % 37 == 0) 9 else 0)
      g
    }
    val t = gs.sum
    val n = w.toLong * h
    var hash = 0L
    var b = 0
    while (b < 64) {
      val r = b / 8; val c = b % 8
      val ylo = (r * h + 7) / 8; val yhi = ((r + 1) * h + 7) / 8 - 1
      val xlo = (c * w + 7) / 8; val xhi = ((c + 1) * w + 7) / 8 - 1
      var s = 0L
      var y = ylo
      while (y <= yhi) {
        var x = xlo
        while (x <= xhi) { s += gs(y * w + x); x += 1 }
        y += 1
      }
      val nb = (yhi - ylo + 1).toLong * (xhi - xlo + 1)
      if (s * n > t * nb) hash |= (1L << b)
      b += 1
    }
    hash
  }

  test("phash_dup_pairs: brute-force replay, planted recall, banding exhaustive") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val sigs = docs.flatMap { case (id, text) =>
      val w = (16 + 2 * (id % 8)).toInt
      val h = (16 + 2 * ((id / 8) % 8)).toInt
      Seq((id, 0, naiveAHash(text, w, h, 0)),
        (id, 1, naiveAHash(text, w, h, 1)))
    }
    // brute-force all-pairs scan — what the pigeonhole join must equal
    val expected = (for {
      a <- sigs; b <- sigs
      if a._1 * 2 + a._2 < b._1 * 2 + b._2
      dist = java.lang.Long.bitCount(a._3 ^ b._3)
      if dist <= 5
    } yield (a._1, a._2, b._1, b._2, dist))
      .sortBy(t => (t._1, t._2, t._3, t._4))
    val got = run("phash_dup_pairs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      s"banded join must equal the brute-force scan: got ${got.length}, " +
        s"expected ${expected.length}")
    // planted recall: every image's (base, rendition) pair survives the
    // threshold — the affine part is distance-free by the invariance
    // contract, so only the sparse salt can spend the 5-bit budget
    val planted = got.filter(t => t._1 == t._3 && t._2 == 0 && t._4 == 1)
    assert(planted.length == docs.length,
      s"all ${docs.length} planted rendition pairs must be within 5 bits, " +
        s"got ${planted.length}")
    // separation: at this SF no unrelated cross-image pair sneaks under
    // the threshold (measured margin ≥ 10 bits on sf0.01)
    assert(got.length == planted.length,
      "no cross-image pair may sit within the planted threshold")
  }

  test("bpe_apply: merges, usage accounting, and fertility match a naive replay") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    // naive training: 3 rounds of corpus pair-count → lexicographic-
    // tie-break argmax → leftmost-non-overlapping fuse
    var cur = texts
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to 3) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      cur.foreach { t =>
        val ws = t.split(" ", -1)
        var i = 0
        while (i < ws.length - 1) {
          counts((ws(i), ws(i + 1))) = counts.getOrElse((ws(i), ws(i + 1)), 0L) + 1
          i += 1
        }
      }
      val (w1, w2) = counts.toSeq.maxBy { case ((a, b), c) => (c, a, b) }(
        Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
          Ordering.String.reverse))._1
      merges += ((w1, w2))
      cur = cur.map(_.replace(s"$w1 $w2", s"${w1}_$w2"))
    }
    // naive inference accounting over the original corpus
    val stages = texts.map { t0 =>
      val chain = merges.scanLeft(t0) { case (t, (w1, w2)) =>
        t.replace(s"$w1 $w2", s"${w1}_$w2")
      }
      chain.map(_.split(" ", -1).length.toLong)
    }
    val s = (0 to 3).map(i => stages.map(_(i)).sum)
    val d = (1 to 3).map(i => stages.count(st => st(i) < st(i - 1)).toLong)
    def fert(x: Long) = math.floor(x.toDouble / s(0) * 1000000 + 0.5) / 1000000
    val expected = Seq(
      (0, "", 0L, 0L, s(0), 1.0),
      (1, merges(0)._1 + "_" + merges(0)._2, d(0), s(0) - s(1), s(1), fert(s(1))),
      (2, merges(1)._1 + "_" + merges(1)._2, d(1), s(1) - s(2), s(2), fert(s(2))),
      (3, merges(2)._1 + "_" + merges(2)._2, d(2), s(2) - s(3), s(3), fert(s(3))))
    val got = run("bpe_apply").collect().map(r => (r.getInt(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == expected)
    // inference identity: applying the learned table reproduces the
    // training loop's final corpus token count (bpe_train_rounds)
    val trainAfter = run("bpe_train_rounds").collect()
      .map(_.getInt(2).toLong).sum
    assert(got(3)._5 == trainAfter,
      "apply(learned merges) must equal training's final token count")
  }

  test("phash aHash: bits invariant under any positive affine pixel map") {
    val (id, text) = {
      val r = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 3 === 0).select("doc_id", "text").head()
      (r.getLong(0), r.getString(1))
    }
    val w = (16 + 2 * (id % 8)).toInt
    val h = (16 + 2 * ((id / 8) % 8)).toInt
    val len = text.length
    import spark.implicits._
    def planes(a: Int, b: Int): Array[Int] =
      Array.tabulate(w * h * 3)(j => a * text.charAt(j % len).toInt + b)
    val df = Seq((0L, planes(1, 0)), (1L, planes(3, 17)), (2L, planes(7, 250)))
      .toDF("id", "px")
      .withColumn("w", lit(w)).withColumn("h", lit(h))
      .select(col("id"),
        graft.dedup.PerceptualHash.aHash64("px", "w", "h").as("sh"))
    val hashes = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(0L) == hashes(1L) && hashes(1L) == hashes(2L),
      "aHash must be exactly invariant under v -> a*v + b (a > 0)")
  }
}
