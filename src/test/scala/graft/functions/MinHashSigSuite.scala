package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Parity gate: native MinHashSig ≡ the zip_with/array_min HOF form. */
class MinHashSigSuite extends SparkSpec {

  test("native minhash signature equals the HOF form on fixture docs") {
    val P = 2147483647L
    val rnd = new scala.util.Random(42L)
    val as = Seq.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Seq.fill(64)(rnd.nextInt(Int.MaxValue).toLong)
    val hs = transform(
      graft.dedup.MinHashLSH.shingleSet(col("text"), 3),
      s => pmod(xxhash64(s), lit(P)))
    val hof = zip_with(typedlit(as), typedlit(bs),
      (a, b) => array_min(transform(col("hs"), x => pmod(a * x + b, lit(P)))))
    val both = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), hof.as("hof"),
        GraftFunctions.minhashSig(col("hs"), as, bs, P).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 100)
  }

  test("arrayHashMod equals the transform(xxhash64 pmod) HOF form") {
    val P = 2147483647L
    val sh = graft.dedup.MinHashLSH.shingleSet(col("text"), 3)
    val both = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), s => pmod(xxhash64(s), lit(P))).as("hof"),
        GraftFunctions.arrayHashMod(col("sh"), P).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 100)
  }

  test("compute handles empty input with the mod sentinel") {
    val out = MinHashSig.compute(Array.empty[Long], Array(3L, 5L),
      Array(1L, 2L), 97L)
    assert(out.toSeq === Seq(97L, 97L))
  }
}
