package graft.dedup

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Planted-duplicate gate for embedding-cosine near-dedup. */
class CosineDedupSuite extends SparkSpec {

  private lazy val planted = {
    import spark.implicits._
    val orig = Tables.embeddings(spark, sfDir).limit(15)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val rnd = new scala.util.Random(7)
    val copies = orig.map { case (id, v) =>
      (id + 100000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    spark.createDataFrame(orig ++ copies).toDF("vec_id", "embedding")
  }

  test("finds every planted near-identical embedding pair, nothing else") {
    val pairs = CosineDedup
      .dedupPairs(planted, "vec_id", "embedding", minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 15).map(i => (i.toLong, i + 100000L)).toSet
    assert(pairs === expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
    // fixture max unrelated cosine is ~0.51, far below the threshold —
    // exact verification guarantees zero false positives
  }

  test("keep-first drops exactly the perturbed copies") {
    val kept = CosineDedup.dedupKeepFirst(planted, "vec_id", "embedding")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === (0 until 15).map(_.toLong).toSet)
  }
}
