package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries frequent-items aggregate: exactness when the vocabulary
  * fits in k, the superset + error guarantees when it doesn't, and
  * parity of the sketch-then-recount query with the exact query. */
class MisraGriesSuite extends SparkSpec {
  import spark.implicits._

  private def mg(k: Int)(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.agg(MisraGriesAgg.misraGries(col("tok"), k).as("mg"))
      .select(col("mg")).head().getMap[String, Long](0).toMap

  test("exact counts when distinct items <= k (no decrement ever fires)") {
    val toks = Seq.tabulate(3000)(i => s"t${i % 7}").toDF("tok")
      .repartition(8)
    val got = mg(16)(toks)
    val want = Seq.tabulate(3000)(i => s"t${i % 7}")
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(got === want)
  }

  test("summary size is bounded by k and heavy items survive planted skew") {
    // 10_000 tail tokens (each once) + 3 heavies at 2000 each:
    // n = 16_000, k = 63 -> n/(k+1) = 250 << 2000, so the guarantee
    // says all three heavies MUST be in the summary, each with
    // estimate within [true - 250, true]. The tail (freq 1) gives the
    // decrement path a real workout across 16 partitions.
    val k = 63
    val heavies = for (h <- 0 until 3; _ <- 0 until 2000) yield s"heavy$h"
    val tail = Seq.tabulate(10000)(i => s"tail$i")
    val toks = new scala.util.Random(42)
      .shuffle((heavies ++ tail).toVector)
      .toDF("tok").repartition(16)
    val got = mg(k)(toks)
    assert(got.size <= k, s"summary exceeded k: ${got.size}")
    val n = 16000L
    val slack = n / (k + 1)
    for (h <- 0 until 3) {
      val key = s"heavy$h"
      assert(got.contains(key), s"$key missing from MG summary")
      assert(got(key) <= 2000L && got(key) >= 2000L - slack,
        s"$key estimate ${got(key)} outside [${2000 - slack}, 2000]")
    }
  }

  test("null keys are ignored, not counted") {
    val toks = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
    val got = mg(8)(toks)
    assert(got === Map("a" -> 2L, "b" -> 1L))
  }

  test("heavy_hitters_mg returns exactly the exact query's top-20") {
    val exact = graft.SparkEntry.queries("heavy_hitters")(spark, sfDir)
      .select("tok", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))
    val viaMg = graft.SparkEntry.queries("heavy_hitters_mg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaMg.toSeq === exact.toSeq)
  }

  test("fixture satisfies the exactness precondition: 20th hitter > n/(k+1)") {
    // heavy_hitters_mg's oracle is the EXACT top-20, but MG(k=64) only
    // guarantees tokens with count > n/(k+1) survive the sketch. If a
    // fixture/corpus change ever dropped the 20th hitter below that
    // bar, oracle parity would break silently (and partition-layout-
    // dependently) — so the violated assumption fails HERE instead
    // (round-6 ADVICE).
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val top20 = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20).collect()
    val n = toks.count()
    val bar = n / 65 // k = 64 in heavy_hitters_mg
    val twentieth = top20.last.getAs[Long]("cnt")
    assert(twentieth > bar,
      s"20th hitter count $twentieth does not clear n/(k+1) = $bar — " +
        "heavy_hitters_mg's exact-top-20 oracle is no longer guaranteed")
  }

  test("partial aggregation: map-side MG summaries merge through the plan") {
    // The physical plan must show a two-phase aggregate (partial +
    // final) — the whole point of a mergeable summary is that the
    // shuffle carries <= k counters per partition, not raw tokens.
    val df = Seq.tabulate(100)(i => s"t$i").toDF("tok")
      .agg(MisraGriesAgg.misraGries(col("tok"), 8))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_misra_gries"), plan)
    assert("(?i)partial".r.findFirstIn(plan).isDefined,
      s"no partial aggregation phase in plan:\n$plan")
  }
}
