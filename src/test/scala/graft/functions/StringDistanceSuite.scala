package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algorithm pins for the native string-distance expressions. The
  * literal expectations were probed against DuckDB's
  * damerau_levenshtein / jaro_winkler_similarity (the oracle
  * functions), so a drift in either algorithm variant fails here
  * before it fails the gate. */
class StringDistanceSuite extends SparkSpec {

  private def dlOf(a: String, b: String): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(DamerauLevenshtein.dl(col("a"), col("b"))).collect()(0).getInt(0)
  }

  private def jwOf(a: String, b: String): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinkler.jw(col("a"), col("b"))).collect()(0).getDouble(0)
  }

  test("damerau_levenshtein is the TRUE variant, not OSA") {
    // OSA forbids edits after a transposition and scores CA->ABC as 3;
    // the true metric (and DuckDB) says 2
    assert(dlOf("CA", "ABC") == 2)
    assert(dlOf("ab", "ba") == 1)
    assert(dlOf("", "abc") == 3)
    assert(dlOf("abc", "") == 3)
    assert(dlOf("kitten", "sitting") == 3)
    assert(dlOf("abcdef", "abdcfe") == 2)
    assert(dlOf("same", "same") == 0)
  }

  test("damerau_levenshtein never exceeds plain levenshtein") {
    import spark.implicits._
    val names = graft.Tables.part(spark, sfDir)
      .select("p_name").distinct().as[String].collect()
    val pairs = for (a <- names.take(30); b <- names.take(30) if a < b)
      yield (a, b)
    val df = pairs.toSeq.toDF("a", "b")
      .select(DamerauLevenshtein.dl(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    df.collect().foreach { r =>
      assert(r.getInt(0) <= r.getInt(1), "transpositions can only help")
      assert(r.getInt(0) >= 0)
    }
  }

  test("jaro_winkler matches the DuckDB-probed reference values") {
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(jwOf("martha", "marhta"), 0.9611111111111111))
    assert(close(jwOf("DwAyNE", "DuANE"), 0.8400000000000001))
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(close(jwOf("aXXXXX", "aYYYYY"), 0.4444444444444444))
    // transpositions, no shared prefix: plain jaro
    assert(close(jwOf("abcdxx", "badcxx"), 0.8888888888888888))
    assert(jwOf("same", "same") == 1.0)
    assert(jwOf("", "abc") == 0.0)
    assert(jwOf("", "") == 1.0)
  }

  test("jaro_winkler stays within [0,1] and rewards shared prefixes") {
    import spark.implicits._
    val names = graft.Tables.part(spark, sfDir)
      .select("p_name").distinct().as[String].collect()
    val pairs = for (a <- names.take(30); b <- names.take(30) if a < b)
      yield (a, b)
    pairs.foreach { case (a, b) =>
      val v = JaroWinkler.similarity(a, b)
      assert(v >= 0.0 && v <= 1.0, s"jw($a,$b)=$v")
      assert(math.abs(v - JaroWinkler.similarity(b, a)) < 1e-15, "symmetry")
    }
  }

  test("expressions stay inside whole-stage codegen") {
    val df = graft.Tables.part(spark, sfDir).select("p_name").distinct()
      .select(DamerauLevenshtein.dl(col("p_name"), lit("cold widget")).as("d"),
        JaroWinkler.jw(col("p_name"), lit("cold widget")).as("j"))
    df.collect() // finalize the AQE plan so codegen markers appear
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"codegen lost:\n$plan")
  }
}
