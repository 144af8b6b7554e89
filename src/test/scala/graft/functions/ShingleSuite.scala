package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Parity gate: native ShingleSet ≡ the HOF form it replaces. */
class ShingleSuite extends SparkSpec {

  private def hofShingles(n: Int) = {
    val ts = split(col("text"), " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(ts) - n, lit(0))),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
  }

  test("native shingles equal the HOF form on fixture docs") {
    val both = Tables.documents(spark, sfDir).limit(200)
      .select(hofShingles(3).as("hof"),
        GraftFunctions.shingles(col("text"), 3).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 200)
  }

  test("native shingles match HOF on edge cases (empties, short docs)") {
    import spark.implicits._
    val edge = Seq("", "a", "a b", "a b c", "a  b c", " lead", "trail ",
      "x x x x").toDF("text")
    val rows = edge.select(hofShingles(3).as("hof"),
      GraftFunctions.shingles(col("text"), 3).as("native")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
  }
}
