package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.dedup.SimHash

/** Parity gate: native SimHash64 ≡ the SQL-expr HOF form. */
class SimHashNativeSuite extends SparkSpec {

  test("native simhash equals the SQL-expr form on fixture docs") {
    GraftFunctions.ensureRegistered(spark)
    val both = Tables.documents(spark, sfDir).limit(200)
      .select(SimHash.simhashExpr("text").as("hof"),
        GraftFunctions.simhashNative(col("text")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 200)
  }

  test("native simhash matches on edge-case strings (empties kept)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val edge = Seq("", " ", "a", "a b", " leading", "trailing ",
      "double  space", "  ").toDF("text")
    val both = edge.select(SimHash.simhashExpr("text").as("hof"),
      GraftFunctions.simhashNative(col("text")).as("native"))
    val rows = both.collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }
}
