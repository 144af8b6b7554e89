package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

/** Source/sink surface (SURVEY.md §2.B rows 1-2): CSV with explicit
  * schema, JSON lines, parquet — full-fidelity round trips through each
  * format. Text scan + key-sorted CSV sink live in MapReduceSuite. */
class SourcesSuite extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    .orderBy("l_orderkey", "l_linenumber")

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_returnflag", StringType)))

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.schema === b.schema)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("CSV sink + schema'd CSV source round-trip lineitem columns") {
    val dir = tmpDir("csv").resolve("li_csv").toString
    li.write.option("header", "true").csv(dir)
    val back = spark.read.schema(liSchema).option("header", "true").csv(dir)
    assertSame(li, back)
  }

  test("JSON-lines sink + source round-trip (schema'd read)") {
    val dir = tmpDir("json").resolve("li_json").toString
    li.write.json(dir)
    val back = spark.read.schema(liSchema).json(dir)
    assertSame(li, back)
  }

  test("parquet sink + source round-trip") {
    val dir = tmpDir("pq").resolve("li_pq").toString
    li.write.parquet(dir)
    assertSame(li, spark.read.parquet(dir))
  }

  test("ORC sink + source round-trip") {
    val dir = tmpDir("orc").resolve("li_orc").toString
    li.write.orc(dir)
    assertSame(li, spark.read.orc(dir))
  }

  test("CSV schema'd read coerces and preserves predicates pushdown-compatibly") {
    val dir = tmpDir("csv2").resolve("li_csv2").toString
    li.write.option("header", "true").csv(dir)
    val filtered = spark.read.schema(liSchema).option("header", "true").csv(dir)
      .filter(col("l_returnflag") === "A")
    assert(filtered.count() === li.filter(col("l_returnflag") === "A").count())
    assert(filtered.schema("l_quantity").dataType === DoubleType)
  }
}
