package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Parity gate: native CharNgramCounts ≡ the explode+count form it
  * compacts (same totals per (doc, gram)), plus code-point alignment. */
class CharNgramCountsSuite extends SparkSpec {

  /** Occurrence-level reference: substring windows, grouped to counts. */
  private def hofCounts(n: Int) =
    transform(sequence(lit(1), length(col("text")) - (n - 1)),
      j => substring(col("text"), j, lit(n)))

  test("native bigram counts equal explode+count on fixture docs") {
    val nat = Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"),
        explode(GraftFunctions.charNgramCounts(col("text"), 2))
          .as(Seq("g", "k")))
    val ref = Tables.documents(spark, sfDir).limit(200)
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), explode(hofCounts(2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("k"))
    assert(nat.count() === ref.count())
    assert(nat.except(ref).count() === 0)
    assert(ref.except(nat).count() === 0)
  }

  test("unigram counts and totals match, keys are first-appearance ordered") {
    import spark.implicits._
    val row = Seq("abracadabra").toDF("text")
      .select(GraftFunctions.charNgramCounts(col("text"), 1).as("m"))
      .select(col("m"), map_keys(col("m")).as("ks"))
      .collect()(0)
    assert(row.getMap[String, Long](0) ===
      Map("a" -> 5L, "b" -> 2L, "r" -> 2L, "c" -> 1L, "d" -> 1L))
    // first-appearance order is deterministic per input
    assert(row.getSeq[String](1) === Seq("a", "b", "r", "c", "d"))
  }

  test("windows are code-point-aligned (supplementary plane)") {
    import spark.implicits._
    // U+1F600 is a surrogate pair in UTF-16; substring() counts code
    // points, so the bigram windows must too.
    val s = "a😀b"
    val m = Seq(s).toDF("text")
      .select(GraftFunctions.charNgramCounts(col("text"), 2).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m === Map("a😀" -> 1L, "😀b" -> 1L))
  }

  test("edge cases: empty, shorter-than-n, exact-n strings") {
    import spark.implicits._
    val rows = Seq("", "a", "ab", "aaa").toDF("text")
      .select(col("text"),
        GraftFunctions.charNgramCounts(col("text"), 3).as("m"))
      .collect()
    val byText = rows.map(r => r.getString(0) ->
      r.getMap[String, Long](1)).toMap
    assert(byText("") === Map.empty)
    assert(byText("a") === Map.empty)
    assert(byText("ab") === Map.empty)
    assert(byText("aaa") === Map("aaa" -> 1L))
  }
}
