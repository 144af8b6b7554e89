package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Parity + semantics gates for the native winnowing expression. */
class WinnowSuite extends SparkSpec {

  /** The interpreted HOF pipeline the native expression replaces. */
  private def hofFingerprint = {
    val hs = expr(
      """transform(sequence(0, greatest(length(text) - 8, 0)),
        |  i -> aggregate(transform(sequence(0, 7),
        |         j -> ascii(substring(text, i + j + 1, 1))
        |              * CAST(pow(31, j) AS BIGINT)),
        |       0L, (acc, x) -> acc + x) % 1000003)""".stripMargin)
    expr(
      """array_sort(array_distinct(
        |  transform(sequence(0, greatest(size(hs) - 16, 0)),
        |    i -> array_min(slice(hs, i + 1, 16)))))""".stripMargin) -> hs
  }

  test("native winnow equals the HOF pipeline on fixture documents") {
    GraftFunctions.ensureRegistered(spark)
    val (fps, hs) = hofFingerprint
    val both = Tables.documents(spark, sfDir).limit(100)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), hs.as("hs"),
        GraftFunctions.winnowNative(col("text")).as("native"))
      .select(col("doc_id"), fps.as("hof"), col("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() === 100)
  }

  test("winnow semantics: known small input") {
    // "abcdefgh" has exactly one 8-gram; its hash mod 1000003 is the
    // single fingerprint.
    val expected = (0 until 8)
      .map(j => "abcdefgh".charAt(j).toLong * math.pow(31, j).toLong)
      .sum % 1000003L
    val got = WinnowFingerprint.compute("abcdefgh", 8, 16, 31L, 1000003L)
    assert(got.toSeq === Seq(expected))
  }

  test("non-BMP text: native matches the codepoint-based HOF form") {
    // Supplementary-plane chars are 2 UTF-16 code units but 1 codepoint;
    // substring/ascii/length are codepoint-based, so the native loop
    // must iterate codepoints (ADVICE r2).
    GraftFunctions.ensureRegistered(spark)
    val (fps, hs) = hofFingerprint
    val texts = Seq("math 𝕏 symbols 𝕐 everywhere here",
      "😀😁😂 emoji run padded with words",
      "plain ascii control row for the same pipeline")
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap))
      .toDF("doc_id", "text")
    val both = df.filter(length(col("text")) >= 8)
      .select(col("doc_id"), hs.as("hs"),
        GraftFunctions.winnowNative(col("text")).as("native"))
      .select(col("doc_id"), fps.as("hof"), col("native"))
    assert(both.count() === 3)
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("identical prefixes share fingerprints (local property)") {
    val base = "the quick brown fox jumps over the lazy dog " * 10
    val a = WinnowFingerprint.compute(base + "tail one", 8, 16, 31L, 1000003L).toSet
    val b = WinnowFingerprint.compute(base + "other suffix", 8, 16, 31L, 1000003L).toSet
    // winnowing is local: a long shared prefix ⇒ mostly shared mins
    val overlap = a.intersect(b).size.toDouble / math.min(a.size, b.size)
    assert(overlap > 0.8, s"overlap $overlap")
  }
}
