package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HashedLinearScore native expression vs the composable HOF form it
  * replaces (nested aggregate(transform(...)) — interpreted), plus the
  * fail-loud non-ASCII contract. */
class HashedLinearScoreSuite extends SparkSpec {
  import spark.implicits._

  /** The same scorer as pure Spark SQL HOFs: filter empty tokens,
    * poly-hash the first 8 chars, weight formula, ordered double sum. */
  private val hofScore = expr(
    """aggregate(
      |  filter(split(text, ' '), x -> x != ''),
      |  cast(0.0 as double),
      |  (acc, tok) -> acc +
      |    ((((aggregate(
      |          sequence(0, int(least(length(tok), 8)) - 1),
      |          cast(0 as bigint),
      |          (h, j) -> h + ascii(substring(tok, j + 1, 1))
      |                    * cast(pow(31, j) as bigint))
      |        % 1024) * 2654435761) % 1000003) / 1000003.0D - 0.5D))
      |""".stripMargin)
  // NB: the D suffixes matter — bare `1000003.0` parses as DECIMAL in
  // Spark SQL and silently truncates the division to decimal scale.

  test("bit-identical to the composable HOF form on the fixture corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val both = docs.select(col("doc_id"),
      GraftFunctions.linearScore(col("text"), 1024).as("native"),
      hofScore.as("hof"))
    val diff = both.filter(col("native") =!= col("hof")).count()
    assert(diff === 0, s"$diff docs diverge between native and HOF scorer")
  }

  test("hand-computed single-token score") {
    // "ab": h = 97 + 98*31 = 3135; bucket = 3135 % 1024 = 63.
    val h = 97L + 98L * 31L
    val bucket = h % 1024
    val want = ((bucket * 2654435761L) % 1000003L) / 1000003.0 - 0.5
    val got = Seq("ab").toDF("text")
      .select(GraftFunctions.linearScore(col("text"), 1024)).head().getDouble(0)
    assert(got === want)
  }

  test("tokens longer than 8 chars hash only their first 8 bytes") {
    val a = Seq("abcdefgh").toDF("text")
      .select(GraftFunctions.linearScore(col("text"), 1024)).head().getDouble(0)
    val b = Seq("abcdefghXYZ").toDF("text")
      .select(GraftFunctions.linearScore(col("text"), 1024)).head().getDouble(0)
    assert(a === b)
  }

  test("empty and all-space text score 0") {
    val got = Seq("", "   ").toDF("text")
      .select(GraftFunctions.linearScore(col("text"), 1024).as("s"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(0.0, 0.0))
  }

  test("non-ASCII input fails loudly (oracle divergence guard)") {
    val ex = intercept[Exception] {
      Seq("café").toDF("text")
        .select(GraftFunctions.linearScore(col("text"), 1024)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("stays inside whole-stage codegen") {
    val plan = graft.Tables.documents(spark, sfDir)
      .select(GraftFunctions.linearScore(col("text"), 1024))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen span:\n$plan")
  }
}
