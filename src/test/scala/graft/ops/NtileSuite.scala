package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DistributedNtile must be bit-equal to the window-form ntile (which
  * is itself the oracle's DuckDB ntile) without ever planning a
  * partition-less Window. */
class NtileSuite extends SparkSpec {

  private def orders = graft.Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_totalprice")

  test("distributed ntile equals window ntile for several bucket counts") {
    for (n <- Seq(2, 4, 7)) {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      val windowed = orders
        .select(col("o_orderkey"), ntile(n).over(w).as("expected"))
      val dist = DistributedNtile.ntile(
        orders, Seq(col("o_totalprice"), col("o_orderkey")), n)
        .select(col("o_orderkey"), col("bucket"))
      val diff = dist.join(windowed, "o_orderkey")
        .filter(col("bucket") =!= col("expected"))
      assert(diff.count() === 0, s"ntile($n) mismatch")
    }
  }

  test("ntile with ties in the leading sort key still matches (tie-broken)") {
    import spark.implicits._
    // heavy ties on the value column; id makes the order total
    val df = (1 to 103).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
    val windowed = df.select(col("id"), ntile(4).over(w).as("expected"))
    val dist = DistributedNtile.ntile(df, Seq(col("v"), col("id")), 4)
    val diff = dist.join(windowed, "id").filter(col("bucket") =!= col("expected"))
    assert(diff.count() === 0)
  }

  test("N < n assigns one row per bucket in rank order") {
    import spark.implicits._
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "s")
    val out = DistributedNtile.ntile(df, Seq(col("id")), 10)
      .select("id", "bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSet === Set((1L, 1), (2L, 2), (3L, 3)))
  }

  test("global ranks are contiguous 1..N and follow the sort order") {
    val ranked = DistributedNtile.withGlobalRank(
      orders, Seq(col("o_totalprice"), col("o_orderkey")))
    val n = ranked.count()
    assert(ranked.agg(min("global_rank"), max("global_rank"),
      countDistinct("global_rank")).collect().head.toSeq === Seq(1L, n, n))
    // rank order == sort order: out-of-order adjacent pair count is 0
    val w = Window.orderBy("global_rank")
    val disorder = ranked
      .withColumn("prev", lag(col("o_totalprice"), 1).over(w))
      .filter(col("prev") > col("o_totalprice"))
    assert(disorder.count() === 0)
  }

  test("distributed ntile plans no partition-less Window") {
    val df = DistributedNtile.ntile(
      orders, Seq(col("o_totalprice"), col("o_orderkey")), 4)
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty)
  }
}
