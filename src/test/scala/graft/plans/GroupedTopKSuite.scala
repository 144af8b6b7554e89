package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Gates for the custom grouped-top-k operator: result parity with the
  * window form, two-phase physical shape, and heap edge cases. */
class GroupedTopKSuite extends SparkSpec {

  test("matches the row_number window form on the orders fixture") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("o_orderstatus", "o_orderkey").collect().toSeq
    val viaNative = GroupedTopK.topK(orders, Seq(col("o_orderstatus")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
      .orderBy("o_orderstatus", "o_orderkey").collect().toSeq
    assert(viaNative === viaWindow)
  }

  test("physical plan: partial + final GroupedTopKExec around one exchange") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
    val plan = GroupedTopK.topK(orders, Seq(col("o_orderstatus")),
      Seq(col("o_totalprice").desc), 3).queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert("GroupedTopK \\[".r.findAllIn(plan).size === 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("k >= group size returns whole groups; asc order; ties bounded") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 9))
      .toDF("g", "v")
    val all = GroupedTopK.topK(df, Seq(col("g")), Seq(col("v").asc), 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(all === Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9), ("b", 9)))
    val top1 = GroupedTopK.topK(df, Seq(col("g")), Seq(col("v").asc), 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(top1 === Seq(("a", 1), ("b", 9)))
  }

  test("partial-phase flush bound: many groups, tiny bound, same result") {
    import spark.implicits._
    // 1000 distinct groups in few partitions with the flush bound far
    // below the group count: the partial heap map must flush repeatedly
    // and the final merge must still reproduce the window-form answer.
    val df = (1 to 5000).map(i => (i % 1000, i, (i * 7919) % 104729))
      .toDF("g", "id", "v").repartition(4)
    spark.conf.set("graft.topk.maxPartialGroups", "16")
    try {
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .orderBy("g", "id").collect().toSeq
      val viaNative = GroupedTopK.topK(df, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), 3)
        .orderBy("g", "id").collect().toSeq
      assert(viaNative === viaWindow)
    } finally spark.conf.unset("graft.topk.maxPartialGroups")
  }

  test("final phase is a sorted stream: O(1) memory at high group cardinality") {
    import spark.implicits._
    // 200k distinct groups landing on few post-shuffle partitions, with
    // the partial flush bound tiny so fragments of one group arrive
    // interleaved with other groups. The final phase must not hold a
    // group map: the plan pins a (spillable) Sort between the exchange
    // and the final GroupedTopK, and the result still matches the
    // window form.
    val df = (1 to 400000).map(i => (i % 200000, i, (i * 7919) % 104729))
      .toDF("g", "id", "v").repartition(4)
    spark.conf.set("graft.topk.maxPartialGroups", "64")
    try {
      val native = GroupedTopK.topK(df, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), 2)
      val plan = native.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), plan)
      // the final-phase sort request is planned as SortExec ("Sort [")
      assert("Sort \\[".r.findAllIn(plan).nonEmpty, plan)
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .orderBy("g", "id").collect().toSeq
      val viaNative = native.orderBy("g", "id").collect().toSeq
      assert(viaNative === viaWindow)
    } finally spark.conf.unset("graft.topk.maxPartialGroups")
  }

  test("null group keys and null order values flow through") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1)), (None, Some(2)), (None, Some(3)),
      (Some("a"), None)).toDF("g", "v")
    // asc default = NULLS FIRST, matching row_number over v asc
    val got = GroupedTopK.topK(df, Seq(col("g")), Seq(col("v").asc), 1)
      .collect().map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toSet
    assert(got === Set((Some("a"), None), (None, Some(2))))
  }
}
