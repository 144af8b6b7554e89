package graft.queries

import graft.SparkSpec

/** Plan and property pins for the round-6 analytics operators — the
  * claims their scaladocs make about physical shape, beyond the value
  * equality the oracle gate already checks. */
class AnalyticsSuite extends SparkSpec {

  test("pagerank: iterations read the persisted adjacency, not a recompute") {
    val df = GraphOps.pagerankBipartite.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("TableCacheQueryStage"),
      s"pagerank plan shows no cache reuse — each iteration would " +
        s"recompute the edge set:\n$plan")
  }

  test("zorder cells are tight rectangles (the data-skipping property)") {
    // z >> 4 frees exactly 2 low bits of each dimension, so inside any
    // cell the user bucket and day bucket must each span <= 3. This is
    // what makes min/max file stats prune BOTH predicates when files
    // are laid out in z order.
    val rows = Relational.q58Zorder.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uMin, uMax) = (r.getAs[Long]("user_min"), r.getAs[Long]("user_max"))
      val (dMin, dMax) = (r.getAs[Int]("day_min"), r.getAs[Int]("day_max"))
      assert(uMax - uMin <= 3, s"cell ${r.get(0)}: user span ${uMax - uMin}")
      assert(dMax - dMin <= 3, s"cell ${r.get(0)}: day span ${dMax - dMin}")
    }
  }

  test("salted join result equals the plain join (all types it supports)") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val c = graft.Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "user_id")
    val plain = e.join(c, Seq("user_id"), "inner")
      .select("event_id", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = graft.ops.SkewJoin.saltedJoin(e, c, "user_id", salt = 8)
      .select("event_id", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("merge upsert classifies every key and keeps latest-wins values") {
    val rows = Relational.q63MergeUpsert.run(spark, sfDir).collect()
    val actions = rows.map(_.getAs[String]("action")).toSet
    assert(actions.subsetOf(Set("insert", "update", "keep")))
    // Every purchase user appears exactly once in the merged snapshot.
    import org.apache.spark.sql.functions._
    val nUsers = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.length.toLong === nUsers)
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length === rows.length)
  }
}
