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

  test("range join plan is a binned equi-join, never a nested loop") {
    val df = Relational.q74RangeJoin.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"keyless range join fell back to a quadratic join:\n$plan")
    // And the values match the naive quadratic formulation.
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val naive = p.join(c,
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"), "left")
      .groupBy("event_id")
      .agg(count(col("c_ts")).as("n_clicks"),
        coalesce(sum(col("cents")), lit(0L)).as("click_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val binned = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(binned.toSeq === naive.toSeq)
  }

  test("triangle count equals the naive enumeration; orientation bounds out-degree") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
    // Naive a<b<c enumeration over canonical edges (the oracle's shape).
    val e1 = edges.select(col("u").as("a"), col("v").as("b"))
    val e2 = edges.select(col("u").as("a"), col("v").as("c"))
    val e3 = edges.select(col("u").as("b"), col("v").as("c"))
    val naiveTri = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
      .join(e3, Seq("b", "c")).count()
    val perNode = GraphOps.triangles.run(spark, sfDir).collect()
    // Σ per-node participation = 3 × triangles when <= 10 nodes appear;
    // with the fixture's sf0.001 graph verify totals via the naive join.
    val total = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
      .join(e3, Seq("b", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").count().orderBy(col("count").desc, col("n"))
      .limit(10).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perNode.map(r => (r.getLong(0), r.getLong(1))).toSeq === total.toSeq,
      s"degree-oriented top-10 differs from naive enumeration (naive total=$naiveTri)")
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
