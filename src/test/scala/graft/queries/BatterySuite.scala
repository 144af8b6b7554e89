package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, SparkEntry}

/** Battery-level invariants the oracle gate can't see. */
class BatterySuite extends SparkSpec {

  test("every query runs at sf0.001 and returns rows") {
    val empties = Seq.newBuilder[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) empties += name
    }
    // simhash/minhash pair queries may legitimately be empty at sf0.001
    // if no near-dups were planted at this scale; everything else must
    // produce rows.
    val allowedEmpty = Set("minhash_dedup_pairs", "simhash_dup_pairs")
    val bad = empties.result().filterNot(allowedEmpty)
    assert(bad.isEmpty, s"queries with 0 rows at sf0.001: $bad")
  }

  test("approx_count_distinct within 5% of exact per group") {
    // The HLL sketch is the spec-gated half of the q46 operator pair
    // (its estimate is sketch-defined — no SQL oracle can replay it).
    // Deliberately TWO aggregations joined at the end: an HLL sharing
    // an agg with an exact count(distinct) rides the distinct-expand
    // shuffle as 52-word per-group state (10x at sf0.1).
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    val approx = lineitem.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
    val exact = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx_parts").toDouble
      val e = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"approx $a vs exact $e for ${r.getString(0)}")
    }
  }

  test("percentile_approx sketch median within 5% of exact per group") {
    // Spec-gated half of the q53 operator pair — the mergeable quantile
    // sketch a 100 TB run uses where exact percentile's whole-group
    // buffer cannot.
    graft.Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"))
      .collect()
      .foreach { r =>
        val (a, e) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("exact_p50"))
        assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
      }
  }

  test("percentile_approx tracks exact percentile within 5%") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sfDir)
    val row = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("percentile_approx(o_totalprice, 0.5, 1000)").as("approx"))
      .as[(Double, Double)].collect().head
    assert(math.abs(row._2 - row._1) / row._1 <= 0.05,
      s"approx ${row._2} vs exact ${row._1}")
  }

  test("HLL sketch build + union-merge pipeline estimates within 5%") {
    // The mergeable-sketch REUSE path a 100 TB run depends on:
    // per-group sketches built once (hll_sketch_agg), persisted as
    // binary, merged later across groups (hll_union_agg) WITHOUT
    // re-reading raw data — re-aggregation from a pre-aggregated
    // sketch table. Estimate-after-merge must track the exact global
    // distinct count.
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    val perGroup = lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    // merge the 6 group sketches down to one global sketch
    val merged = perGroup.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
      .collect().head.getLong(0).toDouble
    val exact = lineitem.select(countDistinct("l_partkey"))
      .collect().head.getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"merged-sketch estimate $merged vs exact $exact")
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("entry() flagship returns rows (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
