package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins Spark's runtime bloom-filter injection (SPARK-32268): a
  * selective filter on one join side should materialize a bloom filter
  * that pre-filters the OTHER side's scan before the shuffle — at
  * 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only rows that can possibly match. The
  * thresholds are size-based (defaults target real clusters), so the
  * spec lowers them to fire on fixture-sized data; what it pins is
  * that the engine's queries run under a session where the rewrite is
  * ENABLED and structurally reachable, not a perf number. */
class RuntimeFilterSuite extends SparkSpec {

  test("selective dim filter injects might_contain on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val fact = graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_quantity")
      val dim = graft.Tables.part(spark, sfDir)
        .filter(col("p_size") === 1) // selective: few part keys survive
        .select("p_partkey", "p_retailprice")
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$plan")
      // and it still computes the right answer
      val expected = fact.join(
        graft.Tables.part(spark, sfDir).filter(col("p_size") === 1)
          .select("p_partkey"), fact("l_partkey") === col("p_partkey"))
        .count()
      assert(joined.count() === expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
