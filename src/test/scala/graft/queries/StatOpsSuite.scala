package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties for the statistical-audit queries (StatOps) and the
  * incremental-pipeline queries (IncrOps) beyond their oracle rows. */
class StatOpsSuite extends SparkSpec {

  test("nb_langid: classifier beats chance on the held-out split") {
    val cm = StatOps.nbLangid.run(spark, sfDir).collect()
    val total = cm.map(_.getLong(2)).sum
    val diag = cm.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val nLangs = cm.map(_.getString(0)).distinct.length
    assert(total > 0)
    // multinomial NB on a hash split must beat uniform guessing
    assert(diag.toDouble / total > 1.0 / nLangs,
      s"accuracy ${diag.toDouble / total} vs chance ${1.0 / nLangs}")
  }

  test("ks_test: statistic is a valid, attained ECDF gap") {
    val row = StatOps.ksTest.run(spark, sfDir).collect().head
    val (n1, n2, d) = (row.getLong(0), row.getLong(1), row.getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(d >= 0.0 && d <= 1.0, s"KS distance in [0,1], got $d")
    // the gap is a multiple of 1/(n1*n2) up to the 1e-6 display grid
    val units = d * n1 * n2
    assert((units - math.round(units)).abs < 1e-6 * n1 * n2 + 1e-6)
  }

  test("drift_psi: bins are exhaustive and shares sum to 1") {
    val rows = StatOps.driftPsi.run(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted ==
      rows.map(_.getInt(0)).toSeq.sorted.distinct, "unique bins")
    val pSum = rows.map(_.getDouble(1)).sum
    val qSum = rows.map(_.getDouble(2)).sum
    // Laplace smoothing reserves mass for EMPTY bins, so observed bins
    // sum to <= 1 and to exactly 1 when all 10 bins are occupied
    assert(pSum <= 1.0 + 1e-9 && pSum > 0.8, s"p mass $pSum")
    assert(qSum <= 1.0 + 1e-9 && qSum > 0.8, s"q mass $qSum")
  }

  test("incr_agg_merge: merged partials equal the one-shot aggregate") {
    // the oracle proves it against DuckDB; this pins it Spark-vs-Spark
    // so a refactor that breaks merge algebra fails fast in CI
    val merged = IncrOps.incrAggMerge.run(spark, sfDir).collect()
    val full = graft.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double") / 100)
          .as("total"))
      .orderBy("o_orderpriority").collect()
    assert(merged.toSeq == full.toSeq)
  }

  test("compact_bins: bins partition all days, in order, within target+max") {
    val bins = IncrOps.compactBins.run(spark, sfDir).collect()
    val nDays = graft.Tables.lineitem(spark, sfDir)
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd")).distinct().count()
    assert(bins.map(_.getLong(1)).sum == nDays, "every day lands in a bin")
    // greedy first-fit by starting offset: a bin exceeds the 20k target
    // by at most one file's rows, and bins cover contiguous day ranges
    val sorted = bins.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(4) <= b.getString(3),
          "bin day-ranges are ordered and non-overlapping")
      case _ => ()
    }
  }
}
