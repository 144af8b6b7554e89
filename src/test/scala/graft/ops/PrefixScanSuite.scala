package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PrefixScan (distributed cumulative sums) parity with the window-
  * function form it replaces at scale, plus the null / multi-partition
  * edges the round-6 ADVICE called out. */
class PrefixScanSuite extends SparkSpec {
  import spark.implicits._

  test("cumulative sums match sum() OVER (ORDER BY ...) across partitions") {
    val df = new scala.util.Random(7)
      .shuffle((1 to 5000).toVector)
      .map(i => (i.toLong, (i % 97).toLong))
      .toDF("key", "v")
      .repartition(16)
    val (scanned, totals) = PrefixScan.withCumSums(
      df, Seq(col("key")), Seq("v"))
    val got = scanned.select("key", "cum_v").orderBy("key")
      .as[(Long, Long)].collect()
    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    val want = df.select(col("key"), sum("v").over(w).as("cum_v"))
      .orderBy("key").as[(Long, Long)].collect()
    assert(got.toSeq === want.toSeq)
    assert(totals.toSeq === Seq((1 to 5000).map(i => (i % 97).toLong).sum))
  }

  test("null sum values contribute 0, matching SQL SUM null-skipping") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("key", "v").repartition(3)
    val (scanned, totals) = PrefixScan.withCumSums(
      df, Seq(col("key")), Seq("v"))
    val got = scanned.select("key", "cum_v").orderBy("key")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 10L), (2L, 10L), (3L, 15L), (4L, 15L)))
    assert(totals.toSeq === Seq(15L))
  }

  test("multiple sum columns scan in one pass with independent totals") {
    val df = (1 to 100).map(i => (i.toLong, 1L, i.toLong)).toDF("key", "one", "v")
      .repartition(8)
    val (scanned, totals) = PrefixScan.withCumSums(
      df, Seq(col("key")), Seq("one", "v"))
    val last = scanned.orderBy(col("key").desc).select("cum_one", "cum_v")
      .as[(Long, Long)].head()
    assert(last === ((100L, 5050L)))
    assert(totals.toSeq === Seq(100L, 5050L))
  }

  test("non-Long sum column is rejected up front") {
    val df = Seq((1L, 1.5)).toDF("key", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixScan.withCumSums(df, Seq(col("key")), Seq("v"))
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("cumulative max matches max() OVER (ORDER BY ...), inclusive and exclusive") {
    val df = new scala.util.Random(11)
      .shuffle((1 to 3000).toVector)
      .map(i => (i.toLong, ((i * 37) % 113).toLong))
      .toDF("key", "v")
      .repartition(12)
    val (inc, totals) = PrefixScan.withCumMaxs(df, Seq(col("key")), Seq("v"))
    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    val wantInc = df.select(col("key"), max("v").over(w).as("m"))
      .orderBy("key").as[(Long, Long)].collect()
    val gotInc = inc.select("key", "cummax_v").orderBy("key")
      .as[(Long, Long)].collect()
    assert(gotInc.toSeq === wantInc.toSeq)
    assert(totals.toSeq === Seq((1 to 3000).map(i => ((i * 37) % 113).toLong).max))

    val (exc, _) = PrefixScan.withCumMaxs(
      df, Seq(col("key")), Seq("v"), exclusive = true)
    val wx = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, -1)
    val wantExc = df.select(col("key"),
        coalesce(max("v").over(wx), lit(Long.MinValue)).as("m"))
      .orderBy("key").as[(Long, Long)].collect()
    val gotExc = exc.select("key", "cummax_v").orderBy("key")
      .as[(Long, Long)].collect()
    assert(gotExc.toSeq === wantExc.toSeq)
  }

  test("cumulative max skips nulls and reports MinValue before any value") {
    val df = Seq((1L, None), (2L, Some(7L)), (3L, None), (4L, Some(3L)))
      .toDF("key", "v").repartition(3)
    val (exc, totals) = PrefixScan.withCumMaxs(
      df, Seq(col("key")), Seq("v"), exclusive = true)
    val got = exc.select("key", "cummax_v").orderBy("key")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, Long.MinValue), (2L, Long.MinValue),
      (3L, 7L), (4L, 7L)))
    assert(totals.toSeq === Seq(7L))
  }

  test("no RDD is left persisted after the scan materializes") {
    // other suites share this session, so assert no NEW persists
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 50).map(i => (i.toLong, 1L)).toDF("key", "v")
    val (scanned, _) = PrefixScan.withCumSums(df, Seq(col("key")), Seq("v"))
    scanned.count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"PrefixScan must not leak persisted RDDs (round-6 ADVICE): $leaked")
  }
}
