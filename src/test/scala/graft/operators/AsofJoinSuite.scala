package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics gates for AsofJoin.backward: inclusive backward match,
  * left-outer nulls, per-key isolation, and the single-shuffle plan. */
class AsofJoinSuite extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  test("backward asof: latest right <= left, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "l1"), (1L, ts(250), "l2"),
      (2L, ts(50), "l3"), (3L, ts(500), "l4"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(100), "r-100"), (1L, ts(200), "r-200"),
      (1L, ts(300), "r-300"), (2L, ts(60), "r-60"))
      .toDF("k", "t", "rv")
    val got = AsofJoin.backward(left, right, "k", "t", Seq("rv"))
      .select(col("lv"), col("asof_rv")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // equal timestamps match (inclusive); later right rows don't leak back
    assert(got("l1") === Some("r-100"))
    assert(got("l2") === Some("r-200"))
    // key 2's right row is at t=60 > left t=50 → no match, null payload
    assert(got("l3") === None)
    // key 3 has no right rows at all
    assert(got("l4") === None)
  }

  test("payload carries multiple columns and all left columns survive") {
    import spark.implicits._
    val left = Seq((1L, ts(1000), 7.5)).toDF("k", "t", "price")
    val right = Seq((1L, ts(900), 42L, "x")).toDF("k", "t", "rid", "tag")
    val row = AsofJoin.backward(left, right, "k", "t", Seq("t", "rid", "tag"))
      .collect().head
    assert(row.getAs[Double]("price") === 7.5)
    assert(row.getAs[Timestamp]("asof_t") === ts(900))
    assert(row.getAs[Long]("asof_rid") === 42L)
    assert(row.getAs[String]("asof_tag") === "x")
  }

  test("forward asof: earliest right >= left, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "l1"), (1L, ts(250), "l2"),
      (2L, ts(500), "l3")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(100), "r-100"), (1L, ts(300), "r-300"),
      (2L, ts(400), "r-400")).toDF("k", "t", "rv")
    val got = AsofJoin.forward(left, right, "k", "t", Seq("rv"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got("l1") === Some("r-100")) // inclusive at equal ts
    assert(got("l2") === Some("r-300"))
    assert(got("l3") === None) // right at 400 < 500 → nothing ahead
  }

  test("property: backward/forward match brute-force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val leftRows = Seq.fill(300)((rnd.nextInt(5).toLong,
      ts(rnd.nextInt(1000).toLong), rnd.nextInt(100000)))
    // distinct (key, ts) on the right: ties at the same instant make
    // "the" match undefined (documented caveat, same as DuckDB ASOF)
    val rightRows = Seq.fill(200)((rnd.nextInt(5).toLong,
      ts(rnd.nextInt(1000).toLong), rnd.nextInt(100000)))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = leftRows.toDF("k", "t", "lv")
    val right = rightRows.toDF("k", "t", "rv")
    val gotB = AsofJoin.backward(left, right, "k", "t", Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    val gotF = AsofJoin.forward(left, right, "k", "t", Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    leftRows.foreach { case (k, t, lv) =>
      val befores = rightRows.filter(r => r._1 == k && !r._2.after(t))
      val expB = if (befores.isEmpty) None
        else Some(befores.maxBy(_._2.getTime)._3)
      assert(gotB((k, t, lv)) === expB, s"backward mismatch at ($k,$t)")
      val afters = rightRows.filter(r => r._1 == k && !r._2.before(t))
      val expF = if (afters.isEmpty) None
        else Some(afters.minBy(_._2.getTime)._3)
      assert(gotF((k, t, lv)) === expF, s"forward mismatch at ($k,$t)")
    }
  }

  test("tolerance caps staleness: matches beyond the gap null out") {
    import spark.implicits._
    val left = Seq((1L, ts(1000), "fresh"), (1L, ts(5000), "stale"),
      (1L, ts(1100), "exact-edge")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(900), "r-900")).toDF("k", "t", "rv")
    val got = AsofJoin.backward(left, right, "k", "t", Seq("rv"),
      tolerance = Some(expr("INTERVAL 200 MILLISECONDS")))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got("fresh") === Some("r-900")) // gap 100ms <= 200ms
    assert(got("exact-edge") === Some("r-900")) // gap exactly 200ms: inclusive
    assert(got("stale") === None) // gap 4100ms
  }

  test("tolerance applies to forward matches symmetrically") {
    import spark.implicits._
    val left = Seq((1L, ts(1000), "near"), (1L, ts(100), "far"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(1050), "r")).toDF("k", "t", "rv")
    val got = AsofJoin.forward(left, right, "k", "t", Seq("rv"),
      tolerance = Some(expr("INTERVAL 100 MILLISECONDS")))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got("near") === Some("r"))
    assert(got("far") === None)
  }

  test("null keys and null timestamps never match (SQL predicate semantics)") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(ts(100)), "ok"),
      (None, Some(ts(100)), "null-key"),
      (Some(1L), None, "null-ts")).toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(ts(50)), "r-50"),
      (None, Some(ts(10)), "r-nullkey"), // must be dropped, not grouped
      (Some(1L), None, "r-nullts")) // would sort first and fill spuriously
      .toDF("k", "t", "rv")
    val got = AsofJoin.backward(left, right, "k", "t", Seq("rv"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got("ok") === Some("r-50"))
    assert(got("null-key") === None)
    assert(got("null-ts") === None)
    // forward scan: left null ts sorts LAST under desc — still no match
    val fwd = AsofJoin.forward(left, right, "k", "t", Seq("rv"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(fwd("null-ts") === None)
    assert(fwd("null-key") === None)
  }

  test("plan shuffles once (no join node, no cartesian)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong % 5, ts(i * 10L), i)).toDF("k", "t", "v")
    val right = (1 to 50).map(i => (i.toLong % 5, ts(i * 17L), i)).toDF("k", "t", "r")
    val plan = AsofJoin.backward(left, right, "k", "t", Seq("r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }
}
