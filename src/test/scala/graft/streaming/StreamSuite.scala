package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkSpec

/** MemoryStream-driven gates for the streaming surface: window emission
  * on watermark passage, late-data drop, session windows, stateful
  * dedup, custom flatMapGroupsWithState sessions. */
class StreamSuite extends SparkSpec {

  /** Minutes after 2024-01-01 00:00:00 UTC. */
  private def at(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  private def ev(id: Long, min: Int, user: Long = 1L, typ: String = "click",
      value: Double = 1.0): Event = Event(id, at(min), user, typ, value)

  private var qn = 0
  private def run[T](stream: MemoryStream[Event],
      out: org.apache.spark.sql.DataFrame,
      mode: String = "append")(body: (StreamingQuery, String) => T): T = {
    qn += 1
    val name = s"stream_sink_$qn"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try body(q, name)
    finally q.stop()
  }

  test("tumbling window emits on watermark passage; late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")) {
      (q, name) =>
        in.addData(ev(1, 1), ev(2, 3, typ = "view"), ev(3, 8))
        q.processAllAvailable()
        // watermark still at 8-10 < window end → nothing final yet
        assert(spark.table(name).count() === 0)
        // an event at minute 25 pushes the watermark to 15 > 10
        in.addData(ev(4, 25))
        q.processAllAvailable()
        val rows = spark.table(name)
          .select("event_type", "n").as[(String, Long)].collect().toSet
        assert(rows === Set(("click", 2L), ("view", 1L)))
        // minute-5 event arrives AFTER the watermark passed its window:
        // must be dropped, emitted results must not change
        in.addData(ev(5, 5))
        in.addData(ev(6, 40))
        q.processAllAvailable()
        val again = spark.table(name)
          .filter($"w_start" === at(0)).select("event_type", "n")
          .as[(String, Long)].collect().toSet
        assert(again === Set(("click", 2L), ("view", 1L)),
          "late event must not re-open the closed window")
    }
  }

  test("sliding window: one event lands in two 10/5-minute windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.slidingCounts(in.toDF(), "10 minutes", "5 minutes")) {
      (q, name) =>
        in.addData(ev(1, 7))      // windows [0,10) and [5,15)
        in.addData(ev(2, 40))     // advance watermark past both
        q.processAllAvailable()
        val got = spark.table(name)
          .select("w_start", "n").as[(Timestamp, Long)].collect().toMap
        assert(got.get(at(0)) === Some(1L))
        assert(got.get(at(5)) === Some(1L))
    }
  }

  test("session_window groups by gap per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.sessionWindows(in.toDF(), "30 minutes", "30 minutes")) {
      (q, name) =>
        // user 1: events at 0,10,20 (one session), then 70 (new session)
        in.addData(ev(1, 0), ev(2, 10), ev(3, 20), ev(4, 70))
        in.addData(ev(5, 200))  // close everything
        q.processAllAvailable()
        val sessions = spark.table(name)
          .filter($"user_id" === 1L)
          .select("s_start", "n").as[(Timestamp, Long)].collect().toMap
        assert(sessions(at(0)) === 3L)
        assert(sessions(at(70)) === 1L)
    }
  }

  test("dropDuplicatesWithinWatermark removes re-delivered event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.dedupWithinWatermark(in.toDF(), "10 minutes")) {
      (q, name) =>
        in.addData(ev(1, 0), ev(2, 1))
        q.processAllAvailable()
        in.addData(ev(1, 0))          // duplicate delivery
        in.addData(ev(3, 2))
        q.processAllAvailable()
        val ids = spark.table(name).select("event_id").as[Long].collect().sorted
        assert(ids === Array(1L, 2L, 3L))
    }
  }

  test("stream-stream join pairs clicks with purchases within the bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.clickToPurchase(in.toDF(), withinMinutes = 30)) {
      (q, name) =>
        in.addData(
          ev(1, 0, user = 1, typ = "click"),
          ev(2, 10, user = 1, typ = "purchase", value = 42.0),  // within 30
          ev(3, 50, user = 1, typ = "purchase", value = 9.0),   // outside 30
          ev(4, 5, user = 2, typ = "purchase", value = 7.0))    // other user
        q.processAllAvailable()
        in.addData(ev(9, 200, user = 9, typ = "click"))          // advance wm
        q.processAllAvailable()
        val got = spark.table(name)
          .select("click_id", "purchase_id", "value")
          .as[(Long, Long, Double)].collect().toSet
        assert(got === Set((1L, 2L, 42.0)))
    }
  }

  test("stream-static join enriches events with a dimension table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val joined = in.toDF().join(users, Seq("user_id"), "left")
      .select($"event_id", $"user_id", coalesce($"tier", lit("none")).as("tier"))
    run(in, joined) { (q, name) =>
      in.addData(ev(1, 0, user = 1), ev(2, 1, user = 2), ev(3, 2, user = 9))
      q.processAllAvailable()
      val got = spark.table(name)
        .select("event_id", "tier").as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "gold", 2L -> "silver", 3L -> "none"))
    }
  }

  test("flatMapGroupsWithState sessionize: gap close + per-session totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.sessionize(in.toDS(), gapMs = 30 * 60000L).toDF()) {
      (q, name) =>
        // session A: minutes 0-20 (3 events, value 6); then a 60-min gap
        // (> 30) → session B opens at minute 80
        in.addData(ev(1, 0, value = 1), ev(2, 10, value = 2), ev(3, 20, value = 3))
        q.processAllAvailable()
        in.addData(ev(4, 80, value = 5))
        q.processAllAvailable()
        val sessions = spark.table(name).as[Session].collect()
        assert(sessions.length === 1, "session A closed by the gap")
        val a = sessions.head
        assert(a.user_id === 1L && a.n_events === 3 && a.total_value === 6.0)
        assert(a.start_ms === at(0).getTime && a.end_ms === at(20).getTime)
    }
  }

  test("sessionize: late cross-batch event extends an open session backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // generous watermark so the minute-5 event in batch 2 is still live
    run(in, StreamOps.sessionize(in.toDS(), gapMs = 30 * 60000L,
      watermark = "2 hours").toDF()) { (q, name) =>
      in.addData(ev(1, 10, value = 1), ev(2, 20, value = 2))
      q.processAllAvailable()
      // batch 2: a late event at minute 5 joins the open session and
      // must pull start_ms back (ADVICE r2); minute 90 then closes it
      in.addData(ev(3, 5, value = 4))
      q.processAllAvailable()
      in.addData(ev(4, 90, value = 1))
      q.processAllAvailable()
      val sessions = spark.table(name).as[Session].collect()
      assert(sessions.length === 1, "first session closed by the 70-min gap")
      val a = sessions.head
      assert(a.n_events === 3 && a.total_value === 7.0)
      assert(a.start_ms === at(5).getTime,
        "late minute-5 arrival must move start_ms back")
      assert(a.end_ms === at(20).getTime)
    }
  }

  test("foreachBatch sink: batchId-keyed upsert is replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The exactly-once pattern for non-transactional external stores:
    // key writes by (batchId) and upsert, so micro-batch replay after a
    // failure overwrites instead of double-counting.
    val store = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
    def upsert(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val total = df.agg(coalesce(org.apache.spark.sql.functions.sum("value"),
        lit(0.0))).collect()(0).getDouble(0)
      store.put(batchId, total) // idempotent: replay overwrites
    }
    val in = MemoryStream[Event]
    val q = in.toDS().toDF().writeStream.foreachBatch(upsert _).start()
    try {
      in.addData(ev(1, 0, value = 2.0), ev(2, 1, value = 3.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, value = 4.0))
      q.processAllAvailable()
      val firstTotal = store.values().stream().mapToDouble(identity(_)).sum()
      assert(firstTotal === 9.0)
      // simulate a replay of the last batch: same batchId, same rows
      val lastBatch = store.keySet().stream().mapToLong(identity(_)).max().getAsLong
      upsert(Seq(ev(3, 2, value = 4.0)).toDF(), lastBatch)
      val afterReplay = store.values().stream().mapToDouble(identity(_)).sum()
      assert(afterReplay === 9.0, "replayed batch must not double-count")
    } finally q.stop()
  }

  test("userGapStats: sorted-buffer state is exact under out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    run(in, StreamOps.userGapStats(in.toDS()).toDF(), mode = "update") {
      (q, name) =>
        // deliver user 7's events DELIBERATELY out of time order across
        // three separate micro-batches: minutes 30, then 5, then 12
        in.addData(ev(1, 30, user = 7, value = 1.0))
        q.processAllAvailable()
        in.addData(ev(2, 5, user = 7, value = 2.0))
        q.processAllAvailable()
        in.addData(ev(3, 12, user = 7, value = 4.0))
        q.processAllAvailable()
        val fin = spark.table(name).as[UserGap].collect()
          .filter(_.user_id == 7L).maxBy(_.n_events)
        assert(fin.n_events === 3L)
        assert(fin.total_cents === 700L)
        // sorted timeline 5, 12, 30 → gaps 7 min and 18 min
        assert(fin.max_gap_us === 18L * 60L * 1000000L,
          s"max gap ${fin.max_gap_us}")
        // intermediate emission after batch 2 already saw the sorted pair
        val mid = spark.table(name).as[UserGap].collect()
          .filter(r => r.user_id == 7L && r.n_events == 2L)
        assert(mid.nonEmpty && mid.head.max_gap_us === 25L * 60L * 1000000L,
          "second emission must reflect the 5..30 sorted gap")
    }
  }
}
