package graft.queries

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declared STREAMING query under the driver's correctness gate.
  *
  * Streaming operators are otherwise spec-gated (StreamSuite /
  * FileStreamSuite — the oracle is batch SQL and cannot watch a
  * stream), but this row runs the real readStream → event-time window
  * aggregate → writeStream path to completion inside the declared
  * battery: the events fixture is consumed as a parquet FILE STREAM,
  * aggregated with the streaming engine (complete mode, memory sink),
  * and the FINAL result — which for a finite stream must equal the
  * batch aggregation — is what the DuckDB oracle checks. Complete mode
  * (no watermark) keeps the finite-stream result independent of file
  * arrival order, so the gate is deterministic at any scale factor.
  */
object StreamingOps {

  private val sinkId = new AtomicLong(0)

  /** File-streamed tumbling 1-hour counts per event_type ≡ batch. */
  val streamFileParity: Q = Q(
    "stream_file_parity",
    """SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n,
      |  min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events GROUP BY 1, 2
      |ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    // Stream the RAW fixture file via the shared fileStream scaffold:
    // ts is parquet TIMESTAMP(NANOS), surfaced as LongType under
    // nanosAsLong (same as Tables.events), converted to a µs timestamp
    // by truncating division — identical to DuckDB's ns→µs read.
    val sink = s"stream_file_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"), col("min_id"), col("max_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("w_ms", "event_type")
  }

  /** File-streamed SLIDING 2-hour/1-hour windows per event_type ≡
    * batch: every event lands in exactly two overlapping windows, the
    * overlap bookkeeping the streaming engine (not the query author)
    * owns. Same finite-stream/complete-mode gate discipline as
    * stream_file_parity; the DuckDB replica materializes each event's
    * two member windows explicitly (trunc-hour and trunc-hour − 1h). */
  val streamSlideParity: Q = Q(
    "stream_slide_parity",
    """WITH w AS (
      |  SELECT epoch_ms(date_trunc('hour', ts) - INTERVAL 1 HOUR) AS w_ms,
      |         event_type FROM events
      |  UNION ALL
      |  SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type
      |  FROM events)
      |SELECT w_ms, event_type, count(*) AS n
      |FROM w GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val sink = s"stream_slide_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("w_ms", "event_type")
  }

  /** File-streamed SESSION windows (30-min gap) per user ≡ batch
    * sessionization: the stateful-MERGE case — unlike tumbling/sliding
    * windows, session extents are data-dependent and the engine must
    * merge overlapping [ts, ts+gap) intervals across micro-batches as
    * late files arrive (complete mode keeps all state, so the finite-
    * stream fixpoint equals the batch answer regardless of arrival
    * order). The DuckDB replica is the lag + running-sum island trick
    * (same as q45_sessionize), with the streaming gap rule: a NEW
    * session starts when ts − prev ≥ gap (session_window treats
    * prev + gap as exclusive end). */
  val streamSessionParity: Q = Q(
    "stream_session_parity",
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |           >= INTERVAL 30 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, epoch_ms(min(ts)) AS s_ms,
      |  epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS e_ms, count(*) AS n
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, s_ms""".stripMargin) { (s, d) =>
    val sink = s"stream_session_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_millis(col("w.start")).as("s_ms"),
          unix_millis(col("w.end")).as("e_ms"), col("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("user_id", "s_ms")
  }

  /** STREAM-STREAM inner join ≡ batch join: purchases joined to the same
    * user's clicks in the preceding hour, both sides consumed as
    * independent file streams. This is the one streaming join shape the
    * other parity rows don't cover — the engine must buffer BOTH sides'
    * state and emit matches as either side's rows arrive (micro-batch
    * order is not knowable in advance), so append-mode output equality
    * with the batch join is a real statement about the join-state
    * machinery, not just windowing. Inner join without watermark keeps
    * state for the whole (finite) stream — for an unbounded production
    * stream the same query takes `withWatermark` on both sides plus the
    * existing time-range condition, which Spark uses to expire state;
    * the fixture gate deliberately runs the no-expiry fixpoint so the
    * result is arrival-order independent. The range condition rides the
    * user_id equi-key — state is hash-partitioned by user, never
    * broadcast or nested-loop. */
  val streamJoinParity: Q = Q(
    "stream_join_parity",
    """SELECT p.event_id AS p_id, c.event_id AS c_id
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin) { (s, d) =>
    val sink = s"stream_join_parity_sink_${sinkId.incrementAndGet()}"
    val p = fileStream(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = fileStream(s, d).filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    withStatePartitions(s, 8) {
      val q = p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("c_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("p_id", "c_id")
  }

  /** STREAM-STREAM **LEFT OUTER** join — the watermark-driven
    * NULL-EMISSION semantics none of the other parity rows pin (r8
    * verdict #6, carried through r9): purchases left-joined to the
    * same user's clicks in the preceding hour, where an unmatched
    * purchase emits (p_id, NULL) only once the watermark proves no
    * future click can match it. Outer joins REQUIRE watermarks (state
    * must be evictable), and a watermark over the id-interleaved
    * chunks would drop half the corpus as late input — so this row
    * streams the TIME-ORDERED chunk layout ([[timeChunkDir]]), under
    * which (a) no input is ever late, (b) state eviction never
    * removes a still-matchable row (a click evicted at watermark
    * max_k − 10 min can only match purchases with p_ts ≤ c_ts + 1h <
    * that watermark, which would already have arrived), so the
    * matched pairs are EXACTLY the batch inner join, and (c) a
    * null emits iff the purchase is globally unmatched AND the FINAL
    * watermark passed its p_ts — where the final watermark is
    * min(max purchase ts, max click ts) − 10 min, because each
    * withWatermark node tracks the max event time IT has seen
    * (post-filter) and the global watermark is their min
    * (multipleWatermarkPolicy=min, the default; pinned empirically —
    * the clicks end before the purchases in this fixture, so the last
    * purchases stay in state forever and the oracle says so; the
    * trailing no-data micro-batch performs the final eviction).
    * Output order pins NULLS LAST explicitly (Spark defaults
    * nulls-first ASC, DuckDB nulls-last). State is hash-partitioned
    * by user_id on both sides, never broadcast. */
  val streamLeftJoinParity: Q = Q(
    "stream_left_join_parity",
    """WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id, ts FROM events
      |      WHERE event_type = 'click'),
      |m AS (SELECT p.p_id, c.c_id FROM p JOIN c
      |        ON p.user_id = c.user_id
      |        AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts),
      |wm AS (SELECT least((SELECT max(ts) FROM p),
      |                    (SELECT max(ts) FROM c))
      |         - INTERVAL 10 MINUTE AS w)
      |SELECT p_id, c_id FROM m
      |UNION ALL
      |SELECT p.p_id, CAST(NULL AS BIGINT) AS c_id FROM p, wm
      |WHERE p.ts < wm.w
      |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id)
      |ORDER BY p_id, c_id NULLS LAST""".stripMargin) { (s, d) =>
    val sink = s"stream_left_join_parity_sink_${sinkId.incrementAndGet()}"
    val p = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    withStatePartitions(s, 8) {
      val q = p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"), "left_outer")
        .select(col("p_id"), col("c_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy(col("p_id"), col("c_id").asc_nulls_last)
  }

  /** CASCADED stream-stream joins — the multi-join streaming topology
    * (view → click → purchase attribution chain): TWO stream-stream
    * inner joins chained in one streaming query, each buffering both
    * sides' state, with per-user day-scale attribution windows (click
    * within a day before the purchase, view within a day before the
    * click — hour-scale windows match ZERO rows at fixture SFs, and a
    * vacuous gate pins nothing). Inner joins without watermarks keep full state for the
    * finite stream, so the emitted set is the arrival-order-independent
    * fixpoint ≡ the batch 3-way join — the oracle is plain SQL. This
    * pins that the engine supports CHAINED stateful join operators,
    * not just one. */
  val streamChainJoinParity: Q = Q(
    "stream_chain_join_parity",
    """SELECT v.event_id AS v_id, c.event_id AS c_id, p.event_id AS p_id
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 DAY AND c.ts <= p.ts
      |JOIN events v
      |  ON v.event_type = 'view' AND v.user_id = c.user_id
      |  AND v.ts >= c.ts - INTERVAL 1 DAY AND v.ts <= c.ts
      |ORDER BY v_id, c_id, p_id""".stripMargin) { (s, d) =>
    val sink = s"stream_chain_join_parity_sink_${sinkId.incrementAndGet()}"
    val p = fileStream(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = fileStream(s, d).filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val v = fileStream(s, d).filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    // 4 state partitions, not 8: TWO chained joins double the
    // per-batch state-store commit count, and at fixture scale commit
    // overhead IS the cost (the withStatePartitions scaladoc's
    // arithmetic) — the RESULT is partition-count independent
    withStatePartitions(s, 4) {
      val q = p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 DAY")
          && col("c_ts") <= col("p_ts"))
        .join(v, col("v_user") === col("c_user")
          && col("v_ts") >= col("c_ts") - expr("INTERVAL 1 DAY")
          && col("v_ts") <= col("c_ts"))
        .select(col("v_id"), col("c_id"), col("p_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("v_id", "c_id", "p_id")
  }

  /** STREAM-STREAM **LEFT SEMI** join — the existence-check shape
    * (EXISTS subquery over a second stream): a purchase emits exactly
    * once, when its first same-user preceding-hour click is seen —
    * whether the click arrived in an earlier batch (probe into right
    * state) or a later one (the buffered purchase emits on the
    * click's arrival batch). Spark REQUIRES watermarks for stream
    * semi joins (left state must be evictable), so this rides the
    * same time-ordered chunk layout as the outer joins — no late
    * input, and a purchase evicted at watermark w has p_ts ≤ w <
    * any future click's c_ts, which can never satisfy c_ts ≤ p_ts —
    * so the emitted SET is exactly the batch semi join: matched
    * purchases, each once, which is what lets the oracle be a plain
    * EXISTS with no watermark term at all. */
  val streamSemiJoinParity: Q = Q(
    "stream_semi_join_parity",
    """SELECT p.event_id AS p_id FROM events p
      |WHERE p.event_type = 'purchase'
      |  AND EXISTS (SELECT 1 FROM events c
      |    WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |      AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
      |ORDER BY p_id""".stripMargin) { (s, d) =>
    val sink = s"stream_semi_join_parity_sink_${sinkId.incrementAndGet()}"
    val p = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    withStatePartitions(s, 8) {
      val q = p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"), "left_semi")
        .select(col("p_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("p_id")
  }

  /** STREAM-STREAM **FULL OUTER** join — both null-emission paths at
    * once, completing the inner/left/full join family: unmatched
    * purchases emit (p_id, NULL) once the watermark passes p_ts (same
    * derivation as the LEFT row), and unmatched clicks emit
    * (NULL, c_id) once the watermark passes c_ts + 1h — the click's
    * no-future-match point comes from the OTHER inequality
    * (a future purchase has p_ts > wm, a match needs
    * p_ts ≤ c_ts + 1h, so eviction requires wm ≥ c_ts + 1h). Same
    * time-ordered chunk scaffold and min-of-sides final watermark as
    * [[streamLeftJoinParity]]; both boundary comparators pinned
    * empirically at both fixture SFs and by the Round10 suite. */
  val streamFullJoinParity: Q = Q(
    "stream_full_join_parity",
    """WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id, ts FROM events
      |      WHERE event_type = 'click'),
      |m AS (SELECT p.p_id, c.c_id FROM p JOIN c
      |        ON p.user_id = c.user_id
      |        AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts),
      |wm AS (SELECT least((SELECT max(ts) FROM p),
      |                    (SELECT max(ts) FROM c))
      |         - INTERVAL 10 MINUTE AS w)
      |SELECT p_id, c_id FROM m
      |UNION ALL
      |SELECT p.p_id, CAST(NULL AS BIGINT) AS c_id FROM p, wm
      |WHERE p.ts < wm.w
      |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id)
      |UNION ALL
      |SELECT CAST(NULL AS BIGINT) AS p_id, c.c_id FROM c, wm
      |WHERE c.ts + INTERVAL 1 HOUR < wm.w
      |  AND NOT EXISTS (SELECT 1 FROM m WHERE m.c_id = c.c_id)
      |ORDER BY p_id NULLS LAST, c_id NULLS LAST""".stripMargin) { (s, d) =>
    val sink = s"stream_full_join_parity_sink_${sinkId.incrementAndGet()}"
    val p = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = timeOrderedFileStream(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    withStatePartitions(s, 8) {
      val q = p.join(c, col("p_user") === col("c_user")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
          && col("c_ts") <= col("p_ts"), "full_outer")
        .select(col("p_id"), col("c_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink)
      .orderBy(col("p_id").asc_nulls_last, col("c_id").asc_nulls_last)
  }

  /** Streaming DEDUPLICATION ≡ batch distinct: dropDuplicates over a
    * file stream keeps per-key state in the state store and emits each
    * key's FIRST arrival — micro-batch arrival order is not knowable,
    * so the gate projects to the dedup key columns BEFORE deduping
    * (the emitted set is then arrival-order independent: exactly the
    * distinct key set). Production form: `dropDuplicatesWithinWatermark`
    * bounds the state (spec-gated in StreamSuite); this row runs the
    * unbounded-state fixpoint the oracle can check. */
  val streamDedupParity: Q = Q(
    "stream_dedup_parity",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val sink = s"stream_dedup_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("user_id", "event_type")
  }

  /** dropDuplicatesWithinWatermark parity — the ingest-dedup built-in
    * (drop retransmissions while letting state EXPIRE so a key can
    * legitimately re-emit with a LATER event time) pinned
    * multi-batch. Three determinism devices over the id-interleaved
    * chunk layout (chunk = event_id % 4 — itself SQL-expressible):
    * (1) every row of a dedup key in a given chunk carries the SAME
    * synthetic event time h = anchor + chunk·step + user-hash offset
    * (step 30 min or 12 h by user mod 3; offset on a 60s-grid + 30s),
    * so which row of a batch enters state is unobservable; (2) CLOCK
    * rows (event_id % 5 = 0, each a never-duplicated singleton key
    * via ck = event_id) carry h = 18h + 12h·chunk — they dominate
    * every key time in their prefix, so the watermark is theirs and
    * sits on the 0-mod-60s grid while key times sit on 30-mod-60s:
    * every late/eviction comparator is STRUCTURALLY tie-free; (3) the
    * exec's protocol was pinned empirically (75/75 keys at sf0.001,
    * re-pinned in Round11OpsSuite): batch k late-filters input AND
    * evicts state with the watermark of TWO triggers back, V_k =
    * max(event time over chunks ≤ k−2) − δ — one more trigger of lag
    * than the aggregate execs pinned by stream_watermark_parity — and
    * a duplicate does NOT extend the stored expiry (state keeps the
    * FIRST row's event time + δ). The oracle replays the 4-batch fold
    * explicitly (pivot per key to h0..h3, then the late/evict/emit
    * cascade with V_2 = M_0 − δ, V_3 = M_1 − δ). The fixture then
    * exercises every path: all keys dup-drop at batch 1 (V = −∞, no
    * eviction yet), 12h-step keys evict + re-emit at batch 2 and
    * split dup-drop/re-emit at batch 3 on the hash offset, 30min-step
    * keys go late at batches 2–3. State is hashed by the full key and
    * bounded by the watermark horizon — the 100 TB ingest-dedup
    * plan. */
  val streamDedupWithinParity: Q = Q(
    "stream_dedup_within_parity",
    """WITH r AS (SELECT user_id, event_type, event_id % 4 AS c,
      |    event_id % 5 = 0 AS clock,
      |    CASE WHEN event_id % 5 = 0
      |      THEN 64800 + (event_id % 4) * 43200
      |      ELSE ((user_id & 2147483647) * 2654435761) % 690 * 60 + 90
      |        + (event_id % 4) *
      |          (CASE WHEN user_id % 3 = 0 THEN 1800 ELSE 43200 END)
      |    END AS h
      |  FROM events),
      |anchor AS (SELECT date_trunc('month', min(ts)) AS a0 FROM events),
      |cm AS (SELECT c, max(h) AS mh FROM r GROUP BY c),
      |vs AS (SELECT (SELECT mh FROM cm WHERE c = 0) - 3600 AS v2,
      |    (SELECT max(mh) FROM cm WHERE c <= 1) - 3600 AS v3),
      |k AS (SELECT user_id, event_type,
      |    max(CASE WHEN c = 0 THEN h END) AS h0,
      |    max(CASE WHEN c = 1 THEN h END) AS h1,
      |    max(CASE WHEN c = 2 THEN h END) AS h2,
      |    max(CASE WHEN c = 3 THEN h END) AS h3
      |  FROM r WHERE NOT clock GROUP BY 1, 2),
      |f1 AS (SELECT user_id, event_type, h0, h1, h2, h3, v2, v3,
      |    h0 IS NOT NULL AS e0,
      |    (h0 IS NULL AND h1 IS NOT NULL) AS e1,
      |    coalesce(h0, h1) AS s1
      |  FROM k CROSS JOIN vs),
      |f2 AS (SELECT *,
      |    CASE WHEN s1 + 3600 < v2 THEN NULL ELSE s1 END AS s2in
      |  FROM f1),
      |f3 AS (SELECT *,
      |    (h2 IS NOT NULL AND h2 >= v2 AND s2in IS NULL) AS e2,
      |    CASE WHEN h2 IS NOT NULL AND h2 >= v2 AND s2in IS NULL
      |      THEN h2 ELSE s2in END AS s3pre
      |  FROM f2),
      |f4 AS (SELECT *,
      |    (h3 IS NOT NULL AND h3 >= v3 AND
      |     (s3pre IS NULL OR s3pre + 3600 < v3)) AS e3
      |  FROM f3),
      |em AS (
      |  SELECT user_id, event_type, h0 AS h FROM f4 WHERE e0
      |  UNION ALL SELECT user_id, event_type, h1 FROM f4 WHERE e1
      |  UNION ALL SELECT user_id, event_type, h2 FROM f4 WHERE e2
      |  UNION ALL SELECT user_id, event_type, h3 FROM f4 WHERE e3)
      |SELECT em.user_id, em.event_type,
      |  epoch_ms(anchor.a0 + em.h * INTERVAL 1 SECOND) AS h_ms
      |FROM em CROSS JOIN anchor
      |ORDER BY user_id, event_type, h_ms""".stripMargin) { (s, d) =>
    val sink = s"stream_dedup_within_sink_${sinkId.incrementAndGet()}"
    // ONE global anchor — date_trunc('month', min(ts)) computed from the
    // batch fixture, exactly the oracle's `anchor` CTE (r11 advisor: a
    // per-row month truncation would silently shift h for any event
    // outside the min-ts month and corrupt the tie-free watermark grid;
    // anchoring once removes the single-calendar-month fixture
    // invariant instead of documenting it). One tiny batch scan per
    // invocation — the chunk-dir build already reads the fixture anyway.
    val anchorUs = graft.Tables.events(s, d)
      .select(unix_micros(date_trunc("MONTH", min(col("ts")))))
      .head().getLong(0)
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .withColumn("hts", expr(
          s"""timestamp_micros(${anchorUs}L +
            |(CASE WHEN event_id % 5 = 0
            |   THEN 64800 + (event_id % 4) * 43200
            |   ELSE ((user_id & 2147483647) * 2654435761) % 690 * 60 + 90
            |     + (event_id % 4) *
            |       (CASE WHEN user_id % 3 = 0 THEN 1800 ELSE 43200 END)
            | END) * 1000000)""".stripMargin))
        .withColumn("ck", expr(
          "CASE WHEN event_id % 5 = 0 THEN event_id ELSE -1 END"))
        .select(col("user_id"), col("event_type"), col("ck"), col("hts"))
        .withWatermark("hts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "ck")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).filter(col("ck") === -1)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("hts")).as("h_ms"))
      .orderBy("user_id", "event_type", "h_ms")
  }

  /** The shared scaffold: stream the raw events fixture as a parquet
    * FILE STREAM (the source only accepts directories — a production
    * stream tails a landing dir — so a temp dir symlinks the fixture,
    * zero-copy), with the same ns→µs ts conversion Tables.events does. */
  /** WATERMARK + LATE-DATA-DROP parity — the determinism showpiece the
    * multi-batch scaffold makes possible: a 10-minute watermark over
    * 1-hour tumbling windows in APPEND mode, where which rows get
    * dropped and which windows ever emit depends entirely on the
    * micro-batch schedule. That schedule is pinned: chunk files are
    * consumed in name order (one per batch), and the watermark before
    * batch k is max(event time over batches < k) − 10 min (monotone,
    * advanced at batch completion). The oracle REPLAYS the protocol a
    * watermark probe pinned empirically (and the suite re-pins): Spark
    * filters LATE INPUT with the PREVIOUS trigger's watermark while
    * EVICTING/EMITTING with the current one — so a chunk-k row is
    * dropped iff its window end ≤ max(event time over chunks ≤ k−2)
    * − 10 min (chunks 0 and 1 are never dropped), and a window emits
    * iff the FINAL watermark passed its end. The one-trigger lag also
    * guarantees no window is ever emitted twice (a surviving row's
    * window can't have been evicted yet). All boundaries fall on
    * max_ts − 10 min values, microseconds away from any hour mark, so
    * <-vs-≤ ambiguity cannot bite. Because chunks interleave ids,
    * every chunk spans the whole month and the watermark leaps to
    * near-global-max after batch 0 — chunks 2–3 are then almost
    * entirely "too late", exercising the drop path on ~half the
    * corpus, and the last hour's windows never emit. */
  val streamWatermarkParity: Q = Q(
    "stream_watermark_parity",
    """WITH e AS (SELECT ts, event_type, event_id % 4 AS c FROM events),
      |cm AS (SELECT c, max(ts) AS mx FROM e GROUP BY c),
      |wm AS (SELECT c,
      |    (SELECT max(mx) FROM cm c2 WHERE c2.c <= cm.c - 2)
      |      - INTERVAL 10 MINUTE AS wm_drop
      |  FROM cm),
      |fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final FROM e),
      |surv AS (SELECT e.ts, e.event_type FROM e JOIN wm USING (c)
      |  WHERE wm.wm_drop IS NULL
      |    OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.wm_drop)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM surv, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val sink = s"stream_watermark_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("w_ms", "event_type")
  }

  /** Number of chunk files the fixture is split into; with
    * maxFilesPerTrigger = 1 each chunk is its own micro-batch, so every
    * parity row exercises REAL cross-batch state merging (session
    * windows extending/merging, join state probed by later arrivals,
    * dedup keys seen again batches later) — not a single-batch
    * degenerate run. The chunks interleave event ids (id mod 4), so
    * every batch carries every user/window and each batch's event-time
    * span overlaps all others: maximally adversarial arrival order for
    * state that must still reach the batch fixpoint. */
  private val StreamChunks = 4

  private def fileStream(s: org.apache.spark.sql.SparkSession, d: String) =
    streamFromDir(s, d, chunkDir(s, d))

  /** Like [[fileStream]] but over the TIME-ORDERED chunk layout
    * ([[timeChunkDir]]): batch k's event times all precede batch
    * k+1's, so a watermarked query never drops input as late — the
    * arrival discipline of a landing directory fed by a time-
    * partitioned upstream, and the one that makes OUTER-join null
    * emission oracle-expressible (the output depends only on the
    * FINAL watermark, not the batch schedule). */
  private def timeOrderedFileStream(s: org.apache.spark.sql.SparkSession, d: String) =
    streamFromDir(s, d, timeChunkDir(s, d))

  private def streamFromDir(s: org.apache.spark.sql.SparkSession,
      d: String, srcDir: String) = {
    val physical = s.read.parquet(s"$d/events.parquet").schema
    val streamed = s.readStream.schema(physical)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    if (physical("ts").dataType == LongType)
      streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else streamed
  }

  /** State-partition right-sizing for the parity rows: stateful
    * micro-batch cost is ~(state partitions × stateful ops) checkpoint
    * commits PER BATCH, independent of data volume — at fixture scale,
    * 32 shuffle partitions × 4 batches is pure commit overhead (the
    * stream-stream join paid it twice, once per side: measured 13.0s
    * of which ~10s was state commits). A production deployment sizes
    * state partitions to keyspace/throughput exactly the same way; the
    * RESULT is partition-count independent. The session conf is
    * restored after the query stops (the battery runs queries
    * sequentially). */
  private def withStatePartitions[A](s: org.apache.spark.sql.SparkSession,
      n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Split the events fixture into StreamChunks parquet files, cached
    * per fixture dir under the JVM temp dir (built once, reused by
    * every streaming query and every bench rep; _SUCCESS marks a
    * complete build so a killed half-write is rebuilt, and the staging
    * dir is unique per attempt so two sessions can't interleave). */
  private[graft] def chunkDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    buildChunkDir(s, d, "chunks") { (raw, i) =>
      raw.filter(pmod(col("event_id"), lit(StreamChunks)) === i)
    }

  /** TIME-ORDERED chunk layout: chunk i holds the i-th ts-quartile
    * (exact interpolated percentile boundaries; ties never straddle a
    * boundary because assignment compares VALUES, not positions), so
    * name-order consumption delivers the stream in event-time order —
    * every batch's min ts ≥ every earlier batch's max ts, and a
    * watermark can never drop input as late. */
  private[graft] def timeChunkDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    buildChunkDir(s, d, "tchunks") { (raw, i) =>
      val tsc =
        (if (raw.schema("ts").dataType == LongType) col("ts")
         else unix_micros(col("ts"))).cast("double")
      val bounds = raw.select(
        expr(s"percentile(${if (raw.schema("ts").dataType == LongType) "CAST(ts AS DOUBLE)"
          else "CAST(unix_micros(ts) AS DOUBLE)"}, array(0.25, 0.5, 0.75))"))
        .head().getSeq[Double](0)
      val lo = if (i == 0) lit(Double.NegativeInfinity) else lit(bounds(i - 1))
      val hi = if (i == StreamChunks - 1) lit(Double.PositiveInfinity) else lit(bounds(i))
      raw.filter(tsc > lo && tsc <= hi)
    }

  /** Shared chunk-cache mechanics: split the events fixture into
    * StreamChunks parquet files under a content-keyed temp dir (built
    * once, reused by every streaming query and bench rep; _SUCCESS
    * marks a complete build, staging is attempt-unique, publish is an
    * atomic rename). `variant` separates layouts (id-interleaved vs
    * time-ordered) in the cache namespace. */
  private def buildChunkDir(s: org.apache.spark.sql.SparkSession, d: String,
      variant: String)(
      chunkFilter: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame)
      : String = synchronized {
    // Key on the fixture FILE's identity (mtime + size), not just the
    // dir name: the driver regenerates /root/testdata between rounds
    // (observed round 7: ns → µs timestamps), and chunks built from a
    // stale fixture would silently fail parity against the new one.
    val src = java.nio.file.Paths.get(s"$d/events.parquet")
    val id = try s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}_${java.nio.file.Files.size(src)}"
      catch { case _: Throwable => "nofile" }
    val key = Integer.toHexString((d + "|" + id).hashCode)
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_${variant}_$key")
    val done = base.resolve("_SUCCESS")
    if (!java.nio.file.Files.exists(done)) {
      val staging = java.nio.file.Files.createTempDirectory(s"graft_${variant}_build_$key")
      val raw = s.read.parquet(s"$d/events.parquet")
      (0 until StreamChunks).foreach { i =>
        val part = java.nio.file.Files.createTempDirectory(s"graft_chunk_part_$i")
        chunkFilter(raw, i)
          .coalesce(1).write.mode("overwrite").parquet(part.toString)
        val file = java.nio.file.Files.list(part).iterator().asScala
          .find(_.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet written for chunk $i"))
        val dst = staging.resolve(f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(file, dst)
        // FileStreamSource orders candidate files by MODIFICATION TIME,
        // not name; a same-millisecond tie (fast build on a coarse-
        // granularity filesystem) falls back to unspecified ordering,
        // which would reorder the pinned micro-batch schedule (and for
        // the time-ordered layout, drop whole chunks as late input).
        // Strictly increasing i-based mtimes make delivery order
        // deterministic regardless of filesystem timestamp granularity.
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
        org.apache.commons.io.FileUtils.deleteDirectory(part.toFile)
      }
      java.nio.file.Files.createFile(staging.resolve("_SUCCESS"))
      // atomic publish: rename staging into place; lose the race → reuse
      try java.nio.file.Files.move(staging, base,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.FileSystemException =>
        org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
      }
    }
    base.toString
  }

  /** foreachBatch keyed-UPSERT sink parity — the "stream into a keyed
    * store" production pattern (JDBC/Delta MERGE per micro-batch),
    * exercised with a versioned parquet table as the store. The stream
    * aggregates per-user totals in UPDATE mode, so each micro-batch
    * emits only the keys it changed, carrying their new CUMULATIVE
    * aggregate; foreachBatch full-outer-merges those rows into the
    * current store version (coalesce: updated beats stored) and
    * publishes the next version — a fully DISTRIBUTED merge (no
    * driver-side collect; at 100 TB the same join is the standard
    * MERGE-on-key upsert, sized |store ∪ batch keys|). After the
    * finite stream drains, store ≡ batch group-by for every key, no
    * matter how the 4 chunks carved the key space. Values are summed
    * as floor(v·100+0.5) integer cents — exact associativity makes the
    * result micro-batch-schedule independent. */
  val streamUpsertParity: Q = Q(
    "stream_upsert_parity",
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.{DataFrame, Row, Dataset}
    val sinkBase = java.nio.file.Files
      .createTempDirectory("graft_upsert_sink_").toString
    val version = new AtomicLong(-1)
    def merge(batch: Dataset[Row], @annotation.unused id: Long): Unit = {
      val updates = batch.toDF("user_id", "u_n", "u_cents")
      val v = version.get()
      val merged =
        if (v < 0) updates.select(col("user_id"),
          col("u_n").as("n_events"), col("u_cents").as("cents"))
        else s.read.parquet(s"$sinkBase/v$v")
          .join(updates, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("u_n"), col("n_events")).as("n_events"),
            coalesce(col("u_cents"), col("cents")).as("cents"))
      merged.write.mode("overwrite").parquet(s"$sinkBase/v${v + 1}")
      version.incrementAndGet()
      ()
    }
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
        .writeStream.outputMode("update")
        .foreachBatch(merge _)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.read.parquet(s"$sinkBase/v${version.get()}").orderBy("user_id")
  }

  /** Append-mode FILE sink parity (r7 verdict #7): the same
    * watermarked tumbling aggregate as stream_watermark_parity, but
    * written through the real parquet FileStreamSink — finalized
    * windows land as committed files tracked by the _spark_metadata
    * exactly-once log, and the gate reads the WRITTEN parquet back, so
    * the sink's commit protocol (not just the in-memory result) is
    * what the oracle hashes. The DuckDB replica is the same
    * deterministic watermark-protocol replay: the id-mod-4 chunks fix
    * each micro-batch's watermark, a window emits only when the
    * watermark passes its end, and windows never finalized by the last
    * batch are absent from the files. */
  val streamFileSinkParity: Q = Q(
    "stream_file_sink_parity",
    """WITH e AS (SELECT ts, event_type, event_id % 4 AS c FROM events),
      |cm AS (SELECT c, max(ts) AS mx FROM e GROUP BY c),
      |wm AS (SELECT c,
      |    (SELECT max(mx) FROM cm c2 WHERE c2.c <= cm.c - 2)
      |      - INTERVAL 10 MINUTE AS wm_drop
      |  FROM cm),
      |fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final FROM e),
      |surv AS (SELECT e.ts, e.event_type FROM e JOIN wm USING (c)
      |  WHERE wm.wm_drop IS NULL
      |    OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.wm_drop)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM surv, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_file_sink_out_").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_file_sink_ckpt_").toString
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.read.parquet(outDir).orderBy("w_ms", "event_type")
  }

  /** flatMapGroupsWithState + EVENT-TIME TIMEOUT parity (r10 verdict
    * #2) — the sessionizer-with-expiry, the last uncovered arbitrary-
    * state shape: a per-user session EMITS either when a later event
    * of the same user closes it (gap > 30 min — the data path) or
    * when the watermark passes end + gap with NO later event (the
    * TIMEOUT path, which only flatMapGroupsWithState can express:
    * `state.setTimeoutTimestamp(end + gap)`, emit-and-remove in the
    * hasTimedOut branch). Rides the TIME-ORDERED chunk layout, which
    * makes both paths watermark-determined and oracle-expressible:
    * (a) no input is ever late; (b) a session still extendable can
    * never time out first (its next in-order event is ≤ gap away,
    * but timeout needs the watermark ≥ end + gap while arriving
    * events keep it within delay of the stream head); (c) whether a
    * closed session emits via data or timeout depends on the batch
    * schedule, but the EMITTED ROW is identical either way, so the
    * output set is schedule-independent: every non-final session,
    * plus the user's final session iff end + gap < final watermark
    * (max event-time ms − 10 min; timeout fires on STRICT
    * timeoutTimestamp < watermark, pinned empirically at both SFs
    * and re-pinned by the Round11 suite, which also proves the
    * timeout path actually fired). All arithmetic is exact: epoch-ms
    * boundaries (Timestamp.getTime truncates µs→ms ≡ DuckDB
    * epoch_ms), integer-cent sums. State is hash-partitioned by
    * user_id and bounded by the watermark horizon — the production
    * sessionizer plan at 100 TB/day. */
  val streamTimeoutParity: Q = Q(
    "stream_timeout_parity",
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS m,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |g AS (SELECT user_id, m, cents,
      |    CASE WHEN lag(m) OVER (PARTITION BY user_id ORDER BY m) IS NULL
      |      OR m - lag(m) OVER (PARTITION BY user_id ORDER BY m) > 1800000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |s AS (SELECT user_id, m, cents,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY m
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
      |    max(m) OVER (PARTITION BY user_id) AS umax
      |  FROM g),
      |sess AS (SELECT user_id, CAST(min(m) AS BIGINT) AS s_ms,
      |    CAST(max(m) AS BIGINT) AS e_ms,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(cents) AS BIGINT) AS cents,
      |    CAST(max(umax) AS BIGINT) AS umax
      |  FROM s GROUP BY user_id, sid),
      |wm AS (SELECT max(epoch_ms(ts)) - 600000 AS w FROM events)
      |SELECT user_id, s_ms, e_ms, n_events, cents
      |FROM sess, wm
      |WHERE e_ms < umax OR e_ms + 1800000 < wm.w
      |ORDER BY user_id, s_ms""".stripMargin) { (s, d) =>
    import s.implicits._
    val sink = s"stream_timeout_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val ev = timeOrderedFileStream(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Event]
      val q = graft.streaming.StreamOps.sessionizeCents(ev)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("user_id", "s_ms")
  }

  /** STREAM–STATIC enrichment join parity — the most common production
    * streaming topology (r11 verdict #2): an event stream joined
    * per-micro-batch to a slowly-changing DIMENSION table (customer),
    * then aggregated over the enriched rows. Unlike the stream-stream
    * rows, the static side keeps NO state — every micro-batch plans a
    * fresh batch join against the dimension (which is how dimension
    * updates between batches become visible in production), and at
    * dimension sizes like this one Spark broadcasts it per batch
    * (BroadcastHashJoin under the streaming plan — asserted by the
    * Round12 suite; a 100 TB deployment keeps the dim under the
    * broadcast threshold or pre-buckets it). The aggregate runs in
    * complete mode with integer-cent sums, so the finite-stream
    * fixpoint is micro-batch-schedule independent and the oracle is
    * the plain batch join + group-by. Every event user_id resolves in
    * customer at all SFs (user_id range ⊂ c_custkey range), so the
    * inner join loses nothing — checked by the row-count gate. */
  val streamStaticJoinParity: Q = Q(
    "stream_static_join_parity",
    """SELECT c_mktsegment, epoch_ms(date_trunc('day', ts)) AS d_ms,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY c_mktsegment, d_ms""".stripMargin) { (s, d) =>
    val sink = s"stream_static_join_sink_${sinkId.incrementAndGet()}"
    val dim = graft.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    withStatePartitions(s, 8) {
      val q = fileStream(s, d)
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
        .select(col("c_mktsegment"), unix_millis(col("w.start")).as("d_ms"),
          col("n"), col("cents"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    s.table(sink).orderBy("c_mktsegment", "d_ms")
  }

  /** Everything the Round12 suite needs to prove a checkpoint recovery
    * actually RESUMED: the sink dir plus the per-phase data-batch ids
    * and input-row totals, and the sink row count visible at the stop
    * point. */
  final case class RecoveryRun(outDir: String,
      preBatchIds: Seq[Long], preRows: Long, rowsAtStop: Long,
      postBatchIds: Seq[Long], postRows: Long)

  /** Core of [[streamRecoveryParity]], factored out so the suite can
    * assert the resume was real (offsets advanced, chunks 0–1 never
    * reprocessed) rather than a silent from-scratch rerun. */
  private[graft] def runRecovery(s: org.apache.spark.sql.SparkSession,
      d: String): RecoveryRun = {
    val chunks = timeChunkDir(s, d)
    val landing = java.nio.file.Files
      .createTempDirectory("graft_recovery_landing_")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_recovery_ckpt_")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_recovery_out_")
    def link(i: Int): Unit = {
      val nm = f"chunk_$i%02d.parquet"
      java.nio.file.Files.createSymbolicLink(
        landing.resolve(nm), java.nio.file.Paths.get(chunks, nm))
      ()
    }
    // the SAME query definition both times — a restart must be able to
    // re-plan the logical query from code and reattach to the
    // checkpoint's offsets + state + sink log
    def start() = {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      src.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
    }
    withStatePartitions(s, 8) {
      link(0); link(1)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val pre = q1.recentProgress.toSeq.filter(_.numInputRows > 0)
      val rowsAtStop =
        try s.read.parquet(outDir.toString).count() catch { case _: Throwable => 0L }
      link(2); link(3)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val post = q2.recentProgress.toSeq.filter(_.numInputRows > 0)
      RecoveryRun(outDir.toString,
        pre.map(_.batchId), pre.map(_.numInputRows).sum, rowsAtStop,
        post.map(_.batchId), post.map(_.numInputRows).sum)
    }
  }

  /** CHECKPOINT-RECOVERY parity — the exactly-once fault-tolerance
    * semantics (r11 verdict #1, top_next; previously the one core
    * streaming behavior with zero coverage): a watermarked stateful
    * aggregate writes through the parquet FileStreamSink with an
    * explicit checkpointLocation, is STOPPED after consuming the first
    * two of four chunk files, and a NEW query (same logical plan, same
    * checkpoint, same sink) is started over the landing dir after the
    * remaining two chunks arrive. The restart must restore source
    * offsets (chunks 0–1 are never re-read — suite-asserted via batch
    * ids and input-row counts), window STATE (windows straddling the
    * stop point merge rows from both phases — any state loss
    * under-counts them and fails the gate), the WATERMARK, and the
    * sink's _spark_metadata commit log (pre-stop files stay committed
    * exactly once; a from-scratch rerun would double-emit and fail the
    * gate). Rides the TIME-ORDERED chunk layout, which makes the final
    * output schedule-independent and therefore ≡ the uninterrupted
    * run: no input is ever late (so no drop depends on the stop
    * point), and a window emits iff the FINAL watermark (global max −
    * 10 min) passed its end — the oracle is that one predicate, with
    * no batch-protocol replay at all. At 100 TB recovery is not
    * optional; this row is the resume-correctness contract. */
  val streamRecoveryParity: Q = Q(
    "stream_recovery_parity",
    """WITH fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final
      |  FROM events)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM events, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val run = runRecovery(s, d)
    s.read.parquet(run.outDir).orderBy("w_ms", "event_type")
  }

  /** Run `body` with the RocksDB state store provider pinned —
    * `transformWithState` requires it (the default HDFS-backed
    * provider does not implement the state-v2 column families), and
    * at 100 TB RocksDB is what a production deployment runs anyway
    * (state spills to local SSD instead of executor heap). Conf
    * restored after; the battery runs queries sequentially. */
  private def withRocksDbState[A](s: org.apache.spark.sql.SparkSession)(
      body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** transformWithState parity — the state-v2 ARBITRARY-STATE API
    * (Spark 4's successor to mapGroupsWithState: named state variables
    * against a StatefulProcessorHandle, RocksDB-backed, per-variable
    * TTL) under the declared gate. The processor keeps ONE
    * ValueState[(n, cents)] per user ([[graft.streaming.
    * RunningTotalsProcessor]]) merged commutatively with each batch's
    * partial sums, so the id-interleaved chunk layout's adversarial
    * arrival order cannot perturb the fixpoint: after the finite
    * stream drains, the last emission per user ≡ the batch group-by
    * the oracle runs. Update-mode emissions are monotone in n_events,
    * so max-n-per-user selects the fixpoint row exactly like
    * stream_state_parity. The suite additionally proves the stream ran
    * ≥ 4 micro-batches and that intermediate (non-final) emissions
    * existed — the state merge is load-bearing, not a single-batch
    * degenerate. */
  lazy val streamTwsParity: Q = Q(
    "stream_tws_parity",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val sink = s"stream_tws_parity_sink_${sinkId.incrementAndGet()}"
    withRocksDbState(s) {
      withStatePartitions(s, 8) {
        val ev = fileStream(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.Event]
        val q = ev.groupByKey(_.user_id)
          .transformWithState(new graft.streaming.RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try q.processAllAvailable()
        finally q.stop()
      }
    }
    val emitted = s.table(sink)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    emitted.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"))
      .orderBy("user_id")
  }

  /** transformWithState INITIAL-STATE parity — the lambda-architecture
    * bootstrap seam: a BATCH aggregate over the historical half of the
    * corpus (time-chunks 0–1, i.e. events at or before the ts median)
    * seeds the streaming query's per-user ValueState via
    * `transformWithState`'s initialState overload
    * ([[graft.streaming.RunningTotalsWithInit]]); the stream then
    * consumes ONLY the tail chunks (2–3, `pathGlobFilter`), and every
    * emission for a bootstrapped user already carries its history —
    * replaying months of history through the stream is replaced by one
    * batch aggregate, which is how a 100 TB deployment actually stands
    * a stateful stream up. `handleInitialState` is state-only (no
    * emission), so the contract output is per-user totals over the
    * WHOLE corpus for exactly the users active in the tail; the oracle
    * replays the chunk boundary as the interpolated ts median (both
    * engines compute the same exact double — the chunk builder used
    * percentile(0.5) over unix-micros, all < 2^53) and the strict
    * `> median` comparison matches the builder's `(q2, q3]` chunk
    * assignment. Update-mode emissions are monotone in n_events;
    * max-n-per-user selects the fixpoint. */
  lazy val streamInitStateParity: Q = Q(
    "stream_init_state_parity",
    """WITH m AS (SELECT quantile_cont(CAST(epoch_us(ts) AS DOUBLE), 0.5)
      |    AS med FROM events),
      |tail_users AS (SELECT DISTINCT user_id FROM events, m
      |  WHERE CAST(epoch_us(ts) AS DOUBLE) > med)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM events
      |WHERE user_id IN (SELECT user_id FROM tail_users)
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val chunks = timeChunkDir(s, d)
    def loadChunks(glob: String) = {
      val raw = s.read.option("pathGlobFilter", glob).parquet(chunks)
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    }
    // batch bootstrap: historical per-user (n, cents) over chunks 0-1
    val bootstrap = loadChunks("chunk_0[01].parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
      .as[(Long, Long, Long)]
      .map { case (u, n, c) => (u, (n, c)) }
      .groupByKey(_._1).mapValues(_._2)
    val sink = s"stream_init_state_sink_${sinkId.incrementAndGet()}"
    withRocksDbState(s) {
      withStatePartitions(s, 8) {
        val physical = s.read.parquet(s"$d/events.parquet").schema
        val streamed = s.readStream.schema(physical)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "chunk_0[23].parquet")
          .parquet(chunks)
        val src = if (physical("ts").dataType == LongType)
          streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else streamed
        val ev = src.select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.Event]
        val q = ev.groupByKey(_.user_id)
          .transformWithState(new graft.streaming.RunningTotalsWithInit,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update(),
            bootstrap)
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try q.processAllAvailable()
        finally q.stop()
      }
    }
    val emitted = s.table(sink)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    emitted.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"))
      .orderBy("user_id")
  }

  /** Everything the Round13 suite needs to prove an AvailableNow run
    * was rate-limited, self-terminating, and idempotent from the
    * checkpoint: per-run data-batch ids / input-row totals and whether
    * each run terminated on its own (vs the 120s safety timeout). */
  final case class AvailableNowRun(outDir: String,
      run1BatchIds: Seq[Long], run1Rows: Long, run1SelfTerminated: Boolean,
      run2DataBatches: Int, run2Rows: Long, run2SelfTerminated: Boolean)

  /** Core of [[streamAvailableNowParity]], factored out so the suite
    * can assert the trigger contract (≥4 rate-limited batches,
    * self-termination, zero-input second run) beyond the result gate. */
  private[graft] def runAvailableNow(s: org.apache.spark.sql.SparkSession,
      d: String): AvailableNowRun = {
    val chunks = timeChunkDir(s, d)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_availnow_ckpt_")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_availnow_out_")
    def start() = {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(chunks)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      src.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
    }
    withStatePartitions(s, 8) {
      // run 1: the backfill — must consume all four chunks in
      // maxFilesPerTrigger-limited batches, then stop ITSELF (no
      // processAllAvailable; 120s is a safety bound, not the stop
      // signal — the suite asserts self-termination)
      val q1 = start()
      val t1 = q1.awaitTermination(120000)
      if (!t1) q1.stop()
      val pre = q1.recentProgress.toSeq.filter(_.numInputRows > 0)
      // run 2: the idempotence contract — a second AvailableNow run
      // from the same checkpoint finds zero new files and terminates
      // without emitting anything
      val q2 = start()
      val t2 = q2.awaitTermination(120000)
      if (!t2) q2.stop()
      val post = q2.recentProgress.toSeq.filter(_.numInputRows > 0)
      AvailableNowRun(outDir.toString,
        pre.map(_.batchId), pre.map(_.numInputRows).sum, t1,
        post.size, post.map(_.numInputRows).sum, t2)
    }
  }

  /** `Trigger.AvailableNow` parity — the BACKFILL trigger every
    * production 100 TB streaming deployment runs ("process everything
    * that exists, rate-limited, then stop"; r12 verdict #2): the
    * watermarked hourly aggregate consumes the time-ordered chunk
    * layout under AvailableNow + maxFilesPerTrigger(1), so the engine
    * must plan MULTIPLE rate-limited micro-batches (not one giant
    * batch — the rate limit is what keeps a month-long backfill from
    * building a month of state in one batch) and then terminate ON ITS
    * OWN once the snapshot is drained. A SECOND AvailableNow run from
    * the same checkpoint is the idempotent-catch-up contract: it reads
    * ZERO new files and emits nothing (suite-asserted). Output ≡ the
    * uninterrupted watermarked run on the same layout, so the oracle
    * is the final-watermark predicate — identical semantics to
    * stream_recovery_parity's gate. */
  val streamAvailableNowParity: Q = Q(
    "stream_available_now_parity",
    """WITH fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final
      |  FROM events)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM events, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val run = runAvailableNow(s, d)
    s.read.parquet(run.outDir).orderBy("w_ms", "event_type")
  }

  /** Phase metadata [[runEvolve]] hands the Round13 suite: batch ids
    * and input-row totals per phase (the resume must be real — phase 2
    * never re-reads phase 1's chunks) plus each phase's emission count
    * from its memory sink. */
  final case class EvolveRun(
      result: org.apache.spark.sql.DataFrame,
      preBatchIds: Seq[Long], preRows: Long, preEmits: Long,
      postBatchIds: Seq[Long], postRows: Long)

  /** Core of [[streamEvolveParity]]: phase 1 runs
    * [[graft.streaming.RunningTotalsProcessor]] over the first two
    * time-chunks, stops, and phase 2 restarts from the SAME checkpoint
    * with the EVOLVED [[graft.streaming.RunningTotalsProcessorV2]]
    * (same state variable + encoder, output row adds a derived
    * column) over the remaining chunks. */
  private[graft] def runEvolve(s: org.apache.spark.sql.SparkSession,
      d: String): EvolveRun = {
    import s.implicits._
    val chunks = timeChunkDir(s, d)
    val landing = java.nio.file.Files
      .createTempDirectory("graft_evolve_landing_")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_evolve_ckpt_")
    def link(i: Int): Unit = {
      val nm = f"chunk_$i%02d.parquet"
      java.nio.file.Files.createSymbolicLink(
        landing.resolve(nm), java.nio.file.Paths.get(chunks, nm))
      ()
    }
    def source() = {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      src.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Event]
    }
    // foreachBatch parquet-append sinks: the memory sink REFUSES
    // checkpoint recovery outside complete mode (exactly the restart
    // this row exists to prove), while ForeachBatchSink is
    // recovery-capable — and is also how a production deployment
    // lands update-mode emissions in a lake table.
    val emitDir1 = java.nio.file.Files
      .createTempDirectory("graft_evolve_emits1_")
    val emitDir2 = java.nio.file.Files
      .createTempDirectory("graft_evolve_emits2_")
    withRocksDbState(s) {
      withStatePartitions(s, 8) {
        link(0); link(1)
        val q1 = source().groupByKey(_.user_id)
          .transformWithState(new graft.streaming.RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[graft.streaming.UserTotals],
             _: Long) =>
              batch.write.mode("append").parquet(emitDir1.toString)
          }
          .option("checkpointLocation", ckpt.toString)
          .outputMode("update").start()
        try q1.processAllAvailable() finally q1.stop()
        val pre = q1.recentProgress.toSeq.filter(_.numInputRows > 0)
        val preEmits = s.read.parquet(emitDir1.toString).count()
        link(2); link(3)
        val q2 = source().groupByKey(_.user_id)
          .transformWithState(new graft.streaming.RunningTotalsProcessorV2,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[graft.streaming.UserTotalsV2],
             _: Long) =>
              batch.write.mode("append").parquet(emitDir2.toString)
          }
          .option("checkpointLocation", ckpt.toString)
          .outputMode("update").start()
        try q2.processAllAvailable() finally q2.stop()
        val post = q2.recentProgress.toSeq.filter(_.numInputRows > 0)
        val emitted = s.read.parquet(emitDir2.toString)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)
        val result = emitted.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("n_events"), col("total_cents"),
            col("cents_per_event"))
          .orderBy("user_id")
        EvolveRun(result, pre.map(_.batchId), pre.map(_.numInputRows).sum,
          preEmits, post.map(_.batchId), post.map(_.numInputRows).sum)
      }
    }
  }

  /** For the Round13 suite ONLY (not a declared query): restart a
    * checkpoint written by RunningTotalsProcessor with the
    * state-INCOMPATIBLE [[graft.streaming.RunningTotalsBadState]]
    * (same state name, widened value encoder) over fresh input, and
    * return the loud failure the engine must raise — persisted state
    * bytes are never silently reinterpreted. */
  private[graft] def runEvolveBadRestart(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    import s.implicits._
    val chunks = timeChunkDir(s, d)
    val landing = java.nio.file.Files
      .createTempDirectory("graft_evolvebad_landing_")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_evolvebad_ckpt_")
    def link(i: Int): Unit = {
      val nm = f"chunk_$i%02d.parquet"
      java.nio.file.Files.createSymbolicLink(
        landing.resolve(nm), java.nio.file.Paths.get(chunks, nm))
      ()
    }
    def source() = {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      src.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Event]
    }
    val emitDir = java.nio.file.Files
      .createTempDirectory("graft_evolvebad_emits_")
    withRocksDbState(s) {
      withStatePartitions(s, 8) {
        link(0)
        val q1 = source().groupByKey(_.user_id)
          .transformWithState(new graft.streaming.RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[graft.streaming.UserTotals],
             _: Long) =>
              batch.write.mode("append").parquet(emitDir.toString)
          }
          .option("checkpointLocation", ckpt.toString)
          .outputMode("update").start()
        try q1.processAllAvailable() finally q1.stop()
        link(1)
        try {
          val q2 = source().groupByKey(_.user_id)
            .transformWithState(new graft.streaming.RunningTotalsBadState,
              org.apache.spark.sql.streaming.TimeMode.None(),
              org.apache.spark.sql.streaming.OutputMode.Update())
            .writeStream
            .foreachBatch {
              (batch: org.apache.spark.sql.Dataset[graft.streaming.UserTotals],
               _: Long) =>
                batch.write.mode("append").parquet(emitDir.toString)
            }
            .option("checkpointLocation", ckpt.toString)
            .outputMode("update").start()
          try q2.processAllAvailable() finally q2.stop()
          "" // no failure raised — the suite fails on this
        } catch {
          case e: Throwable =>
            def messages(t: Throwable): String =
              if (t == null) ""
              else s"${t.getClass.getName}: ${t.getMessage}\n" +
                messages(t.getCause)
            messages(e)
        }
      }
    }
  }

  /** CHAINED STATEFUL OPERATORS parity (round 13) — the hourly→daily
    * rollup in ONE streaming query: a watermarked 1-hour windowed
    * count re-aggregated by a SECOND stateful windowed aggregate into
    * 1-day sums, the multiple-stateful-operator pipeline Spark
    * supports natively since 3.4 (before that, production deployments
    * chained two queries through an intermediate sink and paid a
    * second checkpoint + sink round-trip). Rides the time-ordered
    * chunk layout: a day emits iff the FINAL watermark passed its end,
    * and every hour inside an emitted day has also ended before the
    * watermark (hour end ≤ day end), so no partial day can emit and
    * the oracle is one predicate over the raw events — no
    * batch-protocol replay. The suite asserts TWO stateful operators
    * in the executed streaming plan (the anti-vacuity: a planner that
    * collapsed the rollup into one aggregate would not exercise the
    * chained-state path) and ≥4 micro-batches. At 100 TB this halves
    * the checkpoint traffic of every rollup cascade. */
  lazy val streamChainedAggParity: Q = Q(
    "stream_chained_agg_parity",
    """WITH fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final
      |  FROM events)
      |SELECT epoch_ms(date_trunc('day', ts)) AS d_ms, event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT date_trunc('hour', ts)) AS n_hours
      |FROM events, fin
      |WHERE date_trunc('day', ts) + INTERVAL 1 DAY < wm_final
      |GROUP BY 1, 2 ORDER BY d_ms, event_type""".stripMargin) { (s, d) =>
    val sink = s"stream_chained_agg_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val hourly = timeOrderedFileStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("hw"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val daily = hourly
        .groupBy(window(col("hw"), "1 day").as("dw"), col("event_type"))
        .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"))
        .select(unix_millis(col("dw.start")).as("d_ms"), col("event_type"),
          col("n_events"), col("n_hours"))
      val q = daily.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        lastChainedPlan.set(q.lastProgress)
      } finally q.stop()
    }
    s.table(sink).orderBy("d_ms", "event_type")
  }

  /** Last StreamingQueryProgress of the chained-agg query, for the
    * Round13 suite's two-stateful-operator assertion (the progress
    * carries one stateOperators entry per stateful exec). */
  private[graft] val lastChainedPlan =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.streaming.StreamingQueryProgress](null)

  /** What the Round13 suite needs from the sink-metadata audit: the
    * sink dir, the row count the metadata-aware read sees, the count a
    * raw glob read sees, and the stranger file's row count. */
  final case class SinkMetadataRun(outDir: String,
      metadataRows: Long, globRows: Long, strangerRows: Long)

  /** Core of [[streamSinkMetadataAudit]]: run the watermarked
    * aggregate through the parquet FileStreamSink, then smuggle a
    * foreign parquet file (a copy of the sink's own first data file)
    * into the directory BESIDE the `_spark_metadata` log. */
  private[graft] def runSinkMetadata(s: org.apache.spark.sql.SparkSession,
      d: String): SinkMetadataRun = {
    val chunks = timeChunkDir(s, d)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sinkmeta_ckpt_")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_sinkmeta_out_")
    withStatePartitions(s, 8) {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(chunks)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      val q = src.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // the smuggled file: a byte-copy of the sink's own first data file,
    // dropped into the dir WITHOUT a commit-log entry (what a naive
    // out-of-band compactor or a stray distcp does to a sink dir)
    val first = scala.util.Using.resource(
      java.nio.file.Files.list(outDir)) { st =>
      st.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.minBy(_.toString)
    }
    val stranger = outDir.resolve("part-99999-stranger.parquet")
    java.nio.file.Files.copy(first, stranger)
    val strangerRows = s.read.parquet(stranger.toString).count()
    val metadataRows = s.read.parquet(outDir.toString).count()
    // raw glob read bypasses the log by addressing files, not the dir
    val globRows = s.read.parquet(s"$outDir/part-*.parquet").count()
    SinkMetadataRun(outDir.toString, metadataRows, globRows, strangerRows)
  }

  /** FileStreamSink `_spark_metadata` CONTRACT audit (round 13) — the
    * production pitfall every team hits once: a streaming sink
    * directory is NOT a plain parquet directory. Reads of the dir are
    * served from the sink's commit log (`_spark_metadata`), so files
    * added out-of-band — a naive compactor, a stray copy, a
    * half-failed task's orphan — are INVISIBLE to downstream readers
    * (and conversely, that's what makes the sink exactly-once: an
    * uncommitted file is never read). This row smuggles a copy of the
    * sink's own first data file into the dir and declares the
    * metadata-aware aggregate, which must equal the uninterrupted
    * run's output — i.e. the stranger file must NOT be double-counted.
    * The suite additionally proves the stranger IS physically there (a
    * raw glob read sees exactly strangerRows more). At 100 TB this is
    * why sink compaction must rewrite the metadata log, not just the
    * files. */
  lazy val streamSinkMetadataAudit: Q = Q(
    "stream_sink_metadata_audit",
    """WITH fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final
      |  FROM events)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM events, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val run = runSinkMetadata(s, d)
    s.read.parquet(run.outDir).orderBy("w_ms", "event_type")
  }

  /** Everything the Round13 suite needs from a conf-pin restart: phase
    * batch ids / rows (the resume must be real) and the state
    * operator's ACTUAL shuffle-partition count in each phase (the
    * checkpoint must pin it against the changed session conf). */
  final case class ConfPinRun(outDir: String,
      preBatchIds: Seq[Long], preRows: Long, preStateParts: Long,
      postBatchIds: Seq[Long], postRows: Long, postStateParts: Long)

  /** Core of [[streamConfPinParity]]: phase 1 runs the watermarked
    * aggregate at 8 state partitions over the first two time-chunks
    * and stops; phase 2 restarts the SAME checkpoint with the session
    * conf set to 32 shuffle partitions. */
  private[graft] def runConfPin(s: org.apache.spark.sql.SparkSession,
      d: String): ConfPinRun = {
    val chunks = timeChunkDir(s, d)
    val landing = java.nio.file.Files
      .createTempDirectory("graft_confpin_landing_")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_confpin_ckpt_")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_confpin_out_")
    def link(i: Int): Unit = {
      val nm = f"chunk_$i%02d.parquet"
      java.nio.file.Files.createSymbolicLink(
        landing.resolve(nm), java.nio.file.Paths.get(chunks, nm))
      ()
    }
    def start() = {
      val physical = s.read.parquet(s"$d/events.parquet").schema
      val streamed = s.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val src = if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
      src.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
          col("n"))
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
    }
    def stateParts(
        q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
      val ps = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      if (ps.isEmpty) -1L else ps.map(_.numShufflePartitions).max
    }
    // phase 1 under 8 state partitions
    val (pre, preParts) = withStatePartitions(s, 8) {
      link(0); link(1)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      (q1.recentProgress.toSeq.filter(_.numInputRows > 0), stateParts(q1))
    }
    // phase 2: the session now says 32 — the checkpoint must win
    val (post, postParts) = withStatePartitions(s, 32) {
      link(2); link(3)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      (q2.recentProgress.toSeq.filter(_.numInputRows > 0), stateParts(q2))
    }
    ConfPinRun(outDir.toString,
      pre.map(_.batchId), pre.map(_.numInputRows).sum, preParts,
      post.map(_.batchId), post.map(_.numInputRows).sum, postParts)
  }

  /** STATE-PARTITIONING conf-pin parity (round 13 — the operational
    * contract beside recovery and evolution): a stateful query's state
    * partition count is written into the checkpoint at FIRST start and
    * must override the session's `spark.sql.shuffle.partitions` on
    * every later restart — otherwise each of N state partitions would
    * be asked for keys that hash elsewhere under the new modulus and
    * the aggregate would silently drop or double-count. Phase 1 runs
    * the watermarked hourly aggregate at 8 state partitions and stops
    * mid-stream; phase 2 restarts the same checkpoint under a session
    * conf of 32. The suite asserts the phase-2 state operator STILL
    * ran 8 partitions (numShufflePartitions from the progress, both
    * phases) and that the resume was real (batch ids advance, tail
    * chunks only); the gate asserts the final output is exactly the
    * uninterrupted run's — any state misrouting under-counts windows
    * pending at the stop. At 100 TB this is the contract that makes
    * cluster right-sizing safe: you can resize the CLUSTER, not a
    * checkpoint's state layout (that needs offline state rebuild). */
  lazy val streamConfPinParity: Q = Q(
    "stream_conf_pin_parity",
    """WITH fin AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm_final
      |  FROM events)
      |SELECT epoch_ms(date_trunc('hour', ts)) AS w_ms, event_type,
      |  count(*) AS n
      |FROM events, fin
      |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < wm_final
      |GROUP BY 1, 2 ORDER BY w_ms, event_type""".stripMargin) { (s, d) =>
    val run = runConfPin(s, d)
    s.read.parquet(run.outDir).orderBy("w_ms", "event_type")
  }

  /** QUERY-EVOLUTION restart parity (r12 verdict #4 — completes the
    * fault-tolerance contract stream_recovery_parity opened): a
    * production stream is never restarted only with the identical
    * plan — bug fixes and added derived columns restart long-lived
    * checkpoints with CHANGED queries. Phase 1 runs the
    * transformWithState running-totals processor over the first two
    * time-chunks and stops; phase 2 restarts the SAME checkpoint with
    * the EVOLVED processor — identical state variable and encoder,
    * output row widened by a derived cents_per_event column (the
    * SUPPORTED evolution: output schema is not persisted state) —
    * over the remaining chunks. Emissions in phase 2 must carry phase
    * 1's accumulated state (any state loss under-counts n_events and
    * fails the gate), so the contract output is whole-corpus per-user
    * totals for exactly the users active in the tail chunks — the
    * same oracle shape as stream_init_state_parity, plus the evolved
    * column. The UNSUPPORTED change (widened STATE encoder) is pinned
    * by the suite via [[runEvolveBadRestart]]: it must fail loudly at
    * the state-schema compatibility check, never reinterpret bytes. */
  lazy val streamEvolveParity: Q = Q(
    "stream_evolve_parity",
    """WITH m AS (SELECT quantile_cont(CAST(epoch_us(ts) AS DOUBLE), 0.5)
      |    AS med FROM events),
      |tail_users AS (SELECT DISTINCT user_id FROM events, m
      |  WHERE CAST(epoch_us(ts) AS DOUBLE) > med)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  CAST(floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 1.0
      |    / count(*)) AS BIGINT) AS cents_per_event
      |FROM events
      |WHERE user_id IN (SELECT user_id FROM tail_users)
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    runEvolve(s, d).result
  }

  val all: Seq[Q] = Seq(streamFileParity, streamSlideParity,
    streamSessionParity, streamJoinParity, streamLeftJoinParity,
    streamFullJoinParity, streamSemiJoinParity, streamChainJoinParity,
    streamDedupParity, streamDedupWithinParity,
    streamWatermarkParity, streamUpsertParity, streamFileSinkParity,
    streamStateParity, streamTimeoutParity, streamStaticJoinParity,
    streamRecoveryParity, streamTwsParity, streamInitStateParity,
    streamAvailableNowParity, streamEvolveParity, streamConfPinParity,
    streamChainedAggParity, streamSinkMetadataAudit)

  /** mapGroupsWithState parity — the CUSTOM-STATE API under the
    * declared gate (flatMapGroupsWithState sessionization is
    * spec-gated in StreamSuite; this row runs the buffered
    * mapGroupsWithState form through the real multi-micro-batch file
    * stream). Exact per-user max inter-event gap requires the user's
    * full ordered timeline in state — no built-in streaming aggregate
    * expresses it — and the chunk split (event_id mod) deliberately
    * delivers each user's events OUT of time order across batches, so
    * the op's sorted-buffer merge is load-bearing, not decorative.
    * Update-mode emissions are monotone in n_events, so the finite-
    * stream fixpoint per user is the max-n row; the DuckDB replica is
    * the batch lag walk. */
  lazy val streamStateParity: Q = Q(
    "stream_state_parity",
    """WITH e AS (SELECT user_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |g AS (SELECT user_id, ts, cents,
      |    date_diff('microsecond',
      |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) AS gap
      |  FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val sink = s"stream_state_parity_sink_${sinkId.incrementAndGet()}"
    withStatePartitions(s, 8) {
      val ev = fileStream(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.Event]
      val q = graft.streaming.StreamOps.userGapStats(ev)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val emitted = s.table(sink)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    emitted.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_events"), col("total_cents"),
        col("max_gap_us"))
      .orderBy("user_id")
  }
}
