package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mirror of the `events` fixture schema for typed streaming ops. */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** One closed (or timed-out) user session. */
final case class Session(
    user_id: Long,
    start_ms: Long,
    end_ms: Long,
    n_events: Int,
    total_value: Double)

/** Structured Streaming surface over the `events` schema (SURVEY.md §2.B
  * "Streaming" row): event-time windows + watermarks, late-data drop,
  * stateful dedup, and custom session state via flatMapGroupsWithState.
  *
  * Everything is readStream-agnostic: callers pass any streaming
  * DataFrame with the events schema (MemoryStream in tests, file/kafka
  * source in production). Watermarks bound state: at 100 TB/day the
  * state store only holds windows/sessions newer than the watermark
  * horizon — nothing here accumulates unbounded state.
  */
object StreamOps {

  /** Tumbling event-time window aggregate with late-data drop. */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("total"))

  /** Sliding window (width/slide) aggregate. */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Built-in session window (gap-based) per user. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"), col("total"))

  /** Stateful exact dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with event-time bounds: pair each click
    * with purchases by the same user within `withinMinutes` AFTER the
    * click. Both sides carry watermarks, so join state is purged once
    * event time passes the bound — the only stream-stream join shape
    * that holds state bounded at scale. */
  def clickToPurchase(events: DataFrame, withinMinutes: Int = 30,
      watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"))
  }

  /** Custom sessionization via flatMapGroupsWithState (the general
    * stateful-operator form the built-in session_window can't express —
    * e.g. per-session value totals with custom close rules).
    *
    * A session closes when a newer event in the same group arrives more
    * than gapMs later (emitted immediately) or when event time passes
    * the watermark with no newer events (EventTimeTimeout). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Session]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t >= s.start_ms - gapMs && t - s.end_ms <= gapMs =>
                  // start_ms may move backwards: a late-but-within-watermark
                  // event from an earlier batch can precede the open session
                  // (by at most gapMs, else it is not the same session).
                  open = Some(s.copy(start_ms = math.min(s.start_ms, t),
                    end_ms = math.max(s.end_ms, t),
                    n_events = s.n_events + 1,
                    total_value = s.total_value + e.value))
                case Some(s) if t < s.start_ms - gapMs =>
                  // late event more than gapMs BEFORE the open session:
                  // its own (already-closed) session. Best-effort: equally
                  // late neighbors that would merge with it are emitted
                  // separately — matching them would need a session buffer.
                  closed += Session(userId, t, t, 1, e.value)
                case Some(s) =>
                  closed += s
                  open = Some(Session(userId, t, t, 1, e.value))
                case None =>
                  open = Some(Session(userId, t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** [[sessionize]]'s EXACT-ARITHMETIC sibling for the declared parity
    * gate ([[graft.queries.StreamingOps]] `stream_timeout_parity`):
    * identical state machine — a session closes when a newer same-user
    * event arrives more than gapMs later (emitted on that event's
    * batch) or when the EVENT-TIME TIMEOUT fires (watermark passes
    * end + gap with no newer events; the session is emitted from the
    * hasTimedOut branch and the state removed). Values are summed as
    * floor(v·100 + 0.5) integer cents and boundaries kept in epoch ms
    * (Timestamp.getTime truncates µs → ms; the oracle replays the
    * same truncation via epoch_ms), so every emitted row is
    * bit-replayable by a batch engine. Why flatMapGroupsWithState and
    * not session_window: the timeout EMISSION path is the part the
    * built-in operator hides — this is the sessionizer-with-expiry
    * shape (emit a user's session when they go quiet, not when the
    * window operator feels like flushing) every production stream
    * eventually needs, with state bounded by the watermark horizon at
    * 100 TB/day. */
  def sessionizeCents(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[SessionCents] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionCents, SessionCents](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionCents]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[SessionCents]
            sorted.foreach { e =>
              val t = e.ts.getTime
              val cents = math.floor(e.value * 100 + 0.5).toLong
              open match {
                case Some(s) if t - s.e_ms <= gapMs =>
                  // time-ordered arrival: t >= s.e_ms always, so the
                  // one live question is extend-vs-close
                  open = Some(s.copy(e_ms = math.max(s.e_ms, t),
                    n_events = s.n_events + 1, cents = s.cents + cents))
                case Some(s) =>
                  closed += s
                  open = Some(SessionCents(userId, t, t, 1L, cents))
                case None =>
                  open = Some(SessionCents(userId, t, t, 1L, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.e_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Per-user exact inter-event statistics via mapGroupsWithState —
    * the buffered-custom-state pattern (exact max inter-event gap
    * needs the user's full ordered timeline, which no built-in
    * streaming aggregate provides, and which must stay correct under
    * ARBITRARY cross-batch arrival order — the parity fixture
    * deliberately interleaves event_id mod chunks). State per user =
    * the sorted micro-timestamp buffer + the cents total, bounded by
    * that user's event count; a production deployment bounds it
    * further with a watermark timeout that flushes closed users. Each
    * update re-emits the user's current (n, total, max_gap) — Update
    * output mode, so the final emission per user is the finite-stream
    * fixpoint. */
  def userGapStats(events: Dataset[Event]): Dataset[UserGap] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[GapState, UserGap](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[GapState]) =>
          val prev = state.getOption.getOrElse(GapState(Vector.empty, 0L))
          var cents = prev.cents
          val add = Vector.newBuilder[Long]
          batch.foreach { e =>
            add += e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            cents += math.floor(e.value * 100 + 0.5).toLong
          }
          val tss = (prev.tss ++ add.result()).sorted
          state.update(GapState(tss, cents))
          val maxGap =
            if (tss.length < 2) 0L
            else tss.sliding(2).map(p => p(1) - p(0)).max
          UserGap(userId, tss.length.toLong, cents, maxGap)
      }
  }
}

/** One closed (or timed-out) user session in exact units: epoch-ms
  * boundaries, integer-cent value total. */
final case class SessionCents(
    user_id: Long,
    s_ms: Long,
    e_ms: Long,
    n_events: Long,
    cents: Long)

/** mapGroupsWithState state for userGapStats: the user's sorted
  * event-time buffer (micros) and exact cents total. */
final case class GapState(tss: Vector[Long], cents: Long)

/** One per-user emission of userGapStats. */
final case class UserGap(
    user_id: Long,
    n_events: Long,
    total_cents: Long,
    max_gap_us: Long)

/** One per-user emission of [[RunningTotalsProcessor]]: the user's
  * cumulative event count and exact cents total so far. */
final case class UserTotals(
    user_id: Long,
    n_events: Long,
    total_cents: Long)

/** Per-user running totals via `transformWithState` — the state-v2
  * arbitrary-state API (Spark 4's successor to mapGroupsWithState:
  * named state variables created against a StatefulProcessorHandle,
  * RocksDB-backed, with per-variable TTL). The state here is ONE
  * ValueState[(n, cents)] per user — constant-size, merged
  * commutatively with each batch's partial sums, so arrival order
  * across micro-batches is irrelevant and the finite-stream fixpoint
  * per user is exactly the batch group-by. Every update re-emits the
  * user's cumulative row (Update output mode); emissions are monotone
  * in n_events, so max-n-per-user selects the fixpoint. Exact integer
  * cents only. At 100 TB state is hash-partitioned by user across the
  * cluster's RocksDB stores and each micro-batch touches only the
  * keys it carries — the same bound as the built-in aggregate, with
  * arbitrary user logic. */
final class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
  @transient private var totals:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserTotals] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e =>
      n += 1
      cents += math.floor(e.value * 100 + 0.5).toLong
    }
    val (pn, pc) = if (totals.exists()) totals.get() else (0L, 0L)
    val next = (pn + n, pc + cents)
    totals.update(next)
    Iterator.single(UserTotals(key, next._1, next._2))
  }
}

/** [[RunningTotalsProcessor]] with BATCH-BOOTSTRAPPED state — the
  * lambda-architecture seam done right: a batch job computes each
  * user's historical (n, cents) once, hands it to the streaming query
  * as `transformWithState`'s initialState, and the stream continues
  * the running totals over the tail only. `handleInitialState` runs
  * exactly once per key BEFORE any input row and does not emit (the
  * contract: bootstrap is state, not output — a key surfaces only when
  * the tail touches it), so every emission for a bootstrapped user
  * already includes history. At 100 TB this replaces replaying months
  * of history through the stream with one batch aggregate. */
final class RunningTotalsWithInit
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, Event, UserTotals, (Long, Long)] {
  @transient private var totals:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInitialState(key: Long, initialState: (Long, Long),
      timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
    totals.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserTotals] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e =>
      n += 1
      cents += math.floor(e.value * 100 + 0.5).toLong
    }
    val (pn, pc) = if (totals.exists()) totals.get() else (0L, 0L)
    val next = (pn + n, pc + cents)
    totals.update(next)
    Iterator.single(UserTotals(key, next._1, next._2))
  }
}

/** One per-user emission of [[RunningTotalsProcessorV2]] — the EVOLVED
  * output row: [[UserTotals]] plus a derived integer-mean column. The
  * state backing it is UNCHANGED ((n, cents) ValueState), so a
  * checkpoint written by [[RunningTotalsProcessor]] restores under V2
  * verbatim — output-schema evolution is the supported restart change
  * (state-schema change is the unsupported one, see
  * [[RunningTotalsBadState]]). */
final case class UserTotalsV2(
    user_id: Long,
    n_events: Long,
    total_cents: Long,
    cents_per_event: Long)

/** The EVOLVED [[RunningTotalsProcessor]]: identical state variable
  * (same name, same (Long, Long) encoder — the checkpoint's state
  * schema must match exactly for the restart to resume), evolved
  * OUTPUT (adds floor(cents / n) as cents_per_event). This is the
  * query-evolution contract a long-lived production stream exercises
  * constantly: fix a bug / add a derived column in the emission logic,
  * restart from the same checkpoint, keep the accumulated state. */
final class RunningTotalsProcessorV2
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotalsV2] {
  @transient private var totals:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserTotalsV2] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e =>
      n += 1
      cents += math.floor(e.value * 100 + 0.5).toLong
    }
    val (pn, pc) = if (totals.exists()) totals.get() else (0L, 0L)
    val next = (pn + n, pc + cents)
    totals.update(next)
    Iterator.single(UserTotalsV2(key, next._1, next._2,
      next._2 / next._1))
  }
}

/** The UNSUPPORTED evolution, kept deliberately: same state variable
  * NAME ("totals") but a WIDENED value encoder ((Long, Long, Long) vs
  * the checkpoint's (Long, Long)). Restarting a checkpoint written by
  * [[RunningTotalsProcessor]] with this processor must fail LOUDLY at
  * the state-schema compatibility check (default UnsafeRow state
  * encoding is strict) — never silently reinterpret persisted state
  * bytes. Round13OpsSuite pins that failure mode; this class exists
  * only for that spec. */
final class RunningTotalsBadState
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
  @transient private var totals:
    org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long, Long)]("totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserTotals] = {
    var n = 0L
    var cents = 0L
    rows.foreach { e =>
      n += 1
      cents += math.floor(e.value * 100 + 0.5).toLong
    }
    val (pn, pc, _) = if (totals.exists()) totals.get() else (0L, 0L, 0L)
    val next = (pn + n, pc + cents, 0L)
    totals.update(next)
    Iterator.single(UserTotals(key, next._1, next._2))
  }
}
