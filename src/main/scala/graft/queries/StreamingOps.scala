package graft.queries

import java.util.concurrent.atomic.AtomicLong

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
    // Stream the RAW fixture file: ts is parquet TIMESTAMP(NANOS),
    // surfaced as LongType under nanosAsLong (same as Tables.events),
    // converted to a µs timestamp by truncating division — identical
    // to DuckDB's ns→µs read of the same file.
    val physical = s.read.parquet(s"$d/events.parquet").schema
    val sink = s"stream_file_parity_sink_${sinkId.incrementAndGet()}"
    // The file-stream source only accepts directories (a production
    // stream tails a landing dir); the fixture is a single parquet
    // FILE, so stage a temp dir holding a symlink to it — zero copy.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    srcDir.toFile.deleteOnExit()
    val link = srcDir.resolve("events.parquet")
    val target = java.nio.file.Paths.get(d, "events.parquet")
    try java.nio.file.Files.createSymbolicLink(link, target)
    catch { case _: UnsupportedOperationException =>
      java.nio.file.Files.copy(target, link); ()
    }
    val streamed = s.readStream.schema(physical).parquet(srcDir.toString)
    val withTs =
      if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
    val q = withTs
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
      .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
        col("n"), col("min_id"), col("max_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
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
    val physical = s.read.parquet(s"$d/events.parquet").schema
    val sink = s"stream_slide_parity_sink_${sinkId.incrementAndGet()}"
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    srcDir.toFile.deleteOnExit()
    val link = srcDir.resolve("events.parquet")
    val target = java.nio.file.Paths.get(d, "events.parquet")
    try java.nio.file.Files.createSymbolicLink(link, target)
    catch { case _: UnsupportedOperationException =>
      java.nio.file.Files.copy(target, link); ()
    }
    val streamed = s.readStream.schema(physical).parquet(srcDir.toString)
    val withTs =
      if (physical("ts").dataType == LongType)
        streamed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else streamed
    val q = withTs
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("w_ms"), col("event_type"),
        col("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink).orderBy("w_ms", "event_type")
  }

  val all: Seq[Q] = Seq(streamFileParity, streamSlideParity)
}
