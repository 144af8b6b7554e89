package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global rank and equal-count ntile — the scale-safe
  * replacement for `ntile(n) OVER (ORDER BY ...)`, whose empty
  * partition spec funnels the ENTIRE table through one task (the one
  * scale-killer flagged in round 3's plan audit).
  *
  * Mechanics: `repartitionByRange` on the sort keys gives globally
  * ordered partitions (sampled range boundaries — Spark's standard
  * distributed sort), `sortWithinPartitions` orders within each, and
  * `zipWithIndex` assigns contiguous global indexes: it runs one job to
  * count rows per partition (the range-shuffle output is reused, so the
  * source is not re-scanned), keeps only the PARTITION-COUNT array on
  * the driver, and adds per-row ranks executor-side. No row ever moves
  * to a single task, so this survives 100x where the window form OOMs.
  *
  * The bucket formula is the SQL-standard ntile: with N rows and n
  * buckets, the first N mod n buckets take ceil(N/n) rows — identical
  * to Spark's and DuckDB's `ntile`, which is what lets the q23 oracle
  * stay plain `ntile(4) OVER (ORDER BY ...)`. Determinism requires the
  * sort keys to be a total order (tie rows would otherwise rank
  * arbitrarily, though still consistently within a run).
  */
object DistributedNtile {

  /** Adds `global_rank` (1-based, dense, contiguous) ordered by
    * `sortCols`. One range shuffle + one reused-shuffle rank pass.
    *
    * r13 optimization (guide §4 — keep hot paths in codegen): the
    * original implementation went `sorted.rdd.zipWithIndex()` +
    * `createDataFrame`, boxing every field of every row into external
    * `Row` objects and back, and the RDD boundary hid the range
    * exchange from ReuseExchange (GroupedPercentile reads the ranked
    * relation twice — each read re-ran the whole boxed pipeline). The
    * native form uses `monotonically_increasing_id`, whose documented
    * layout is (partition id << 33) | record-number-in-partition: the
    * low 33 bits ARE the within-partition index, so the global rank is
    * offset(partition) + low-bits + 1 with zero row conversion. The
    * per-partition row counts come from one tiny aggregate job (≤
    * #partitions longs to the driver — the same bounded-traffic class
    * as zipWithIndex's internal count job), and the offsets ride back
    * as a broadcast-joined #partitions-row relation. Rank values are
    * IDENTICAL to the zipWithIndex form (same partition layout, same
    * within-partition order). A partition above 2^33 rows would wrap
    * the record counter — 8.6 G rows in ONE task is far past any sane
    * partition sizing (and the old form's Long index had the same
    * practical bound through its single-partition scan). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      reuse: Boolean = false): DataFrame =
    if (reuse) withGlobalRankReused(df, sortCols)
    else {
      // Single-read/small-input form — the original zipWithIndex path:
      // ONE range shuffle whose files both the internal count job and
      // the rank pass share at the RDD level. The boxed-Row conversion
      // it pays was measured CHEAPER here than either native variant
      // (persist: +0.2s cache-materialization on zipf_fit's ~50k-row
      // vocabulary; no-persist native: the per-partition-counts action
      // re-runs the WHOLE upstream pipeline from the source scan,
      // 0.23 → 0.84s). The reused form below wins only when the ranked
      // relation is fact-sized AND read repeatedly (GroupedPercentile).
      val spark = df.sparkSession
      val sorted = df.repartitionByRange(sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      val schema = df.schema.add("global_rank", LongType, nullable = false)
      val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
        Row.fromSeq(row.toSeq :+ (idx + 1L))
      }
      spark.createDataFrame(ranked, schema)
    }

  /** Multi-read form: whole-stage-codegen rank over a PERSISTED sorted
    * relation — zero Row boxing, and every downstream read shares one
    * materialization (the zipWithIndex form re-ran the in-partition
    * sort and the row boxing on EVERY read; GroupedPercentile reads the
    * ranked relation twice more over a fact-sized input — measured win
    * q114_winsorize 2.34→1.26s, ship_latency 2.24→1.52s, q54 1.39→1.05s).
    * Mechanics: `monotonically_increasing_id`'s documented layout is
    * (partition id << 33) | record-number-in-partition, so the low 33
    * bits ARE the within-partition index; the global rank is
    * offset(partition) + low-bits + 1. Per-partition row counts come
    * from one tiny aggregate job over the persisted relation (≤
    * #partitions longs to the driver), offsets ride back as a
    * broadcast-joined #partitions-row relation. Rank values are
    * IDENTICAL to the zipWithIndex form (same partition layout, same
    * within-partition order). A partition above 2^33 rows would wrap
    * the record counter — 8.6 G rows in ONE task is far past any sane
    * partition sizing. Battery harness (Bench/Verify reset()) clears
    * the persist between queries, the pagerank-adjacency discipline. */
  private def withGlobalRankReused(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val mask = (1L << 33) - 1
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(col("*"), spark_partition_id().as("_gr_pid"),
        monotonically_increasing_id().bitwiseAND(lit(mask)).as("_gr_ridx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one job: rows per partition (≤ #partitions rows to the driver);
    // warms the persist every downstream read shares
    val counts = sorted.groupBy("_gr_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var running = 0L
    val offsetRows = counts.map { case (pid, n) =>
      val r = Row(pid, running); running += n; r
    }
    import scala.jdk.CollectionConverters._
    val offsets = spark.createDataFrame(
      offsetRows.toSeq.asJava,
      new org.apache.spark.sql.types.StructType()
        .add("_gr_pid", org.apache.spark.sql.types.IntegerType, nullable = false)
        .add("_gr_off", LongType, nullable = false))
    sorted.join(broadcast(offsets), "_gr_pid")
      .withColumn("global_rank", col("_gr_off") + col("_gr_ridx") + 1)
      .select(df.columns.map(col).toSeq :+ col("global_rank"): _*)
  }

  /** Adds `bucket` = ntile(n) ordered globally by `sortCols`. The row
    * count N comes from a separate aggregate job (for a parquet-backed
    * relation that is a metadata-only count). */
  def ntile(df: DataFrame, sortCols: Seq[Column], n: Int): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val total = df.count()
    val base = total / n // rows in each small bucket
    val rem = total % n // the first `rem` buckets take base+1 rows
    val big = rem * (base + 1) // rows covered by the big buckets
    // Integer DIV, not Column./ (double division rounds above 2^52 —
    // exactly the rank range a 100 TB table reaches). The base == 0
    // branch (N < n) never reaches the ELSE arm; greatest() just keeps
    // the divisor non-zero.
    val bucket = expr(
      s"""CAST(CASE WHEN global_rank <= ${big}L
         |  THEN (global_rank - 1) DIV ${base + 1}L + 1
         |  ELSE ${rem}L + (global_rank - ${big}L - 1) DIV ${math.max(base, 1)}L + 1
         |END AS INT)""".stripMargin)
    withGlobalRank(df, sortCols)
      .withColumn("bucket", bucket)
      .drop("global_rank")
  }
}
