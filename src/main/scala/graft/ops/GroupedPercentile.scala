package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentile WITHOUT buffering any group
  * in memory — the scale path beside the builtin `percentile` UDA
  * (q53), whose final aggregate materializes each group's full value
  * array in one task (at sf0.1 that is 3 tasks of ~200k doubles;
  * against a 100 TB fact table a single group can be billions of rows
  * and the buffering form OOMs by construction).
  *
  * Mechanics: one range shuffle on (group, value) gives globally
  * ordered contiguous partitions ([[DistributedNtile.withGlobalRank]],
  * rank job reuses the shuffle output); each group then occupies one
  * contiguous rank interval `[start, start+n)`. A tiny per-group
  * aggregate (start, n) → the SQL-standard interpolation positions
  * `lo/hi = ⌊/⌈(n-1)·q⌋/⌉` → broadcast back and keep the ≤2 boundary
  * rows per group → interpolate. No task ever holds more than its
  * range slice; parallelism is data-sized, not group-count-sized.
  *
  * Interpolation is `v_lo + (pos - lo) · (v_hi - v_lo)` — the exact
  * formula (and float association) of Spark's `percentile` and
  * DuckDB's `quantile_cont`, so the result stays on the
  * rows+schema+hash oracle gate.
  */
object GroupedPercentile {

  /** One row per group: (groupCol, outCol = exact interpolated
    * q-quantile of valueCol). valueCol must be numeric (cast to double
    * here); rank ties between equal values are broken arbitrarily but
    * harmlessly (equal values interpolate to the same result). */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      q: Double, outCol: String): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]")
    val ranked = DistributedNtile.withGlobalRank(
      df.select(col(groupCol), col(valueCol).cast("double").as(valueCol)),
      Seq(col(groupCol), col(valueCol)))
    // group extents in the global order — one small row per group
    val stats = ranked.groupBy(groupCol)
      .agg(min("global_rank").as("start"), count(lit(1)).as("n"))
      .withColumn("pos", (col("n") - 1) * lit(q))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    ranked.join(broadcast(stats), groupCol)
      .withColumn("lr", col("global_rank") - col("start")) // 0-based local
      .filter(col("lr") === col("lo") || col("lr") === col("hi"))
      // lo == hi (integer position) yields ONE row matching both arms;
      // min() collapses it into both vlo and vhi
      .groupBy(groupCol)
      .agg(
        min(col("pos")).as("pos"),
        min(col("lo")).as("lo"),
        min(when(col("lr") === col("lo"), col(valueCol))).as("vlo"),
        min(when(col("lr") === col("hi"), col(valueCol))).as("vhi"))
      .select(col(groupCol),
        (col("vlo") + (col("pos") - col("lo")) * (col("vhi") - col("vlo")))
          .as(outCol))
  }
}
