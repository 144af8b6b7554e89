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
      q: Double, outCol: String): DataFrame =
    exactMulti(df, groupCol, valueCol, Seq(q -> outCol))

  /** Multi-quantile form: ONE range shuffle + rank pass serves every
    * requested quantile (ship_latency's p50+p90 halved its wall time
    * moving off two exact() calls). Same interpolation contract. */
  def exactMulti(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    require(qs.nonEmpty && qs.forall(t => t._1 >= 0.0 && t._1 <= 1.0),
      s"quantiles ${qs.map(_._1)} outside [0, 1]")
    val ranked = DistributedNtile.withGlobalRank(
      df.select(col(groupCol), col(valueCol).cast("double").as(valueCol)),
      Seq(col(groupCol), col(valueCol)), reuse = true)
    // group extents in the global order — one small row per group
    var stats = ranked.groupBy(groupCol)
      .agg(min("global_rank").as("start"), count(lit(1)).as("n"))
    qs.zipWithIndex.foreach { case ((q, _), i) =>
      stats = stats.withColumn(s"pos_$i", (col("n") - 1) * lit(q))
        .withColumn(s"lo_$i", floor(col(s"pos_$i")).cast("long"))
        .withColumn(s"hi_$i", ceil(col(s"pos_$i")).cast("long"))
    }
    val boundary = qs.indices
      .map(i => col("lr") === col(s"lo_$i") || col("lr") === col(s"hi_$i"))
      .reduce(_ || _)
    val joined = ranked.join(broadcast(stats), groupCol)
      .withColumn("lr", col("global_rank") - col("start")) // 0-based local
      .filter(boundary)
    // lo == hi (integer position) yields ONE row matching both arms;
    // min() collapses it into both vlo and vhi
    val aggs = qs.indices.flatMap { i =>
      Seq(min(col(s"pos_$i")).as(s"posv_$i"),
        min(col(s"lo_$i")).as(s"lov_$i"),
        min(when(col("lr") === col(s"lo_$i"), col(valueCol))).as(s"vlo_$i"),
        min(when(col("lr") === col(s"hi_$i"), col(valueCol))).as(s"vhi_$i"))
    }
    joined.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: qs.zipWithIndex.map { case ((_, name), i) =>
        (col(s"vlo_$i") + (col(s"posv_$i") - col(s"lov_$i"))
          * (col(s"vhi_$i") - col(s"vlo_$i"))).as(name)
      }: _*)
  }
}
