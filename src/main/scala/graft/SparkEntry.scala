package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationOps, DedupAnn, EvalOps, Extensibility, FeatureOps, GraphOps, IncrOps, MlOps, MrParity, PipelineOps, Q, Relational, SearchOps, StatOps, StreamingOps, TemporalOps, TextOps, TpchLike, TrainingPrep, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * `queries`; SQL-expressible ones also register matching DuckDB SQL in
  * `oracleSql` (the t2 correctness gate). As of round 5 EVERY declared
  * query carries a full oracle — including the ANN pair (±1-hyperplane
  * LSH whose plane literals are re-emitted into the oracle; seeded-
  * medoid IVF with portable integer-hash seeds), real-codec media
  * stats (WAV/BMP/Y4M/PNG formula replicas), and a streaming row
  * (stream_file_parity: file stream run to completion, final windowed
  * aggregate ≡ batch). The sketch halves of q46/q53 (HLL,
  * percentile_approx) are gated ±5%-vs-exact in BatterySuite; trained
  * Lloyd-IVF and LSH recall are gated in AnnSuite.
  */
object SparkEntry {

  /** The full declared battery (relational + text/LLM + vector ops). */
  val battery: Seq[Q] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ MrParity.all ++
      DedupAnn.all ++ PipelineOps.all ++ Extensibility.all ++ TpchLike.all ++
      CurationOps.all ++ TrainingPrep.all ++ StreamingOps.all ++ GraphOps.all ++
      MlOps.all ++ StatOps.all ++ IncrOps.all ++ SearchOps.all ++
      TemporalOps.all ++ EvalOps.all ++ FeatureOps.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    battery.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
