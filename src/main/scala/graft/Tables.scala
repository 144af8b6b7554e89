package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (driver parquet, see TESTDATA.md / FIXTURES.md).
  *
  * All query entry points receive `(spark, sfDir)` and load tables through
  * here, so the scan always goes through the vectorized parquet reader with
  * Catalyst column pruning / predicate pushdown intact (never cached
  * globally — the driver calls with different sf dirs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` arrived as parquet TIMESTAMP(NANOS) through round 6
    * (read via spark.sql.legacy.parquet.nanosAsLong + truncating
    * division — exactly DuckDB's ns→µs behavior) and as TIMESTAMP(µs,
    * isAdjustedToUTC=false) from round 7. Sessions set
    * spark.sql.parquet.inferTimestampNTZ.enabled=false so the µs form
    * reads as plain TimestampType under the UTC session zone (NTZ would
    * break unix_micros/window call sites); both fixture vintages load
    * to identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
