package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column-API access to Spark's native bloom-filter expressions
  * (`bloom_filter_agg` / `might_contain`), which ship in the engine
  * for AQE runtime filters but are not exposed through
  * `org.apache.spark.sql.functions`. Keys are xxhash64-ed on both the
  * build and probe side — the same discipline Spark's own
  * InjectRuntimeFilter uses — so any input type probes the sketch as
  * one codegen'd long, never a per-row Scala call. */
object BloomBridge {

  /** Distributed two-phase bloom build: partial sketches merge
    * executor-side, one serialized ~numBits/8-byte sketch reaches the
    * driver. */
  def bloomFilterAgg(c: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(c)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a built sketch embedded as a literal —
    * foldable bloom side keeps the predicate inside whole-stage
    * codegen. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        GraftColumnBridge.expression(xxhash64(c))))
}
