package graft.streaming

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Config-backed gate for the 100 TB/day streaming claim: the state
  * store must run on RocksDB (off-heap, incremental-checkpoint — the
  * provider a production cluster uses so state size is bounded by disk,
  * not executor heap) and watermark eviction must actually DELETE state
  * rows, not just stop emitting them. Schema-level watermarks alone
  * don't prove either; this pins both via the provider conf and the
  * per-operator state metrics. */
class RocksDBStateSuite extends SparkSpec {

  private def at(min: Int): Timestamp =
    new Timestamp(1704067200000L + min * 60000L)

  test("windowed agg on RocksDB provider: state rows evicted by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = StreamOps.tumblingCounts(in.toDF(), "10 minutes", "10 minutes")
        .writeStream.format("memory").queryName("rocksdb_state_sink")
        .outputMode("append").start()
      try {
        // minutes 0-40: four 10-minute windows of state
        in.addData((0 until 40 by 3).map(m =>
          Event(m.toLong, at(m), m.toLong % 3, "click", 1.0)): _*)
        q.processAllAvailable()
        val afterFill = q.lastProgress.stateOperators(0).numRowsTotal
        assert(afterFill > 0, "windowed state must exist before eviction")
        // jump the watermark far ahead: every earlier window closes and
        // its state rows must be REMOVED from the store
        in.addData(Event(999L, at(300), 1L, "click", 1.0))
        q.processAllAvailable()
        in.addData(Event(1000L, at(301), 1L, "click", 1.0))
        q.processAllAvailable()
        val afterEvict = q.lastProgress.stateOperators(0).numRowsTotal
        assert(afterEvict < afterFill,
          s"watermark must shrink state ($afterFill -> $afterEvict)")
        // only the still-open tail windows may remain (2 windows x <=
        // cluster-of-users rows; generous bound that fails on any leak)
        assert(afterEvict <= 4,
          s"state after eviction should be the open tail, got $afterEvict")
        // the provider actually in use is RocksDB (metrics namespace is
        // provider-specific — a HDFS-backed store reports none of these)
        val metrics = q.lastProgress.stateOperators(0).customMetrics
        assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
          s"expected rocksdb custom metrics, got ${metrics.keySet}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("dropDuplicatesWithinWatermark state stays bounded under replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = StreamOps.dedupWithinWatermark(in.toDF(), "10 minutes")
        .writeStream.format("memory").queryName("rocksdb_dedup_sink")
        .outputMode("append").start()
      try {
        // same ids re-delivered across batches: dedup state accumulates
        in.addData((0 until 30).map(i =>
          Event(i.toLong, at(i), 1L, "click", 1.0)): _*)
        q.processAllAvailable()
        in.addData((0 until 30).map(i =>
          Event(i.toLong, at(i), 1L, "click", 1.0)): _*)
        q.processAllAvailable()
        val peak = q.lastProgress.stateOperators(0).numRowsTotal
        // advance event time far past the watermark horizon twice (the
        // store purges expired keys on the NEXT commit after the
        // watermark moves)
        in.addData(Event(500L, at(500), 1L, "click", 1.0))
        q.processAllAvailable()
        in.addData(Event(501L, at(501), 1L, "click", 1.0))
        q.processAllAvailable()
        val afterPurge = q.lastProgress.stateOperators(0).numRowsTotal
        assert(afterPurge < peak && afterPurge <= 3,
          s"expired dedup keys must purge: peak $peak, after $afterPurge")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
