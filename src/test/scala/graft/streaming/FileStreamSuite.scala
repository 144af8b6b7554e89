package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Integration: the streaming operators over the REAL events fixture via
  * a file stream (readStream.parquet), not just MemoryStream — proving
  * the readStream → transform → writeStream path end-to-end and that
  * streaming window totals equal the batch equivalents. */
class FileStreamSuite extends SparkSpec {

  test("file-streamed tumbling counts equal the batch window aggregation") {
    // Stage the fixture as a stream source dir (one file = one batch).
    val src = tmpDir("fstream").resolve("events_src")
    val batchDf = Tables.events(spark, sfDir)
    batchDf.write.parquet(src.toString)

    val streamed = spark.readStream
      .schema(batchDf.schema)
      .parquet(src.toString)
    // complete-mode aggregation (no watermark) so every window is
    // emitted regardless of where the fixture's event times end
    val agg = streamed
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("fstream_sink")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()

    val fromStream = spark.table("fstream_sink")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val fromBatch = batchDf
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(fromStream === fromBatch)
    assert(fromStream.nonEmpty)
  }

  test("map-only curation features stream unchanged (incl. native exprs)") {
    // The curation feature stages (token stats, hash sampling, sketch
    // signatures) are pure maps, so the same column expressions run in
    // a readStream append pipeline — pinning that the pipeline ops and
    // the custom codegen expressions are streaming-compatible.
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def feats(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_distinct"),
      graft.functions.GraftFunctions.simhashNative(col("text")).as("sh"))
      .filter((col("doc_id") * lit(2654435761L)) % 100 < 30)
    val src = tmpDir("cstream").resolve("docs_src")
    val batchDf = Tables.documents(spark, sfDir)
    batchDf.write.parquet(src.toString)
    val q = feats(spark.readStream.schema(batchDf.schema).parquet(src.toString))
      .writeStream.format("memory").queryName("cstream_sink")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val fromStream = spark.table("cstream_sink").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val fromBatch = feats(batchDf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(fromStream === fromBatch)
    assert(fromStream.nonEmpty)
  }

  test("streaming sketch dedup: duplicate texts collapse on simhash key") {
    // Streaming near-dedup: exact collision on the 64-bit SimHash
    // signature (identical/near-identical texts share it) via
    // dropDuplicates on the sketch column — sketch state instead of
    // full-text state, the scalable streaming-dedup key.
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val src = tmpDir("sdedup").resolve("docs_src")
    val docs = Tables.documents(spark, sfDir).limit(50)
    // duplicate every doc (same text, shifted ids): stream must keep one per text
    docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 100000L, col("text")))
      .write.parquet(src.toString)
    val streamed = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .parquet(src.toString)
      .withColumn("sh", graft.functions.GraftFunctions.simhashNative(col("text")))
      .dropDuplicates("sh")
    val q = streamed.writeStream.format("memory").queryName("sdedup_sink")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val kept = spark.table("sdedup_sink").select("sh").collect().map(_.getLong(0))
    assert(kept.length === kept.distinct.length, "one row per signature")
    val batchSigs = docs
      .select(graft.functions.GraftFunctions.simhashNative(col("text")))
      .distinct().count()
    assert(kept.length === batchSigs)
  }
  test("battery stream scaffold splits the fixture into multiple micro-batches") {
    val dir = graft.queries.StreamingOps.chunkDir(spark, sfDir)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator()
    var parquets = 0
    while (files.hasNext) {
      if (files.next().toString.endsWith(".parquet")) parquets += 1
    }
    assert(parquets === 4, s"expected 4 chunk files in $dir")
    // a stream over the chunk dir with maxFilesPerTrigger=1 must run
    // one micro-batch per file, and their union must be the fixture
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .groupBy().count()
      .writeStream.format("memory").queryName("chunk_probe")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val batches = q.recentProgress.filter(_.numInputRows > 0).length
    assert(batches === 4, s"expected 4 input micro-batches, saw $batches")
    val total = spark.table("chunk_probe").head().getLong(0)
    assert(total === graft.Tables.events(spark, sfDir).count())
  }
  test("watermark parity row pins the lagged-drop / current-evict protocol") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.StreamingOps.streamWatermarkParity.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    // Spark-side replica of the oracle's protocol: drop chunk-k rows
    // whose window end <= max ts over chunks <= k-2 minus the delay;
    // emit windows whose end < global max minus the delay.
    val e = graft.Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"),
        pmod(col("event_id"), lit(4)).as("c"))
    val cm = e.groupBy("c").agg(max("ts").as("mx")).collect()
      .map(r => (r.getLong(0).toInt, r.getTimestamp(1).getTime)).toMap
    val wmDrop = (0 to 3).map { k =>
      val prior = cm.filter(_._1 <= k - 2).values
      k -> (if (prior.isEmpty) Long.MinValue else prior.max - 600000L)
    }.toMap
    val wmFinal = cm.values.max - 600000L
    val naive = e.collect().map { r =>
      val ts = r.getTimestamp(0).getTime
      val wEnd = (ts / 3600000L) * 3600000L + 3600000L
      (wEnd - 3600000L, r.getString(1), r.getLong(2).toInt, wEnd)
    }.filter { case (_, _, c, wEnd) => wEnd > wmDrop(c) && wEnd < wmFinal }
      .groupBy(t => (t._1, t._2)).map { case ((w, t), rows) =>
        (w, t, rows.length.toLong)
      }.toArray.sorted
    assert(got.toSeq === naive.toSeq)
  }
}
