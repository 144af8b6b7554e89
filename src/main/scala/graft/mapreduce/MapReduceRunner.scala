package graft.mapreduce

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Spark-native execution of the reference's two-phase job
  * (SURVEY.md §3): scan → user flatMap → hash shuffle on key →
  * key-sorted streaming reduce → key-sorted `key,value` text sink.
  *
  * Stage map (reference → here):
  *   - S1/S2 sharded text scan (`/root/reference/src/worker.h:69-79`,
  *     `src/file_shard.h:43-89`) → `spark.read.textFile` with
  *     `spark.sql.files.maxPartitionBytes` = mapKilobytes (same greedy
  *     byte-budget + newline-aligned split + small-file packing).
  *   - S3 user map → `Dataset.flatMap(job.map)`.
  *   - S4 hash(key) % R partitioned emit (`src/mr_tasks.h:24-32,45-76`)
  *     → `repartition(R, $"key")` (Murmur3 instead of the ×131
  *     polynomial — equal keys still co-locate, which is the contract).
  *   - S5 sorted group-by-key (`src/worker.h:81-119`, in-memory std::map)
  *     → `sortWithinPartitions($"key")` + streaming consecutive-key
  *     grouping: strictly stronger (sort-based, spillable, one group in
  *     memory at a time vs the reference's whole-bucket map).
  *   - S6 user reduce → applied per sorted group.
  *   - S7 sink (`src/mr_tasks.h:123-174`): R text files of `key,value`
  *     lines (raw bytes, no quoting — values MAY contain commas,
  *     `src/worker.h:92-94`), keys ascending in byte order within each
  *     file. BYTE-EXACT, including the reference's newline discipline:
  *     '\n' is written BEFORE every line except the first
  *     (`src/mr_tasks.h:161-174`), so the final line is unterminated
  *     and an empty bucket is an empty file — Spark's own text sink
  *     terminates every line, hence the direct FileSystem writer.
  *
  * At scale: one shuffle total (the repartition). Map-side combining is
  * intentionally NOT injected — the reference never combines
  * (`src/mr_tasks.h:113-115`) and a general reducer need not be
  * associative; jobs wanting combining express it relationally
  * (cf. TextOps.wcWords, which Catalyst gives partial aggregation).
  */
object MapReduceRunner {

  /** Full job from a spec: read text files, run, write the sink. */
  def run(spark: SparkSession, spec: MapReduceSpec): Unit = {
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", spec.mapKilobytes * 1024L)
    try {
      val lines = spark.read.textFile(spec.inputFiles: _*)
      val reduced = transform(lines, JobRegistry.get(spec.userId), spec.nOutputFiles)
      writeSink(reduced, spec.outputDir)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        spark.conf.set("spark.sql.files.maxPartitionBytes", _))
    }
  }

  /** The core dataflow on any line source (text files, a parquet string
    * column, a test fixture): flatMap → shuffle → sorted reduce.
    * Returns the reduce output; partition i holds bucket hash(key)%R,
    * rows ordered by ascending input key within each partition. */
  def transform(
      lines: Dataset[String],
      job: MapReduceJob,
      r: Int): Dataset[(String, String)] = {
    import lines.sparkSession.implicits._
    val shuffled = lines
      .flatMap(job.map(_))                       // S3
      .toDF("key", "value")
      .repartition(r, col("key"))                // S4
      .sortWithinPartitions("key")               // S5 (sort half)
      .as[(String, String)]
    shuffled.mapPartitions { it =>               // S5 (group half) + S6
      groupSorted(it).flatMap { case (k, vs) => job.reduce(k, vs) }
    }
  }

  /** Group consecutive equal keys of a key-sorted iterator. One group's
    * values are buffered at a time (the reference buffers the whole
    * bucket, `/root/reference/src/worker.h:83`). */
  private[mapreduce] def groupSorted(
      it: Iterator[(String, String)]): Iterator[(String, Iterator[String])] = {
    val b = it.buffered
    new Iterator[(String, Iterator[String])] {
      override def hasNext: Boolean = b.hasNext
      override def next(): (String, Iterator[String]) = {
        val k = b.head._1
        val buf = Vector.newBuilder[String]
        while (b.hasNext && b.head._1 == k) buf += b.next()._2
        (k, buf.result().iterator)
      }
    }
  }

  /** Java-serializable Hadoop Configuration carrier (Spark's own
    * SerializableConfiguration is private[spark]). */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** S7: R text files of raw `key,value` lines (no quoting/escaping),
    * byte-identical to the reference's emit loop: separator-newlines
    * only (no trailing '\n'), one `part-NNNNN` file per reduce bucket,
    * empty buckets → empty files (the reference opens every ofstream up
    * front). Writes through the Hadoop FileSystem API executor-side
    * using the SESSION's Hadoop configuration (broadcast to tasks), so
    * spark.hadoop.* settings — defaultFS, object-store credentials —
    * apply on a real cluster. Each attempt writes to an attempt-unique
    * temp file and renames into place on success: concurrent
    * speculative attempts never interleave writes on one stream, and a
    * failed attempt leaves no truncated part file behind. Attempts of
    * one partition produce identical bytes (input is sorted and
    * deterministic), so whichever rename lands last/first is correct. */
  def writeSink(reduced: Dataset[(String, String)], outputDir: String): Unit = {
    val rdd = reduced.rdd
    val sc = rdd.sparkContext
    val confB = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    sc.runJob(rdd, (ctx: org.apache.spark.TaskContext,
        it: Iterator[(String, String)]) => {
      val path = new org.apache.hadoop.fs.Path(
        outputDir, f"part-${ctx.partitionId}%05d")
      val tmp = new org.apache.hadoop.fs.Path(
        outputDir,
        f".part-${ctx.partitionId}%05d.attempt-${ctx.taskAttemptId()}%d.tmp")
      val fs = path.getFileSystem(confB.value.value)
      val out = fs.create(tmp, true)
      var committed = false
      try {
        var first = true
        it.foreach { case (k, v) =>
          if (!first) out.write('\n')
          out.write(s"$k,$v".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          first = false
        }
        out.close()
        // commit: rename into place. If another (speculative) attempt
        // already committed, its bytes are identical — drop ours.
        if (fs.exists(path)) fs.delete(tmp, false)
        else if (!fs.rename(tmp, path)) {
          if (fs.exists(path)) fs.delete(tmp, false)
          else throw new java.io.IOException(s"cannot commit $tmp -> $path")
        }
        committed = true
      } finally {
        if (!committed) { out.close(); fs.delete(tmp, false); () }
      }
    })
  }

  /** Relational view of a job's output (for oracle-checked queries). */
  def toDataFrame(
      lines: Dataset[String],
      job: MapReduceJob,
      r: Int): DataFrame =
    transform(lines, job, r).toDF("key", "value")
}
