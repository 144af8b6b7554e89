package graft.mapreduce

/** The reference's user-facing MapReduce API, re-expressed as a Scala
  * trait (SURVEY.md §2.A S3/S6).
  *
  * Mirrors `/root/reference/external/include/mr_task_factory.h:20-21,37`:
  * a mapper receives one input line and emits 0..N (key, value) string
  * pairs; a reducer receives one key with all its values and emits 0..N
  * pairs. Values arrive in NO deterministic order (the reference
  * concatenates intermediate files in map-completion order,
  * `src/master.h:143-166`) — reducers must be value-order-insensitive.
  */
trait MapReduceJob extends Serializable {
  def map(line: String): Iterator[(String, String)]
  def reduce(key: String, values: Iterator[String]): Iterator[(String, String)]
}

/** Job spec mirroring the reference's `MapReduceSpec`
  * (`/root/reference/src/mapreduce_spec.h:13-21`), with cluster-shape
  * fields (worker count/addresses) dropped — Spark's scheduler owns
  * those. `mapKilobytes` maps to `spark.sql.files.maxPartitionBytes`
  * (same greedy byte-budget, newline-aligned splitting semantics,
  * `src/file_shard.h:43-89`); `nOutputFiles` is the reduce-side hash
  * fanout R (`src/mapreduce_spec.h:54-56`).
  */
final case class MapReduceSpec(
    inputFiles: Seq[String],
    outputDir: String,
    nOutputFiles: Int = 8,
    mapKilobytes: Long = 500,
    userId: String = "wordcount")

/** Name → job registry (SURVEY.md §2.A S9), the reference's only
  * extension point: UDF code ships ahead of time and is selected by
  * `user_id` at run time (`/root/reference/src/mr_task_factory.cc:74-88`,
  * resolved at `src/worker.h:167,179`).
  */
object JobRegistry {
  private val jobs = scala.collection.concurrent.TrieMap[String, MapReduceJob]()

  def register(userId: String, job: MapReduceJob): Unit = jobs.put(userId, job)

  def get(userId: String): MapReduceJob =
    jobs.getOrElse(userId,
      throw new NoSuchElementException(
        s"no MapReduceJob registered for user_id '$userId' " +
          s"(registered: ${jobs.keys.toSeq.sorted.mkString(", ")})"))

  def registered: Seq[String] = jobs.keys.toSeq.sorted

  // Built-ins, mirroring the reference's static registration-before-main
  // (`/root/reference/test/user_tasks.cc:58`).
  register("wordcount", WordCountJob)
  register("identity", IdentityJob)
  register("inverted_index", InvertedIndexJob)
}
