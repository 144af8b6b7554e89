package graft.mapreduce

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** Fidelity on the reference's OWN demo corpus
  * (`/root/reference/test/input/testdata_{1,2}.txt` — the files
  * `test/config.ini:3` feeds the word-count demo): the Spark MapReduce
  * path must reproduce a naive strtok-count of the same bytes. */
class RefCorpusSuite extends SparkSpec {

  private val refInputs = Seq(
    "/root/reference/test/input/testdata_1.txt",
    "/root/reference/test/input/testdata_2.txt")

  private def naive(): Map[String, Int] =
    refInputs.flatMap { f =>
      Files.readAllLines(Paths.get(f)).asScala
        .flatMap(_.split("[ ,.'\"]")).filter(_.nonEmpty)
    }.groupBy(identity).map { case (k, v) => k -> v.size }

  test("word count over the reference demo corpus matches a naive count") {
    assume(refInputs.forall(f => Files.exists(Paths.get(f))),
      "reference corpus not present")
    val dir = tmpDir("refwc")
    val out = dir.resolve("out")
    MapReduceRunner.run(spark, MapReduceSpec(
      inputFiles = refInputs,
      outputDir = out.toString,
      nOutputFiles = 8,      // the demo's n_output_files (config.ini:5)
      mapKilobytes = 500,    // the demo's map_kilobytes (config.ini:6)
      userId = "wordcount"))
    val got = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .map { l => val i = l.indexOf(','); l.substring(0, i) -> l.substring(i + 1).toInt }
      .toMap
    val expected = naive()
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("S7 sink is byte-exact: separator newlines only, no trailing byte") {
    assume(refInputs.forall(f => Files.exists(Paths.get(f))),
      "reference corpus not present")
    import org.apache.spark.sql.functions.spark_partition_id
    val r = 8
    val spark0 = spark
    import spark0.implicits._
    val lines = spark.read.textFile(refInputs: _*)
    val kv = MapReduceRunner.transform(lines, WordCountJob, r)
    // golden bytes per bucket, built with the reference's emit loop
    // ('\n' BEFORE every line but the first — mr_tasks.h:161-174) from
    // the observed bucket assignment: this pins the SINK's byte
    // discipline regardless of which hash assigned the bucket (the
    // documented murmur3-vs-x131 deviation). Word count emits unique
    // keys per bucket, so the two executions order identically.
    val perBucket = kv.toDF("key", "value")
      .withColumn("pid", spark_partition_id())
      .as[(String, String, Int)].collect()
      .groupBy(_._3).view.mapValues(_.map(t => s"${t._1},${t._2}")).toMap
    val out = tmpDir("refbytes").resolve("out")
    MapReduceRunner.writeSink(kv, out.toString)
    (0 until r).foreach { pid =>
      val f = out.resolve(f"part-$pid%05d")
      assert(Files.exists(f), s"bucket $pid file must exist even if empty")
      val golden = perBucket.getOrElse(pid, Array.empty[String])
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val got = Files.readAllBytes(f)
      assert(java.util.Arrays.equals(got, golden),
        s"bucket $pid bytes differ (got ${got.length}B, want ${golden.length}B)")
      if (golden.nonEmpty)
        assert(got.last != '\n'.toByte, "reference omits the final newline")
    }
  }

  test("S7 sink: empty buckets produce empty files (ref opens all streams)") {
    val spark0 = spark
    import spark0.implicits._
    val kv = MapReduceRunner.transform(
      spark.createDataset(Seq("solo solo solo")), WordCountJob, 4)
    val out = tmpDir("emptybkt").resolve("out")
    MapReduceRunner.writeSink(kv, out.toString)
    val files = (0 until 4).map(i => out.resolve(f"part-$i%05d"))
    assert(files.forall(Files.exists(_)))
    val sizes = files.map(Files.size(_))
    assert(sizes.count(_ == 0L) === 3, s"three empty buckets, got $sizes")
    assert(sizes.count(_ > 0L) === 1)
    val content = new String(Files.readAllBytes(files(sizes.indexWhere(_ > 0))),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(content === "solo,3")
  }
}
