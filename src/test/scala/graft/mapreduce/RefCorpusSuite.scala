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
}
