package graft.mapreduce

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Specs for the MapReduce-parity core (SURVEY.md §2.A S1-S9), checking
  * the contracts the reference establishes:
  *   - word count ≡ naive in-memory count (S8, property-tested);
  *   - sink: R files, keys ascending byte-order within each file, raw
  *     `key,value` lines, values may contain commas (S4/S5/S7);
  *   - registry resolution by user_id (S9).
  */
class MapReduceSuite extends SparkSpec {

  private def naiveWordCount(lines: Seq[String]): Map[String, Int] =
    lines.flatMap(_.split("[ ,.'\"]")).filter(_.nonEmpty)
      .groupBy(identity).map { case (k, v) => k -> v.size }

  private def runWordCount(lines: Seq[String], r: Int = 4): Map[String, Int] = {
    import spark.implicits._
    MapReduceRunner.transform(spark.createDataset(lines), WordCountJob, r)
      .collect().map { case (k, v) => k -> v.toInt }.toMap
  }

  test("S8: word count matches naive count on demo-shaped text") {
    val lines = Seq(
      "dairy respect gazing Savannah.nanoseconds",
      "the quick, brown \"fox\" jumps. over the 'lazy' dog",
      "",
      "   ",
      "the the the",
      "comma,separated,words here")
    assert(runWordCount(lines) === naiveWordCount(lines))
  }

  test("S8: tokenizer is strtok-faithful (delims ` ,.\"'`, empties dropped, case kept)") {
    val pairs = WordCountJob.map("A.a,'b\" c  d..").toSeq
    assert(pairs === Seq("A" -> "1", "a" -> "1", "b" -> "1", "c" -> "1", "d" -> "1"))
    assert(WordCountJob.map("").isEmpty)
    assert(WordCountJob.map(" ,.'\"").isEmpty)
  }

  test("property: word count ≡ naive count on generated word soup") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val sep = Gen.oneOf(" ", ", ", ". ", "  ", "' ", "\" ")
    val line = for {
      ws <- Gen.listOf(word); ss <- Gen.listOfN(ws.size, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    val linesGen = Gen.listOfN(20, line)
    (0 until 10).foreach { i =>
      val lines = linesGen(Gen.Parameters.default, Seed(42L + i)).get
      assert(runWordCount(lines, r = 3) === naiveWordCount(lines))
    }
  }

  test("S4/S5/S7: sink writes R key-sorted files; equal keys co-locate") {
    import spark.implicits._
    val r = 4
    val lines = (0 until 500).map(i => s"k${i % 37} v$i")
    val out = tmpDir("sink").resolve("wc_out")
    val kv = MapReduceRunner.transform(
      spark.createDataset(lines),
      new MapReduceJob {
        def map(l: String): Iterator[(String, String)] = {
          val Array(k, v) = l.split(" ", 2); Iterator.single((k, v))
        }
        def reduce(k: String, vs: Iterator[String]): Iterator[(String, String)] =
          vs.map((k, _))
      }, r)
    MapReduceRunner.writeSink(kv, out.toString)

    val files = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
    assert(files.size === r, "one output file per reduce bucket")

    val keyToFile = scala.collection.mutable.Map[String, Int]()
    files.zipWithIndex.foreach { case (f, idx) =>
      val keys = Files.readAllLines(f).asScala.map(_.takeWhile(_ != ','))
      // keys ascending in byte order within each file (ref worker.h:108-117)
      assert(keys === keys.sorted, s"file $f not key-sorted")
      keys.foreach { k =>
        assert(keyToFile.getOrElse(k, idx) === idx, s"key $k split across files")
        keyToFile(k) = idx
      }
    }
    assert(keyToFile.keySet === (0 until 37).map(i => s"k$i").toSet)
  }

  test("S7: values containing commas survive the first-comma-split contract") {
    import spark.implicits._
    val lines = Seq("alpha,one,two", "beta,x", "alpha,three,four")
    val out = MapReduceRunner.transform(
      spark.createDataset(lines), IdentityJob, 2).collect().toSet
    assert(out === Set("alpha" -> "one,two", "beta" -> "x", "alpha" -> "three,four"))
  }

  test("S9: registry resolves by user_id; unknown id names the known ones") {
    assert(JobRegistry.get("wordcount") eq WordCountJob)
    assert(JobRegistry.get("identity") eq IdentityJob)
    val e = intercept[NoSuchElementException](JobRegistry.get("nope"))
    assert(e.getMessage.contains("wordcount"))
  }

  test("S1/S2: full run from text files via MapReduceSpec (ref demo shape)") {
    val dir = tmpDir("mrjob")
    val in1 = dir.resolve("in1.txt")
    val in2 = dir.resolve("in2.txt")
    Files.writeString(in1, "apple banana apple\ncherry\n")
    Files.writeString(in2, "banana banana date\n")
    val out = dir.resolve("out")
    MapReduceRunner.run(spark, MapReduceSpec(
      inputFiles = Seq(in1.toString, in2.toString),
      outputDir = out.toString,
      nOutputFiles = 3,
      mapKilobytes = 500,
      userId = "wordcount"))
    val got = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .map { l => val i = l.indexOf(','); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
    assert(got === Map("apple" -> "2", "banana" -> "3", "cherry" -> "1", "date" -> "1"))
  }

  test("inverted index job: token → sorted distinct doc list") {
    import spark.implicits._
    val lines = Seq("d1\tapple banana", "d2\tbanana cherry", "d3\tapple banana")
    val got = MapReduceRunner.transform(
      spark.createDataset(lines), InvertedIndexJob, 2).collect().toMap
    assert(got === Map(
      "apple" -> "d1 d3", "banana" -> "d1 d2 d3", "cherry" -> "d2"))
  }

  test("groupSorted streams consecutive runs of a sorted iterator") {
    val it = Iterator("a" -> "1", "a" -> "2", "b" -> "3", "c" -> "4", "c" -> "5")
    val groups = MapReduceRunner.groupSorted(it)
      .map { case (k, vs) => k -> vs.toList }.toList
    assert(groups === List("a" -> List("1", "2"), "b" -> List("3"),
      "c" -> List("4", "5")))
  }
}
