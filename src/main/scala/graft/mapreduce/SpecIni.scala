package graft.mapreduce

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parser + validator for the reference's `config.ini` job format, so a
  * user of the reference can run their existing config unchanged.
  *
  * Format (`/root/reference/test/config.ini:1-7`, parse logic
  * `src/mapreduce_spec.h:34-67`): `key=value` lines with keys
  * n_workers, worker_ipaddr_ports, input_files, output_dir,
  * n_output_files, map_kilobytes, user_id; list values comma-separated.
  *
  * Validation mirrors `validate_mr_spec` (`src/mapreduce_spec.h:75-93`):
  * worker count must match the address list, counts/sizes positive,
  * every input file must exist, the output dir must NOT exist. Worker
  * addresses are validated for consistency but otherwise ignored —
  * Spark's scheduler owns placement (SURVEY.md §4).
  */
object SpecIni {

  def fromIni(path: String): MapReduceSpec = {
    val kv = Files.readAllLines(Paths.get(path)).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

    def req(k: String): String =
      kv.getOrElse(k, fail(s"missing required key '$k'"))

    val nWorkers = req("n_workers").toInt
    val workers = req("worker_ipaddr_ports").split(",").filter(_.nonEmpty)
    val inputs = req("input_files").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outputDir = req("output_dir")
    val r = req("n_output_files").toInt
    val mapKb = req("map_kilobytes").toLong
    val userId = req("user_id")

    if (nWorkers <= 0) fail("n_workers must be positive")
    if (workers.length != nWorkers)
      fail(s"n_workers=$nWorkers but ${workers.length} worker addresses")
    if (r <= 0) fail("n_output_files must be positive")
    if (mapKb <= 0) fail("map_kilobytes must be positive")
    if (inputs.isEmpty) fail("input_files must be non-empty")
    inputs.foreach { f =>
      if (!Files.exists(Paths.get(f))) fail(s"input file does not exist: $f")
    }
    if (Files.exists(Paths.get(outputDir)))
      fail(s"output dir already exists: $outputDir")

    MapReduceSpec(inputs, outputDir, r, mapKb, userId)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid mapreduce config: $msg")
}
