package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.mapreduce.{MapReduceRunner, WordCountJob}

/** Oracle-checked queries driven through the MapReduce-parity API
  * (graft.mapreduce) rather than the relational surface — proving the
  * general map/shuffle/reduce path (S1-S9) computes the same answers
  * as the declarative form. */
object MrParity {

  /** Word count executed via the MapReduceJob API over documents.text.
    * Same oracle as TextOps.wcWords — the two paths must agree. */
  val mrWordCount: Q = Q(
    "mr_wordcount",
    """SELECT tok AS word, count(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(text, '[ ,.''"]')) AS tok FROM documents) t
      |WHERE tok <> '' GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
    import s.implicits._
    val lines = Tables.documents(s, d).select("text").as[String]
    MapReduceRunner.toDataFrame(lines, WordCountJob, 32)
      .select(col("key").as("word"), col("value").cast("long").as("cnt"))
      .orderBy("word")
  }

  val all: Seq[Q] = Seq(mrWordCount)
}
