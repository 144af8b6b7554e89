package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.mapreduce.{InvertedIndexJob, MapReduceRunner, WordCountJob}

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

  /** Inverted index via the MapReduceJob API: token → sorted distinct
    * document list (the reducer is order-insensitive by construction —
    * the contract every reference reducer must satisfy). */
  val mrInvertedIndex: Q = Q(
    "mr_inverted_index",
    """SELECT tok AS term,
      |  array_to_string(list_sort(list_distinct(list(CAST(doc_id AS VARCHAR)))), ' ') AS docs
      |FROM (SELECT doc_id, unnest(string_split_regex(text, '[ ,.''"]')) AS tok
      |      FROM documents) t
      |WHERE tok <> '' GROUP BY tok ORDER BY term""".stripMargin) { (s, d) =>
    import s.implicits._
    val lines = Tables.documents(s, d)
      .select(concat(col("doc_id").cast("string"), lit("\t"), col("text")))
      .as[String]
    MapReduceRunner.toDataFrame(lines, InvertedIndexJob, 32)
      .select(col("key").as("term"), col("value").as("docs"))
      .orderBy("term")
  }

  val all: Seq[Q] = Seq(mrWordCount, mrInvertedIndex)
}
