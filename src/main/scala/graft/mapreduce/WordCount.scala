package graft.mapreduce

/** The reference's demo workload (SURVEY.md §2.A S8), faithful to
  * `/root/reference/test/user_tasks.cc:12-33`:
  *   - map: tokenize on the delimiter set ` ,."'` (strtok semantics —
  *     empty tokens dropped, case-sensitive), emit (token, "1");
  *   - reduce: integer-sum the values, emit (word, sum).
  */
object WordCountJob extends MapReduceJob {
  /** The demo's exact strtok delimiter set: space comma period dquote quote. */
  val Delims: Set[Char] = Set(' ', ',', '.', '"', '\'')

  override def map(line: String): Iterator[(String, String)] = {
    // strtok: split on ANY delimiter char, drop empty tokens.
    val tokens = Iterator.unfold(0) { i =>
      if (i >= line.length) None
      else {
        var start = i
        while (start < line.length && Delims(line.charAt(start))) start += 1
        if (start >= line.length) None
        else {
          var end = start
          while (end < line.length && !Delims(line.charAt(end))) end += 1
          Some((line.substring(start, end), end))
        }
      }
    }
    tokens.map(t => (t, "1"))
  }

  override def reduce(key: String, values: Iterator[String]): Iterator[(String, String)] =
    Iterator.single((key, values.map(_.toInt).sum.toString))
}

/** Inverted index: map emits (token, docId) for `docId<TAB>text` lines;
  * reduce emits the token with its sorted-distinct document list —
  * the other classic MapReduce workload beside word count, exercising a
  * multi-valued, order-insensitive reducer. */
object InvertedIndexJob extends MapReduceJob {
  override def map(line: String): Iterator[(String, String)] = {
    val i = line.indexOf('\t')
    if (i < 0) Iterator.empty
    else {
      val docId = line.substring(0, i)
      line.substring(i + 1).split("[ ,.'\"]").iterator
        .filter(_.nonEmpty).map(tok => (tok, docId))
    }
  }
  override def reduce(key: String, values: Iterator[String]): Iterator[(String, String)] =
    Iterator.single((key, values.toSeq.distinct.sorted.mkString(" ")))
}

/** Pass-through job: useful for testing the shuffle/sink contract
  * (S4/S5/S7) independently of any aggregation logic. */
object IdentityJob extends MapReduceJob {
  override def map(line: String): Iterator[(String, String)] = {
    // First-comma split, like the reference's reduce-side parser
    // (`/root/reference/src/worker.h:92-94`): keys may not contain ',',
    // values may.
    val i = line.indexOf(',')
    if (i < 0) Iterator.single((line, ""))
    else Iterator.single((line.substring(0, i), line.substring(i + 1)))
  }
  override def reduce(key: String, values: Iterator[String]): Iterator[(String, String)] =
    values.map(v => (key, v))
}
