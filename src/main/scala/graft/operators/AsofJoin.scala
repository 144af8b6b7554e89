package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join: for every left row, attach the
  * single latest right row whose timestamp is ≤ the left timestamp,
  * within the same key — the time-series point-in-time lookup (DuckDB
  * `ASOF JOIN`, pandas `merge_asof`, kdb `aj`). Spark has no built-in,
  * and the naive formulation (range join + per-left-row max) explodes
  * into an O(L×R-per-key) theta join.
  *
  * Spark-first plan instead: tag and union both sides, hash-partition
  * by key, sort within each key by (ts, side) — right rows sort before
  * left rows at equal ts, making the match inclusive — then forward-
  * fill the right payload with `last(_, ignoreNulls)` over a running
  * window and keep only left rows. ONE shuffle of L+R rows, no
  * candidate explosion; at 100 TB this is the same cost envelope as a
  * sort-merge join, and AQE handles per-key skew like any window op.
  *
  * Unmatched left rows keep a null payload (left-outer semantics).
  * Right rows should be unique per (key, ts) — the caller pre-
  * aggregates ties — otherwise "the" latest row at a timestamp is
  * undefined (DuckDB's ASOF has the same caveat).
  *
  * NULL semantics follow SQL comparison predicates (and pandas
  * merge_asof, which rejects NaT keys): a right row with a null key or
  * null timestamp can never be "the latest at-or-before" anything, so
  * such rows are dropped from the right side; a LEFT row with a null
  * key or timestamp keeps a null payload instead of inheriting
  * whatever fill its sort position would see.
  */
object AsofJoin {

  /** Latest right row with ts ≤ the left timestamp (inclusive).
    * @param rightPayload right-side columns to carry onto left rows
    *                     (each emitted as `asof_<name>`, null when no
    *                     right row qualifies).
    * @param tolerance max allowed staleness, `merge_asof(tolerance=)`
    *                  semantics: a match further than this from the
    *                  left timestamp nulls out (an interval literal for
    *                  timestamp columns, a number for numeric ones).
    *                  Real pipelines cap staleness — a quote from last
    *                  week should not fill today's trade. */
  def backward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCol, tsCol, rightPayload, descendingScan = false,
      tolerance)

  /** Forward (inclusive) as-of: the EARLIEST right row with ts ≥ the
    * left timestamp. Same machinery with the scan order reversed —
    * the fill runs over descending time; right still sorts before left
    * at equal ts so the match stays inclusive. */
  def forward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCol, tsCol, rightPayload, descendingScan = true,
      tolerance)

  private def asof(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightPayload: Seq[String],
      descendingScan: Boolean, tolerance: Option[Column]): DataFrame = {
    val reserved = Seq("__side", "__p", "__k", "__ts", "__l", "__match", "__rts")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns may not use the operator-internal names " +
        reserved.mkString(", "))
    // the right timestamp rides the payload struct so the tolerance
    // check (and nothing else) can see the matched row's distance
    val payloadStruct = struct(
      rightPayload.map(col) :+ col(tsCol).as("__rts"): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col("__side"), col("__p"), struct(leftCols.map(col): _*).as("__l"))
      .unionByName(right
        // null key / null ts can never satisfy a SQL comparison — drop
        // (under the ascending scan a null ts would otherwise sort
        // FIRST and forward-fill as a "match")
        .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
        .withColumn("__side", lit(0))
        .withColumn("__p", payloadStruct)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
          col("__side"), col("__p"), lit(null).cast(
            left.select(struct(leftCols.map(col): _*)).schema.head.dataType)
            .as("__l")))
    val ts = if (descendingScan) col("__ts").desc else col("__ts").asc
    val fill = Window.partitionBy("__k")
      .orderBy(ts, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rawMatch = last(col("__p"), ignoreNulls = true).over(fill)
    val gapOk = tolerance match {
      case None => lit(true)
      case Some(tol) if descendingScan =>
        rawMatch.getField("__rts") - col("__ts") <= tol
      case Some(tol) =>
        col("__ts") - rawMatch.getField("__rts") <= tol
    }
    val filled = tagged
      .withColumn("__match",
        // a null-key/null-ts LEFT row matches nothing (SQL predicate
        // semantics), whatever its sort position saw; a match outside
        // the tolerance nulls out like merge_asof's
        when(col("__k").isNotNull && col("__ts").isNotNull && gapOk,
          rawMatch).otherwise(lit(null).cast(payloadType)))
      .filter(col("__side") === 1)
    // getField, not string paths: column names containing dots must not
    // be re-parsed as nested access
    val out: Seq[Column] =
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightPayload.map(c => col("__match").getField(c).as(s"asof_$c"))
    filled.select(out: _*)
  }
}
