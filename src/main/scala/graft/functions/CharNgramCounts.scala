package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-n-gram histogram: one pass over the string,
  * map<ngram, count> out — the compaction step that keeps n-gram LM
  * training/scoring (lm_perplexity) from shuffling one row per
  * CHARACTER of the corpus. Exploding this map yields one row per
  * DISTINCT n-gram per document (bounded by min(len, V^n)), and the
  * occurrence count rides along as the weight, so downstream
  * aggregates are weighted sums over far fewer rows with identical
  * totals.
  *
  * Windows are code-point-aligned (`substring(text, j, n)` in both
  * Spark and DuckDB counts code points, not UTF-16 chars), so
  * supplementary-plane text hashes identically across engines. Key
  * order is first-appearance order — deterministic per input string.
  */
case class CharNgramCounts(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 8, s"n-gram width must be in [1, 8], got $n")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_char_ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramCounts.compute(input.asInstanceOf[UTF8String].toString, n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharNgramCounts.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.compute($c.toString(), $n);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramCounts = copy(child = newChild)
}

object CharNgramCounts {

  /** First-appearance-ordered n-gram histogram over code-point windows. */
  def compute(text: String, n: Int): MapData = {
    // code-point start offsets (one extra slot for the end boundary)
    val len = text.length
    val bounds = new Array[Int](len + 1)
    var cp = 0
    var i = 0
    while (i < len) {
      bounds(cp) = i
      i += Character.charCount(text.codePointAt(i))
      cp += 1
    }
    bounds(cp) = len
    val windows = cp - n + 1 // number of n-gram windows (may be <= 0)

    val idx = new java.util.HashMap[String, Integer]()
    val keys = new java.util.ArrayList[String]()
    var counts = new Array[Long](16)
    var w = 0
    while (w < windows) {
      val g = text.substring(bounds(w), bounds(w + n))
      val at = idx.get(g)
      if (at == null) {
        idx.put(g, keys.size)
        if (keys.size == counts.length)
          counts = java.util.Arrays.copyOf(counts, counts.length * 2)
        counts(keys.size) = 1L
        keys.add(g)
      } else {
        counts(at) += 1L
      }
      w += 1
    }

    val m = keys.size
    val keyArr = new Array[AnyRef](m)
    val valArr = new Array[Any](m)
    var j = 0
    while (j < m) {
      keyArr(j) = UTF8String.fromString(keys.get(j))
      valArr(j) = counts(j)
      j += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keyArr.asInstanceOf[Array[Any]]),
      new GenericArrayData(valArr))
  }
}
