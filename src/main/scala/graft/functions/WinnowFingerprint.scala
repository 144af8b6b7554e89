package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint: polynomial hashes of character k-grams,
  * min per w-hash window, distinct, ascending — in one tight loop.
  *
  * The composable form (nested `transform`/`aggregate`, see
  * TextOps.winnowFingerprint scaladoc) is semantically identical but
  * runs interpreted: Spark's higher-order functions are CodegenFallback,
  * and the nested per-character lambdas cost ~5 ms/doc (27 s for the
  * sf0.1 corpus). This expression computes the same arrays in ~µs/doc.
  *
  * Semantics replicate the SQL formula EXACTLY (the DuckDB oracle is
  * unchanged): out-of-range k-gram positions contribute 0 (ascii('')),
  * the gram sum is taken before the modulo, and short inputs clamp the
  * window to the available hashes.
  */
case class WinnowFingerprint(
    child: Expression,
    k: Int = 8,
    w: Int = 16,
    base: Long = 31L,
    mod: Long = 1000003L)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprint.compute(input.asInstanceOf[UTF8String].toString,
        k, w, base, mod))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WinnowFingerprint.getClass.getName.stripSuffix("$")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c.toString(), $k, $w, ${base}L, ${mod}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Shared by interpreted eval and generated code. Iterates by Unicode
    * codepoint (not UTF-16 code unit) to match the oracle's
    * character-based substring/ascii semantics and Spark's
    * codepoint-counting `length`. */
  def compute(str: String, k: Int, w: Int, base: Long, mod: Long): Array[Long] = {
    val s = str.codePoints().toArray
    val n = s.length
    // k-gram polynomial hashes; positions past the end contribute 0,
    // matching ascii(substring(text, i, 1)) = 0 for out-of-range i.
    val nGrams = math.max(n - k, 0) + 1
    val hs = new Array[Long](nGrams)
    val pow = new Array[Long](k)
    pow(0) = 1L
    var j = 1
    while (j < k) { pow(j) = pow(j - 1) * base; j += 1 }
    var i = 0
    while (i < nGrams) {
      var sum = 0L
      var t = 0
      while (t < k) {
        if (i + t < n) sum += s(i + t).toLong * pow(t)
        t += 1
      }
      hs(i) = sum % mod
      i += 1
    }
    // min per w-window (clamped for short inputs), distinct, ascending
    val nWin = math.max(nGrams - w, 0) + 1
    val mins = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = Long.MaxValue
      var u = i
      val end = math.min(i + w, nGrams)
      while (u < end) { if (hs(u) < m) m = hs(u); u += 1 }
      mins.add(m)
      i += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
