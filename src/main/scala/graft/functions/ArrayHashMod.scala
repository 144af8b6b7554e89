package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-element string hashing: `pmod(xxhash64(elem), mod)` over
  * an array<string> in one pass — the shingle→hash step of the MinHash
  * pipeline. The composable `transform(shingles, s ->
  * pmod(xxhash64(s), mod))` is CodegenFallback: one interpreted lambda
  * invocation (plus closure and boxing churn) per shingle, ~150 per
  * document. Bit-identical output: same XxHash64 (seed 42, the
  * `xxhash64()` SQL default) and the same positive-mod math; parity
  * pinned in MinHashSigSuite. */
case class ArrayHashMod(child: Expression, mod: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_array_hash_mod"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires non-null elements (a null would hash to the " +
        "seed instead of null, silently diverging from transform(xxhash64))")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ArrayHashMod.compute(input.asInstanceOf[ArrayData], mod))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ArrayHashMod.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c, ${mod}L));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayHashMod =
    copy(child = newChild)
}

object ArrayHashMod {

  /** Matches Spark's `xxhash64(string)` (seed 42) then `pmod`. */
  def compute(arr: ArrayData, mod: Long): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(
        arr.getUTF8String(i), StringType, 42L)
      val m = h % mod
      out(i) = if (m < 0) m + mod else m
      i += 1
    }
    out
  }
}
