package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: for each of k seeded affine hashes
  * (a_j·x + b_j) mod p, the minimum over the input hash array — fused
  * into one k×n loop.
  *
  * The composable form (`zip_with(lit(as), lit(bs), (a,b) ->
  * array_min(transform(hs, ...)))`, see MinHashLSH.signatures scaladoc)
  * is CodegenFallback/interpreted and re-walks the input array k times
  * through lambda closures; this expression keeps a running-min vector
  * in one pass per element. Bit-identical output (same integer math).
  */
case class MinHashSig(
    child: Expression,
    as: Array[Long],
    bs: Array[Long],
    mod: Long)
  extends UnaryExpression {

  require(as.length == bs.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    new GenericArrayData(MinHashSig.compute(hs.toLongArray(), as, bs, mod))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    val cls = MinHashSig.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c.toLongArray(), $asRef, $bsRef, ${mod}L));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** One pass over the hashes, k running minima. Empty input yields
    * all-mod sentinels (matches array_min over empty → null? no: the
    * HOF form never sees empty arrays — shingleSet emits ≥1 shingle —
    * but a defined sentinel keeps the expression total). */
  def compute(hs: Array[Long], as: Array[Long], bs: Array[Long],
      mod: Long): Array[Long] = {
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val x = hs(i)
      var j = 0
      while (j < k) {
        val h = (as(j) * x + bs(j)) % mod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    if (hs.isEmpty) java.util.Arrays.fill(mins, mod)
    mins
  }
}
