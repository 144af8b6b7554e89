package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a whitespace-tokenized string — one loop
  * over tokens updating a 64-wide ±1 counter vector, then bit packing.
  *
  * Bit-identical to the SQL-expr form (`SimHash.simhashExpr`): tokens
  * come from `split(text, ' ')` semantics (single-space regex, empty
  * tokens KEPT — they hash too), each token hashed with Spark's
  * xxhash64 (seed 42). The HOF form allocates a 64-element array per
  * token through interpreted lambdas; this walks the bits of each hash
  * directly. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.compute($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  def compute(s: String): Long = {
    val counts = new Array[Long](64)
    // split(" ", -1): Spark's split keeps empty tokens (leading,
    // repeated, and trailing separators) — Java's default split drops
    // trailing empties, hence the explicit -1.
    val tokens = s.split(" ", -1)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(tokens(t)), StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}
