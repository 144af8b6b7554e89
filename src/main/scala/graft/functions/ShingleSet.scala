package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct token-n-gram shingle set — one pass over the text.
  *
  * Bit-compatible with the composable form in MinHashLSH.shingleSet
  * (`array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(text,' '), i+1, n))))`): same space-only tokenization
  * (empty tokens kept, as Spark's split does), same short-document
  * clamp (≤ n tokens → one shingle of the whole sequence), and the
  * same first-occurrence order that array_distinct preserves. The HOF
  * pipeline allocates a token array, a sequence array, n-element
  * slices, and joined strings per shingle through interpreted lambdas;
  * this builds each shingle directly from the token array. */
case class ShingleSet(child: Expression, n: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleSet.compute(input.asInstanceOf[UTF8String].toString, n)
        .map(UTF8String.fromString): Array[AnyRef])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleSet.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.computeUtf8($c.toString(), $n));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  def compute(s: String, n: Int): Array[String] = {
    val toks = s.split(" ", -1)
    val count = math.max(toks.length - n, 0) + 1
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[String](seen.size)
    seen.toArray(out)
    out
  }

  /** Codegen entry point (avoids UTF8String juggling in generated code). */
  def computeUtf8(s: String, n: Int): Array[AnyRef] =
    compute(s, n).map(UTF8String.fromString): Array[AnyRef]
}
