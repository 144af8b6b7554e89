package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-profile scores: one pass over the lowercased tokens,
  * one hit counter per language profile, ratios out as array<double>.
  *
  * Semantics replicate LangId.scores' composable form exactly: tokenize
  * by splitting on `[ ,.;:!?'"]+` (regex, empty tokens dropped), count
  * case-insensitive membership per profile, divide by max(tokens, 1).
  * The HOF form runs one interpreted `filter(..., isin(19 words))` scan
  * per language (5 profile scans × linear word-list probes per token);
  * this does a single tokenization with hash-set probes. */
case class LangScores(child: Expression, profiles: Seq[Seq[String]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  @transient private lazy val profileSets: Array[java.util.HashSet[String]] =
    LangScores.toSets(profiles)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LangScores.compute(
      input.asInstanceOf[UTF8String].toString, profileSets))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("profileSets", profileSets,
      "java.util.HashSet[]")
    val cls = LangScores.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.compute($c.toString(), $setsRef));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

object LangScores {

  def toSets(profiles: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    profiles.map { words =>
      val s = new java.util.HashSet[String]()
      words.foreach(w => s.add(w))
      s
    }.toArray

  def compute(text: String, sets: Array[java.util.HashSet[String]]): Array[Double] = {
    // split on the delimiter class, drop empties — matches
    // filter(split(lower(text), "[ ,.;:!?'\"]+"), _ =!= "")
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[ ,.;:!?'\"]+")
    val counts = new Array[Long](sets.length)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    val denom = math.max(n, 1).toDouble
    val out = new Array[Double](sets.length)
    var j = 0
    while (j < sets.length) { out(j) = counts(j) / denom; j += 1 }
    out
  }
}
