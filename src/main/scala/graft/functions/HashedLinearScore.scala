package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed linear text scorer in one native pass: split
  * the document on single spaces, bucket each token by a polynomial
  * rolling hash of its first 8 bytes, look the bucket up in a
  * deterministic hashed weight table, and sum the weights in token
  * order. The model-based quality filter of a pretraining pipeline
  * (DCLM / fastText classifiers), reduced to its engine shape: a pure
  * map over documents with a broadcast-free constant "model" (weights
  * are a formula of the bucket id, so both engines can replay them).
  *
  * All arithmetic is engine-portable and order-pinned:
  *   bucket(tok) = (Σ_{j<min(len,8)} byte_j * 31^j) mod `buckets`
  *   weight(b)   = ((b * 2654435761) mod 1000003) / 1000003.0 - 0.5
  *   score(doc)  = Σ_tokens weight(bucket(tok))   (left-to-right)
  * The byte-wise powers stay ≤ 127·31⁷·8 < 2⁵³, so the DuckDB replica
  * (`CAST(pow(31, j) AS BIGINT)` — exact in doubles up to 2⁵³) computes
  * identical integers, and the final double sum runs in identical list
  * order → bit-identical scores. Non-ASCII input fails loudly (the
  * oracle's `ascii()` sees code points, the JVM sees UTF-8 bytes —
  * silently diverging; the fixtures are ASCII by construction).
  *
  * The equivalent composable form — `aggregate(transform(split(...)))`
  * with a nested per-token `aggregate` — is two levels of interpreted
  * HOF lambdas per token (CodegenFallback); parity is pinned in
  * HashedLinearScoreSuite.
  */
case class HashedLinearScore(child: Expression, buckets: Int)
  extends UnaryExpression {

  require(buckets >= 2, s"graft_linear_score needs >= 2 buckets, got $buckets")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedLinearScore.compute(input.asInstanceOf[UTF8String], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedLinearScore.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.compute($c, $buckets);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedLinearScore = copy(child = newChild)
}

object HashedLinearScore {

  /** Sum of hashed-bucket weights over space-separated tokens, in
    * document order. Empty tokens (leading/double spaces) contribute
    * nothing, matching `x <> ''` filters on the SQL side. */
  def compute(text: UTF8String, buckets: Int): Double = {
    val bytes = text.getBytes
    var score = 0.0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        var h = 0L
        var pow = 1L
        var j = 0
        while (i < n && bytes(i) != ' ') {
          val b = bytes(i)
          // Fail with enough context to FIND the offending row: at
          // corpus scale "got byte -61" without the document prefix
          // makes a single stray UTF-8 byte nearly undebuggable
          // (round-6 ADVICE).
          require(b >= 0 && b < 128,
            s"graft_linear_score requires ASCII text (oracle replays the " +
              s"hash via ascii()); got byte $b at offset $i in document " +
              s"starting ${text.substring(0, math.min(48, text.numChars()))
                .toString.replaceAll("\\s", " ")}...")
          if (j < 8) { h += b.toLong * pow; pow *= 31L; j += 1 }
          i += 1
        }
        val bucket = h % buckets
        score += ((bucket * 2654435761L) % 1000003L) / 1000003.0 - 0.5
      }
    }
    score
  }
}
