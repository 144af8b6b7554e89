package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a whitespace-tokenized string — one loop
  * over tokens updating a 64-wide ±1 counter vector, then bit packing.
  *
  * Bit-identical to the SQL-expr form (`SimHash.simhashExpr`): tokens
  * come from `split(text, ' ')` semantics (single-space regex, empty
  * tokens KEPT — they hash too). The token hash is deliberately
  * engine-portable: two 31-bit code-point polynomial hashes mod
  * p = 2^31-1 (multipliers 31/131, seeds 7/11) mixed through quadratic
  * rounds and packed to 64 bits — see [[SimHash64.tokenHash]] for the
  * construction and why the squaring matters. Every intermediate fits
  * in a signed 64-bit integer, so the exact same arithmetic runs in
  * DuckDB SQL — which is what makes `simhash_dup_pairs`
  * oracle-checkable cross-engine rather than sketch-gated. The HOF
  * form allocates a 64-element array per token through interpreted
  * lambdas; this walks the bits of each hash directly. */
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

  private val P = 2147483647L // 2^31 - 1

  /** Portable 64-bit token hash: two code-point polynomial hashes mod
    * 2^31-1 pushed through QUADRATIC mixing rounds (x → x²+c mod p),
    * then bit-packed `x | y<<31 | (z&3)<<62`. The squaring is the
    * load-bearing part — packing the raw polynomial hashes leaves their
    * algebraic structure in the signature bits, and on the fixture
    * corpus that inflated the Hamming-≤3 pair count ~18× over an ideal
    * hash (55 vs 12 at sf0.01; 5 814 vs 312 at sf0.1 — bucket-density
    * poison at 100 TB). With two quadratic rounds per lane the counts
    * land within 1.4× of the md5 ceiling (20 / 449). Every
    * intermediate provably fits signed 64-bit (operands < 2^31, mix
    * constants < 2^32 → products < 2^63), so DuckDB replays the exact
    * arithmetic — which is what keeps `simhash_dup_pairs`
    * oracle-checkable. Iterates true code points (surrogate pairs are
    * one step) to match per-character engines like DuckDB's substr. */
  def tokenHash(t: String): Long = {
    var h1 = 7L; var h2 = 11L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h1 = (h1 * 31L + cp) % P
      h2 = (h2 * 131L + cp) % P
      i += Character.charCount(cp)
    }
    var x = (h1 * 2654435761L + h2) % P
    x = (x * x + h1) % P
    x = (x * x + h2) % P
    var y = (h2 * 2246822519L + h1) % P
    y = (y * y + h2) % P
    y = (y * y + h1) % P
    var z = (x * 65599L + y) % P
    z = (z * z + x) % P
    x | (y << 31) | ((z & 3L) << 62)
  }

  def compute(s: String): Long = {
    val counts = new Array[Long](64)
    // split(" ", -1): Spark's split keeps empty tokens (leading,
    // repeated, and trailing separators) — Java's default split drops
    // trailing empties, hence the explicit -1.
    val tokens = s.split(" ", -1)
    var t = 0
    while (t < tokens.length) {
      val h = tokenHash(tokens(t))
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
