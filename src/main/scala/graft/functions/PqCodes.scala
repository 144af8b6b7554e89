package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encode: vector → m nearest-codeword
  * indices, one fused codegen loop per row.
  *
  * Replaces the composable HOF form (`array_min(array(struct(
  * aggregate(zip_with(...)), j)))` per subspace — see
  * [[graft.ann.ProductQuantizer.encodeHof]]), which planned 128
  * interpreted folds per row because Spark's array HOFs are
  * CodegenFallback. Math is bit-identical to that form: per codeword a
  * left-to-right `acc + (a-b)*(a-b)` fold from 0.0, argmin with
  * strict `<` (keeps the LOWEST code index on ties, matching the
  * lexicographic `struct(d, i)` array_min). The `pq_encode` DuckDB
  * oracle replays exactly this math, so swapping in the native
  * expression keeps the rows+schema+hash gate green.
  *
  * Codebooks are a driver-side constant (m·k·sub doubles, flattened
  * `[s][j][i]`) riding into generated code as a reference object —
  * no shuffle, no per-row codebook deserialization.
  *
  * Returns NULL if the input vector's length isn't exactly m·sub
  * (callers filter on length first; a wrong-length row upstream of the
  * filter must not silently mis-encode).
  */
case class PqEncode(child: Expression, flatBooks: Array[Double],
    m: Int, k: Int, sub: Int) extends UnaryExpression {

  require(flatBooks.length == m * k * sub,
    s"flatBooks length ${flatBooks.length} != m*k*sub = ${m * k * sub}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * sub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = x.getDouble(s * sub + i) - flatBooks((s * k + j) * sub + i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |if ($v.numElements() != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestJ = 0;
         |    for (int $j = 0; $j < $k; $j++) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $diff = $v.getDouble($s * $sub + $i)
         |          - $books[($s * $k + $j) * $sub + $i];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $best) { $best = $d; $bestJ = $j; }
         |    }
         |    $codes[$s] = $bestJ;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native asymmetric distance computation (ADC): approximate squared
  * L2 between a raw query vector and a PQ-encoded corpus row — the
  * scan a 100 TB PQ re-rank actually runs (full vectors stay cold;
  * the scan touches only m small codes per row).
  *
  * `dist(q, codes) = Σ_s sqL2(q[s·sub..(s+1)·sub), book[s][codes[s]])`
  * with each subspace's squared-L2 a left-to-right fold from 0.0 and
  * the subspace partials summed in s-order — the exact association
  * the `pq_adc_topk` DuckDB oracle replays (`list_sum` over per-
  * subspace `list_sum`s, both in-order folds), keeping the query
  * under the full rows+schema+hash gate.
  *
  * The classical formulation precomputes a k×m lookup table per query
  * and sums table hits; since only entry `codes[s]` of each column is
  * ever read here, computing that entry directly is the same math
  * with no table materialization.
  *
  * Returns NULL on a wrong-length query vector or code array.
  */
case class PqAdc(left: Expression, right: Expression,
    flatBooks: Array[Double], m: Int, k: Int, sub: Int)
    extends BinaryExpression {

  require(flatBooks.length == m * k * sub,
    s"flatBooks length ${flatBooks.length} != m*k*sub = ${m * k * sub}")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (qv.numElements() != m * sub || codes.numElements() != m) return null
    var total = 0.0
    var s = 0
    while (s < m) {
      val j = codes.getInt(s)
      if (j < 0 || j >= k) return null
      var d = 0.0
      var i = 0
      while (i < sub) {
        val diff = qv.getDouble(s * sub + i) - flatBooks((s * k + j) * sub + i)
        d += diff * diff
        i += 1
      }
      total += d
      s += 1
    }
    total
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val total = ctx.freshName("total")
      val bad = ctx.freshName("bad")
      s"""
         |if ($q.numElements() != ${m * sub} || $c.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m && !$bad; $s++) {
         |    int $j = $c.getInt($s);
         |    if ($j < 0 || $j >= $k) { $bad = true; break; }
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $diff = $q.getDouble($s * $sub + $i)
         |        - $books[($s * $k + $j) * $sub + $i];
         |      $d += $diff * $diff;
         |    }
         |    $total += $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $total; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
