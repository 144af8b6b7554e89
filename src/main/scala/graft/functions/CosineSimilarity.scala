package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expression: cosine(a, b) over two array<double>
  * columns, fused into one loop with whole-stage codegen.
  *
  * The composable form (`aggregate(zip_with(a, b, *), ...)`, see
  * VectorOps.cosine) materializes a zipped intermediate array and folds
  * it per row; this expression reads both ArrayData buffers directly —
  * no allocation, one pass — which matters when the ANN rerank computes
  * millions of cosines per partition. Returns NULL if either vector has
  * zero norm; truncates to the shorter length (callers pass fixed-dim
  * embeddings).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) null else dot / d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = $a.getDouble($i);
         |  double yi = $b.getDouble($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($d == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $d; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for graft's native expressions. */
object GraftFunctions {

  val CosineName = "graft_cosine"

  private[functions] val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$CosineName expects 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  val DotName = "graft_dot"

  private[functions] val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$DotName expects 2 arguments")
    ArrayDot(children.head, children(1))
  }

  val SimHashName = "graft_simhash"

  private[functions] val simhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"$SimHashName expects 1 argument")
    SimHash64(children.head)
  }

  val WinnowName = "graft_winnow"

  private[functions] val winnowBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"$WinnowName expects 1 argument")
    WinnowFingerprint(children.head)
  }

  /** Idempotently register graft functions in a session (sessions built
    * outside GraftExtensions — e.g. the driver's own — get them too). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val cid = FunctionIdentifier(CosineName)
    if (!registry.functionExists(cid)) {
      registry.registerFunction(cid,
        new ExpressionInfo(classOf[CosineSimilarity].getName, CosineName),
        cosineBuilder)
    }
    val wid = FunctionIdentifier(WinnowName)
    if (!registry.functionExists(wid)) {
      registry.registerFunction(wid,
        new ExpressionInfo(classOf[WinnowFingerprint].getName, WinnowName),
        winnowBuilder)
    }
    val did = FunctionIdentifier(DotName)
    if (!registry.functionExists(did)) {
      registry.registerFunction(did,
        new ExpressionInfo(classOf[ArrayDot].getName, DotName), dotBuilder)
    }
    val sid = FunctionIdentifier(SimHashName)
    if (!registry.functionExists(sid)) {
      registry.registerFunction(sid,
        new ExpressionInfo(classOf[SimHash64].getName, SimHashName),
        simhashBuilder)
    }
  }

  /** SimHash through the native expression. */
  def simhashNative(text: Column): Column =
    org.apache.spark.sql.functions.call_function(SimHashName, text)

  /** dot(a, b) through the native expression (bit-equal to the HOF fold). */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)

  /** Winnowing fingerprint through the native expression. */
  def winnowNative(text: Column): Column =
    org.apache.spark.sql.functions.call_function(WinnowName, text)

  /** Per-profile stopword-hit ratios through the native expression. */
  def langScores(text: Column, profiles: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LangScores(org.apache.spark.sql.GraftColumnBridge.expression(text),
        profiles))

  /** Distinct token-n-gram shingles through the native expression. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleSet(org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Hashed-linear text quality score (fastText-shaped), one native
    * pass per document — see HashedLinearScore. */
  def linearScore(text: Column, buckets: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedLinearScore(
        org.apache.spark.sql.GraftColumnBridge.expression(text), buckets))

  /** pmod(xxhash64(elem), mod) per array element, one native pass. */
  def arrayHashMod(arr: Column, mod: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayHashMod(org.apache.spark.sql.GraftColumnBridge.expression(arr), mod))

  /** MinHash signature through the native expression (coefficients are
    * driver-side constants, so this wraps the expression directly
    * rather than going through the name registry). */
  def minhashSig(hs: Column, as: Seq[Long], bs: Seq[Long], mod: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSig(
        org.apache.spark.sql.GraftColumnBridge.expression(hs),
        as.toArray, bs.toArray, mod))

  /** cosine(a, b) through the native expression (vs VectorOps.cosine,
    * the pure-builtin form). Caller must have run ensureRegistered. */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(CosineName, a, b)

  /** Real-codec decodes over binary payloads (graft.multimodal.Codecs):
    * PCM-WAV → (sample_rate, samples), 24-bit BMP → (width, height,
    * pixels), YUV4MPEG2 → (width, height, n_frames, frames). */
  def wavDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WavDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def bmpDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BmpDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def y4mDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Y4mDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def pngDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PngDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def jpegDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      JpegDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def gifDecode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      GifDecode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def aviFrames(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      AviFrames(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  def h264Decode(payload: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      H264Decode(org.apache.spark.sql.GraftColumnBridge.expression(payload)))

  /** Per-row char-n-gram histogram (map<ngram, count>), one native pass —
    * the explode-compaction for n-gram LM train/score. */
  def charNgramCounts(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharNgramCounts(org.apache.spark.sql.GraftColumnBridge.expression(text), n))
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.
  * GraftExtensions` injects the native functions at session build. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        GraftFunctions.CosineName),
      GraftFunctions.cosineBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.WinnowName),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        GraftFunctions.WinnowName),
      GraftFunctions.winnowBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[ArrayDot].getName, GraftFunctions.DotName),
      GraftFunctions.dotBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.SimHashName),
      new ExpressionInfo(classOf[SimHash64].getName, GraftFunctions.SimHashName),
      GraftFunctions.simhashBuilder))
    // Whole-operator extension: plans graft.plans.GroupedTopKPlan as
    // the two-phase bounded-heap physical operator.
    e.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
