package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.multimodal.Codecs

/** Native media-decode expressions over binary payload columns — the
  * production direction of the real codecs in
  * [[graft.multimodal.Codecs]] (RIFF/WAVE PCM, 24-bit BI_RGB BMP,
  * YUV4MPEG2, and PNG via the JDK's Inflater). Each parses the actual
  * container format executor-side and emits a typed struct; payload
  * bytes never leave the row, so the stages stay map-only at 100 TB.
  * JPEG/H.264 remain behind the documented stub swap point — no codec
  * libraries ship in this container. */
private[graft] trait MediaDecodeExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got ${t.catalogString}")
  }
}

/** PCM WAV → struct<sample_rate:int, samples:array<int>>. */
case class WavDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = WavDecode.schema
  override def prettyName: String = "graft_wav_decode"
  override def nullSafeEval(input: Any): Any =
    WavDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
}

object WavDecode {
  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (rate, samples) = Codecs.wavDecode(bytes)
    val ints = new Array[Int](samples.length)
    var i = 0
    while (i < samples.length) { ints(i) = samples(i).toInt; i += 1 }
    new GenericInternalRow(Array[Any](rate, new GenericArrayData(ints)))
  }
}

/** 24-bit BMP → struct<width:int, height:int, pixels:array<int>> with
  * pixels as top-down row-major RGB triples, 0..255. */
case class BmpDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = BmpDecode.schema
  override def prettyName: String = "graft_bmp_decode"
  override def nullSafeEval(input: Any): Any =
    BmpDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BmpDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BmpDecode =
    copy(child = newChild)
}

object BmpDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, rgb) = Codecs.bmpDecode(bytes)
    val ints = new Array[Int](rgb.length)
    var i = 0
    while (i < rgb.length) { ints(i) = rgb(i) & 0xff; i += 1 }
    new GenericInternalRow(Array[Any](w, h, new GenericArrayData(ints)))
  }
}

/** YUV4MPEG2 → struct<width:int, height:int, n_frames:int,
  * frames:array<array<int>>> (per-frame luma planes, 0..255). */
case class Y4mDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = Y4mDecode.schema
  override def prettyName: String = "graft_y4m_decode"
  override def nullSafeEval(input: Any): Any =
    Y4mDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Y4mDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Y4mDecode =
    copy(child = newChild)
}

object Y4mDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames",
      ArrayType(ArrayType(IntegerType, containsNull = false),
        containsNull = false), nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, frames) = Codecs.y4mDecode(bytes)
    val arrs: Array[Any] = frames.map { y =>
      val ints = new Array[Int](y.length)
      var i = 0
      while (i < y.length) { ints(i) = y(i) & 0xff; i += 1 }
      new GenericArrayData(ints): Any
    }
    new GenericInternalRow(Array[Any](w, h, frames.length,
      new GenericArrayData(arrs)))
  }
}

/** PNG → struct<width:int, height:int, channels:int, pixels:array<int>>
  * with pixels as top-down row-major interleaved samples, 0..255
  * (channels = 1 gray / 3 RGB / 4 RGBA). Real inflate + unfilter. */
case class PngDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = PngDecode.schema
  override def prettyName: String = "graft_png_decode"
  override def nullSafeEval(input: Any): Any =
    PngDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PngDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PngDecode =
    copy(child = newChild)
}

object PngDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, ch, px) = Codecs.pngDecode(bytes)
    val ints = new Array[Int](px.length)
    var i = 0
    while (i < px.length) { ints(i) = px(i) & 0xff; i += 1 }
    new GenericInternalRow(Array[Any](w, h, ch, new GenericArrayData(ints)))
  }
}

/** AVI/MJPEG demux → struct<width:int, height:int, fps:int,
  * n_frames:int, frames:array<binary>> — each frame a complete
  * baseline-JPEG payload for per-frame [[JpegDecode]]. Container walk
  * only ([[graft.multimodal.AviMjpeg]]); pairs with posexplode so the
  * expensive frame decode parallelizes per frame, payloads map-side. */
case class AviFrames(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = AviFrames.schema
  override def prettyName: String = "graft_avi_frames"
  override def nullSafeEval(input: Any): Any =
    AviFrames.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AviFrames.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): AviFrames =
    copy(child = newChild)
}

object AviFrames {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames", ArrayType(BinaryType, containsNull = false),
      nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, fps, frames) = graft.multimodal.AviMjpeg.aviDecode(bytes)
    new GenericInternalRow(Array[Any](w, h, fps, frames.length,
      new GenericArrayData(frames.asInstanceOf[Array[Any]])))
  }
}

/** GIF → struct<width:int, height:int, n_frames:int,
  * frames:array<array<int>>> — per-frame palette-applied interleaved
  * RGB triples 0..255, top-down row-major (animations yield one entry
  * per image descriptor). Real LZW decompress + container walk
  * ([[graft.multimodal.GifCodec]]). */
case class GifDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = GifDecode.schema
  override def prettyName: String = "graft_gif_decode"
  override def nullSafeEval(input: Any): Any =
    GifDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GifDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GifDecode =
    copy(child = newChild)
}

object GifDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames",
      ArrayType(ArrayType(IntegerType, containsNull = false),
        containsNull = false), nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, frames) = graft.multimodal.GifCodec.gifDecode(bytes)
    val arrs: Array[Any] = frames.map { rgb =>
      val ints = new Array[Int](rgb.length)
      var i = 0
      while (i < rgb.length) { ints(i) = rgb(i) & 0xff; i += 1 }
      new GenericArrayData(ints): Any
    }
    new GenericInternalRow(Array[Any](w, h, frames.length,
      new GenericArrayData(arrs)))
  }
}

/** Baseline JPEG → struct<width:int, height:int, channels:int,
  * pixels:array<int>> — top-down row-major interleaved samples 0..255
  * (channels = 1 gray / 3 RGB). Real Huffman + IDCT decode
  * ([[graft.multimodal.JpegCodec]]). */
case class JpegDecode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = JpegDecode.schema
  override def prettyName: String = "graft_jpeg_decode"
  override def nullSafeEval(input: Any): Any =
    JpegDecode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JpegDecode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): JpegDecode =
    copy(child = newChild)
}

object JpegDecode {
  val schema: StructType = PngDecode.schema

  def compute(bytes: Array[Byte]): InternalRow = {
    val (w, h, ch, px) = graft.multimodal.JpegCodec.decode(bytes)
    val ints = new Array[Int](px.length)
    var i = 0
    while (i < px.length) { ints(i) = px(i) & 0xff; i += 1 }
    new GenericInternalRow(Array[Any](w, h, ch, new GenericArrayData(ints)))
  }
}
