package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.multimodal.H264Codec

/** Intra-only baseline H.264 Annex B stream →
  * struct<width:int, height:int, n_frames:int,
  *        frames:array<array<int>>>
  * where each frame array is the cropped Y plane followed by the Cb
  * and Cr planes (4:2:0: w*h + 2*(w/2)*(h/2) ints, 0..255).
  *
  * Same plan discipline as the other codecs: decode is map-only and
  * executor-side; payload bytes never reach a shuffle. Non-intra /
  * CABAC / deblocking-required streams throw (scope documented in
  * [[H264Codec]]) rather than decoding wrong samples. */
case class H264Decode(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = H264Decode.schema
  override def prettyName: String = "graft_h264_decode"
  override def nullSafeEval(input: Any): Any =
    H264Decode.compute(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = H264Decode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): H264Decode =
    copy(child = newChild)
}

/** test-only invocation counter (asserting single evaluation per row
  * would be the real gate; the counter makes over-evaluation visible). */
object H264DecodeCounter {
  val n = new java.util.concurrent.atomic.AtomicLong(0)
}

object H264Decode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames",
      ArrayType(ArrayType(IntegerType, containsNull = false),
        containsNull = false), nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    H264DecodeCounter.n.incrementAndGet()
    val dec = H264Codec.decode(bytes)
    val arrs: Array[Any] = dec.frames.map { f =>
      val out = new Array[Int](f.y.length + f.cb.length + f.cr.length)
      System.arraycopy(f.y, 0, out, 0, f.y.length)
      System.arraycopy(f.cb, 0, out, f.y.length, f.cb.length)
      System.arraycopy(f.cr, 0, out, f.y.length + f.cb.length, f.cr.length)
      new GenericArrayData(out): Any
    }
    new GenericInternalRow(Array[Any](dec.width, dec.height, dec.frames.length,
      new GenericArrayData(arrs)))
  }
}
