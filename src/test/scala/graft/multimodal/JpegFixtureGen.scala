package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** One-shot generator for the committed JPEG fixtures under
  * `src/main/resources/graft/jpeg/` and the constant rows in the
  * `media_jpeg_stats` oracle (PipelineOps).
  *
  * Run: `sbt "Test/runMain graft.multimodal.JpegFixtureGen"`.
  *
  * The fixtures are encoded ONCE by the JDK ImageIO reference encoder
  * (deterministic smooth content below) and committed as bytes; the
  * oracle constants are this engine's decode of those bytes. JPEG has
  * no bit-exact mandated IDCT, so constants from our own decoder are
  * the only exact gate possible — their CORRECTNESS is tied to the
  * reference decoder by JpegSuite, which pins the committed fixtures'
  * decode within a tight numeric band of ImageIO's. Regenerating
  * fixtures requires re-pasting the printed oracle rows.
  */
object JpegFixtureGen {

  def smooth(w: Int, h: Int, gray: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((x * 255) / math.max(w - 1, 1) +
        32 * math.sin(y / 9.0)).toInt.max(0).min(255)
      val g = ((y * 255) / math.max(h - 1, 1) +
        24 * math.cos(x / 11.0)).toInt.max(0).min(255)
      val b = ((x + y) * 255 / math.max(w + h - 2, 1))
      if (gray) {
        val v = (r + g + b) / 3
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      } else img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  val Fixtures: Seq[(String, Int, Int, Boolean, Float)] = Seq(
    ("gray_64x48_q85", 64, 48, true, 0.85f),
    ("gray_57x33_q70", 57, 33, true, 0.7f),
    ("gray_8x8_q95", 8, 8, true, 0.95f),
    ("rgb_64x48_q85", 64, 48, false, 0.85f),
    ("rgb_57x33_q70", 57, 33, false, 0.7f),
    ("rgb_80x56_q92", 80, 56, false, 0.92f))

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("src/main/resources/graft/jpeg")
    java.nio.file.Files.createDirectories(outDir)
    val rows = Fixtures.map { case (name, w, h, gray, q) =>
      val bytes = encode(smooth(w, h, gray), q)
      java.nio.file.Files.write(outDir.resolve(s"$name.jpg"), bytes)
      val (gw, gh, ch, px) = JpegCodec.decode(bytes)
      val sum = px.foldLeft(0L)((a, b) => a + (b & 0xff))
      s"('$name', $gw, $gh, $ch, ${px.length}, $sum)"
    }
    println("-- paste into the media_jpeg_stats oracle:")
    println(rows.mkString(",\n"))
  }
}
