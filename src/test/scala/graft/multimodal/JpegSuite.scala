package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec vs the JDK ImageIO reference codec (libjpeg-backed): the
  * JPEG standard does not mandate a bit-exact IDCT, so the gates are
  * tight numeric bounds, not equality — ±2 per sample for images with
  * no chroma subsampling (IDCT + color-convert rounding), a slightly
  * wider band where the reference's triangular chroma upsampling
  * differs from our nearest-neighbour on 4:2:0 content. */
class JpegSuite extends AnyFunSuite {

  /** Deterministic smooth content (low-frequency gradients + sinusoid)
    * — smooth chroma keeps upsampling-filter differences small, which
    * is what lets the interop bound stay tight. */
  private def smoothImage(w: Int, h: Int, gray: Boolean): BufferedImage = {
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

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
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

  /** (maxAbsDiff, meanAbsDiff) of our decode vs ImageIO's over RGB. */
  private def diffVsReference(jpeg: Array[Byte]): (Int, Double) = {
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    val (w, h, ch, px) = JpegCodec.decode(jpeg)
    assert(w === ref.getWidth && h === ref.getHeight)
    var maxD = 0
    var sum = 0L
    var n = 0L
    for (y <- 0 until h; x <- 0 until w) {
      // getRGB on a grayscale image applies the ICC gray→sRGB
      // transform (gamma), which is a property of the comparison, not
      // the codec — compare raw raster samples instead
      val refVals =
        if (ch == 1) Seq(ref.getRaster.getSample(x, y, 0))
        else {
          val argb = ref.getRGB(x, y)
          Seq((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
        }
      val got =
        if (ch == 3) {
          val p = (y * w + x) * 3
          Seq(px(p) & 0xff, px(p + 1) & 0xff, px(p + 2) & 0xff)
        } else Seq(px(y * w + x) & 0xff)
      refVals.zip(got).foreach { case (a, b) =>
        val d = math.abs(a - b)
        maxD = math.max(maxD, d)
        sum += d
        n += 1
      }
    }
    (maxD, sum.toDouble / n)
  }

  test("grayscale baseline: within ±2 of the ImageIO reference decode") {
    for ((w, h, q) <- Seq((64, 48, 0.85f), (57, 33, 0.7f), (8, 8, 0.95f))) {
      val jpeg = encodeJpeg(smoothImage(w, h, gray = true), q)
      val (maxD, meanD) = diffVsReference(jpeg)
      assert(maxD <= 2, s"${w}x$h q=$q maxDiff=$maxD mean=$meanD")
      assert(meanD <= 0.5, s"${w}x$h q=$q meanDiff=$meanD")
    }
  }

  test("color baseline (subsampled): tight band vs the reference decode") {
    for ((w, h, q) <- Seq((64, 48, 0.85f), (57, 33, 0.7f), (100, 64, 0.92f))) {
      val jpeg = encodeJpeg(smoothImage(w, h, gray = false), q)
      val (maxD, meanD) = diffVsReference(jpeg)
      // chroma upsampling filters differ (triangular vs nearest):
      // smooth-content divergence stays low double-digit at image
      // edges; IDCT/convert rounding alone would be ±2
      assert(maxD <= 12, s"${w}x$h q=$q maxDiff=$maxD mean=$meanD")
      assert(meanD <= 2.0, s"${w}x$h q=$q meanDiff=$meanD")
    }
  }

  test("committed fixtures decode within the reference band (oracle tie)") {
    // The media_jpeg_stats oracle pins OUR decode of these bytes as
    // constants; this gate is what makes those constants meaningful —
    // the same committed bytes must decode within a tight band of the
    // reference decoder.
    for ((name, _, _, gray, _) <- JpegFixtureGen.Fixtures) {
      val in = getClass.getResourceAsStream(s"/graft/jpeg/$name.jpg")
      assert(in != null, s"missing committed fixture $name.jpg")
      val bytes = try in.readAllBytes() finally in.close()
      val (maxD, meanD) = diffVsReference(bytes)
      if (gray) assert(maxD <= 2 && meanD <= 0.5, s"$name max=$maxD mean=$meanD")
      else assert(maxD <= 12 && meanD <= 2.0, s"$name max=$maxD mean=$meanD")
    }
  }

  test("malformed JPEGs are rejected loudly") {
    intercept[IllegalArgumentException](
      JpegCodec.decode("definitely not a jpeg".getBytes))
    val good = encodeJpeg(smoothImage(16, 16, gray = true), 0.8f)
    // truncated entropy data
    intercept[IllegalArgumentException](JpegCodec.decode(good.dropRight(8)))
    // progressive rejected by marker (synthesize SOF2 from SOF0)
    val prog = good.clone()
    val sof = {
      var i = 2
      var at = -1
      while (at < 0 && i + 4 < prog.length) {
        if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) at = i
        else i += 1
      }
      at
    }
    assume(sof > 0, "fixture had no SOF0")
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodec.decode(prog))
  }
}
