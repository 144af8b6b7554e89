package graft.multimodal

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level gates for the real codecs: exact round-trips (including
  * BMP row padding and negative PCM samples), spec-mandated header
  * magic, chunk-walking on decode, and rejection of malformed input. */
class CodecsSuite extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("WAV round-trip: PCM16 mono, negative samples, rates") {
    for (n <- Seq(0, 1, 7, 1000); rate <- Seq(8000, 16000, 44100)) {
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val (gotRate, gotSamples) = Codecs.wavDecode(Codecs.wavEncode(samples, rate))
      assert(gotRate === rate)
      assert(gotSamples.toSeq === samples.toSeq)
    }
  }

  test("WAV header magic matches the RIFF/WAVE spec") {
    val bytes = Codecs.wavEncode(Array[Short](1, -1), 16000)
    assert(new String(bytes.take(4), StandardCharsets.US_ASCII) === "RIFF")
    assert(new String(bytes.slice(8, 12), StandardCharsets.US_ASCII) === "WAVE")
    assert(new String(bytes.slice(12, 16), StandardCharsets.US_ASCII) === "fmt ")
    assert(bytes.length === 44 + 4) // canonical header + 2 samples
  }

  test("WAV decode walks unknown chunks (LIST before data)") {
    // a conforming reader skips chunks it does not understand
    val base = Codecs.wavEncode(Array[Short](5, 6, 7), 8000)
    val (head, data) = base.splitAt(36) // riff+fmt | data chunk
    val listChunk = "LIST".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes(StandardCharsets.US_ASCII)
    val withExtra = head ++ listChunk ++ data
    // fix the RIFF size field (bytes 4-7, little endian)
    val fixed = withExtra.clone()
    val riffLen = withExtra.length - 8
    for (i <- 0 until 4) fixed(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val (rate, samples) = Codecs.wavDecode(fixed)
    assert(rate === 8000)
    assert(samples.toSeq === Seq[Short](5, 6, 7))
  }

  test("BMP round-trip incl. non-multiple-of-4 row widths (padding)") {
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 4), (16, 16), (30, 22))) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val (gw, gh, got) = Codecs.bmpDecode(Codecs.bmpEncode(w, h, rgb))
      assert((gw, gh) === (w, h))
      assert(got.toSeq === rgb.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("BMP header magic and layout constants") {
    val bytes = Codecs.bmpEncode(2, 2, Array.fill(12)(9.toByte))
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    // pixel offset 54 = 14 (file header) + 40 (info header)
    assert(bytes(10) === 54.toByte)
    // 2px * 3B = 6B rows padded to 8 → 2 rows = 16B of pixel data
    assert(bytes.length === 54 + 16)
  }

  test("Y4M round-trip: multiple frames, even dims") {
    for ((w, h, nf) <- Seq((2, 2, 1), (16, 16, 8), (30, 22, 3))) {
      val frames = Array.fill(nf)(Array.fill(w * h)(rnd.nextInt(256).toByte))
      val (gw, gh, got) = Codecs.y4mDecode(Codecs.y4mEncode(w, h, frames))
      assert((gw, gh) === (w, h))
      assert(got.length === nf)
      got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    }
  }

  test("Y4M stream header is spec-shaped and chroma planes are present") {
    val bytes = Codecs.y4mEncode(4, 2, Array(Array.fill(8)(1.toByte)))
    val header = new String(bytes.takeWhile(_ != '\n'.toByte),
      StandardCharsets.US_ASCII)
    assert(header === "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420")
    // header + \n + FRAME\n + Y(8) + U(2) + V(2)
    assert(bytes.length === header.length + 1 + 6 + 8 + 4)
  }

  test("malformed inputs are rejected, not misdecoded") {
    intercept[IllegalArgumentException](
      Codecs.wavDecode("nope".getBytes ++ Array.fill(40)(0.toByte)))
    intercept[IllegalArgumentException](
      Codecs.bmpDecode(Array.fill(60)(7.toByte)))
    intercept[IllegalArgumentException](
      Codecs.y4mDecode("MPEG4 W2 H2\nFRAME\n....".getBytes))
    intercept[IllegalArgumentException](
      Codecs.y4mEncode(3, 2, Array(Array.fill(6)(0.toByte)))) // odd width
  }

  test("PNG round-trip: all five row filters, odd widths, gradients") {
    for ((w, h) <- Seq((1, 1), (3, 7), (8, 8), (17, 5), (32, 11))) {
      val rgb = Array.tabulate(w * h * 3)(j => ((j * 31 + 7) % 256).toByte)
      val (gw, gh, ch, out) = Codecs.pngDecode(Codecs.pngEncode(w, h, rgb))
      assert((gw, gh, ch) === ((w, h, 3)))
      assert(out.toSeq === rgb.toSeq)
    }
  }

  test("PNG interop: JDK ImageIO reads our bytes; we read ImageIO's") {
    val (w, h) = (13, 9)
    val rgb = Array.tabulate(w * h * 3)(j => ((j * 131 + 17) % 256).toByte)
    // our encoder → reference decoder
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Codecs.pngEncode(w, h, rgb)))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val argb = img.getRGB(x, y)
      assert(((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff) ===
        ((rgb(p) & 0xff, rgb(p + 1) & 0xff, rgb(p + 2) & 0xff)))
    }
    // reference encoder → our decoder
    val ref = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      ref.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
        ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ref, "png", bos)
    val (gw, gh, ch, out) = Codecs.pngDecode(bos.toByteArray)
    assert(gw === w && gh === h)
    // ImageIO may emit RGB or gray; compare channel-aware
    assert(ch === 3 || ch === 1)
    if (ch === 3) assert(out.toSeq === rgb.toSeq)
  }

  test("PNG malformed inputs are rejected: bad magic, CRC, truncation") {
    val good = Codecs.pngEncode(4, 4, Array.tabulate(48)(_.toByte))
    intercept[IllegalArgumentException](
      Codecs.pngDecode("not a png at all".getBytes))
    // flip a byte inside IDAT → CRC failure
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    intercept[IllegalArgumentException](Codecs.pngDecode(corrupt))
    // drop the tail (no IEND / truncated chunk)
    intercept[IllegalArgumentException](Codecs.pngDecode(good.dropRight(16)))
    // dims larger than pixel data: lie in IHDR width (and fix its CRC)
    val lying = good.clone()
    lying(16 + 3) = 100 // IHDR width LSB (sig 8 + len 4 + type 4 + 3)
    val crc = new java.util.zip.CRC32()
    crc.update(lying, 12, 4 + 13)
    val fixed = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    System.arraycopy(fixed, 0, lying, 12 + 4 + 13, 4)
    intercept[IllegalArgumentException](Codecs.pngDecode(lying))
  }

  test("truncated payloads fail loudly instead of zero-padding") {
    // Y4M: drop the tail of the final frame — must not decode as zero luma
    val y4m = Codecs.y4mEncode(4, 4, Array(Array.tabulate(16)(_.toByte)))
    intercept[IllegalArgumentException](
      Codecs.y4mDecode(y4m.dropRight(3)))
    // BMP: pixel data shorter than dataOffset + rows claims
    val bmp = Codecs.bmpEncode(4, 4, Array.tabulate(48)(_.toByte))
    intercept[IllegalArgumentException](
      Codecs.bmpDecode(bmp.dropRight(5)))
    // BMP: header claiming absurd dims over a small buffer
    val lying = bmp.clone()
    lying(18) = 127 // width LSB → width no longer fits the data
    intercept[IllegalArgumentException](Codecs.bmpDecode(lying))
  }
}
