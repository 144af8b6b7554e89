package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** GIF codec spec: LZW round-trips across content regimes (dictionary
  * growth, width bumps, table-full clears, the cScSc special case),
  * animations, interop with the JDK ImageIO reference codec in both
  * directions, and loud rejection of malformed streams. */
class GifSuite extends AnyFunSuite {

  private def gray(i: Int): Int = {
    val v = i & 0xff
    (v << 16) | (v << 8) | v
  }

  test("round-trip: dims × content patterns, incl. width-bump regimes") {
    val patterns: Seq[(String, Int => Byte)] = Seq(
      ("gradient", j => (j % 256).toByte),
      ("constant", _ => 77.toByte), // cScSc-heavy, runs of one symbol
      ("pseudo-random", j => ((j * 131 + 17) % 251).toByte),
      ("two-symbol", j => (if ((j / 3) % 2 == 0) 10 else 200).toByte))
    for ((w, h) <- Seq((1, 1), (3, 7), (8, 8), (17, 5), (40, 30));
         (_, pat) <- patterns) {
      val idx = Array.tabulate(w * h)(pat)
      val (gw, gh, frames) = GifCodec.gifDecode(GifCodec.gifEncode(w, h, Array(idx)))
      assert((gw, gh, frames.length) === ((w, h, 1)))
      // gray palette: each decoded RGB triple is (i, i, i)
      val rgb = frames(0)
      assert(rgb.length === w * h * 3)
      for (j <- 0 until w * h) {
        val v = idx(j)
        assert(rgb(3 * j) === v && rgb(3 * j + 1) === v && rgb(3 * j + 2) === v,
          s"pixel $j at ${w}x$h")
      }
    }
  }

  test("round-trip survives the 4096-entry table-full clear") {
    // ~10k pseudo-random pixels force the dictionary past 4096 entries,
    // so the encoder must emit a mid-stream clear and the decoder must
    // resynchronize
    val (w, h) = (100, 100)
    val idx = Array.tabulate(w * h)(j => ((j * 197 + j / 7 + 31) % 256).toByte)
    val bytes = GifCodec.gifEncode(w, h, Array(idx))
    val (gw, gh, frames) = GifCodec.gifDecode(bytes)
    assert((gw, gh) === ((w, h)))
    assert(frames(0).toSeq === idx.flatMap(v => Seq(v, v, v)).toSeq)
    // and it actually compressed relative to raw indices + container
    assert(bytes.length < 13 + 768 + w * h,
      s"LZW output ${bytes.length} did not compress ${w * h} pixels")
  }

  test("animation round-trip: one frame per image descriptor") {
    val (w, h) = (11, 6)
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(w * h)(j => ((f * 37 + j) % 256).toByte))
    val (gw, gh, out) = GifCodec.gifDecode(GifCodec.gifEncode(w, h, frames))
    assert((gw, gh, out.length) === ((w, h, 5)))
    for (f <- 0 until 5; j <- 0 until w * h)
      assert(out(f)(3 * j) === frames(f)(j), s"frame $f pixel $j")
  }

  test("GIF interop: JDK ImageIO reads our bytes; we read ImageIO's") {
    val (w, h) = (19, 13)
    val idx = Array.tabulate(w * h)(j => ((j * 23 + 5) % 256).toByte)
    // our encoder → reference decoder
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(GifCodec.gifEncode(w, h, Array(idx))))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) === gray(idx(y * w + x)),
        s"ImageIO pixel ($x,$y)")
    // reference encoder → our decoder (indexed gray image; palette
    // ordering is the writer's choice, so compare rendered RGB values)
    val cm = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }
    val ref = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      ref.setRGB(x, y, gray(idx(y * w + x)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(ref, "gif", bos))
    val (gw, gh, frames) = GifCodec.gifDecode(bos.toByteArray)
    assert(gw === w && gh === h && frames.length === 1)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val rgb = frames(0)
      assert(((rgb(p) & 0xff) << 16 | (rgb(p + 1) & 0xff) << 8 |
        (rgb(p + 2) & 0xff)) === gray(idx(y * w + x)),
        s"our decode of ImageIO bytes at ($x,$y)")
    }
  }

  test("multi-frame animation survives the ImageIO reference reader") {
    val (w, h) = (9, 9)
    val frames = Array.tabulate(3)(f =>
      Array.tabulate(w * h)(j => ((f * 80 + j * 2) % 256).toByte))
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(GifCodec.gifEncode(w, h, frames)))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) === 3)
    for (f <- 0 until 3) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) === gray(frames(f)(y * w + x)),
          s"frame $f pixel ($x,$y)")
    }
    reader.dispose()
  }

  test("malformed streams are rejected, not misdecoded") {
    val good = GifCodec.gifEncode(6, 4, Array(Array.tabulate(24)(_.toByte)))
    // wrong magic
    intercept[IllegalArgumentException](
      GifCodec.gifDecode("JIF89a".getBytes ++ good.drop(6)))
    // truncated: mid color table, mid pixel data, missing trailer
    intercept[IllegalArgumentException](GifCodec.gifDecode(good.take(20)))
    intercept[IllegalArgumentException](GifCodec.gifDecode(good.dropRight(6)))
    intercept[IllegalArgumentException](GifCodec.gifDecode(good.dropRight(1)))
    // unknown block type where a descriptor should be
    val bad = good.clone()
    bad(13 + 768) = 0x7e.toByte // first block byte after header+GCT
    intercept[IllegalArgumentException](GifCodec.gifDecode(bad))
    // encoder input validation
    intercept[IllegalArgumentException](
      GifCodec.gifEncode(4, 4, Array(Array.tabulate(15)(_.toByte))))
    intercept[IllegalArgumentException](
      GifCodec.gifEncode(0, 4, Array(Array.empty[Byte])))
  }
}
