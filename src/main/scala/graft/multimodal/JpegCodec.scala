package graft.multimodal

/** Baseline JPEG (ITU-T T.81) decoder, pure JVM — the last compressed
  * format a real multimodal corpus actually contains that this engine
  * can decode without external codec libraries: marker parse (SOI /
  * APPn / DQT / SOF0-1 / DHT / DRI / SOS / EOI), canonical Huffman
  * entropy decode with byte-stuffing and restart markers, dequantize +
  * dezigzag, separable double-precision 8×8 IDCT, nearest-neighbour
  * chroma upsampling, and JFIF YCbCr→RGB.
  *
  * Scope: baseline + extended-sequential Huffman (SOF0/SOF1), 8-bit,
  * 1 or 3 components, single interleaved scan. Progressive (SOF2) and
  * arithmetic coding are rejected loudly. IDCT is the mathematically
  * exact double-precision transform, so decoded samples may differ
  * from a fixed-point reference decoder (libjpeg "islow") by ±1, and
  * smooth-chroma 4:2:0 images by a few counts where libjpeg's
  * triangular upsampling interpolates — JpegSuite pins both bounds
  * against the JDK ImageIO reference decoder.
  */
object JpegCodec {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — one axis of the
    * separable IDCT. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) math.sqrt(0.5) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table (T.81 annex C): decode via the standard
    * mincode/maxcode/valptr walk. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (code > maxcode(l)) {
        code = (code << 1) | br.bit()
        l += 1
        require(l <= 16, "corrupt JPEG: Huffman code over 16 bits")
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, unstuffing
    * 0xFF00 and stopping (byte-aligned) at any real marker. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated JPEG entropy data")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated JPEG entropy data")
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed 0xFF data byte
          else {
            // real marker mid-read: per T.81 only legal at restart /
            // end-of-scan; reaching it inside a block is corruption
            throw new IllegalArgumentException(
              f"unexpected marker 0xFF$b2%02X inside entropy data")
          }
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = nbits = 0
    /** Consume the expected RSTn marker (cyclic 0xD0..0xD7). */
    def restart(n: Int): Unit = {
      byteAlign()
      require(pos + 2 <= bytes.length &&
        (bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) == 0xd0 + n,
        s"missing restart marker RST$n")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int,
      val tq: Int) {
    var dcTab = 0
    var acTab = 0
    var dcPred = 0
    var plane: Array[Byte] = null
    var planeW = 0
  }

  /** Decode one 8×8 block into `out` (clamped 0..255 spatial samples).
    * Coefficients are Huffman-decoded in zigzag order, dequantized,
    * placed naturally, then IDCT'd with the exact separable float
    * transform. */
  private def decodeBlock(br: BitReader, dc: Huff, ac: Huff,
      q: Array[Int], comp: Component, coef: Array[Int],
      out: Array[Int]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val t = dc.decode(br)
    comp.dcPred += extend(br.receive(t), t)
    coef(0) = comp.dcPred * q(0)
    var k = 1
    while (k < 64) {
      val rs = ac.decode(br)
      val r = rs >> 4
      val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL: sixteen zeros
        else k = 64 // EOB
      } else {
        k += r
        require(k < 64, "corrupt JPEG: AC run past block end")
        coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
        k += 1
      }
    }
    // rows then columns; +128 level shift and clamp at the end
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(x)(u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = acc
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += Cos(yy)(v) * tmp(v * 8 + x); v += 1 }
        val s = math.round(acc + 128.0).toInt
        out(yy * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        yy += 1
      }
      x += 1
    }
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** @return (width, height, channels, interleaved 8-bit samples,
    * top-down row-major; channels = 1 gray / 3 RGB). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }
    require(bytes.length > 4 && u16() == 0xffd8, "not a JPEG (missing SOI)")

    val quant = Array.ofDim[Int](4, 64)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var result: Array[Byte] = null
    var channels = 0

    def parseScan(): Unit = {
      val segLen = u16()
      val segEnd = pos + segLen - 2
      val ns = u8()
      require(comps != null, "SOS before SOF")
      require(ns == comps.length,
        s"only single interleaved scans supported (Ns=$ns)")
      var i = 0
      while (i < ns) {
        val cs = u8()
        val c = comps.find(_.id == cs).getOrElse(
          throw new IllegalArgumentException(s"scan references unknown component $cs"))
        val tt = u8()
        c.dcTab = tt >> 4
        c.acTab = tt & 15
        i += 1
      }
      pos = segEnd // Ss/Se/AhAl (baseline: 0/63/00) end the segment
      val maxH = comps.map(_.h).max
      val maxV = comps.map(_.v).max
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      comps.foreach { c =>
        c.planeW = mcusX * c.h * 8
        c.plane = new Array[Byte](c.planeW * mcusY * c.v * 8)
        c.dcPred = 0
      }
      val br = new BitReader(bytes, pos)
      val coef = new Array[Int](64)
      val blk = new Array[Int](64)
      var mcu = 0
      var rst = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.restart(rst)
            rst = (rst + 1) % 8
            comps.foreach(_.dcPred = 0)
          }
          comps.foreach { c =>
            val dc = huffDc(c.dcTab)
            val ac = huffAc(c.acTab)
            require(dc != null && ac != null, "scan uses undefined Huffman table")
            val q = quant(c.tq)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(br, dc, ac, q, c, coef, blk)
                val ox = (mx * c.h + bx) * 8
                val oy = (my * c.v + by) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    c.plane((oy + yy) * c.planeW + ox + xx) =
                      blk(yy * 8 + xx).toByte
                    xx += 1
                  }
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
      br.byteAlign()
      pos = br.pos
      // assemble output: nearest-neighbour subsample lookup + color
      channels = if (comps.length == 1) 1 else 3
      result = new Array[Byte](width * height * channels)
      val cY = comps(0)
      if (channels == 1) {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            result(y * width + x) = cY.plane(y * cY.planeW + x)
            x += 1
          }
          y += 1
        }
      } else {
        val cCb = comps(1)
        val cCr = comps(2)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val lum = cY.plane(
              (y * cY.v / maxV) * cY.planeW + (x * cY.h / maxH)) & 0xff
            val cb = (cCb.plane(
              (y * cCb.v / maxV) * cCb.planeW + (x * cCb.h / maxH)) & 0xff) - 128
            val cr = (cCr.plane(
              (y * cCr.v / maxV) * cCr.planeW + (x * cCr.h / maxH)) & 0xff) - 128
            val p = (y * width + x) * 3
            result(p) = clamp255(math.round(lum + 1.402 * cr)).toByte
            result(p + 1) = clamp255(math.round(
              lum - 0.344136 * cb - 0.714136 * cr)).toByte
            result(p + 2) = clamp255(math.round(lum + 1.772 * cb)).toByte
            x += 1
          }
          y += 1
        }
      }
    }

    var done = false
    while (!done) {
      require(pos + 2 <= bytes.length, "truncated JPEG: missing EOI")
      var m = u8()
      require(m == 0xff, f"expected marker, got 0x$m%02X at ${pos - 1}")
      m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd9 => done = true // EOI
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          val sofLen = u16()
          val end = pos + sofLen - 2
          val precision = u8()
          require(precision == 8, s"unsupported sample precision $precision")
          height = u16()
          width = u16()
          require(width > 0 && height > 0, s"invalid dims ${width}x$height")
          val nc = u8()
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.fill(nc) {
            val id = u8()
            val hv = u8()
            val tq = u8()
            require(tq < 4, s"bad quant table id $tq")
            new Component(id, hv >> 4, hv & 15, tq)
          }
          comps.foreach(c => require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
            s"bad sampling factors ${c.h}x${c.v}"))
          pos = end
        case 0xc2 =>
          throw new IllegalArgumentException("progressive JPEG (SOF2) not supported")
        case 0xc4 => // DHT: one or more tables
          val dhtLen = u16()
          val end = pos + dhtLen - 2
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4
            val id = tc & 15
            require(cls <= 1 && id < 4, s"bad DHT header $tc")
            val bits = Array.fill(16)(u8())
            val vals = Array.fill(bits.sum)(u8())
            if (cls == 0) huffDc(id) = new Huff(bits, vals)
            else huffAc(id) = new Huff(bits, vals)
          }
          require(pos == end, "malformed DHT segment")
        case 0xdb => // DQT: one or more tables
          val dqtLen = u16()
          val end = pos + dqtLen - 2
          while (pos < end) {
            val pq = u8()
            require((pq >> 4) == 0, "16-bit quant tables not supported (baseline)")
            val id = pq & 15
            require(id < 4, s"bad quant table id $id")
            var i = 0
            while (i < 64) { quant(id)(i) = u8(); i += 1 }
          }
          require(pos == end, "malformed DQT segment")
        case 0xdd => // DRI
          val driLen = u16()
          val end = pos + driLen - 2
          restartInterval = u16()
          pos = end
        case 0xda => parseScan()
        case x if x >= 0xd0 && x <= 0xd7 => // stray RST: nothing to skip
        case _ => // APPn / COM / others: length-prefixed, skip
          val len = u16()
          require(len >= 2 && pos + len - 2 <= bytes.length,
            f"truncated segment 0xFF$m%02X")
          pos += len - 2
      }
    }
    require(result != null, "no scan decoded (missing SOS)")
    (width, height, channels, result)
  }
}
