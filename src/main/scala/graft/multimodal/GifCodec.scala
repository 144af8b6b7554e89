package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Real, pure-JVM GIF87a/89a codec — the LZW-compressed image/animation
  * container beside [[Codecs]] (WAV/BMP/Y4M/PNG) and [[JpegCodec]].
  *
  * Like the reference engine's other formats, this is public-spec work:
  * the GIF89a specification plus the standard LZW variable-width coding
  * (clear/EOI codes, LSB-first bit packing, 12-bit cap, width bump when
  * the next table slot stops fitting the current code width).
  *
  * Decode is the production-direction operator: header + logical screen
  * descriptor walk, global color table, extension-block skip, per-image
  * LZW decompress, palette application to interleaved RGB. Multi-image
  * streams (animations) decode to one frame per image descriptor.
  * Encode exists to synthesize REAL compressed fixtures (grayscale
  * palette, genuine LZW with dictionary growth and table-full clears)
  * so a decoder bug in any code path fails round-trips, the ImageIO
  * cross-check, and the `media_gif_frames` oracle.
  *
  * Supported on decode: global or local color tables, interlaced or
  * sequential rows, full-logical-screen frames (partial-frame
  * compositing would need disposal-method state; fails loudly rather
  * than misreading). The encoder emits sequential full frames over a
  * 256-gray global table — and the ImageIO interop spec feeds the
  * decoder interlaced, writer-paletted streams.
  */
object GifCodec {

  private val Header89 = "GIF89a".getBytes(StandardCharsets.US_ASCII)
  private val Header87 = "GIF87a".getBytes(StandardCharsets.US_ASCII)

  /** 256-entry grayscale palette (index i → (i,i,i)). */
  private def grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
      i += 1
    }
    p
  }

  // ------------------------------------------------------------- encode

  /** GIF89a with a 256-gray global color table; one image descriptor
    * per frame (full logical screen, non-interlaced), real LZW. Frames
    * are w*h palette indices (gray values). */
  def gifEncode(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"invalid GIF dims ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"each frame must be w*h=${width * height} indices, got ${f.length}"))
    val out = new ByteArrayOutputStream()
    out.write(Header89, 0, 6)
    // logical screen descriptor: dims, GCT flag + 8-bit color res +
    // size 7 (256 entries), background 0, aspect 0
    writeU16(out, width); writeU16(out, height)
    out.write(0xf7); out.write(0); out.write(0)
    val pal = grayPalette
    out.write(pal, 0, 768)
    frames.foreach { f =>
      out.write(0x2c) // image descriptor
      writeU16(out, 0); writeU16(out, 0) // left, top
      writeU16(out, width); writeU16(out, height)
      out.write(0) // no local color table, not interlaced
      lzwCompress(f, out)
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def writeU16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Variable-width LZW per the GIF spec: min code size 8 (256 roots),
    * clear first, dictionary of (prefixCode, byte) pairs, width bump
    * after the add that makes the next slot exceed the current width,
    * clear + reset when the table hits 4096, EOI last. Output packed
    * LSB-first and chunked into ≤255-byte sub-blocks. */
  private def lzwCompress(indices: Array[Byte], out: ByteArrayOutputStream): Unit = {
    val mcs = 8
    val clear = 1 << mcs
    val eoi = clear + 1
    out.write(mcs)
    val blocks = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = mcs + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        blocks.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: (prefix code, next byte) → code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) {
        cur = hit.intValue()
      } else {
        emit(cur)
        dict.put(key, Integer.valueOf(next))
        next += 1
        // the just-added slot means the NEXT emitted code can reference
        // index next-1; bump once that index stops fitting `width` bits
        if (next == (1 << width) + 1 && width < 12) width += 1
        if (next == 4096) { // table full: clear and restart
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = eoi + 1
          width = mcs + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) blocks.write((bitBuf & 0xff).toInt)
    // chunk into sub-blocks
    val data = blocks.toByteArray
    var p = 0
    while (p < data.length) {
      val n = math.min(255, data.length - p)
      out.write(n)
      out.write(data, p, n)
      p += n
    }
    out.write(0) // block terminator
  }

  // ------------------------------------------------------------- decode

  /** @return (width, height, per-frame interleaved RGB triples 0..255,
    * top-down row-major — the palette is applied, like any conforming
    * renderer). Walks the container: logical screen descriptor, global
    * color table, extension blocks (skipped), one LZW decompress per
    * image descriptor; truncated or malformed streams fail loudly. */
  def gifDecode(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    require(bytes.length >= 13, "truncated GIF header")
    val hdrOk = Header89.indices.forall(i => bytes(i) == Header89(i)) ||
      Header87.indices.forall(i => bytes(i) == Header87(i))
    require(hdrOk, "not a GIF87a/GIF89a stream")
    val width = u16(bytes, 6)
    val height = u16(bytes, 8)
    require(width > 0 && height > 0, s"invalid GIF dims ${width}x$height")
    // width*height*3 must not overflow Int (40000x40000 wraps positive):
    // a hostile header should fail validation here, not as an opaque
    // ArrayIndexOutOfBounds or a multi-GB allocation downstream
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"GIF dims ${width}x$height exceed the supported pixel budget")
    val packed = bytes(10) & 0xff
    var pos = 13
    val globalPalette: Array[Byte] = if ((packed & 0x80) != 0) {
      val gctSize = 2 << (packed & 7)
      require(pos + 3 * gctSize <= bytes.length, "truncated global color table")
      val p = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * gctSize)
      pos += 3 * gctSize
      p
    } else null
    val frames = Array.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      require(pos < bytes.length, "GIF stream ended without trailer")
      val block = bytes(pos) & 0xff
      pos += 1
      block match {
        case 0x3b => done = true
        case 0x21 => // extension: label byte + sub-blocks
          require(pos < bytes.length, "truncated extension block")
          pos += 1
          pos = skipSubBlocks(bytes, pos)
        case 0x2c =>
          require(pos + 9 <= bytes.length, "truncated image descriptor")
          val left = u16(bytes, pos); val top = u16(bytes, pos + 2)
          val iw = u16(bytes, pos + 4); val ih = u16(bytes, pos + 6)
          val ipacked = bytes(pos + 8) & 0xff
          pos += 9
          require(left == 0 && top == 0 && iw == width && ih == height,
            s"unsupported partial frame ${iw}x$ih at ($left,$top)")
          val interlaced = (ipacked & 0x40) != 0
          val palette = if ((ipacked & 0x80) != 0) { // local color table
            val lctSize = 2 << (ipacked & 7)
            require(pos + 3 * lctSize <= bytes.length,
              "truncated local color table")
            val p = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * lctSize)
            pos += 3 * lctSize
            p
          } else {
            require(globalPalette != null,
              "frame has neither local nor global color table")
            globalPalette
          }
          val (stored, newPos) = lzwDecompress(bytes, pos, width * height)
          pos = newPos
          val indices = if (interlaced) deinterlace(stored, width, height)
            else stored
          // apply the palette → interleaved RGB
          val rgb = new Array[Byte](width * height * 3)
          var j = 0
          while (j < indices.length) {
            val idx = indices(j) & 0xff
            require(3 * idx + 2 < palette.length,
              s"palette index $idx out of range (${palette.length / 3} entries)")
            rgb(3 * j) = palette(3 * idx)
            rgb(3 * j + 1) = palette(3 * idx + 1)
            rgb(3 * j + 2) = palette(3 * idx + 2)
            j += 1
          }
          frames += rgb
        case b => throw new IllegalArgumentException(
          f"unknown GIF block 0x$b%02x at ${pos - 1}")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF contains no image data")
    (width, height, fs)
  }

  /** GIF interlace (four passes: rows 0%8, 4%8, 2%4, 1%2) → sequential
    * top-down rows. The writer stores pass-ordered rows; this maps the
    * i-th stored row back to its display position. */
  private def deinterlace(stored: Array[Byte], width: Int,
      height: Int): Array[Byte] = {
    val out = new Array[Byte](stored.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var row = start
      while (row < height) {
        System.arraycopy(stored, src * width, out, row * width, width)
        src += 1
        row += step
      }
    }
    out
  }

  private def u16(bytes: Array[Byte], p: Int): Int =
    (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)

  private def skipSubBlocks(bytes: Array[Byte], start: Int): Int = {
    var pos = start
    while ({
      require(pos < bytes.length, "truncated sub-block chain")
      val n = bytes(pos) & 0xff
      pos += 1 + n
      n != 0
    }) ()
    pos
  }

  /** Standard GIF LZW decode: variable code width from minCodeSize+1 to
    * 12 bits, LSB-first packing, clear/EOI codes, the code==next
    * (cScSc) special case, deferred-clear tolerance at a full table.
    * @return (nPixels palette indices, position after the terminator) */
  private def lzwDecompress(bytes: Array[Byte], start: Int,
      nPixels: Int): (Array[Byte], Int) = {
    var pos = start
    require(pos < bytes.length, "missing LZW minimum code size")
    val mcs = bytes(pos) & 0xff
    pos += 1
    require(mcs >= 2 && mcs <= 8, s"bad LZW min code size $mcs")
    val clear = 1 << mcs
    val eoi = clear + 1
    // dictionary as (prefix, suffix) arrays — strings materialize by
    // walking prefixes backwards into the output buffer
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var width = mcs + 1
    var next = eoi + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var blockLeft = 0
    var finished = false
    var sawTerminator = false
    def fillBits(): Boolean = {
      while (bitCnt < width) {
        if (blockLeft == 0) {
          require(pos < bytes.length, "truncated LZW sub-block chain")
          blockLeft = bytes(pos) & 0xff
          pos += 1
          if (blockLeft == 0) { sawTerminator = true; return false }
        }
        require(pos < bytes.length, "truncated LZW data")
        bitBuf |= (bytes(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
        blockLeft -= 1
      }
      true
    }
    while (!finished && fillBits()) {
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      if (code == clear) {
        width = mcs + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        finished = true
      } else {
        require(code < next || (code == next && prev >= 0),
          s"LZW code $code out of range (next=$next)")
        // materialize string(code) — for code==next, string(prev)+first
        var sp = 0
        var c = if (code == next) prev else code
        val firstOfPrev = code == next
        while (c >= clear + 2) { // non-root: walk the chain
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        val root = c.toByte
        val strLen = sp + 1 + (if (firstOfPrev) 1 else 0)
        require(outPos + strLen <= nPixels,
          s"LZW output overruns ${nPixels}px frame")
        out(outPos) = root
        outPos += 1
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (firstOfPrev) { out(outPos) = root; outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = root
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == nPixels,
      s"LZW stream decoded $outPos of $nPixels pixels")
    // consume the rest of the sub-block chain through its terminator
    // (EOI usually lands mid-block, leaving bytes and the 0 unread)
    if (!sawTerminator) {
      if (blockLeft > 0) { pos += blockLeft; blockLeft = 0 }
      var n = -1
      while ({
        require(pos < bytes.length, "missing LZW block terminator")
        n = bytes(pos) & 0xff
        pos += 1
        n != 0
      }) pos += n
    }
    (out, pos)
  }
}
