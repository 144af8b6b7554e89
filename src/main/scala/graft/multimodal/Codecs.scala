package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real, pure-JVM codecs for media formats. Uncompressed containers
  * plus PNG (whose DEFLATE stream the JDK's java.util.zip handles);
  * JPEG/H.264 need codec libraries that do not ship here and stay
  * behind the documented swap point in [[Multimodal.decodeBytes]]:
  *
  *  - WAV: RIFF/WAVE PCM (the 1991 Microsoft/IBM Multimedia Programming
  *    Interface format) — 16-bit little-endian mono, proper chunk walk
  *    on decode (a conforming reader must skip unknown chunks, not
  *    assume a 44-byte header).
  *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB — rows
  *    stored bottom-up, each padded to a 4-byte boundary, pixels BGR.
  *  - Y4M: YUV4MPEG2 (the mjpegtools interchange format) — plain-text
  *    stream header, `FRAME\n` markers, raw 4:2:0 planes.
  *  - PNG: RFC 2083 — chunk walk with CRC32 verification, zlib
  *    inflate, and all five row unfilters (None/Sub/Up/Average/Paeth);
  *    8-bit gray/RGB/RGBA, non-interlaced. CodecsSuite cross-checks
  *    both directions against the JDK ImageIO reference codec.
  *
  * Encode exists so the engine can synthesize REAL format bytes for
  * fixtures and tests; decode is the production-direction operator. The
  * pairs are inverse by construction and spec-pinned byte-for-byte
  * (CodecsSuite), and the `media_decode_stats` oracle checks
  * text → encode → decode → stats against an independent SQL replica of
  * the generation formula, so a bug in either direction fails the
  * correctness gate.
  */
object Codecs {

  // ---------------------------------------------------------------- WAV

  /** 16-bit PCM mono WAV. */
  def wavEncode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    b.putInt(36 + dataLen) // riff payload size
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    b.putInt(16) // PCM fmt chunk size
    b.putShort(1) // audio format: PCM
    b.putShort(1) // channels: mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2) // byte rate = rate * channels * 16/8
    b.putShort(2) // block align
    b.putShort(16) // bits per sample
    b.put("data".getBytes(StandardCharsets.US_ASCII))
    b.putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** @return (sampleRate, samples). Walks chunks; requires PCM 16-bit
    *         mono (what wavEncode writes and fixtures contain). */
  def wavDecode(bytes: Array[Byte]): (Int, Array[Short]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); b.get(t)
      new String(t, StandardCharsets.US_ASCII)
    }
    require(tag() == "RIFF", "not a RIFF stream")
    b.getInt // riff size
    require(tag() == "WAVE", "not a WAVE stream")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (samples == null && b.remaining() >= 8) {
      val id = tag()
      val len = b.getInt
      id match {
        case "fmt " =>
          val fmt = b.getShort
          val channels = b.getShort
          sampleRate = b.getInt
          b.getInt; b.getShort // byte rate, block align
          val bits = b.getShort
          require(fmt == 1 && channels == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt ch=$channels bits=$bits")
          b.position(b.position() + (len - 16)) // skip fmt extensions
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = b.getShort; i += 1 }
          samples = out
        case _ => // skip unknown chunk (word-aligned)
          b.position(b.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk")
    (sampleRate, samples)
  }

  // ---------------------------------------------------------------- BMP

  /** 24-bit BI_RGB BMP from top-down row-major RGB triples. */
  def bmpEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val rowLen = width * 3
    val pad = (4 - rowLen % 4) % 4
    val dataLen = (rowLen + pad) * height
    val b = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataLen) // file size
    b.putInt(0) // reserved
    b.putInt(54) // pixel data offset
    b.putInt(40) // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height) // positive = bottom-up
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0) // BI_RGB
    b.putInt(dataLen)
    b.putInt(2835).putInt(2835) // 72 DPI in px/metre
    b.putInt(0).putInt(0) // palette sizes
    var row = height - 1
    while (row >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val p = (row * width + x) * 3
        b.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
        x += 1
      }
      var k = 0
      while (k < pad) { b.put(0.toByte); k += 1 }
      row -= 1
    }
    b.array()
  }

  /** @return (width, height, top-down row-major RGB triples). */
  def bmpDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B'.toByte && b.get() == 'M'.toByte, "not a BMP")
    b.getInt; b.getInt // file size, reserved
    val dataOffset = b.getInt
    val hdrSize = b.getInt
    val width = b.getInt
    val height = b.getInt
    b.getShort // planes
    val bpp = b.getShort
    val compression = b.getInt
    require(bpp == 24 && compression == 0 && height > 0,
      s"unsupported BMP: bpp=$bpp compression=$compression height=$height")
    require(hdrSize >= 40, "header too small")
    require(width > 0, s"invalid BMP width $width")
    val rowLen = width * 3
    val pad = (4 - rowLen % 4) % 4
    // reject malformed headers up front: a lying dataOffset/dims would
    // otherwise surface as a raw AIOOBE mid-copy instead of a clean error
    require(dataOffset >= 26 &&
      dataOffset.toLong + height.toLong * (rowLen + pad) <= bytes.length,
      s"truncated BMP: dataOffset=$dataOffset dims=${width}x$height " +
        s"need ${dataOffset.toLong + height.toLong * (rowLen + pad)} " +
        s"bytes, have ${bytes.length}")
    val rgb = new Array[Byte](width * height * 3)
    var row = height - 1
    var pos = dataOffset
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val p = (row * width + x) * 3
        rgb(p + 2) = bytes(pos); rgb(p + 1) = bytes(pos + 1)
        rgb(p) = bytes(pos + 2)
        pos += 3; x += 1
      }
      pos += pad
      row -= 1
    }
    (width, height, rgb)
  }

  // ---------------------------------------------------------------- Y4M

  /** YUV4MPEG2 4:2:0 from per-frame luma planes (chroma written
    * neutral-gray 128 — the fixtures carry information in Y only).
    * Width and height must be even (4:2:0 subsampling). */
  def y4mEncode(width: Int, height: Int,
      frames: Array[Array[Byte]], fpsNum: Int = 25): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    frames.foreach(f => require(f.length == width * height,
      "each frame must be a w*h luma plane"))
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:1 Ip A1:1 C420\n"
        .getBytes(StandardCharsets.US_ASCII)
    val chromaLen = (width / 2) * (height / 2)
    val frameMarker = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val out = ByteBuffer.allocate(header.length +
      frames.length * (frameMarker.length + width * height + 2 * chromaLen))
    out.put(header)
    frames.foreach { y =>
      out.put(frameMarker)
      out.put(y)
      var i = 0
      while (i < 2 * chromaLen) { out.put(128.toByte); i += 1 }
    }
    out.array()
  }

  /** @return (width, height, per-frame luma planes). */
  def y4mDecode(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    var pos = bytes.indexOf('\n'.toByte)
    require(pos > 0, "missing Y4M stream header")
    val header = new String(bytes, 0, pos, StandardCharsets.US_ASCII)
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    val params = header.split(" ").drop(1)
      .map(p => p.head -> p.tail).toMap
    val width = params('W').toInt
    val height = params('H').toInt
    require(width > 0 && height > 0, s"invalid Y4M dims ${width}x$height")
    require(!params.get('C').exists(c => c != "420" && !c.startsWith("420")),
      s"unsupported chroma mode ${params.get('C')}")
    val lumaLen = width * height
    val chromaLen = (width / 2) * (height / 2)
    pos += 1
    val frames = Array.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val eol = bytes.indexOf('\n'.toByte, pos)
      require(eol > 0 &&
        new String(bytes, pos, 5, StandardCharsets.US_ASCII) == "FRAME",
        s"expected FRAME marker at $pos")
      // copyOfRange zero-pads past end-of-input — a truncated final
      // frame must fail loudly, not decode as zero luma
      require(eol + 1 + lumaLen + 2 * chromaLen <= bytes.length,
        s"truncated Y4M frame at $pos: need ${eol + 1 + lumaLen + 2 * chromaLen} bytes, have ${bytes.length}")
      val y = java.util.Arrays.copyOfRange(bytes, eol + 1, eol + 1 + lumaLen)
      frames += y
      pos = eol + 1 + lumaLen + 2 * chromaLen
    }
    (width, height, frames.result())
  }

  // ---------------------------------------------------------------- PNG

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** PNG Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc32(typ: Array[Byte], data: Array[Byte], off: Int,
      len: Int): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(typ)
    crc.update(data, off, len)
    crc.getValue.toInt
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    out.write(ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    out.write(ByteBuffer.allocate(4)
      .putInt(crc32(t, data, 0, data.length)).array(), 0, 4)
  }

  /** 8-bit RGB PNG (color type 2), zlib-deflated, one IDAT. The row
    * filter CYCLES through all five spec filters (None/Sub/Up/Average/
    * Paeth, row % 5), so a decoder bug in any unfilter path breaks
    * round-trips and the media_png_stats oracle — a constant filter-0
    * encoder would leave four of the five decode paths untested. */
  def pngEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"invalid PNG dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    var row = 0
    while (row < height) {
      val f = row % 5
      raw(row * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(row * stride + i) & 0xff
        val a = if (i >= bpp) rgb(row * stride + i - bpp) & 0xff else 0
        val b = if (row > 0) rgb((row - 1) * stride + i) & 0xff else 0
        val c =
          if (row > 0 && i >= bpp) rgb((row - 1) * stride + i - bpp) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        raw(row * (stride + 1) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zout.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def beInt(bytes: Array[Byte], p: Int): Int =
    ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
      ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)

  /** @return (width, height, channels, interleaved 8-bit samples,
    * top-down row-major). Real inflate + unfilter decode: bit depth 8,
    * color types 0/2/6 (gray/RGB/RGBA), no interlace; ancillary chunks
    * are skipped; every chunk CRC is verified; truncated or
    * inconsistent pixel data fails loudly. */
  def pngDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 8 &&
      PngSig.indices.forall(i => bytes(i) == PngSig(i)), "not a PNG")
    var width = 0
    var height = 0
    var channels = 0
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    while (!seenIend) {
      require(pos + 8 <= bytes.length, s"truncated PNG chunk header at $pos")
      val len = beInt(bytes, pos)
      require(len >= 0, s"negative chunk length at $pos")
      require(pos + 12 + len <= bytes.length, s"truncated PNG chunk at $pos")
      val typ = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      val typBytes = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 8)
      require(crc32(typBytes, bytes, pos + 8, len) == beInt(bytes, pos + 8 + len),
        s"bad CRC in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "malformed IHDR")
          width = beInt(bytes, pos + 8)
          height = beInt(bytes, pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(width > 0 && height > 0, s"invalid dims ${width}x$height")
          channels = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // RGB
            case 6 => 4 // RGBA
            case t => throw new IllegalArgumentException(
              s"unsupported PNG color type $t")
          }
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(compression == 0 && filterMethod == 0 && interlace == 0,
            "unsupported compression/filter/interlace method")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk (tEXt, gAMA, ...) — skip
      }
      pos += 12 + len
    }
    require(seenIhdr, "missing IHDR")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0, s"truncated PNG pixel data: got $off of ${raw.length}")
      off += n
    }
    val leftover = inflater.inflate(new Array[Byte](1))
    inflater.end()
    require(leftover == 0, "PNG pixel data longer than dims imply")
    val out = new Array[Byte](stride * height)
    var row = 0
    while (row < height) {
      val f = raw(row * (stride + 1)) & 0xff
      require(f <= 4, s"bad PNG filter type $f in row $row")
      var i = 0
      while (i < stride) {
        val x = raw(row * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= channels) out(row * stride + i - channels) & 0xff else 0
        val b = if (row > 0) out((row - 1) * stride + i) & 0xff else 0
        val c =
          if (row > 0 && i >= channels) out((row - 1) * stride + i - channels) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        out(row * stride + i) = ((x + pred) & 0xff).toByte
        i += 1
      }
      row += 1
    }
    (width, height, channels, out)
  }
}
