package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real, pure-JVM codecs for the UNCOMPRESSED media formats — the part
  * of the multimodal story this container CAN make real (no image/audio
  * libraries ship here, so compressed formats like PNG/JPEG/H.264 stay
  * behind the documented swap point in [[Multimodal.decodeBytes]]):
  *
  *  - WAV: RIFF/WAVE PCM (the 1991 Microsoft/IBM Multimedia Programming
  *    Interface format) — 16-bit little-endian mono, proper chunk walk
  *    on decode (a conforming reader must skip unknown chunks, not
  *    assume a 44-byte header).
  *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB — rows
  *    stored bottom-up, each padded to a 4-byte boundary, pixels BGR.
  *  - Y4M: YUV4MPEG2 (the mjpegtools interchange format) — plain-text
  *    stream header, `FRAME\n` markers, raw 4:2:0 planes.
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
}
