package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** RIFF/AVI container for Motion-JPEG video — the compressed-video
  * path: each `00dc` chunk in the `movi` list is a complete baseline
  * JPEG, decoded per-frame by [[JpegCodec]].
  *
  * This is deliberately a DEMUXER, separate from the frame codec: real
  * video pipelines split container walk (cheap, sequential) from frame
  * decode (expensive, parallel per frame), and the Spark plan mirrors
  * that — AviMjpegFrames emits array<binary> frame payloads map-side,
  * posexplode fans frames out, JpegDecode runs per frame. Payload
  * bytes never shuffle; only per-frame stats leave the scan stage.
  *
  * Encode assembles a spec-shaped AVI (hdrl with avih + one vids strl,
  * MJPG fourcc, movi list, even-padded chunks) so fixtures are genuine
  * multi-frame compressed video; decode walks RIFF structure only —
  * unknown chunks and lists (idx1, INFO, JUNK) are skipped by size,
  * like any conforming reader.
  */
object AviMjpeg {

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.US_ASCII)

  /** Minimal conforming AVI wrapping pre-encoded JPEG frames. */
  def aviEncode(width: Int, height: Int, fps: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "invalid AVI parameters")
    require(frames.nonEmpty, "need at least one frame")
    val maxFrame = frames.map(_.length).max

    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1 // RIFF chunks are word-aligned
      val b = ByteBuffer.allocate(8 + data.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc(id)).putInt(data.length).put(data)
      if (pad == 1) b.put(0.toByte)
      b.array()
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(typ)).put(body)
      b.array()
    }

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps) // µs per frame
      .putInt(maxFrame * fps) // max bytes/sec
      .putInt(0) // padding granularity
      .putInt(0) // flags: no idx1 is written, so AVIF_HASINDEX stays off
      .putInt(frames.length)
      .putInt(0) // initial frames
      .putInt(1) // streams
      .putInt(maxFrame) // suggested buffer
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put(fourcc("vids")).put(fourcc("MJPG"))
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(fps) // scale, rate → fps
      .putInt(0).putInt(frames.length) // start, length
      .putInt(maxFrame) // suggested buffer
      .putInt(-1) // quality: default
      .putInt(0) // sample size: varies
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bpp
      .put(fourcc("MJPG")) // biCompression
      .putInt(width * height * 3) // size image (uncompressed bound)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dpi + palette
      .array()

    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF"), 0, 4)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(body.length).array(), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** @return (width, height, fps, per-frame JPEG payloads). Walks the
    * RIFF tree: requires one vids stream; collects `00dc`/`00db`
    * chunks from the movi list; skips unknown chunks/lists by size;
    * truncation fails loudly. */
  def aviDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
    require(bytes.length >= 12, "truncated RIFF header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); b.get(t)
      new String(t, StandardCharsets.US_ASCII)
    }
    require(tag() == "RIFF", "not a RIFF stream")
    val riffLen = b.getInt
    require(riffLen >= 4 && 8 + riffLen <= bytes.length,
      s"truncated RIFF payload: claims $riffLen, have ${bytes.length - 8}")
    require(tag() == "AVI ", "not an AVI stream")

    var width = 0
    var height = 0
    var fps = 0
    val frames = Array.newBuilder[Array[Byte]]
    var nFrames = 0

    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = tag()
        val len = b.getInt
        require(len >= 0 && b.position() + len <= end,
          s"truncated $id chunk (len=$len) at ${b.position() - 8}")
        val next = b.position() + len + (len & 1)
        id match {
          case "LIST" =>
            val typ = tag()
            typ match {
              // "rec " groups interleaved frame chunks inside movi —
              // skipping it would silently drop frames
              case "hdrl" | "strl" | "movi" | "rec " =>
                walk(b.position() + len - 4)
              case _ => () // INFO etc.
            }
          case "avih" =>
            require(len >= 40, "short avih chunk")
            val usPerFrame = b.getInt
            b.getInt; b.getInt; b.getInt; b.getInt; b.getInt; b.getInt; b.getInt
            width = b.getInt
            height = b.getInt
            // round, don't truncate: 29.97 fps is encoded as 33367 µs
            // and must decode to 30, not 29 (integer-fps schema)
            fps = if (usPerFrame > 0) (1000000 + usPerFrame / 2) / usPerFrame
                  else 0
          case "00dc" | "00db" =>
            val f = new Array[Byte](len)
            b.get(f)
            frames += f
            nFrames += 1
          case "strh" =>
            require(len >= 8, "short strh chunk")
            val fccType = tag()
            require(fccType == "vids",
              s"unsupported stream type $fccType (video-only demuxer)")
          case _ => () // strf, idx1, JUNK, ...
        }
        b.position(next)
      }
    }
    walk(8 + riffLen)
    require(width > 0 && height > 0, "missing or malformed avih header")
    val fs = frames.result()
    require(fs.nonEmpty, "AVI contains no video frames")
    (width, height, fps, fs)
  }
}
