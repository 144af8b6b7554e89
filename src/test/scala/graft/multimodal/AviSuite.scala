package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AVI/MJPEG demuxer spec: byte-exact frame round-trips (odd and even
  * frame lengths exercise RIFF word padding), header geometry, unknown
  * chunk/list skipping, and loud rejection of malformed streams. */
class AviSuite extends AnyFunSuite {

  private def fakeJpeg(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(j => ((j * 31 + seed) % 256).toByte)

  test("round-trip: frames come back byte-exact, geometry preserved") {
    // odd lengths force the even-padding path; decoded lengths must be
    // the chunk's claimed size, not the padded size
    val frames = Array(fakeJpeg(1001, 3), fakeJpeg(256, 7), fakeJpeg(777, 11))
    val bytes = AviMjpeg.aviEncode(64, 48, 25, frames)
    val (w, h, fps, out) = AviMjpeg.aviDecode(bytes)
    assert((w, h, fps, out.length) === ((64, 48, 25, 3)))
    for (i <- frames.indices) assert(out(i).toSeq === frames(i).toSeq, s"frame $i")
  }

  test("unknown chunks and lists are skipped by size") {
    val frames = Array(fakeJpeg(100, 1))
    val bytes = AviMjpeg.aviEncode(16, 16, 10, frames)
    // splice a JUNK chunk right before the movi LIST
    val moviAt = {
      var i = 12
      def tagAt(p: Int) = new String(bytes, p + 8, 4, "US-ASCII")
      while (!(new String(bytes, i, 4, "US-ASCII") == "LIST" && tagAt(i) == "movi"))
        i += 1
      i
    }
    val junkBody = Array.tabulate(9)(_.toByte) // odd → padded
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](9, 0, 0, 0) ++ junkBody ++ Array[Byte](0)
    val spliced = bytes.take(moviAt) ++ junk ++ bytes.drop(moviAt)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    val patched = spliced.clone()
    patched(4) = (riffLen & 0xff).toByte
    patched(5) = ((riffLen >> 8) & 0xff).toByte
    patched(6) = ((riffLen >> 16) & 0xff).toByte
    patched(7) = ((riffLen >> 24) & 0xff).toByte
    val (w, h, _, out) = AviMjpeg.aviDecode(patched)
    assert((w, h, out.length) === ((16, 16, 1)))
    assert(out(0).toSeq === frames(0).toSeq)
  }

  test("frames inside a 'rec ' LIST within movi are collected") {
    // interleaved AVIs group frame chunks in LIST('rec ') inside movi;
    // a demuxer that skips them silently drops frames
    val f0 = fakeJpeg(100, 1)
    val f1 = fakeJpeg(101, 2) // odd → padded inside rec
    val base = AviMjpeg.aviEncode(16, 16, 10, Array(f0))
    def le32(n: Int) = Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    def chunk(id: String, d: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(d.length) ++ d ++
        (if (d.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val recBody = "rec ".getBytes("US-ASCII") ++ chunk("00dc", f1)
    val rec = "LIST".getBytes("US-ASCII") ++ le32(recBody.length) ++ recBody
    // splice the rec LIST at the very end of the movi list body
    val moviAt = {
      var i = 12
      def tagAt(p: Int) = new String(base, p + 8, 4, "US-ASCII")
      while (!(new String(base, i, 4, "US-ASCII") == "LIST" && tagAt(i) == "movi"))
        i += 1
      i
    }
    val moviLen = java.nio.ByteBuffer.wrap(base, moviAt + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val moviEnd = moviAt + 8 + moviLen
    val spliced = base.take(moviEnd) ++ rec ++ base.drop(moviEnd)
    // patch movi LIST length and RIFF length
    def patch32(a: Array[Byte], at: Int, v: Int): Unit =
      le32(v).copyToArray(a, at)
    patch32(spliced, moviAt + 4, moviLen + rec.length)
    patch32(spliced, 4, spliced.length - 8)
    val (w, h, _, out) = AviMjpeg.aviDecode(spliced)
    assert((w, h, out.length) === ((16, 16, 2)))
    assert(out(0).toSeq === f0.toSeq)
    assert(out(1).toSeq === f1.toSeq)
  }

  test("non-integer frame rates round to nearest (29.97fps != 29)") {
    // encode side only writes integer fps; synthesize the 29.97 case by
    // patching usPerFrame = 33367 into avih
    val bytes = AviMjpeg.aviEncode(16, 16, 25, Array(fakeJpeg(64, 5)))
    val avihAt = {
      var i = 12
      while (new String(bytes, i, 4, "US-ASCII") != "avih") i += 1
      i
    }
    val patched = bytes.clone()
    java.nio.ByteBuffer.wrap(patched, avihAt + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(33367)
    val (_, _, fps, _) = AviMjpeg.aviDecode(patched)
    assert(fps === 30)
  }

  test("malformed streams are rejected, not misdecoded") {
    val good = AviMjpeg.aviEncode(8, 8, 5, Array(fakeJpeg(64, 2)))
    intercept[IllegalArgumentException](
      AviMjpeg.aviDecode("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](AviMjpeg.aviDecode(good.take(10)))
    // truncated payload vs RIFF-claimed size
    intercept[IllegalArgumentException](AviMjpeg.aviDecode(good.dropRight(8)))
    // WAVE is RIFF but not AVI
    val wav = Codecs.wavEncode(Array.tabulate(32)(_.toShort), 8000)
    intercept[IllegalArgumentException](AviMjpeg.aviDecode(wav))
    // encoder input validation
    intercept[IllegalArgumentException](
      AviMjpeg.aviEncode(0, 8, 5, Array(fakeJpeg(10, 1))))
    intercept[IllegalArgumentException](
      AviMjpeg.aviEncode(8, 8, 5, Array.empty[Array[Byte]]))
  }
}
