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
