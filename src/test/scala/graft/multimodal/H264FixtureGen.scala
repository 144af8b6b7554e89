package graft.multimodal

/** One-shot generator for the committed H.264 fixtures under
  * `src/main/resources/graft/h264/` and the constant rows in the
  * `media_h264_stats` oracle (PipelineOps).
  *
  * Run: `sbt "Test/runMain graft.multimodal.H264FixtureGen"`.
  *
  * The fixtures are real mixed-macroblock streams (I_PCM / I_16x16 /
  * I_4x4 with SAD-chosen prediction modes, full CAVLC) over smooth
  * deterministic content, at several sizes (incl. a cropped 34x18) and
  * QPs (incl. a low-QP stream that exercises dense-coefficient CAVLC
  * contexts). This container has no reference H.264 decoder, so the
  * oracle constants are this engine's decode of the committed bytes;
  * their correctness is tied to the spec by H264Suite's hand-authored
  * bitstreams, byte-exact I_PCM gate, and exact encoder-reconstruction
  * parity. Regenerating fixtures requires re-pasting the printed
  * oracle rows.
  */
object H264FixtureGen {

  def smooth(w: Int, h: Int, seed: Int): (Array[Int], Array[Int], Array[Int]) = {
    val y = Array.tabulate(w * h) { i =>
      val (x, yy) = (i % w, i / w)
      ((x * 255) / math.max(w - 1, 1) + 30 * math.sin(yy / 7.0 + seed)).toInt
        .max(0).min(255)
    }
    val cb = Array.tabulate((w / 2) * (h / 2)) { i =>
      val (x, yy) = (i % (w / 2), i / (w / 2))
      (128 + 40 * math.cos(x / 5.0 + seed) + yy).toInt.max(0).min(255)
    }
    val cr = Array.tabulate((w / 2) * (h / 2)) { i =>
      val (x, yy) = (i % (w / 2), i / (w / 2))
      (128 + 35 * math.sin((x + yy) / 6.0 - seed)).toInt.max(0).min(255)
    }
    (y, cb, cr)
  }

  val Fixtures: Seq[(String, Int, Int, Int, Int)] = Seq(
    // (name, w, h, nFrames, qp)
    ("gradient_48x32_q24", 48, 32, 2, 24),
    ("gradient_64x48_q30", 64, 48, 1, 30),
    ("crop_34x18_q20", 34, 18, 1, 20),
    ("lowqp_32x32_q12", 32, 32, 3, 12))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/main/resources/graft/h264")
    dir.mkdirs()
    Fixtures.foreach { case (name, w, h, nf, qp) =>
      val frames = (0 until nf).map(f => smooth(w, h, f))
      val (bytes, _) = H264Encoder.encode(w, h, frames, qp)
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.264").toPath, bytes)
      val dec = H264Codec.decode(bytes)
      dec.frames.zipWithIndex.foreach { case (fr, fi) =>
        println(s"  ('$name', ${dec.width}, ${dec.height}, ${dec.frames.length}, $fi, " +
          s"CAST(${fr.y.map(_.toLong).sum} AS BIGINT), " +
          s"CAST(${fr.cb.map(_.toLong).sum} AS BIGINT), " +
          s"CAST(${fr.cr.map(_.toLong).sum} AS BIGINT)),")
      }
      println(s"  -- $name: ${bytes.length} bytes")
    }
  }
}
