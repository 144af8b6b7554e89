package graft.multimodal

import H264Codec._

/** Fixture-side intra-only constrained-baseline H.264 encoder — the
  * generation direction for [[H264Codec]]'s decoder, in the same role
  * JpegFixtureGen/ImageIO plays for the JPEG decoder (this container
  * ships no H.264 reference codec, so the fixtures are produced here
  * and the decoder is independently gated by hand-authored bitstreams
  * in H264Suite).
  *
  * Produces real streams, not toys: SPS/PPS with frame cropping,
  * one IDR I-slice per frame, a deterministic mix of I_PCM /
  * I_16x16 (V/H/DC/Plane by SAD) / I_4x4 (all 9 modes by SAD)
  * macroblocks, forward 4x4 integer transform + quant, luma-DC 4x4
  * and chroma-DC 2x2 Hadamard paths, and full CAVLC entropy coding
  * (coeff_token / T1 signs / adaptive-suffix levels / total_zeros /
  * run_before) writing the same public spec tables the decoder reads.
  *
  * The encoder tracks the spec reconstruction (dequant + inverse
  * transform via H264Codec) both for intra prediction and so tests
  * can assert decoder output == encoder reconstruction exactly.
  */
object H264Encoder {

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      write(0, n - 1)
      write(k, n)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nbits == 0
    /** pcm_alignment_zero_bit padding. */
    def alignZero(): Unit = while (nbits != 0) writeBit(0)
    /** rbsp_trailing_bits: stop bit + zero pad. */
    def trailing(): Unit = { writeBit(1); alignZero() }
    def toBytes: Array[Byte] = {
      require(nbits == 0, "H264Encoder: unterminated RBSP")
      buf.toByteArray
    }
  }

  /** RBSP -> EBSP (emulation prevention) with NAL header + start code. */
  def nal(refIdc: Int, typ: Int, rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0); out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | typ)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros == 2 && (b & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Forward 4x4 integer transform (the exact inverse-direction pair of
    * H264Codec.inverseTransform4x4, gain 16 on DC). */
  def forwardTransform4x4(res: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = res(o) + res(o + 3); val s1 = res(o + 1) + res(o + 2)
      val d1 = res(o + 1) - res(o + 2); val d0 = res(o) - res(o + 3)
      t(o) = s0 + s1; t(o + 2) = s0 - s1
      t(o + 1) = 2 * d0 + d1; t(o + 3) = d0 - 2 * d1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val s0 = t(i) + t(i + 12); val s1 = t(i + 4) + t(i + 8)
      val d1 = t(i + 4) - t(i + 8); val d0 = t(i) - t(i + 12)
      out(i) = s0 + s1; out(i + 8) = s0 - s1
      out(i + 4) = 2 * d0 + d1; out(i + 12) = d0 - 2 * d1
      i += 1
    }
    out
  }

  private def quantCoef(v: Int, pos: Int, qp: Int, dcShift: Int): Int = {
    val qbits = 15 + qp / 6 + dcShift
    val m = QuantM(qp % 6)(if (dcShift > 0) 0 else PosClass(pos))
    val f = (1 << qbits) / 3 // intra rounding
    val lvl = (math.abs(v) * m + f) >> qbits
    if (v < 0) -lvl else lvl
  }

  /** test hook: non-DC quant at the given raster pos. */
  def quantCoefForTest(v: Int, pos: Int, qp: Int): Int = quantCoef(v, pos, qp, 0)

  /** CAVLC residual writer. `coeffs` in scan order (len maxNumCoeff);
    * nC as the decoder would derive it (-1 chroma DC). Returns
    * totalCoeff for nnz bookkeeping. */
  def writeResidual(w: BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val n = coeffs.length
    val pos = (0 until n).filter(coeffs(_) != 0).toArray
    val tc = pos.length
    var t1s = 0
    while (t1s < 3 && t1s < tc &&
      math.abs(coeffs(pos(tc - 1 - t1s))) == 1) t1s += 1
    // coeff_token
    if (nC >= 8) {
      val v = if (tc == 0) 3 else ((tc - 1) << 2) | t1s
      w.write(v, 6)
    } else {
      val idx = 4 * tc + t1s
      val (lens, bits) =
        if (nC == -1) (ChromaDcCoeffTokenLen, ChromaDcCoeffTokenBits)
        else {
          val ctx = if (nC < 2) 0 else if (nC < 4) 1 else 2
          (CoeffTokenLen(ctx), CoeffTokenBits(ctx))
        }
      require(lens(idx) > 0, s"H264Encoder: invalid coeff_token tc=$tc t1s=$t1s")
      w.write(bits(idx), lens(idx))
    }
    if (tc == 0) return 0
    // trailing-one signs, highest frequency first
    var i = 0
    while (i < t1s) {
      w.writeBit(if (coeffs(pos(tc - 1 - i)) < 0) 1 else 0)
      i += 1
    }
    // levels
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    i = t1s
    while (i < tc) {
      val level = coeffs(pos(tc - 1 - i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == t1s && t1s < 3) levelCode -= 2
      if (suffixLength == 0) {
        if (levelCode < 14) { w.write(0, levelCode); w.writeBit(1) }
        else if (levelCode < 30) {
          w.write(0, 14); w.writeBit(1); w.write(levelCode - 14, 4)
        } else {
          require(levelCode < 30 + 4096, "H264Encoder: level out of range")
          w.write(0, 15); w.writeBit(1); w.write(levelCode - 30, 12)
        }
      } else {
        if (levelCode < (15 << suffixLength)) {
          w.write(0, levelCode >> suffixLength); w.writeBit(1)
          w.write(levelCode & ((1 << suffixLength) - 1), suffixLength)
        } else {
          val esc = levelCode - (15 << suffixLength)
          require(esc < 4096, "H264Encoder: level out of escape range")
          w.write(0, 15); w.writeBit(1); w.write(esc, 12)
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    val totalZeros = pos(tc - 1) + 1 - tc
    if (tc < n) {
      if (nC == -1)
        w.write(ChromaDcTotalZerosBits(tc - 1)(totalZeros),
          ChromaDcTotalZerosLen(tc - 1)(totalZeros))
      else
        w.write(TotalZerosBits(tc - 1)(totalZeros),
          TotalZerosLen(tc - 1)(totalZeros))
    }
    // run_before, highest frequency first, last coeff implicit
    var zerosLeft = totalZeros
    i = 0
    while (i < tc - 1 && zerosLeft > 0) {
      val run = pos(tc - 1 - i) - pos(tc - 2 - i) - 1
      val row = math.min(zerosLeft, 7) - 1
      w.write(RunBeforeBits(row)(run), RunBeforeLen(row)(run))
      zerosLeft -= run
      i += 1
    }
    tc
  }

  /** Encode frames (Y/Cb/Cr planes at the given even dims, values
    * 0..255) into an Annex B stream: SPS, PPS, one IDR slice per
    * frame. Returns (bytes, reconstructed frames) — the recon is the
    * spec decode of what was written, for exact parity tests. */
  def encode(width: Int, height: Int,
      frames: Seq[(Array[Int], Array[Int], Array[Int])],
      qp: Int, allPcm: Boolean = false): (Array[Byte], Seq[Frame]) = {
    require(width % 2 == 0 && height % 2 == 0,
      "H264Encoder: 4:2:0 needs even dims")
    require(qp >= 0 && qp <= 51, "H264Encoder: qp out of range")
    val mbW = (width + 15) / 16; val mbH = (height + 15) / 16
    val cropR = (mbW * 16 - width) / 2; val cropB = (mbH * 16 - height) / 2
    val out = new java.io.ByteArrayOutputStream()

    // ---- SPS
    val sps = new BitWriter
    sps.write(66, 8) // profile_idc baseline
    sps.write(0xc0, 8) // constraint_set0+1, reserved
    sps.write(10, 8) // level_idc 1.0
    sps.ue(0) // sps_id
    sps.ue(0) // log2_max_frame_num_minus4
    sps.ue(2) // pic_order_cnt_type 2
    sps.ue(1) // max_num_ref_frames
    sps.writeBit(0) // gaps_in_frame_num
    sps.ue(mbW - 1); sps.ue(mbH - 1)
    sps.writeBit(1) // frame_mbs_only
    sps.writeBit(1) // direct_8x8_inference
    if (cropR > 0 || cropB > 0) {
      sps.writeBit(1); sps.ue(0); sps.ue(cropR); sps.ue(0); sps.ue(cropB)
    } else sps.writeBit(0)
    sps.writeBit(0) // vui
    sps.trailing()
    out.write(nal(3, 7, sps.toBytes))

    // ---- PPS
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps_id, sps_id
    pps.writeBit(0) // entropy_coding_mode: CAVLC
    pps.writeBit(0) // bottom_field_poc
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx defaults
    pps.writeBit(0) // weighted_pred
    pps.write(0, 2) // weighted_bipred_idc
    pps.se(qp - 26) // pic_init_qp_minus26
    pps.se(0) // pic_init_qs
    pps.se(0) // chroma_qp_index_offset
    pps.writeBit(1) // deblocking_filter_control_present
    pps.writeBit(0) // constrained_intra_pred
    pps.writeBit(0) // redundant_pic_cnt_present
    pps.trailing()
    out.write(nal(3, 8, pps.toBytes))

    val recons = frames.zipWithIndex.map { case ((sy, scb, scr), fi) =>
      val (rbsp, rec) =
        encodeSlice(width, height, mbW, mbH, sy, scb, scr, qp, fi, allPcm)
      out.write(nal(3, 5, rbsp))
      rec
    }
    (out.toByteArray, recons)
  }

  private def pad(src: Array[Int], w: Int, h: Int, fw: Int, fh: Int): Array[Int] = {
    val p = new Array[Int](fw * fh)
    var y = 0
    while (y < fh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < fw) { p(y * fw + x) = src(sy * w + math.min(x, w - 1)); x += 1 }
      y += 1
    }
    p
  }

  private def sad(a: Array[Int], b: Array[Int]): Int = {
    var s = 0; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }

  // deterministic MB-type schedule: a real mix of all three coded forms
  // (allPcm forces the lossless path for formula-oracle streams)
  private def mbKind(mbIdx: Int, frameIdx: Int, allPcm: Boolean): Int =
    if (allPcm) 2
    else {
      val k = (mbIdx + 3 * frameIdx) % 7
      if (k == 5) 2 /* I_PCM */ else if (k % 3 == 1) 1 /* I_16x16 */ else 0
    }

  private def encodeSlice(width: Int, height: Int, mbW: Int, mbH: Int,
      srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int],
      qp: Int, frameIdx: Int, allPcm: Boolean): (Array[Byte], Frame) = {
    val w = mbW * 16; val h = mbH * 16; val cw = w / 2; val chh = h / 2
    val Sy = pad(srcY, width, height, w, h)
    val Scb = pad(srcCb, width / 2, height / 2, cw, chh)
    val Scr = pad(srcCr, width / 2, height / 2, cw, chh)
    val Y = new Array[Int](w * h)
    val Cb = new Array[Int](cw * chh); val Cr = new Array[Int](cw * chh)
    val nnzY = Array.fill(mbW * 4 * mbH * 4)(-1)
    val nnzCb = Array.fill(mbW * 2 * mbH * 2)(-1)
    val nnzCr = Array.fill(mbW * 2 * mbH * 2)(-1)
    val mode4 = Array.fill(mbW * 4 * mbH * 4)(-1)
    val qpc = chromaQp(qp, 0)

    def nCof(grid: Array[Int], gw: Int, gx: Int, gy: Int): Int = {
      val a = if (gx > 0) grid(gy * gw + gx - 1) else -1
      val b = if (gy > 0) grid((gy - 1) * gw + gx) else -1
      if (a >= 0 && b >= 0) (a + b + 1) >> 1
      else if (a >= 0) a else if (b >= 0) b else 0
    }

    val bw = new BitWriter
    // ---- slice header (IDR, I slice, poc type 2)
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices in picture)
    bw.ue(0) // pps_id
    bw.write(0, 4) // frame_num (log2 = 4)
    bw.ue(frameIdx % 32) // idr_pic_id (differs between consecutive IDRs)
    bw.writeBit(0); bw.writeBit(0) // no_output_of_prior / long_term
    bw.se(0) // slice_qp_delta
    bw.ue(1) // disable_deblocking_filter_idc = 1 (off)

    var mb = 0
    while (mb < mbW * mbH) {
      val mbX = mb % mbW; val mbY = mb / mbW
      val px = mbX * 16; val py = mbY * 16
      val gx0 = mbX * 4; val gy0 = mbY * 4
      val cgx0 = mbX * 2; val cgy0 = mbY * 2
      val gw = mbW * 4; val cgw = mbW * 2
      val topA = mbY > 0; val leftA = mbX > 0
      val kind = mbKind(mb, frameIdx, allPcm)

      if (kind == 2) {
        // -------------------------------------------------------- I_PCM ---
        bw.ue(25)
        bw.alignZero()
        var i = 0
        while (i < 256) {
          val v = Sy((py + i / 16) * w + px + i % 16)
          bw.write(v, 8); Y((py + i / 16) * w + px + i % 16) = v
          i += 1
        }
        i = 0
        while (i < 64) {
          val v = Scb((py / 2 + i / 8) * cw + px / 2 + i % 8)
          bw.write(v, 8); Cb((py / 2 + i / 8) * cw + px / 2 + i % 8) = v
          i += 1
        }
        i = 0
        while (i < 64) {
          val v = Scr((py / 2 + i / 8) * cw + px / 2 + i % 8)
          bw.write(v, 8); Cr((py / 2 + i / 8) * cw + px / 2 + i % 8) = v
          i += 1
        }
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) { nnzY((gy0 + yy) * gw + gx0 + xx) = 16; xx += 1 }
          yy += 1
        }
        yy = 0
        while (yy < 2) {
          var xx = 0
          while (xx < 2) {
            nnzCb((cgy0 + yy) * cgw + cgx0 + xx) = 16
            nnzCr((cgy0 + yy) * cgw + cgx0 + xx) = 16
            xx += 1
          }
          yy += 1
        }
      } else if (kind == 1) {
        // ------------------------------------------------------ I_16x16 ---
        val top = Array.tabulate(16)(i => if (topA) Y((py - 1) * w + px + i) else 0)
        val left = Array.tabulate(16)(i => if (leftA) Y((py + i) * w + px - 1) else 0)
        val tl = if (topA && leftA) Y((py - 1) * w + px - 1) else 0
        val srcMb = Array.tabulate(256)(i => Sy((py + i / 16) * w + px + i % 16))
        val cand = Seq(2) ++ (if (topA) Seq(0) else Nil) ++
          (if (leftA) Seq(1) else Nil) ++ (if (topA && leftA) Seq(3) else Nil)
        val (mode, pred) = cand.map { m =>
          val p = predict16x16(m, top, left, tl, topA, leftA)
          (m, p)
        }.minBy { case (m, p) => (sad(srcMb, p), m) }
        // forward transform + quant
        val acQ = new Array[Array[Int]](16) // 15 AC levels, scan order
        val dcRaw = new Array[Int](16) // raster over 4x4 block grid
        var b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val res = Array.tabulate(16) { i =>
            srcMb((by + i / 4) * 16 + bx + i % 4) - pred((by + i / 4) * 16 + bx + i % 4)
          }
          val t = forwardTransform4x4(res)
          dcRaw((by / 4) * 4 + bx / 4) = t(0)
          acQ(b) = Array.tabulate(15)(k =>
            quantCoef(t(Zigzag4(k + 1)), Zigzag4(k + 1), qp, 0))
          b += 1
        }
        val had = hadamard4x4(dcRaw).map(v =>
          if (v >= 0) (v + 1) >> 1 else -((-v + 1) >> 1))
        val dcQraster = had.map(quantCoef(_, 0, qp, 1))
        val dcQscan = Array.tabulate(16)(k => dcQraster(Zigzag4(k)))
        val cbpLuma = if (acQ.exists(_.exists(_ != 0))) 15 else 0
        // chroma pipeline (shared below) to learn cbpChroma before mb_type
        val ch = encodeChroma(mb, px, py, cw, Scb, Scr, Cb, Cr,
          topA, leftA, qpc)
        val mbType = 1 + mode + 4 * ch.cbpChroma + 12 * (cbpLuma / 15)
        bw.ue(mbType)
        bw.ue(ch.chromaMode)
        bw.se(0) // mb_qp_delta (always present for I_16x16)
        // DC block: nC from block 0 neighbors, before this MB's updates
        writeResidual(bw, dcQscan, nCof(nnzY, gw, gx0, gy0))
        b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val gx = gx0 + bx / 4; val gy = gy0 + by / 4
          if (cbpLuma != 0) {
            val tc = writeResidual(bw, acQ(b), nCof(nnzY, gw, gx, gy))
            nnzY(gy * gw + gx) = tc
          } else nnzY(gy * gw + gx) = 0
          b += 1
        }
        emitChroma(bw, ch, nnzCb, nnzCr, cgx0, cgy0, cgw, nCof)
        // ---- recon (spec decode of what we wrote)
        val f = hadamard4x4(dcQraster)
        val dc = f.map(scaleLumaDc(_, qp))
        b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val d = new Array[Int](16)
          var k = 1
          while (k < 16) {
            val lv = if (cbpLuma != 0) acQ(b)(k - 1) else 0
            d(Zigzag4(k)) = dequant(lv, Zigzag4(k), qp)
            k += 1
          }
          d(0) = dc((by / 4) * 4 + bx / 4)
          inverseTransform4x4(d)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              Y((py + by + y) * w + px + bx + x) =
                clip255(pred((by + y) * 16 + bx + x) + d(y * 4 + x))
              x += 1
            }
            y += 1
          }
          b += 1
        }
        reconChroma(ch, Cb, Cr, px, py, cw, qpc)
      } else {
        // ------------------------------------------------------- I_4x4 ---
        // per-block: choose mode by SAD over available modes (recon-based
        // prediction), quantize, track nnz; syntax needs modes + cbp
        // first, so run the pipeline, then emit.
        val modes = new Array[Int](16)
        val levels = new Array[Array[Int]](16) // 16 scan-order levels
        val blockRec = new Array[Array[Int]](16)
        var b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val ax = px + bx; val ay = py + by
          val bTopA = ay > 0; val bLeftA = ax > 0
          val bTlA = bTopA && bLeftA
          val trA = bTopA && (ax + 4 < w) && {
            val trMb = ((ay - 1) / 16) * mbW + (ax + 4) / 16
            if (trMb < mb) true
            else if (trMb > mb) false
            else luma4x4Idx((ax + 4) % 16 / 4, (ay - 1) % 16 / 4) < b
          }
          val top = new Array[Int](8)
          if (bTopA) {
            var i = 0
            while (i < 4) { top(i) = Y((ay - 1) * w + ax + i); i += 1 }
            while (i < 8) {
              top(i) = if (trA) Y((ay - 1) * w + ax + i) else top(3); i += 1
            }
          }
          val left = Array.tabulate(4)(i => if (bLeftA) Y((ay + i) * w + ax - 1) else 0)
          val tl = if (bTlA) Y((ay - 1) * w + ax - 1) else 0
          val border = Border4(top, left, tl, bTopA, bLeftA, bTlA)
          val srcBlk = Array.tabulate(16)(i => Sy((ay + i / 4) * w + ax + i % 4))
          val cand = Seq(2) ++ (if (bTopA) Seq(0, 3, 7) else Nil) ++
            (if (bLeftA) Seq(1, 8) else Nil) ++
            (if (bTopA && bLeftA && bTlA) Seq(4, 5, 6) else Nil)
          val (m, pred) = cand.map(m => (m, predict4x4(m, border)))
            .minBy { case (mm, p) => (sad(srcBlk, p), mm) }
          modes(b) = m
          val res = Array.tabulate(16)(i => srcBlk(i) - pred(i))
          val t = forwardTransform4x4(res)
          levels(b) = Array.tabulate(16)(k =>
            quantCoef(t(Zigzag4(k)), Zigzag4(k), qp, 0))
          // recon
          val d = new Array[Int](16)
          var k = 0
          while (k < 16) {
            d(Zigzag4(k)) = dequant(levels(b)(k), Zigzag4(k), qp); k += 1
          }
          inverseTransform4x4(d)
          blockRec(b) = Array.tabulate(16)(i => clip255(pred(i) + d(i)))
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              Y((ay + y) * w + ax + x) = blockRec(b)(y * 4 + x); x += 1
            }
            y += 1
          }
          b += 1
        }
        val cbpLuma = (0 until 4).map { b8 =>
          val any = (0 until 4).exists(i => levels(b8 * 4 + i).exists(_ != 0))
          if (any) 1 << b8 else 0
        }.sum
        val ch = encodeChroma(mb, px, py, cw, Scb, Scr, Cb, Cr,
          topA, leftA, qpc)
        // ---- emit syntax
        bw.ue(0) // mb_type I_NxN
        b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val gx = gx0 + bx / 4; val gy = gy0 + by / 4
          val mA = if (gx > 0) mode4(gy * gw + gx - 1) else -1
          val mB = if (gy > 0) mode4((gy - 1) * gw + gx) else -1
          val predMode = math.min(if (mA < 0) 2 else mA, if (mB < 0) 2 else mB)
          if (modes(b) == predMode) bw.writeBit(1)
          else {
            bw.writeBit(0)
            bw.write(if (modes(b) < predMode) modes(b) else modes(b) - 1, 3)
          }
          mode4(gy * gw + gx) = modes(b)
          b += 1
        }
        bw.ue(ch.chromaMode)
        val cbp = cbpLuma | (ch.cbpChroma << 4)
        val code = CbpIntra.indexOf(cbp)
        require(code >= 0, s"H264Encoder: no CBP code for $cbp")
        bw.ue(code)
        if (cbp != 0) bw.se(0) // mb_qp_delta
        b = 0
        while (b < 16) {
          val (bx, by) = luma4x4Pos(b)
          val gx = gx0 + bx / 4; val gy = gy0 + by / 4
          if ((cbpLuma & (1 << (b >> 2))) != 0) {
            val tc = writeResidual(bw, levels(b), nCof(nnzY, gw, gx, gy))
            nnzY(gy * gw + gx) = tc
          } else {
            // dropped blocks are all-zero by construction of cbp
            nnzY(gy * gw + gx) = 0
          }
          b += 1
        }
        emitChroma(bw, ch, nnzCb, nnzCr, cgx0, cgy0, cgw, nCof)
        reconChroma(ch, Cb, Cr, px, py, cw, qpc)
      }
      mb += 1
    }
    bw.trailing()
    (bw.toBytes, Frame(Y, Cb, Cr))
  }

  /** Chroma pipeline state computed once per MB (both components):
    * prediction, quantized DC/AC, cbpChroma. */
  private final case class ChromaEnc(
      chromaMode: Int, cbpChroma: Int,
      predCb: Array[Int], predCr: Array[Int],
      dcQCb: Array[Int], dcQCr: Array[Int],
      acQCb: Array[Array[Int]], acQCr: Array[Array[Int]])

  private def encodeChroma(mb: Int, px: Int, py: Int, cw: Int,
      Scb: Array[Int], Scr: Array[Int], Cb: Array[Int], Cr: Array[Int],
      topA: Boolean, leftA: Boolean, qpc: Int): ChromaEnc = {
    val cpx = px / 2; val cpy = py / 2
    val chromaMode = {
      val want = mb % 4
      if (topA && leftA) want
      else if (leftA && want == 1) 1
      else if (topA && want == 2) 2
      else 0
    }
    def comp(src: Array[Int], plane: Array[Int]): (Array[Int], Array[Int], Array[Array[Int]]) = {
      val top = Array.tabulate(8)(i => if (topA) plane((cpy - 1) * cw + cpx + i) else 0)
      val left = Array.tabulate(8)(i => if (leftA) plane((cpy + i) * cw + cpx - 1) else 0)
      val tl = if (topA && leftA) plane((cpy - 1) * cw + cpx - 1) else 0
      val pred = predictChroma(chromaMode, top, left, tl, topA, leftA)
      val dcRaw = new Array[Int](4)
      val acQ = new Array[Array[Int]](4)
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 4; val by = (b >> 1) * 4
        val res = Array.tabulate(16) { i =>
          src((cpy + by + i / 4) * cw + cpx + bx + i % 4) -
            pred((by + i / 4) * 8 + bx + i % 4)
        }
        val t = forwardTransform4x4(res)
        dcRaw(b) = t(0)
        acQ(b) = Array.tabulate(15)(k =>
          quantCoef(t(Zigzag4(k + 1)), Zigzag4(k + 1), qpc, 0))
        b += 1
      }
      val dcQ = hadamard2x2(dcRaw).map(quantCoef(_, 0, qpc, 1))
      (pred, dcQ, acQ)
    }
    val (pcb, dcb, acb) = comp(Scb, Cb)
    val (pcr, dcr, acr) = comp(Scr, Cr)
    val anyAc = acb.exists(_.exists(_ != 0)) || acr.exists(_.exists(_ != 0))
    val anyDc = dcb.exists(_ != 0) || dcr.exists(_ != 0)
    val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
    ChromaEnc(chromaMode, cbpChroma, pcb, pcr, dcb, dcr, acb, acr)
  }

  private def emitChroma(bw: BitWriter, ch: ChromaEnc,
      nnzCb: Array[Int], nnzCr: Array[Int],
      cgx0: Int, cgy0: Int, cgw: Int,
      nCof: (Array[Int], Int, Int, Int) => Int): Unit = {
    if (ch.cbpChroma != 0) {
      writeResidual(bw, ch.dcQCb, -1)
      writeResidual(bw, ch.dcQCr, -1)
    }
    var c = 0
    while (c < 2) {
      val (grid, ac) = if (c == 0) (nnzCb, ch.acQCb) else (nnzCr, ch.acQCr)
      var b = 0
      while (b < 4) {
        val cgx = cgx0 + (b & 1); val cgy = cgy0 + (b >> 1)
        if (ch.cbpChroma == 2) {
          val tc = writeResidual(bw, ac(b), nCof(grid, cgw, cgx, cgy))
          grid(cgy * cgw + cgx) = tc
        } else grid(cgy * cgw + cgx) = 0
        b += 1
      }
      c += 1
    }
  }

  private def reconChroma(ch: ChromaEnc, Cb: Array[Int], Cr: Array[Int],
      px: Int, py: Int, cw: Int, qpc: Int): Unit = {
    val cpx = px / 2; val cpy = py / 2
    var c = 0
    while (c < 2) {
      val (plane, pred, dcQ, acQ) =
        if (c == 0) (Cb, ch.predCb, ch.dcQCb, ch.acQCb)
        else (Cr, ch.predCr, ch.dcQCr, ch.acQCr)
      val dcUsed = if (ch.cbpChroma != 0) dcQ else Array.fill(4)(0)
      val f = hadamard2x2(dcUsed)
      val dc = f.map(scaleChromaDc(_, qpc))
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 4; val by = (b >> 1) * 4
        val d = new Array[Int](16)
        var k = 1
        while (k < 16) {
          val lv = if (ch.cbpChroma == 2) acQ(b)(k - 1) else 0
          d(Zigzag4(k)) = dequant(lv, Zigzag4(k), qpc)
          k += 1
        }
        d(0) = dc(b)
        inverseTransform4x4(d)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val o = (cpy + by + y) * cw + cpx + bx + x
            plane(o) = clip255(pred((by + y) * 8 + bx + x) + d(y * 4 + x))
            x += 1
          }
          y += 1
        }
        b += 1
      }
      c += 1
    }
  }
}
