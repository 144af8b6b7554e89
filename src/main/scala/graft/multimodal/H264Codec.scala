package graft.multimodal

/** Intra-only constrained-baseline H.264 (ITU-T H.264 / ISO 14496-10)
  * decoder, pure JVM — closes the last multimodal gap (the reference
  * has no multimodal surface at all; this is a north-star operator,
  * see VERDICT r7 #1). From-scratch implementation of the public
  * spec, consistent with the repo's PNG/GIF/JPEG codecs:
  *
  *  - Annex B byte-stream parse (start codes, emulation prevention)
  *  - Exp-Golomb bit reader, SPS / PPS / IDR slice-header parse
  *    (incl. frame cropping for non-multiple-of-16 dims)
  *  - I-slice macroblock layer: I_PCM, I_4x4 (all 9 prediction
  *    modes), I_16x16 (V / H / DC / Plane), chroma 8x8 intra
  *    (DC / H / V / Plane), 4:2:0
  *  - CAVLC entropy decode (coeff_token in all nC contexts incl.
  *    chroma-DC, trailing-one signs, level prefix/suffix with
  *    adaptive suffixLength, total_zeros, run_before)
  *  - Dequant (flat baseline scaling lists) + 4x4 inverse integer
  *    transform, 4x4 luma-DC inverse Hadamard (8.5.10), 2x2
  *    chroma-DC inverse Hadamard (8.5.11)
  *
  * SCOPE (rejected loudly, never silently): P/B slices (inter
  * prediction), CABAC, FMO/ASO, fields/MBAFF, multi-slice pictures,
  * scaling matrices, 8x8 transform, and in-loop deblocking — the
  * fixture streams disable the deblocking filter
  * (disable_deblocking_filter_idc == 1), which a conformant encoder
  * may do; streams that require deblocking are rejected because
  * skipping the filter would silently change decoded samples.
  *
  * There is no reference H.264 decoder in this container (unlike
  * JPEG's ImageIO), so conformance is gated three independent ways in
  * H264Suite: (1) hand-authored micro bitstreams with hand-computed
  * expected samples (decoder-only, no shared code with the encoder's
  * write path), (2) I_PCM streams where decode must be byte-exact to
  * the source, (3) encoder-reconstruction parity + PSNR bounds vs the
  * source for CAVLC/intra/IDCT streams, plus Kraft-completeness /
  * prefix-freeness structural checks over every VLC table.
  *
  * All VLC tables below are transcriptions of the public spec tables
  * (9-4, 9-5, 9-7/9-8, 9-9(a), 9-10) as reproduced in every open
  * decoder.
  */
object H264Codec {

  // ------------------------------------------------------------ bits ---

  /** MSB-first bit reader over an RBSP (emulation prevention already
    * stripped). Reads past the end return 0 bits only from `peek`;
    * explicit reads past the end throw. */
  final class BitReader(val data: Array[Byte]) {
    private var pos = 0 // bit position
    def bitPos: Int = pos
    def u1(): Int = {
      require(pos < data.length * 8, "H264: read past end of RBSP")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** next n bits without consuming; zero-padded past the end. */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val b = if (p < data.length * 8) (data(p >> 3) >> (7 - (p & 7))) & 1 else 0
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = { pos += n }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        require(zeros <= 31, "H264: exp-Golomb code too long")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) {
      require(u1() == 0, "H264: pcm_alignment_zero_bit must be 0")
    }
    def readAlignedByte(): Int = { require((pos & 7) == 0); u(8) }
  }

  /** Annex B → (nalRefIdc, nalType, rbsp) triples, with the
    * 00 00 03 emulation-prevention bytes stripped. */
  def nalUnits(b: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    // find start codes 00 00 01 (optionally preceded by an extra 00)
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    require(starts.nonEmpty, "H264: no Annex B start code found")
    val bounds = starts.zip(starts.drop(1).map(_ - 3) :+ b.length)
    bounds.toSeq.map { case (s, eRaw) =>
      var e = eRaw
      // a 4-byte start code leaves one trailing 00 on the previous NAL
      while (e > s && b(e - 1) == 0) e -= 1
      val header = b(s) & 0xff
      require((header & 0x80) == 0, "H264: forbidden_zero_bit set")
      val refIdc = (header >> 5) & 3
      val typ = header & 0x1f
      // strip emulation prevention: 00 00 03 -> 00 00; a stripped 03
      // resets the zero run (00 00 03 03 encodes the bytes 00 00 03)
      val out = new Array[Byte](e - s - 1)
      var n = 0
      var j = s + 1
      var zeros = 0
      while (j < e) {
        val v = b(j)
        if (zeros == 2 && v == 3) zeros = 0
        else {
          out(n) = v; n += 1
          zeros = if (v == 0) zeros + 1 else 0
        }
        j += 1
      }
      (refIdc, typ, java.util.Arrays.copyOf(out, n))
    }
  }

  // ---------------------------------------------------- parameter sets ---

  final case class Sps(
      profile: Int, level: Int, spsId: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      mbW: Int, mbH: Int,
      cropL: Int, cropR: Int, cropT: Int, cropB: Int) {
    def width: Int = mbW * 16 - 2 * (cropL + cropR)
    def height: Int = mbH * 16 - 2 * (cropT + cropB)
  }

  final case class Pps(
      ppsId: Int, spsId: Int, cabac: Boolean,
      picInitQp: Int, chromaQpOffset: Int,
      deblockControl: Boolean, constrainedIntra: Boolean,
      redundantPicCnt: Boolean)

  def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    val spsId = r.ue()
    require(!Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
      .contains(profile),
      s"H264: high-profile SPS (profile_idc $profile) not supported")
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    require(pocType == 0 || pocType == 2,
      s"H264: pic_order_cnt_type $pocType not supported")
    val log2MaxPocLsb = if (pocType == 0) r.ue() + 4 else 0
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    val frameMbsOnly = r.u1() == 1
    require(frameMbsOnly, "H264: interlaced (frame_mbs_only_flag=0) not supported")
    r.u1() // direct_8x8_inference
    val crop = r.u1() == 1
    val (cl, cr, ct, cb) =
      if (crop) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
    // vui ignored — nothing after it is needed
    Sps(profile, level, spsId, log2MaxFrameNum, pocType, log2MaxPocLsb,
      mbW, mbH, cl, cr, ct, cb)
  }

  def parsePps(r: BitReader): Pps = {
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.u1() == 1
    require(!cabac, "H264: CABAC not supported (CAVLC only)")
    val bottomFieldPoc = r.u1() == 1
    require(!bottomFieldPoc, "H264: bottom_field_pic_order not supported")
    val numSliceGroups = r.ue() + 1
    require(numSliceGroups == 1, "H264: FMO (slice groups) not supported")
    r.ue(); r.ue() // num_ref_idx_l0/l1_default_active_minus1
    r.u1() // weighted_pred_flag
    r.u(2) // weighted_bipred_idc
    val picInitQp = r.se() + 26
    r.se() // pic_init_qs
    val chromaQpOffset = r.se()
    val deblockControl = r.u1() == 1
    val constrainedIntra = r.u1() == 1
    val redundant = r.u1() == 1
    Pps(ppsId, spsId, cabac, picInitQp, chromaQpOffset, deblockControl,
      constrainedIntra, redundant)
  }

  // --------------------------------------------------------- VLC tables ---

  /** Table 9-4, Intra_4x4 column: codeNum -> coded_block_pattern. */
  val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Table 9-5: coeff_token (len, bits) indexed
    * [nCtx][4*totalCoeff + trailingOnes]; nCtx 0: 0<=nC<2, 1: 2<=nC<4,
    * 2: 4<=nC<8, 3: nC>=8 (6-bit FLC). len 0 = invalid combination. */
  val CoeffTokenLen: Array[Array[Int]] = Array(
    Array(
      1, 0, 0, 0,
      6, 2, 0, 0, 8, 6, 3, 0, 9, 8, 7, 5, 10, 9, 8, 6,
      11, 10, 9, 7, 13, 11, 10, 8, 13, 13, 11, 9, 13, 13, 13, 10,
      14, 14, 13, 11, 14, 14, 14, 13, 15, 15, 14, 14, 15, 15, 15, 14,
      16, 15, 15, 15, 16, 16, 16, 15, 16, 16, 16, 16, 16, 16, 16, 16),
    Array(
      2, 0, 0, 0,
      6, 2, 0, 0, 6, 5, 3, 0, 7, 6, 6, 4, 8, 6, 6, 4,
      8, 7, 7, 5, 9, 8, 8, 6, 11, 9, 9, 6, 11, 11, 11, 7,
      12, 11, 11, 9, 12, 12, 12, 11, 12, 12, 12, 11, 13, 13, 13, 12,
      13, 13, 13, 13, 13, 14, 13, 13, 14, 14, 14, 13, 14, 14, 14, 14),
    Array(
      4, 0, 0, 0,
      6, 4, 0, 0, 6, 5, 4, 0, 6, 5, 5, 4, 7, 5, 5, 4,
      7, 5, 5, 4, 7, 6, 6, 4, 7, 6, 6, 4, 8, 7, 7, 5,
      8, 8, 7, 6, 9, 8, 8, 7, 9, 9, 8, 8, 9, 9, 9, 8,
      10, 9, 9, 9, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10),
    Array(
      6, 0, 0, 0,
      6, 6, 0, 0, 6, 6, 6, 0, 6, 6, 6, 6, 6, 6, 6, 6,
      6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
      6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
      6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6))

  val CoeffTokenBits: Array[Array[Int]] = Array(
    Array(
      1, 0, 0, 0,
      5, 1, 0, 0, 7, 4, 1, 0, 7, 6, 5, 3, 7, 6, 5, 3,
      7, 6, 5, 4, 15, 6, 5, 4, 11, 14, 5, 4, 8, 10, 13, 4,
      15, 14, 9, 4, 11, 10, 13, 12, 15, 14, 9, 12, 11, 10, 13, 8,
      15, 1, 9, 12, 11, 14, 13, 8, 7, 10, 9, 12, 4, 6, 5, 8),
    Array(
      3, 0, 0, 0,
      11, 2, 0, 0, 7, 7, 3, 0, 7, 10, 9, 5, 7, 6, 5, 4,
      4, 6, 5, 6, 7, 6, 5, 8, 15, 6, 5, 4, 11, 14, 13, 4,
      15, 10, 9, 4, 11, 14, 13, 12, 8, 10, 9, 8, 15, 14, 13, 12,
      11, 10, 9, 12, 7, 11, 6, 8, 9, 8, 10, 1, 7, 6, 5, 4),
    Array(
      15, 0, 0, 0,
      15, 14, 0, 0, 11, 15, 13, 0, 8, 12, 14, 12, 15, 10, 11, 11,
      11, 8, 9, 10, 9, 14, 13, 9, 8, 10, 9, 8, 15, 14, 13, 13,
      11, 14, 10, 12, 15, 10, 13, 12, 11, 14, 9, 12, 8, 10, 13, 8,
      13, 7, 9, 12, 9, 12, 11, 10, 5, 8, 7, 6, 1, 4, 3, 2),
    Array(
      3, 0, 0, 0,
      0, 1, 0, 0, 4, 5, 6, 0, 8, 9, 10, 11, 12, 13, 14, 15,
      16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31,
      32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47,
      48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63))

  /** coeff_token for chroma DC, 4:2:0 (nC == -1): (len, bits) at
    * [4*totalCoeff + trailingOnes]. */
  val ChromaDcCoeffTokenLen: Array[Int] =
    Array(2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0, 6, 7, 7, 6, 6, 8, 8, 7)
  val ChromaDcCoeffTokenBits: Array[Int] =
    Array(1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0, 3, 3, 2, 5, 2, 3, 2, 0)

  /** Tables 9-7/9-8: total_zeros for 4x4 (and 15-coeff AC) blocks,
    * indexed [totalCoeff-1][totalZeros]. */
  val TotalZerosLen: Array[Array[Int]] = Array(
    Array(1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9),
    Array(3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6),
    Array(4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6),
    Array(5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5),
    Array(4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5),
    Array(6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6),
    Array(6, 5, 3, 3, 3, 2, 3, 4, 3, 6),
    Array(6, 4, 5, 3, 2, 2, 3, 3, 6),
    Array(6, 6, 4, 2, 2, 3, 2, 5),
    Array(5, 5, 3, 2, 2, 2, 4),
    Array(4, 4, 3, 3, 1, 3),
    Array(4, 4, 2, 1, 3),
    Array(3, 3, 1, 2),
    Array(2, 2, 1),
    Array(1, 1))
  val TotalZerosBits: Array[Array[Int]] = Array(
    Array(1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1),
    Array(7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0),
    Array(5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0),
    Array(3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0),
    Array(5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    Array(1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    Array(1, 1, 5, 4, 3, 3, 2, 1, 1, 0),
    Array(1, 1, 1, 3, 3, 2, 2, 1, 0),
    Array(1, 0, 1, 3, 2, 1, 1, 1),
    Array(1, 0, 1, 3, 2, 1, 1),
    Array(0, 1, 1, 2, 1, 3),
    Array(0, 1, 1, 1, 1),
    Array(0, 1, 1, 1),
    Array(0, 1, 1),
    Array(0, 1))

  /** Table 9-9(a): total_zeros for chroma DC (maxNumCoeff 4),
    * [totalCoeff-1][totalZeros]. */
  val ChromaDcTotalZerosLen: Array[Array[Int]] =
    Array(Array(1, 2, 3, 3), Array(1, 2, 2), Array(1, 1))
  val ChromaDcTotalZerosBits: Array[Array[Int]] =
    Array(Array(1, 1, 1, 0), Array(1, 1, 0), Array(1, 0))

  /** Table 9-10: run_before, [min(zerosLeft,7)-1][runBefore]. The
    * zerosLeft>6 row extends 7..14 as 0001, 00001, ... (len run-3,
    * bits 1). */
  val RunBeforeLen: Array[Array[Int]] = Array(
    Array(1, 1),
    Array(1, 2, 2),
    Array(2, 2, 2, 2),
    Array(2, 2, 2, 3, 3),
    Array(2, 2, 3, 3, 3, 3),
    Array(2, 3, 3, 3, 3, 3, 3),
    Array(3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  val RunBeforeBits: Array[Array[Int]] = Array(
    Array(1, 0),
    Array(1, 1, 0),
    Array(3, 2, 1, 0),
    Array(3, 2, 1, 1, 0),
    Array(3, 2, 3, 2, 1, 0),
    Array(3, 0, 1, 3, 2, 5, 4),
    Array(7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1))

  /** Dequant normAdjust V (Table; positions 0: (0,0)-class, 1:
    * (1,1)-class, 2: other), indexed [qp%6][class]. */
  val DequantV: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** Forward quant M (encoder side), same indexing. */
  val QuantM: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))

  /** position class of raster index 0..15: 0 for (0,0),(0,2),(2,0),
    * (2,2); 1 for (1,1),(1,3),(3,1),(3,3); else 2. */
  val PosClass: Array[Int] = Array.tabulate(16) { i =>
    val (x, y) = (i & 3, i >> 2)
    if (x % 2 == 0 && y % 2 == 0) 0 else if (x % 2 == 1 && y % 2 == 1) 1 else 2
  }

  /** 4x4 zigzag: scan order -> raster index. */
  val Zigzag4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Chroma QP mapping (Table 8-15) for qPi 30..51; below 30, qPc = qPi. */
  private val QpcTab: Array[Int] = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
    38, 38, 39, 39, 39, 39)
  def chromaQp(qpY: Int, offset: Int): Int = {
    val qPi = math.max(0, math.min(51, qpY + offset))
    if (qPi < 30) qPi else QpcTab(qPi - 30)
  }

  // -------------------------------------------------------- transforms ---

  /** In-place 4x4 inverse integer transform (8.5.12.2) on a raster
    * 16-array of dequantized d, producing residuals r = (f+32)>>6. */
  def inverseTransform4x4(d: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val e0 = d(o) + d(o + 2)
      val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3)
      val e3 = d(o + 1) + (d(o + 3) >> 1)
      d(o) = e0 + e3; d(o + 1) = e1 + e2; d(o + 2) = e1 - e2; d(o + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val e0 = d(i) + d(i + 8)
      val e1 = d(i) - d(i + 8)
      val e2 = (d(i + 4) >> 1) - d(i + 12)
      val e3 = d(i + 4) + (d(i + 12) >> 1)
      d(i) = (e0 + e3 + 32) >> 6; d(i + 4) = (e1 + e2 + 32) >> 6
      d(i + 8) = (e1 - e2 + 32) >> 6; d(i + 12) = (e0 - e3 + 32) >> 6
      i += 1
    }
  }

  /** 4x4 unnormalized Hadamard (both for 8.5.10 inverse and the
    * encoder's forward — the transform is its own inverse up to 16x). */
  def hadamard4x4(m: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val e0 = m(o) + m(o + 2); val e1 = m(o) - m(o + 2)
      val e2 = m(o + 1) - m(o + 3); val e3 = m(o + 1) + m(o + 3)
      t(o) = e0 + e3; t(o + 1) = e1 + e2; t(o + 2) = e1 - e2; t(o + 3) = e0 - e3
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val e0 = t(i) + t(i + 8); val e1 = t(i) - t(i + 8)
      val e2 = t(i + 4) - t(i + 12); val e3 = t(i + 4) + t(i + 12)
      out(i) = e0 + e3; out(i + 4) = e1 + e2
      out(i + 8) = e1 - e2; out(i + 12) = e0 - e3
      i += 1
    }
    out
  }

  /** 2x2 Hadamard (8.5.11), raster (c00,c01,c10,c11). */
  def hadamard2x2(c: Array[Int]): Array[Int] = Array(
    c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
    c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))

  /** Dequantize one non-DC coefficient at raster pos (flat lists,
    * weightScale 16 folded — exactly the spec 8.5.12.1 for flat). */
  def dequant(level: Int, pos: Int, qp: Int): Int =
    level * DequantV(qp % 6)(PosClass(pos)) << (qp / 6)

  /** Luma DC scaling after inverse Hadamard (8.5.10). */
  def scaleLumaDc(f: Int, qp: Int): Int = {
    val ls = 16 * DequantV(qp % 6)(0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** Chroma DC scaling after inverse 2x2 Hadamard (8.5.11). */
  def scaleChromaDc(f: Int, qpc: Int): Int =
    ((f * (16 * DequantV(qpc % 6)(0))) << (qpc / 6)) >> 5

  def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ------------------------------------------------------ CAVLC decode ---

  /** One decoded residual block: coefficient levels in scan order
    * (length maxNumCoeff) + totalCoeff (for the nC bookkeeping). */
  final case class ResidualBlock(coeffs: Array[Int], totalCoeff: Int)

  private def decodeVlc(r: BitReader, lens: Array[Int], bits: Array[Int],
      what: String): Int = {
    var best = -1
    var bestLen = 0
    var i = 0
    while (i < lens.length) {
      val l = lens(i)
      if (l > 0 && (best == -1 || l < bestLen) && r.peek(l) == bits(i)) {
        // prefix-free tables: at most one entry can match; pick it
        best = i; bestLen = l
      }
      i += 1
    }
    require(best >= 0, s"H264: no $what VLC match")
    r.skip(bestLen)
    best
  }

  /** coeff_token: returns (totalCoeff, trailingOnes). nC == -1 selects
    * the chroma-DC table; nC >= 8 the 6-bit FLC. */
  def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) (0, 0) else ((v >> 2) + 1, v & 3)
    } else {
      val (lens, bits) =
        if (nC == -1) (ChromaDcCoeffTokenLen, ChromaDcCoeffTokenBits)
        else {
          val ctx = if (nC < 2) 0 else if (nC < 4) 1 else 2
          (CoeffTokenLen(ctx), CoeffTokenBits(ctx))
        }
      val idx = decodeVlc(r, lens, bits, "coeff_token")
      (idx >> 2, idx & 3)
    }
  }

  /** residual_block_cavlc (9.2.2): levels + runs -> scan-order array. */
  def residualBlock(r: BitReader, nC: Int, maxNumCoeff: Int): ResidualBlock = {
    val (totalCoeff, trailingOnes) = readCoeffToken(r, nC)
    val coeffs = new Array[Int](maxNumCoeff)
    if (totalCoeff == 0) return ResidualBlock(coeffs, 0)
    require(totalCoeff <= maxNumCoeff, "H264: totalCoeff > maxNumCoeff")
    val levels = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      levels(i) = if (r.u1() == 1) -1 else 1
      i += 1
    }
    var suffixLength =
      if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var levelPrefix = 0
      while (r.u1() == 0) {
        levelPrefix += 1
        require(levelPrefix <= 32, "H264: level_prefix too long")
      }
      val levelSuffixSize =
        if (levelPrefix == 14 && suffixLength == 0) 4
        else if (levelPrefix >= 15) levelPrefix - 3
        else suffixLength
      val suffix = if (levelSuffixSize > 0) r.u(levelSuffixSize) else 0
      var levelCode = (math.min(15, levelPrefix) << suffixLength) + suffix
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      levels(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else (-levelCode - 1) >> 1
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val totalZeros =
      if (totalCoeff == maxNumCoeff) 0
      else if (nC == -1)
        decodeVlc(r, ChromaDcTotalZerosLen(totalCoeff - 1),
          ChromaDcTotalZerosBits(totalCoeff - 1), "chroma total_zeros")
      else
        decodeVlc(r, TotalZerosLen(totalCoeff - 1),
          TotalZerosBits(totalCoeff - 1), "total_zeros")
    var zerosLeft = totalZeros
    val runs = new Array[Int](totalCoeff)
    i = 0
    while (i < totalCoeff - 1) {
      runs(i) =
        if (zerosLeft > 0) {
          val row = math.min(zerosLeft, 7) - 1
          decodeVlc(r, RunBeforeLen(row), RunBeforeBits(row), "run_before")
        } else 0
      zerosLeft -= runs(i)
      require(zerosLeft >= 0, "H264: run_before exceeds zerosLeft")
      i += 1
    }
    runs(totalCoeff - 1) = zerosLeft
    var coeffNum = totalCoeff + totalZeros - 1
    i = 0
    while (i < totalCoeff) {
      coeffs(coeffNum) = levels(i)
      coeffNum -= 1 + runs(i)
      i += 1
    }
    ResidualBlock(coeffs, totalCoeff)
  }

  // -------------------------------------------------- intra prediction ---

  /** Border-sample context for one 4x4 block: top[0..7] (incl.
    * top-right, already substituted per 8.3.1.2 when TR unavailable),
    * left[0..3], topLeft; availability flags. */
  final case class Border4(
      top: Array[Int], left: Array[Int], topLeft: Int,
      topAvail: Boolean, leftAvail: Boolean, topLeftAvail: Boolean)

  /** Intra 4x4 prediction (8.3.1.2.1-9) -> 16 raster samples. */
  def predict4x4(mode: Int, b: Border4): Array[Int] = {
    val p = new Array[Int](16)
    def t(x: Int) = b.top(x)
    def l(y: Int) = b.left(y)
    mode match {
      case 0 => // Vertical
        require(b.topAvail, "H264: V pred needs top samples")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = t(x); x += 1 }; y += 1 }
      case 1 => // Horizontal
        require(b.leftAvail, "H264: H pred needs left samples")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = l(y); x += 1 }; y += 1 }
      case 2 => // DC
        val v =
          if (b.topAvail && b.leftAvail)
            (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (b.leftAvail) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else if (b.topAvail) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(p, v)
      case 3 => // Diagonal down-left
        require(b.topAvail, "H264: DDL pred needs top samples")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            p(y * 4 + x) =
              if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 4 => // Diagonal down-right
        require(b.topAvail && b.leftAvail && b.topLeftAvail,
          "H264: DDR pred needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            p(y * 4 + x) =
              if (x > y)
                ((if (x - y == 1) b.topLeft else t(x - y - 2)) +
                  2 * t(x - y - 1) + t(x - y) + 2) >> 2
              else if (x < y)
                ((if (y - x == 1) b.topLeft else l(y - x - 2)) +
                  2 * l(y - x - 1) + l(y - x) + 2) >> 2
              else (t(0) + 2 * b.topLeft + l(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 5 => // Vertical-right
        require(b.topAvail && b.leftAvail && b.topLeftAvail,
          "H264: VR pred needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            p(y * 4 + x) =
              if (z >= 0 && z % 2 == 0) {
                val i = x - (y >> 1)
                ((if (i == 0) b.topLeft else t(i - 1)) + t(i) + 1) >> 1
              } else if (z >= 0) {
                val i = x - (y >> 1)
                ((if (i == 1) b.topLeft else t(i - 2)) + 2 * t(i - 1) + t(i) + 2) >> 2
              } else if (z == -1) (l(0) + 2 * b.topLeft + t(0) + 2) >> 2
              else (l(y - 2 * x - 1) + 2 * l(y - 2 * x - 2) +
                (if (y - 2 * x - 3 < 0) b.topLeft else l(y - 2 * x - 3)) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 6 => // Horizontal-down
        require(b.topAvail && b.leftAvail && b.topLeftAvail,
          "H264: HD pred needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            p(y * 4 + x) =
              if (z >= 0 && z % 2 == 0) {
                val i = y - (x >> 1)
                ((if (i == 0) b.topLeft else l(i - 1)) + l(i) + 1) >> 1
              } else if (z >= 0) {
                val i = y - (x >> 1)
                ((if (i == 1) b.topLeft else l(i - 2)) + 2 * l(i - 1) + l(i) + 2) >> 2
              } else if (z == -1) (t(0) + 2 * b.topLeft + l(0) + 2) >> 2
              else (t(x - 2 * y - 1) + 2 * t(x - 2 * y - 2) +
                (if (x - 2 * y - 3 < 0) b.topLeft else t(x - 2 * y - 3)) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 7 => // Vertical-left
        require(b.topAvail, "H264: VL pred needs top samples")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + (y >> 1)
            p(y * 4 + x) =
              if (y % 2 == 0) (t(i) + t(i + 1) + 1) >> 1
              else (t(i) + 2 * t(i + 1) + t(i + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 8 => // Horizontal-up
        require(b.leftAvail, "H264: HU pred needs left samples")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            p(y * 4 + x) =
              if (z > 5) l(3)
              else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
              else if (z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                l(y + (x >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"H264: bad 4x4 mode $m")
    }
    p
  }

  /** Intra 16x16 luma prediction (8.3.3): mode 0 V, 1 H, 2 DC,
    * 3 Plane. top[0..15], left[0..15], topLeft. */
  def predict16x16(mode: Int, top: Array[Int], left: Array[Int], topLeft: Int,
      topAvail: Boolean, leftAvail: Boolean): Array[Int] = {
    val p = new Array[Int](256)
    mode match {
      case 0 =>
        require(topAvail, "H264: 16x16 V pred needs top")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = top(x); x += 1 }; y += 1 }
      case 1 =>
        require(leftAvail, "H264: 16x16 H pred needs left")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = left(y); x += 1 }; y += 1 }
      case 2 =>
        val v =
          if (topAvail && leftAvail) (top.sum + left.sum + 16) >> 5
          else if (leftAvail) (left.sum + 8) >> 4
          else if (topAvail) (top.sum + 8) >> 4
          else 128
        java.util.Arrays.fill(p, v)
      case 3 =>
        require(topAvail && leftAvail, "H264: 16x16 plane pred needs top+left")
        var hg = 0; var vg = 0
        var i = 0
        while (i < 8) {
          hg += (i + 1) * (top(8 + i) - (if (6 - i < 0) topLeft else top(6 - i)))
          vg += (i + 1) * (left(8 + i) - (if (6 - i < 0) topLeft else left(6 - i)))
          i += 1
        }
        val a = 16 * (left(15) + top(15))
        val bb = (5 * hg + 32) >> 6
        val cc = (5 * vg + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            p(y * 16 + x) = clip255((a + bb * (x - 7) + cc * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"H264: bad 16x16 mode $m")
    }
    p
  }

  /** Intra chroma 8x8 prediction (8.3.4): mode 0 DC, 1 H, 2 V,
    * 3 Plane. top[0..7], left[0..7], topLeft. */
  def predictChroma(mode: Int, top: Array[Int], left: Array[Int], topLeft: Int,
      topAvail: Boolean, leftAvail: Boolean): Array[Int] = {
    val p = new Array[Int](64)
    mode match {
      case 0 => // DC, per 4x4 sub-block
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            def sumT = (0 until 4).map(i => top(bx * 4 + i)).sum
            def sumL = (0 until 4).map(i => left(by * 4 + i)).sum
            val v =
              if (bx == by) { // corner blocks use both when available
                if (topAvail && leftAvail) (sumT + sumL + 4) >> 3
                else if (leftAvail) (sumL + 2) >> 2
                else if (topAvail) (sumT + 2) >> 2
                else 128
              } else if (bx == 1 && by == 0) {
                if (topAvail) (sumT + 2) >> 2
                else if (leftAvail) (sumL + 2) >> 2
                else 128
              } else { // bx == 0, by == 1
                if (leftAvail) (sumL + 2) >> 2
                else if (topAvail) (sumT + 2) >> 2
                else 128
              }
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) { p((by * 4 + y) * 8 + bx * 4 + x) = v; x += 1 }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
      case 1 =>
        require(leftAvail, "H264: chroma H pred needs left")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = left(y); x += 1 }; y += 1 }
      case 2 =>
        require(topAvail, "H264: chroma V pred needs top")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = top(x); x += 1 }; y += 1 }
      case 3 =>
        require(topAvail && leftAvail, "H264: chroma plane pred needs top+left")
        var hg = 0; var vg = 0
        var i = 0
        while (i < 4) {
          hg += (i + 1) * (top(4 + i) - (if (2 - i < 0) topLeft else top(2 - i)))
          vg += (i + 1) * (left(4 + i) - (if (2 - i < 0) topLeft else left(2 - i)))
          i += 1
        }
        val a = 16 * (left(7) + top(7))
        val bb = (17 * hg + 16) >> 5
        val cc = (17 * vg + 16) >> 5
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            p(y * 8 + x) = clip255((a + bb * (x - 3) + cc * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"H264: bad chroma mode $m")
    }
    p
  }

  /** luma4x4BlkIdx -> (x, y) pixel offset inside the MB (6.4.3). */
  def luma4x4Pos(blk: Int): (Int, Int) = (
    ((blk >> 2) & 1) * 8 + (blk & 1) * 4,
    ((blk >> 3) & 1) * 8 + ((blk >> 1) & 1) * 4)

  /** inverse of luma4x4Pos: (xx, yy) 4x4-grid coords in MB -> blkIdx. */
  def luma4x4Idx(xx: Int, yy: Int): Int =
    8 * (yy >> 1) + 4 * (xx >> 1) + 2 * (yy & 1) + (xx & 1)

  // ------------------------------------------------------ frame decode ---

  final case class Frame(y: Array[Int], cb: Array[Int], cr: Array[Int])

  final case class Decoded(width: Int, height: Int, frames: Array[Frame])

  /** Decode an Annex B byte stream of SPS + PPS + IDR I-slices. */
  def decode(bytes: Array[Byte]): Decoded = {
    var sps: Sps = null
    var pps: Pps = null
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    nalUnits(bytes).foreach { case (refIdc, typ, rbsp) =>
      typ match {
        case 7 => sps = parseSps(new BitReader(rbsp))
        case 8 => pps = parsePps(new BitReader(rbsp))
        case 5 =>
          require(sps != null && pps != null, "H264: IDR before SPS/PPS")
          require(refIdc > 0, "H264: IDR slice with nal_ref_idc 0")
          frames += decodeIdrSlice(new BitReader(rbsp), sps, pps)
        case 1 =>
          throw new IllegalArgumentException(
            "H264: non-IDR slice — inter prediction not supported")
        case 6 | 9 | 10 | 11 => () // SEI / AUD / end-of-seq/stream: ignore
        case t =>
          throw new IllegalArgumentException(s"H264: unsupported NAL type $t")
      }
    }
    require(sps != null, "H264: no SPS in stream")
    require(frames.nonEmpty, "H264: no IDR slice in stream")
    // apply frame cropping on output
    val (w, h) = (sps.width, sps.height)
    val fw = sps.mbW * 16
    val cropped = frames.map { f =>
      if (w == fw && h == sps.mbH * 16) f
      else {
        val y = new Array[Int](w * h)
        var r = 0
        while (r < h) {
          System.arraycopy(f.y, (r + 2 * sps.cropT) * fw + 2 * sps.cropL, y, r * w, w)
          r += 1
        }
        val cw = w / 2; val ch = h / 2; val cfw = fw / 2
        val cb = new Array[Int](cw * ch); val cr = new Array[Int](cw * ch)
        r = 0
        while (r < ch) {
          System.arraycopy(f.cb, (r + sps.cropT) * cfw + sps.cropL, cb, r * cw, cw)
          System.arraycopy(f.cr, (r + sps.cropT) * cfw + sps.cropL, cr, r * cw, cw)
          r += 1
        }
        Frame(y, cb, cr)
      }
    }
    Decoded(w, h, cropped.toArray)
  }

  private def decodeIdrSlice(r: BitReader, sps: Sps, pps: Pps): Frame = {
    // ---- slice header
    val firstMb = r.ue()
    require(firstMb == 0, "H264: multi-slice pictures not supported")
    val sliceType = r.ue()
    require(sliceType == 2 || sliceType == 7,
      s"H264: slice_type $sliceType — only I slices supported")
    r.ue() // pps_id (single active PPS assumed)
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.pocType == 0) r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
    if (pps.redundantPicCnt) r.ue()
    // dec_ref_pic_marking for IDR
    r.u1(); r.u1() // no_output_of_prior_pics, long_term_reference
    var qp = pps.picInitQp + r.se() // slice_qp_delta
    if (pps.deblockControl) {
      val disable = r.ue()
      require(disable == 1,
        "H264: in-loop deblocking requested but not implemented — rejecting " +
          "rather than decoding wrong samples")
    } else throw new IllegalArgumentException(
      "H264: stream does not disable deblocking (PPS lacks the control flag)")

    // ---- picture state
    val mbW = sps.mbW; val mbH = sps.mbH
    val w = mbW * 16; val h = mbH * 16
    val cw = w / 2; val chh = h / 2
    val Y = new Array[Int](w * h)
    val Cb = new Array[Int](cw * chh)
    val Cr = new Array[Int](cw * chh)
    // nC bookkeeping on global 4x4 grids (counts per decoded block)
    val nnzY = Array.fill(mbW * 4 * mbH * 4)(-1) // -1 = not yet decoded
    val nnzCb = Array.fill(mbW * 2 * mbH * 2)(-1)
    val nnzCr = Array.fill(mbW * 2 * mbH * 2)(-1)
    // per-4x4-block intra mode grid for 4x4 mode prediction
    // (-1 = block not in an I_4x4 MB)
    val mode4 = Array.fill(mbW * 4 * mbH * 4)(-1)

    def nC(grid: Array[Int], gw: Int, gx: Int, gy: Int): Int = {
      val a = if (gx > 0) grid(gy * gw + gx - 1) else -1
      val b = if (gy > 0) grid((gy - 1) * gw + gx) else -1
      if (a >= 0 && b >= 0) (a + b + 1) >> 1
      else if (a >= 0) a else if (b >= 0) b else 0
    }

    var mb = 0
    val nMbs = mbW * mbH
    while (mb < nMbs) {
      val mbX = mb % mbW; val mbY = mb / mbW
      val px = mbX * 16; val py = mbY * 16 // luma pixel origin
      val gx0 = mbX * 4; val gy0 = mbY * 4 // luma 4x4-grid origin
      val cgx0 = mbX * 2; val cgy0 = mbY * 2 // chroma grid origin

      val mbType = r.ue()
      require(mbType <= 25, s"H264: mb_type $mbType invalid in I slice")

      if (mbType == 25) {
        // ------------------------------------------------------ I_PCM ---
        r.byteAlign()
        var i = 0
        while (i < 256) {
          Y((py + i / 16) * w + px + i % 16) = r.readAlignedByte(); i += 1
        }
        i = 0
        while (i < 64) {
          Cb((py / 2 + i / 8) * cw + px / 2 + i % 8) = r.readAlignedByte(); i += 1
        }
        i = 0
        while (i < 64) {
          Cr((py / 2 + i / 8) * cw + px / 2 + i % 8) = r.readAlignedByte(); i += 1
        }
        // I_PCM counts as 16 coefficients for neighbor nC
        var yy = 0
        while (yy < 4) {
          var xx = 0
          while (xx < 4) { nnzY((gy0 + yy) * mbW * 4 + gx0 + xx) = 16; xx += 1 }
          yy += 1
        }
        yy = 0
        while (yy < 2) {
          var xx = 0
          while (xx < 2) {
            nnzCb((cgy0 + yy) * mbW * 2 + cgx0 + xx) = 16
            nnzCr((cgy0 + yy) * mbW * 2 + cgx0 + xx) = 16
            xx += 1
          }
          yy += 1
        }
      } else {
        val is16 = mbType >= 1
        val (pred16Mode, cbpChroma16, cbpLuma16) =
          if (is16) {
            val t = mbType - 1
            (t % 4, (t / 4) % 3, (t / 12) * 15)
          } else (0, 0, 0)

        // ---- prediction mode parse (I_4x4)
        val modes = new Array[Int](16)
        if (!is16) {
          var blk = 0
          while (blk < 16) {
            val (bx, by) = luma4x4Pos(blk)
            val gx = gx0 + bx / 4; val gy = gy0 + by / 4
            val mA = if (gx > 0) mode4(gy * mbW * 4 + gx - 1) else -1
            val mB = if (gy > 0) mode4((gy - 1) * mbW * 4 + gx) else -1
            val predMode = math.min(
              if (mA < 0) 2 else mA, if (mB < 0) 2 else mB)
            modes(blk) =
              if (r.u1() == 1) predMode
              else { val rem = r.u(3); if (rem < predMode) rem else rem + 1 }
            mode4(gy * mbW * 4 + gx) = modes(blk)
            blk += 1
          }
        }
        val chromaMode = r.ue()
        require(chromaMode <= 3, s"H264: intra_chroma_pred_mode $chromaMode")

        // ---- CBP
        val (cbpLuma, cbpChroma) =
          if (is16) (cbpLuma16, cbpChroma16)
          else {
            val code = r.ue()
            require(code < 48, s"H264: coded_block_pattern code $code")
            val cbp = CbpIntra(code)
            (cbp & 15, cbp >> 4)
          }
        if (is16 || cbpLuma != 0 || cbpChroma != 0) {
          val delta = r.se()
          qp = (qp + delta + 52) % 52
        }
        val qpc = chromaQp(qp, pps.chromaQpOffset)

        // ---- residual parse
        val gw = mbW * 4
        var dcLuma: Array[Int] = null
        if (is16) {
          val n = nC(nnzY, gw, gx0, gy0)
          dcLuma = residualBlock(r, n, 16).coeffs
        }
        val acBlocks = new Array[Array[Int]](16)
        var blk = 0
        while (blk < 16) {
          val (bx, by) = luma4x4Pos(blk)
          val gx = gx0 + bx / 4; val gy = gy0 + by / 4
          if ((cbpLuma & (1 << (blk >> 2))) != 0) {
            val n = nC(nnzY, gw, gx, gy)
            val rb = residualBlock(r, n, if (is16) 15 else 16)
            acBlocks(blk) = rb.coeffs
            nnzY(gy * gw + gx) = rb.totalCoeff
          } else {
            acBlocks(blk) = new Array[Int](if (is16) 15 else 16)
            nnzY(gy * gw + gx) = 0
          }
          blk += 1
        }
        val cgw = mbW * 2
        val dcCb = new Array[Int](4); val dcCr = new Array[Int](4)
        if (cbpChroma != 0) {
          System.arraycopy(residualBlock(r, -1, 4).coeffs, 0, dcCb, 0, 4)
          System.arraycopy(residualBlock(r, -1, 4).coeffs, 0, dcCr, 0, 4)
        }
        val acCb = new Array[Array[Int]](4); val acCr = new Array[Array[Int]](4)
        var c = 0
        while (c < 2) {
          val (grid, ac) = if (c == 0) (nnzCb, acCb) else (nnzCr, acCr)
          var cb = 0
          while (cb < 4) {
            val cgx = cgx0 + (cb & 1); val cgy = cgy0 + (cb >> 1)
            if (cbpChroma == 2) {
              val n = nC(grid, cgw, cgx, cgy)
              val rb = residualBlock(r, n, 15)
              ac(cb) = rb.coeffs
              grid(cgy * cgw + cgx) = rb.totalCoeff
            } else {
              ac(cb) = new Array[Int](15)
              grid(cgy * cgw + cgx) = 0
            }
            cb += 1
          }
          c += 1
        }

        // ---- reconstruction: luma
        if (is16) {
          val topA = mbY > 0; val leftA = mbX > 0
          val top = Array.tabulate(16)(i => if (topA) Y((py - 1) * w + px + i) else 0)
          val left = Array.tabulate(16)(i => if (leftA) Y((py + i) * w + px - 1) else 0)
          val tl = if (topA && leftA) Y((py - 1) * w + px - 1) else 0
          val pred = predict16x16(pred16Mode, top, left, tl, topA, leftA)
          // DC: de-zigzag (8.5.6) then inverse Hadamard then scale (8.5.10)
          val dcRaster = new Array[Int](16)
          var zk = 0
          while (zk < 16) { dcRaster(Zigzag4(zk)) = dcLuma(zk); zk += 1 }
          val f = hadamard4x4(dcRaster)
          val dc = f.map(scaleLumaDc(_, qp))
          var b = 0
          while (b < 16) {
            val (bx, by) = luma4x4Pos(b)
            val d = new Array[Int](16)
            var k = 1
            while (k < 16) {
              d(Zigzag4(k)) = dequant(acBlocks(b)(k - 1), Zigzag4(k), qp)
              k += 1
            }
            // DC position in the Hadamard grid is raster over 4x4 blocks
            d(0) = dc((by / 4) * 4 + bx / 4)
            inverseTransform4x4(d)
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) {
                val o = (py + by + y) * w + px + bx + x
                Y(o) = clip255(pred((by + y) * 16 + bx + x) + d(y * 4 + x))
                x += 1
              }
              y += 1
            }
            b += 1
          }
        } else {
          var b = 0
          while (b < 16) {
            val (bx, by) = luma4x4Pos(b)
            val ax = px + bx; val ay = py + by // absolute pixel coords
            val topA = ay > 0
            val leftA = ax > 0
            val tlA = topA && leftA
            // top-right availability: block (BX+1, BY-1) decoded already?
            val trA = topA && (ax + 4 < w) && {
              val trMbX = (ax + 4) / 16; val trMbY = (ay - 1) / 16
              val trMb = trMbY * mbW + trMbX
              if (trMb < mb) true
              else if (trMb > mb) false
              else luma4x4Idx((ax + 4) % 16 / 4, (ay - 1) % 16 / 4) < b
            }
            val top = new Array[Int](8)
            if (topA) {
              var i = 0
              while (i < 4) { top(i) = Y((ay - 1) * w + ax + i); i += 1 }
              while (i < 8) {
                top(i) = if (trA) Y((ay - 1) * w + ax + i) else top(3)
                i += 1
              }
            }
            val left = Array.tabulate(4)(i => if (leftA) Y((ay + i) * w + ax - 1) else 0)
            val tl = if (tlA) Y((ay - 1) * w + ax - 1) else 0
            val pred = predict4x4(modes(b), Border4(top, left, tl, topA, leftA, tlA))
            val d = new Array[Int](16)
            var k = 0
            while (k < 16) {
              d(Zigzag4(k)) = dequant(acBlocks(b)(k), Zigzag4(k), qp)
              k += 1
            }
            inverseTransform4x4(d)
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) {
                Y((ay + y) * w + ax + x) = clip255(pred(y * 4 + x) + d(y * 4 + x))
                x += 1
              }
              y += 1
            }
            b += 1
          }
        }

        // ---- reconstruction: chroma
        val cpx = px / 2; val cpy = py / 2
        val topA = mbY > 0; val leftA = mbX > 0
        c = 0
        while (c < 2) {
          val plane = if (c == 0) Cb else Cr
          val dcIn = if (c == 0) dcCb else dcCr
          val ac = if (c == 0) acCb else acCr
          val top = Array.tabulate(8)(i => if (topA) plane((cpy - 1) * cw + cpx + i) else 0)
          val left = Array.tabulate(8)(i => if (leftA) plane((cpy + i) * cw + cpx - 1) else 0)
          val tl = if (topA && leftA) plane((cpy - 1) * cw + cpx - 1) else 0
          val pred = predictChroma(chromaMode, top, left, tl, topA, leftA)
          val f = hadamard2x2(dcIn)
          val dc = f.map(scaleChromaDc(_, qpc))
          var b = 0
          while (b < 4) {
            val bx = (b & 1) * 4; val by = (b >> 1) * 4
            val d = new Array[Int](16)
            var k = 1
            while (k < 16) {
              d(Zigzag4(k)) = dequant(ac(b)(k - 1), Zigzag4(k), qpc)
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
      mb += 1
    }
    Frame(Y, Cb, Cr)
  }
}
