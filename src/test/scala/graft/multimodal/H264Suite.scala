package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import H264Codec._
import H264Encoder.BitWriter

/** Gates for the intra-only baseline H.264 codec. No reference H.264
  * decoder exists in this container (unlike JPEG's ImageIO), so
  * conformance rests on three independent legs plus structural table
  * checks:
  *
  *  1. hand-authored bitstreams written syntax-element-by-element from
  *     the spec in this suite (no shared code with the encoder's MB
  *     pipeline) with hand-computed expected samples;
  *  2. I_PCM streams, where decode must be byte-exact to the source
  *     (pins NAL / emulation-prevention / SPS / PPS / slice-header /
  *     alignment with zero codec-math ambiguity);
  *  3. encoder-reconstruction parity: the decoder must reproduce the
  *     encoder's spec-math reconstruction EXACTLY, and that recon must
  *     sit within a quantization-error bound of the source (so the
  *     transform/quant pipeline can't be self-consistently wrong by
  *     more than the bound).
  */
class H264Suite extends AnyFunSuite {

  // ------------------------------------------------------- VLC tables ---

  private def kraft(lens: Seq[Int]): Double =
    lens.filter(_ > 0).map(l => math.pow(2, -l)).sum

  private def assertPrefixFree(pairs: Seq[(Int, Int)], what: String): Unit = {
    val codes = pairs.filter(_._1 > 0)
    for (Seq((l1, b1), (l2, b2)) <- codes.combinations(2)) {
      val (sl, sb, ll, lb) = if (l1 <= l2) (l1, b1, l2, b2) else (l2, b2, l1, b1)
      assert((lb >> (ll - sl)) != sb || ll == sl,
        s"$what: code ($sl,$sb) is a prefix of ($ll,$lb)")
    }
    codes.groupBy(identity).foreach { case (c, g) =>
      assert(g.size == 1, s"$what: duplicate code $c")
    }
  }

  test("coeff_token tables are complete prefix codes per nC context") {
    for (ctx <- 0 until 3) {
      val pairs = CoeffTokenLen(ctx).zip(CoeffTokenBits(ctx)).toSeq
      assertPrefixFree(pairs, s"coeff_token ctx $ctx")
      // each context leaves exactly one codeword unused in the spec
      // table (15-bit / 13-bit / 10-bit) — verified by tree-tiling
      // analysis; any transcription slip in a length breaks this sum
      val expect = 1.0 - math.pow(2, Seq(-15, -13, -10)(ctx))
      assert(math.abs(kraft(CoeffTokenLen(ctx).toSeq) - expect) < 1e-12,
        s"coeff_token ctx $ctx Kraft ${kraft(CoeffTokenLen(ctx).toSeq)} != $expect")
    }
    val cd = ChromaDcCoeffTokenLen.zip(ChromaDcCoeffTokenBits).toSeq
    assertPrefixFree(cd, "chroma DC coeff_token")
    assert(math.abs(kraft(ChromaDcCoeffTokenLen.toSeq) - 1.0) < 1e-12)
  }

  test("total_zeros and run_before tables are complete prefix codes") {
    for (tc <- TotalZerosLen.indices) {
      val pairs = TotalZerosLen(tc).zip(TotalZerosBits(tc)).toSeq
      assertPrefixFree(pairs, s"total_zeros tc=${tc + 1}")
      // the spec's tzVlcIndex=1 row leaves the all-zeros 9-bit code
      // unused (deficit 2^-9); every other row is complete
      val k = kraft(TotalZerosLen(tc).toSeq)
      val expect = if (tc == 0) 1.0 - math.pow(2, -9) else 1.0
      assert(math.abs(k - expect) < 1e-12,
        s"total_zeros tc=${tc + 1}: Kraft $k != $expect")
    }
    for (tc <- ChromaDcTotalZerosLen.indices) {
      val pairs = ChromaDcTotalZerosLen(tc).zip(ChromaDcTotalZerosBits(tc)).toSeq
      assertPrefixFree(pairs, s"chroma total_zeros tc=${tc + 1}")
      assert(math.abs(kraft(ChromaDcTotalZerosLen(tc).toSeq) - 1.0) < 1e-12)
    }
    for (zl <- RunBeforeLen.indices) {
      val pairs = RunBeforeLen(zl).zip(RunBeforeBits(zl)).toSeq
      assertPrefixFree(pairs, s"run_before zl=${zl + 1}")
      // rows 0..5 are complete; row 6 (zerosLeft>6) is an open-ended
      // unary extension — completeness does not apply
      if (zl < 6)
        assert(math.abs(kraft(RunBeforeLen(zl).toSeq) - 1.0) < 1e-12,
          s"run_before zl=${zl + 1} not complete")
    }
  }

  test("CBP intra table is a permutation of 0..47") {
    assert(CbpIntra.sorted.toSeq == (0 until 48).toSeq)
  }

  test("transform+quant roundtrip at qp 0 recovers residuals within 1") {
    // at qp 0 the quantization step is sub-unit, so the full
    // forward -> quant -> dequant -> inverse chain must reproduce every
    // residual to within +-1 — any scaling-chain bug shows up as a
    // systematic multiple instead
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val res = Array.fill(16)(rnd.nextInt(61) - 30)
      val t = H264Encoder.forwardTransform4x4(res)
      val d = new Array[Int](16)
      for (k <- 0 until 16) {
        val pos = Zigzag4(k)
        val lvl = H264Encoder.quantCoefForTest(t(pos), pos, 0)
        d(pos) = dequant(lvl, pos, 0)
      }
      inverseTransform4x4(d)
      for (i <- 0 until 16)
        assert(math.abs(d(i) - res(i)) <= 1,
          s"qp0 roundtrip off by ${d(i) - res(i)} at $i for ${res.toSeq}")
    }
    // and the constant block is exact through the DC basis
    val const = Array.fill(16)(13)
    val t = H264Encoder.forwardTransform4x4(const)
    assert(t(0) == 16 * 13 && t.drop(1).forall(_ == 0))
  }

  test("exp-Golomb writer and reader are inverse") {
    val w = new BitWriter
    val vals = Seq(0, 1, 2, 3, 7, 15, 255, 12345)
    vals.foreach(w.ue)
    val svals = Seq(0, 1, -1, 5, -9, 200, -1000)
    svals.foreach(w.se)
    w.trailing()
    val r = new BitReader(w.toBytes)
    vals.foreach(v => assert(r.ue() == v))
    svals.foreach(v => assert(r.se() == v))
  }

  // -------------------------------------------- hand-authored streams ---

  /** SPS + PPS for a mbW x mbH picture, QP 24, deblocking disabled —
    * written element-by-element from the spec syntax (7.3.2.1/7.3.2.2),
    * independently of the encoder's SPS/PPS writers. */
  private def handSpsPps(mbW: Int, mbH: Int, qp: Int): Array[Byte] = {
    val sps = new BitWriter
    sps.write(66, 8) // profile_idc: baseline
    sps.write(0xc0, 8) // constraint_set0/1, reserved zero
    sps.write(10, 8) // level_idc
    sps.ue(0) // seq_parameter_set_id
    sps.ue(0) // log2_max_frame_num_minus4
    sps.ue(2) // pic_order_cnt_type
    sps.ue(1) // max_num_ref_frames
    sps.write(0, 1) // gaps_in_frame_num_value_allowed_flag
    sps.ue(mbW - 1) // pic_width_in_mbs_minus1
    sps.ue(mbH - 1) // pic_height_in_map_units_minus1
    sps.write(1, 1) // frame_mbs_only_flag
    sps.write(1, 1) // direct_8x8_inference_flag
    sps.write(0, 1) // frame_cropping_flag
    sps.write(0, 1) // vui_parameters_present_flag
    sps.trailing()
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.write(0, 1) // entropy_coding_mode_flag: CAVLC
    pps.write(0, 1) // bottom_field_pic_order_in_frame_present_flag
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx defaults
    pps.write(0, 1); pps.write(0, 2) // weighted_pred, weighted_bipred_idc
    pps.se(qp - 26) // pic_init_qp_minus26
    pps.se(0) // pic_init_qs_minus26
    pps.se(0) // chroma_qp_index_offset
    pps.write(1, 1) // deblocking_filter_control_present_flag
    pps.write(0, 1) // constrained_intra_pred_flag
    pps.write(0, 1) // redundant_pic_cnt_present_flag
    pps.trailing()
    H264Encoder.nal(3, 7, sps.toBytes) ++ H264Encoder.nal(3, 8, pps.toBytes)
  }

  private def handSliceHeader(w: BitWriter): Unit = {
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all)
    w.ue(0) // pic_parameter_set_id
    w.write(0, 4) // frame_num
    w.ue(0) // idr_pic_id
    w.write(0, 1); w.write(0, 1) // no_output_of_prior_pics, long_term_ref
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc = 1
  }

  test("hand stream: I_16x16 DC, zero residual -> flat 128") {
    val w = new BitWriter
    handSliceHeader(w)
    w.ue(3) // mb_type: I_16x16_2_0_0 (DC pred, cbpChroma 0, cbpLuma 0)
    w.ue(0) // intra_chroma_pred_mode: DC
    w.se(0) // mb_qp_delta
    // Intra16x16DCLevel: coeff_token nC=0, TotalCoeff 0 -> '1'
    w.write(1, 1)
    w.trailing()
    val stream = handSpsPps(1, 1, 24) ++ H264Encoder.nal(3, 5, w.toBytes)
    val dec = decode(stream)
    assert(dec.width == 16 && dec.height == 16 && dec.frames.length == 1)
    assert(dec.frames(0).y.forall(_ == 128), "luma must be flat DC 128")
    assert(dec.frames(0).cb.forall(_ == 128) && dec.frames(0).cr.forall(_ == 128))
  }

  test("hand stream: I_16x16 DC with one luma DC coefficient -> flat 129") {
    // quantized DC level +1 at scan pos 0: after inverse Hadamard every
    // block's f = 1; scaleLumaDc(1, qp=24) = (1*160 + 2) >> 2 = 40;
    // inverse transform of d(0,0)=40 gives (40+32)>>6 = 1 per sample;
    // DC prediction with no neighbors = 128 -> all samples 129.
    val w = new BitWriter
    handSliceHeader(w)
    w.ue(3) // I_16x16 DC, cbp 0/0
    w.ue(0) // chroma DC
    w.se(0) // mb_qp_delta
    // DC block: TotalCoeff 1, TrailingOnes 1 (nC=0): '01'
    w.write(1, 2)
    w.write(0, 1) // trailing one sign: +
    // total_zeros (tc=1, maxNumCoeff 16): tz=0 -> '1'
    w.write(1, 1)
    w.trailing()
    val stream = handSpsPps(1, 1, 24) ++ H264Encoder.nal(3, 5, w.toBytes)
    val dec = decode(stream)
    assert(dec.frames(0).y.forall(_ == 129),
      s"expected flat 129, got ${dec.frames(0).y.toSeq.distinct}")
    assert(dec.frames(0).cb.forall(_ == 128))
  }

  test("hand stream: I_4x4 all-DC, zero residual -> flat 128") {
    val w = new BitWriter
    handSliceHeader(w)
    w.ue(0) // mb_type: I_NxN
    for (_ <- 0 until 16) w.write(1, 1) // prev_intra4x4_pred_mode_flag (DC)
    w.ue(0) // chroma DC
    w.ue(3) // coded_block_pattern: codeNum 3 -> cbp 0
    w.trailing()
    val stream = handSpsPps(1, 1, 24) ++ H264Encoder.nal(3, 5, w.toBytes)
    val dec = decode(stream)
    assert(dec.frames(0).y.forall(_ == 128))
  }

  test("hand stream: I_PCM with embedded zero runs (emulation prevention)") {
    val w = new BitWriter
    handSliceHeader(w)
    w.ue(25) // mb_type: I_PCM
    w.alignZero()
    // deliberately include long runs of 0x00 to force 00 00 03 escapes
    val y = Array.tabulate(256)(i => if (i % 19 < 3) 0 else (i * 7) % 256)
    val cb = Array.tabulate(64)(i => if (i < 6) 0 else (i * 5) % 256)
    val cr = Array.tabulate(64)(i => (i * 11) % 256)
    y.foreach(v => w.write(v, 8))
    cb.foreach(v => w.write(v, 8))
    cr.foreach(v => w.write(v, 8))
    w.trailing()
    val rbsp = w.toBytes
    val ebsp = H264Encoder.nal(3, 5, rbsp)
    assert(ebsp.containsSlice(Array[Byte](0, 0, 3)),
      "fixture must actually exercise emulation prevention")
    val stream = handSpsPps(1, 1, 24) ++ ebsp
    val dec = decode(stream)
    assert(dec.frames(0).y.toSeq == y.toSeq, "I_PCM luma must be byte-exact")
    assert(dec.frames(0).cb.toSeq == cb.toSeq)
    assert(dec.frames(0).cr.toSeq == cr.toSeq)
  }

  test("hand stream: I_4x4 vertical pred propagates the PCM row above") {
    // MB 0: I_PCM with a known bottom row; MB 1 sits below?? — 2x1 MBs
    // stacked vertically: mbH=2, mbW=1. Second MB: I_4x4 all mode 0
    // (vertical), no residual -> every row copies PCM's bottom row.
    val w = new BitWriter
    handSliceHeader(w)
    w.ue(25) // MB 0: I_PCM
    w.alignZero()
    val y = Array.tabulate(256)(i => (40 + (i % 16) * 3) % 256)
    val cb = Array.fill(64)(90); val cr = Array.fill(64)(160)
    y.foreach(v => w.write(v, 8))
    cb.foreach(v => w.write(v, 8)); cr.foreach(v => w.write(v, 8))
    // MB 1: I_NxN, all blocks vertical (mode 0). Signaling follows the
    // predicted-mode rule: block 0's neighbors are out-of-picture /
    // PCM (both -> DC=2), so predMode=2 and mode 0 needs flag=0,rem=0;
    // every later block has a mode-0 neighbor, so predMode=0 and
    // flag=1 selects it.
    w.ue(0)
    w.write(0, 1); w.write(0, 3) // block 0: rem 0 < pred 2 -> mode 0
    for (_ <- 1 until 16) w.write(1, 1) // prev_flag: predicted mode 0

    w.ue(0) // chroma DC
    w.ue(3) // cbp 0
    w.trailing()
    val stream = handSpsPps(1, 2, 24) ++ H264Encoder.nal(3, 5, w.toBytes)
    val dec = decode(stream)
    assert(dec.width == 16 && dec.height == 32)
    val bottomRow = (0 until 16).map(x => y(15 * 16 + x))
    for (row <- 16 until 32; x <- 0 until 16)
      assert(dec.frames(0).y(row * 16 + x) == bottomRow(x),
        s"vertical pred mismatch at ($x,$row)")
  }

  // ------------------------------------------------- roundtrip parity ---

  /** smooth deterministic YCbCr content (same spirit as JpegFixtureGen). */
  private def smooth(w: Int, h: Int, seed: Int): (Array[Int], Array[Int], Array[Int]) = {
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

  test("roundtrip: decoder reproduces encoder reconstruction exactly") {
    for ((w, h, qp, nf) <- Seq((48, 32, 24, 2), (64, 48, 30, 1),
      (32, 32, 18, 3), (34, 18, 26, 2))) {
      val frames = (0 until nf).map(f => smooth(w, h, f))
      val (bytes, recon) = H264Encoder.encode(w, h, frames, qp)
      val dec = decode(bytes)
      assert(dec.width == w && dec.height == h, s"dims for ${(w, h)}")
      assert(dec.frames.length == nf)
      for (f <- 0 until nf) {
        // encoder recon is uncropped; compare on the cropped window
        val fw = ((w + 15) / 16) * 16
        for (yy <- 0 until h; xx <- 0 until w)
          assert(dec.frames(f).y(yy * w + xx) == recon(f).y(yy * fw + xx),
            s"luma parity mismatch at ($xx,$yy) frame $f size ${(w, h)} qp $qp")
        val cfw = fw / 2
        for (yy <- 0 until h / 2; xx <- 0 until w / 2) {
          assert(dec.frames(f).cb(yy * (w / 2) + xx) == recon(f).cb(yy * cfw + xx),
            s"cb parity mismatch at ($xx,$yy) frame $f")
          assert(dec.frames(f).cr(yy * (w / 2) + xx) == recon(f).cr(yy * cfw + xx),
            s"cr parity mismatch at ($xx,$yy) frame $f")
        }
      }
    }
  }

  test("roundtrip: reconstruction error is bounded by quantization step") {
    val (w, h) = (48, 48)
    val frames = Seq(smooth(w, h, 1))
    for (qp <- Seq(12, 20, 28)) {
      val (bytes, _) = H264Encoder.encode(w, h, frames, qp)
      val dec = decode(bytes)
      val err = dec.frames(0).y.zip(frames.head._1).map { case (a, b) =>
        math.abs(a - b)
      }
      val mean = err.sum.toDouble / err.length
      // quant step doubles every 6 QP; these bounds are loose enough to
      // be stable but tight enough to catch any systematic scaling bug
      val bound = math.max(2.0, math.pow(2.0, (qp - 4) / 6.0) * 0.8)
      assert(mean <= bound,
        s"qp=$qp mean |err| $mean exceeds $bound — transform/quant chain broken")
      assert(err.max <= 16 * math.max(1.0, math.pow(2.0, (qp - 10) / 6.0)),
        s"qp=$qp max err ${err.max}")
    }
  }

  test("all-PCM streams decode byte-exactly (lossless path)") {
    val (w, h) = (32, 32)
    val frames = (0 until 3).map { f =>
      (Array.tabulate(w * h)(i => (i * 3 + f * 11) % 256),
        Array.tabulate(w / 2 * h / 2)(i => (i * 5 + f) % 256),
        Array.tabulate(w / 2 * h / 2)(i => (i * 7 + 2 * f) % 256))
    }
    val (bytes, _) = H264Encoder.encode(w, h, frames, 24, allPcm = true)
    val dec = decode(bytes)
    assert(dec.frames.length == 3)
    for (f <- 0 until 3) {
      assert(dec.frames(f).y.toSeq == frames(f)._1.toSeq)
      assert(dec.frames(f).cb.toSeq == frames(f)._2.toSeq)
      assert(dec.frames(f).cr.toSeq == frames(f)._3.toSeq)
    }
  }

  test("CAVLC write/read roundtrip fuzz across all nC contexts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8000) {
      val n = Seq(16, 15, 4)(trial % 3)
      val nCraw = Seq(-1, 0, 1, 2, 3, 4, 5, 7, 8, 16)(rnd.nextInt(10))
      val nC = if (n == 4) -1 else if (nCraw == -1) 0 else nCraw
      val density = rnd.nextInt(4) + 1
      val coeffs = Array.tabulate(n) { _ =>
        if (rnd.nextInt(4) < density) {
          val mag = rnd.nextInt(3) match {
            case 0 => 1 + rnd.nextInt(2)
            case 1 => 1 + rnd.nextInt(60)
            case _ => 1 + rnd.nextInt(1800)
          }
          if (rnd.nextBoolean()) mag else -mag
        } else 0
      }
      val w = new BitWriter
      H264Encoder.writeResidual(w, coeffs, nC)
      w.trailing()
      val rb = residualBlock(new BitReader(w.toBytes), nC, n)
      assert(rb.coeffs.sameElements(coeffs),
        s"CAVLC roundtrip n=$n nC=$nC: ${coeffs.toSeq} -> ${rb.coeffs.toSeq}")
    }
  }

  test("rejects CABAC, inter slices, and deblocking-required streams loudly") {
    // CABAC PPS
    val ppsCabac = new BitWriter
    ppsCabac.ue(0); ppsCabac.ue(0); ppsCabac.write(1, 1)
    ppsCabac.write(0, 1); ppsCabac.ue(0); ppsCabac.ue(0); ppsCabac.ue(0)
    ppsCabac.write(0, 1); ppsCabac.write(0, 2)
    ppsCabac.se(0); ppsCabac.se(0); ppsCabac.se(0)
    ppsCabac.write(1, 1); ppsCabac.write(0, 1); ppsCabac.write(0, 1)
    ppsCabac.trailing()
    val e1 = intercept[IllegalArgumentException] {
      parsePps(new BitReader(ppsCabac.toBytes))
    }
    assert(e1.getMessage.contains("CABAC"))
    // non-IDR NAL in a stream
    val (good, _) = H264Encoder.encode(16, 16, Seq(smooth(16, 16, 0)), 24)
    val tampered = good.clone()
    // flip the IDR NAL type (5) to non-IDR (1): find the 00 00 00 01 x65
    val idx = (0 until tampered.length - 4).find(i =>
      tampered(i) == 0 && tampered(i + 1) == 0 && tampered(i + 2) == 0 &&
        tampered(i + 3) == 1 && (tampered(i + 4) & 0x1f) == 5).get
    tampered(idx + 4) = ((tampered(idx + 4) & 0xe0) | 1).toByte
    val e2 = intercept[IllegalArgumentException] { decode(tampered) }
    assert(e2.getMessage.contains("inter"))
  }
}
