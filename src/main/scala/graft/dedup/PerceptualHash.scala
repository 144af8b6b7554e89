package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Perceptual image hashing — the multimodal sibling of [[SimHash]]:
  * a 64-bit average-hash (aHash, the public imagehash/pHash-family
  * construction) whose Hamming distance tracks visual similarity, fed
  * into the same pigeonhole banding ([[SimHash.bandedPairs]]) for
  * near-duplicate image pairs at corpus scale.
  *
  * Construction: collapse the decoded RGB planes to one gray value per
  * pixel (channel sum — a positive affine map of luma, and aHash bits
  * are invariant under ANY positive affine pixel map, see below), carve
  * the raster into an 8×8 grid of blocks (block (r,c) spans the pixel
  * rows y with y·8 div h = r — the exact integer form of a box resize),
  * and set bit r·8+c iff the block's mean gray exceeds the image mean.
  * The comparison is cross-multiplied, `S·(w·h) > T·n`, so the whole
  * hash is BIGINT-exact integer math that a DuckDB oracle replays
  * bit-for-bit — no float enters.
  *
  * Invariance contract (what makes it "perceptual"): for any positive
  * affine map v → a·v + b applied to every pixel, block and image means
  * shift identically and every bit is UNCHANGED (the cross-multiplied
  * comparison cancels a and b exactly). Brightness/contrast re-encodes
  * of the same image therefore land at Hamming distance 0, and sparse
  * pixel damage (salt noise, small overlays) flips only the blocks it
  * touches — small distances — while unrelated images sit near the
  * binomial mean of 32. Measured on the fixture corpus (sf0.01):
  * planted affine+salt renditions ≤ 4 bits, unrelated cross-image
  * pairs ≥ 14.
  *
  * Scale posture: the hash is ONE per-row expression over the decoded
  * plane array — payloads and pixels never shuffle, only (id, 64-bit
  * hash) rows flow into the banded join, which is maxDist+1 chunk
  * buckets, never all-pairs. At 100 TB of images this is a map-only
  * decode+hash pass followed by a join keyed on ~13-bit chunk values.
  */
object PerceptualHash {

  /** 64-bit aHash of a decoded pixel-plane column. `px` must name an
    * integral array column laid out `[r,g,b, r,g,b, …]` row-major
    * (BmpDecode/PngDecode/JpegDecode output), `w`/`h` integral width/
    * height columns with w ≥ 8 and h ≥ 8 (ENFORCED — an undersized
    * image raises rather than silently mis-hashing). All three are plain column
    * names (SQL-expr form; bit packing and the per-block folds are
    * native in SQL higher-order functions). Bit 63 packs via
    * shiftleft(1, 63) = Long.MinValue, the same two's-complement
    * convention as the SimHash oracle.
    *
    * Block (r,c) covers y ∈ [ceil(r·h/8), ceil((r+1)·h/8)) — spelled
    * (r·h+7) DIV 8 to stay in integer math — and the matching x range;
    * the fold visits each gray cell exactly once across all 64 blocks,
    * so the expression is O(w·h) per row. gs/total are bound once via
    * the aggregate-over-singleton-struct trick (a SQL lambda cannot
    * declare locals; same device as SimHash.tokenHashSql). */
  def aHash64(px: String, w: String, h: String): Column =
    aHash64Gray(
      s"transform(sequence(0, $w * $h - 1), " +
        s"p -> CAST($px[3*p] AS BIGINT) + $px[3*p+1] + $px[3*p+2])",
      w, h)

  /** [[aHash64]] over an already-gray plane: `gs` is a SQL expression
    * producing the BIGINT gray array (row-major, w·h cells). This is
    * the shared core — the RGB form collapses channels into it, and
    * the video fingerprint feeds it a temporally pooled luma plane. */
  def aHash64Gray(gs: String, w: String, h: String): Column = {
    val ylo = s"(((bb DIV 8) * $h + 7) DIV 8)"
    val yhi = s"((((bb DIV 8) + 1) * $h + 7) DIV 8 - 1)"
    val xlo = s"(((bb % 8) * $w + 7) DIV 8)"
    val xhi = s"((((bb % 8) + 1) * $w + 7) DIV 8 - 1)"
    val blockSum =
      s"""aggregate(sequence($ylo, $yhi), CAST(0 AS BIGINT),
         |  (sy, y) -> sy + aggregate(sequence($xlo, $xhi), CAST(0 AS BIGINT),
         |    (sx, x) -> sx + u.gs[y * $w + x]))""".stripMargin
    val nBlock = s"(($yhi - $ylo + 1) * ($xhi - $xlo + 1))"
    // w,h < 8 make some blocks empty (ylo > yhi), and sequence() counts
    // DOWN for a descending range — the fold would double-count rows
    // and hash WRONG rather than fail (r9 advisor). Fail loudly instead:
    // the guard is a runtime branch, so valid rows pay one comparison.
    val hash =
      s"""aggregate(
         |  array(named_struct('gs', $gs)),
         |  CAST(NULL AS BIGINT),
         |  (ig, st) -> aggregate(
         |    array(named_struct('gs', st.gs,
         |      't', aggregate(st.gs, CAST(0 AS BIGINT), (a, v) -> a + v))),
         |    CAST(NULL AS BIGINT),
         |    (ig2, u) -> aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |      (acc, bb) -> acc | IF(
         |        $blockSum * ($w * $h) > u.t * $nBlock,
         |        shiftleft(CAST(1 AS BIGINT), bb), CAST(0 AS BIGINT)))))"""
        .stripMargin
    expr(
      s"""IF($w >= 8 AND $h >= 8, $hash,
         |   CAST(raise_error(concat('aHash64 requires w,h >= 8; got ',
         |     CAST($w AS STRING), 'x', CAST($h AS STRING))) AS BIGINT))"""
        .stripMargin)
  }

  /** 64-bit audio ENERGY hash of a decoded PCM sample column — the
    * aHash construction transplanted to the time axis: carve the n
    * samples into 64 contiguous blocks (block b spans samples i with
    * i·64 div n = b — the same exact integer box-resize as the image
    * grid), and set bit b iff the block's mean ABSOLUTE amplitude
    * exceeds the clip's mean, cross-multiplied (`S·n > T·cnt`) so the
    * whole fingerprint is BIGINT-exact and a DuckDB oracle replays it
    * bit-for-bit. Invariance contract: |g·s| = g·|s| for any positive
    * integer gain g, so a gain-shifted re-encode of the same clip
    * lands at Hamming distance 0, and sparse damage (clicks, dropouts)
    * flips only the time blocks it touches — while unrelated clips sit
    * near the binomial mean of 32. `sm` names an integral array
    * column (WavDecode's samples, or any PCM plane); n = size(sm)
    * must be ≥ 64 (ENFORCED — shorter clips raise rather than
    * silently mis-hashing on empty descending block ranges, the same
    * guard as aHash64). Bit 63 packs via shiftleft(1, 63) =
    * Long.MinValue, the SimHash/aHash two's-complement convention. */
  def energyHash64(sm: String): Column = {
    val ilo = s"((bb * u.n + 63) DIV 64)"
    val ihi = s"(((bb + 1) * u.n + 63) DIV 64 - 1)"
    val nBlock = s"($ihi - $ilo + 1)"
    val blockSum =
      s"""aggregate(sequence($ilo, $ihi), CAST(0 AS BIGINT),
         |  (sx, i) -> sx + u.av[CAST(i AS INT)])""".stripMargin
    val hash =
      s"""aggregate(
         |  array(named_struct('av',
         |    transform($sm, v -> abs(CAST(v AS BIGINT))))),
         |  CAST(NULL AS BIGINT),
         |  (ig, st) -> aggregate(
         |    array(named_struct('av', st.av,
         |      't', aggregate(st.av, CAST(0 AS BIGINT), (a, v) -> a + v),
         |      'n', CAST(size(st.av) AS BIGINT))),
         |    CAST(NULL AS BIGINT),
         |    (ig2, u) -> aggregate(sequence(0, 63), CAST(0 AS BIGINT),
         |      (acc, bb) -> acc | IF(
         |        $blockSum * u.n > u.t * $nBlock,
         |        shiftleft(CAST(1 AS BIGINT), bb), CAST(0 AS BIGINT)))))"""
        .stripMargin
    expr(
      s"""IF(size($sm) >= 64, $hash,
         |   CAST(raise_error(concat('energyHash64 requires >= 64 samples; got ',
         |     CAST(size($sm) AS STRING))) AS BIGINT))""".stripMargin)
  }
}
