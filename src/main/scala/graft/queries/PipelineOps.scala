package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{AviMjpeg, Multimodal}
import graft.text.LangId

/** Declared queries for the remaining LLM-pipeline operators: BPE-ish
  * token counting, heuristic language ID, and multimodal feature
  * plumbing. All oracle-checked except where sketch/codec internals are
  * not SQL-replicable (noted per query). */
object PipelineOps {

  /** Word-ish/number/punctuation token counting — the regex analogue of
    * a BPE pre-tokenizer pass. Pure map; counts only. */
  val tokenCounts: Q = Q(
    "token_counts",
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
      | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_bpeish,
      | CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_chars_nospace
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws"),
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .as("n_bpeish"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars_nospace"))
      .orderBy("doc_id")
  }

  /** Language-ID over documents: predicted language distribution. The
    * stopword scoring is replicated exactly in the oracle SQL (same
    * profiles, same tie-break order, same confidence floor). */
  val langidProfile: Q = Q(
    "langid_profile",
    {
      val profiles = LangId.Profiles
      val toks = "list_filter(string_split_regex(lower(text), " +
        "'[ ,.;:!?''\"]+'), x -> x <> '')"
      val scoreCols = profiles.map { case (lang, words) =>
        val set = words.map(w => s"'${w}'").mkString(", ")
        s"CAST(len(list_filter(ts, t -> t IN ($set))) AS DOUBLE) / greatest(len(ts), 1) AS $lang"
      }.mkString(",\n ")
      val best = "greatest(" + profiles.map(_._1).mkString(", ") + ")"
      val caseExpr = profiles.map { case (lang, _) =>
        s"WHEN $lang = best AND best >= 0.05 THEN '$lang'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, $toks AS ts FROM documents),
         |s AS (SELECT doc_id, $scoreCols FROM t),
         |p AS (SELECT doc_id, $best AS best,
         |        CASE $caseExpr ELSE 'und' END AS lang FROM s)
         |SELECT lang, count(*) AS n_docs
         |FROM p GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, d) =>
    LangId.classify(Tables.documents(s, d), "doc_id", "text")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  /** Multimodal feature extraction through the binary-column plumbing.
    * Oracle covers the codec-agnostic outputs (payload length + decoded
    * byte stats — fixture text is ASCII, so DuckDB's ascii() equals the
    * UTF-8 byte Spark reads); modality/meta derive from xxhash64, which
    * DuckDB lacks, and are gated in MultimodalSuite instead. */
  val multimodalFeats: Q = Q(
    "multimodal_feats",
    """WITH b AS (
      |  SELECT doc_id AS media_id,
      |    octet_length(encode(text)) AS n_bytes,
      |    list_transform(range(1, least(length(text), 64) + 1),
      |      i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS px
      |  FROM documents)
      |SELECT media_id, n_bytes,
      |  floor(CAST(list_aggregate(px, 'sum') AS DOUBLE) / len(px) * 10000 + 0.5) / 10000
      |    AS mean_byte,
      |  CAST(list_aggregate(px, 'min') AS BIGINT) AS min_byte,
      |  CAST(list_aggregate(px, 'max') AS BIGINT) AS max_byte
      |FROM b ORDER BY media_id""".stripMargin) { (s, d) =>
    val media = Multimodal.fabricate(Tables.documents(s, d), "doc_id", "text")
    val px = col("px")
    media
      .withColumn("px", Multimodal.decodeBytes(col("payload"), 64))
      .select(col("media_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        (floor(aggregate(px, lit(0L), (a, x) => a + x).cast("double")
          / size(px) * 10000 + 0.5) / 10000).as("mean_byte"),
        array_min(px).as("min_byte"),
        array_max(px).as("max_byte"))
      .orderBy("media_id")
  }

  /** REAL-codec round-trip over the three uncompressed container
    * formats: documents → BMP / PCM-WAV / Y4M payloads (Codecs.encode)
    * → native decode expressions → decoded-value stats. The oracle
    * recomputes n_units and sum_val straight from the generation
    * formula (Multimodal.fabricateMedia scaladoc) — it never parses a
    * container, so a bug in EITHER direction of either codec breaks
    * the hash match. Payloads stay inside the row (map-only; the
    * 100 TB discipline: only small decoded stats flow onward). */
  val mediaDecodeStats: Q = Q(
    "media_decode_stats",
    """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |p AS (SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'y4m' END
      |    AS format,
      |  CASE doc_id % 3
      |    WHEN 0 THEN (16 + 2*(doc_id % 8)) * (16 + 2*((doc_id // 8) % 8)) * 3
      |    WHEN 1 THEN 200 + (doc_id % 100)
      |    ELSE (1 + (doc_id % 8)) * 256 END AS n_units
      |  FROM d),
      |s AS (SELECT d.doc_id,
      |    CASE WHEN d.doc_id % 3 = 1 THEN
      |      list_sum(list_transform(range(0, p.n_units),
      |        i -> unicode(substr(d.text, CAST(i % d.len AS INT) + 1, 1)) * 257
      |             - 16384))
      |    ELSE
      |      list_sum(list_transform(range(0, p.n_units),
      |        i -> unicode(substr(d.text, CAST(i % d.len AS INT) + 1, 1))))
      |    END AS sum_val
      |  FROM d JOIN p USING (doc_id))
      |SELECT p.doc_id AS media_id, p.format,
      |  CAST(p.n_units AS BIGINT) AS n_units,
      |  CAST(s.sum_val AS BIGINT) AS sum_val
      |FROM p JOIN s USING (doc_id) ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val media = Multimodal.fabricateMedia(Tables.documents(s, d), "doc_id", "text")
    def sumOf(values: org.apache.spark.sql.Column) =
      aggregate(values, lit(0L), (a, x) => a + x)
    // CaseWhen evaluates branches lazily, so each payload only ever
    // meets its own codec
    val pixels = bmpDecode(col("payload")).getField("pixels")
    val samples = wavDecode(col("payload")).getField("samples")
    val luma = flatten(y4mDecode(col("payload")).getField("frames"))
    media.select(col("media_id"), col("format"),
      when(col("format") === "bmp", size(pixels))
        .when(col("format") === "wav", size(samples))
        .otherwise(size(luma)).cast("long").as("n_units"),
      when(col("format") === "bmp", sumOf(pixels))
        .when(col("format") === "wav", sumOf(samples))
        .otherwise(sumOf(luma)).as("sum_val"))
      .orderBy("media_id")
  }

  /** Thumbnail/resize over REAL decoded pixels: BMP payloads decode
    * through the real codec, then a 4x4 block-mean reduction runs as a
    * fully distributed explode → groupBy (pixel rows shuffle, payloads
    * do not follow — only (media_id, block) sums). Block membership is
    * pure integer math (px*4 DIV w), identical in both engines; the
    * oracle recomputes every pixel from the generation formula, so the
    * decode → resize chain is verified end-to-end. Exact BIGINT sums
    * (no float means) keep the compare drift-free. */
  val mediaThumbnail: Q = Q(
    "media_thumbnail",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             16 + 2*(doc_id % 8) AS w, 16 + 2*((doc_id // 8) % 8) AS h
      |           FROM documents WHERE doc_id % 3 = 0),
      |px AS (SELECT doc_id, w, h, len, text,
      |         unnest(range(0, w*h*3)) AS j
      |       FROM d)
      |SELECT doc_id AS media_id,
      |  CAST((((j // 3) // w) * 4 // h) * 4 + (((j // 3) % w) * 4 // w)
      |    AS INTEGER) AS block,
      |  count(*) AS n_vals,
      |  CAST(sum(unicode(substr(text, CAST(j % len AS INT) + 1, 1)))
      |    AS BIGINT) AS val_sum
      |FROM px GROUP BY 1, 2 ORDER BY media_id, block""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val media = Multimodal.fabricateMedia(Tables.documents(s, d), "doc_id", "text")
    media.filter(col("format") === "bmp")
      .select(col("media_id"), bmpDecode(col("payload")).as("dec"))
      .select(col("media_id"), col("dec.width").as("w"),
        col("dec.height").as("h"),
        posexplode(col("dec.pixels")).as(Seq("j", "v")))
      .select(col("media_id"),
        expr("""CAST((((j DIV 3) DIV w) * 4 DIV h) * 4
               |  + (((j DIV 3) % w) * 4 DIV w) AS INT)""".stripMargin)
          .as("block"),
        col("v"))
      .groupBy("media_id", "block")
      .agg(count(lit(1)).as("n_vals"), sum(col("v")).as("val_sum"))
      .orderBy("media_id", "block")
  }

  /** Frame sampling over REAL video containers: Y4M payloads decode
    * through the real codec, every second frame is kept (stride 2 —
    * the cheap temporal downsample before an expensive per-frame
    * model), and exact per-frame luma sums come out. posexplode of the
    * decoded frame array keeps the stage map-side until the final
    * per-frame row; the oracle replays frame bytes from the generation
    * formula, closing the loop on the last of the three real-codec
    * feature stages (decode → resize → frame-sample). */
  val mediaFrameSample: Q = Q(
    "media_frame_sample",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             1 + (doc_id % 8) AS nf
      |           FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, text, len,
      |        unnest(range(0, nf)) AS frame_idx
      |      FROM d),
      |s AS (SELECT doc_id, frame_idx,
      |        (SELECT sum(unicode(substr(f.text,
      |           CAST((f.frame_idx * 256 + j.j) % f.len AS INT) + 1, 1)))
      |         FROM (SELECT unnest(range(0, 256)) AS j) j) AS y_sum
      |      FROM f WHERE frame_idx % 2 = 0)
      |SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(y_sum AS BIGINT) AS y_sum
      |FROM s ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val media = Multimodal.fabricateMedia(Tables.documents(s, d), "doc_id", "text")
    media.filter(col("format") === "y4m")
      .select(col("media_id"),
        posexplode(y4mDecode(col("payload")).getField("frames"))
          .as(Seq("frame_idx", "ys")))
      .filter(col("frame_idx") % 2 === 0)
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        aggregate(col("ys"), lit(0L), (a, x) => a + x).as("y_sum"))
      .orderBy("media_id", "frame_idx")
  }

  /** Real PNG decode, end-to-end: documents → pngEncode (deflate +
    * cycling row filters) → native PngDecode (chunk walk, CRC check,
    * inflate, all five unfilters) → per-image stats. The oracle
    * recomputes expected sums straight from the text generation
    * formula — it never parses a container — so a bug anywhere in the
    * DEFLATE round-trip or any unfilter path breaks the hash match.
    * Map-only: payloads never shuffle, only (id, dims, sums) flow. */
  val mediaPngStats: Q = Q(
    "media_png_stats",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             8 + (doc_id % 9) AS w, 8 + ((doc_id // 9) % 9) AS h
      |           FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(w * h * 3 AS BIGINT) AS n_units,
      |  CAST(list_sum(list_transform(range(0, w * h * 3),
      |    j -> unicode(substr(text, CAST(j % len AS INT) + 1, 1))))
      |    AS BIGINT) AS sum_val
      |FROM d ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val png = Multimodal.fabricatePng(Tables.documents(s, d), "doc_id", "text")
    png.select(col("media_id"), pngDecode(col("payload")).as("dec"))
      .select(col("media_id"),
        col("dec.width").as("width"), col("dec.height").as("height"),
        size(col("dec.pixels")).cast("long").as("n_units"),
        aggregate(col("dec.pixels"), lit(0L), (a, x) => a + x).as("sum_val"))
      .orderBy("media_id")
  }

  /** Real GIF decode, end-to-end and per-frame: documents →
    * gifEncode (genuine LZW with dictionary growth, width bumps, and
    * table-full clears; 256-gray palette) → native GifDecode
    * (container walk, extension skip, LZW decompress, cScSc special
    * case, palette application) → per-frame RGB sums. The oracle
    * recomputes expected sums straight from the text generation
    * formula (gray palette ⇒ each index contributes 3× its value), so
    * a bug anywhere in the LZW round-trip breaks the hash match. The
    * multi-frame rows double as the compressed-video path: a GIF
    * animation is frames-in-one-payload exactly like the Y4M
    * media_frame_sample query, but through a real entropy coder.
    * Map-only: payloads never shuffle. */
  val mediaGifFrames: Q = Q(
    "media_gif_frames",
    """WITH d AS (SELECT doc_id, text, length(text) AS len,
      |             8 + (doc_id % 9) AS w, 8 + ((doc_id // 9) % 9) AS h,
      |             1 + (doc_id % 4) AS nf
      |           FROM documents),
      |f AS (SELECT doc_id, text, len, w, h,
      |        unnest(range(0, nf)) AS frame_idx
      |      FROM d)
      |SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(w * h * 3 AS BIGINT) AS n_units,
      |  CAST(3 * list_sum(list_transform(range(0, w * h),
      |    j -> unicode(substr(text,
      |           CAST((frame_idx * w * h + j) % len AS INT) + 1, 1))))
      |    AS BIGINT) AS px_sum
      |FROM f ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val gif = Multimodal.fabricateGif(Tables.documents(s, d), "doc_id", "text")
    gif.select(col("media_id"), gifDecode(col("payload")).as("dec"))
      .select(col("media_id"),
        col("dec.width").as("width"), col("dec.height").as("height"),
        posexplode(col("dec.frames")).as(Seq("frame_idx", "px")))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("width"), col("height"),
        size(col("px")).cast("long").as("n_units"),
        aggregate(col("px"), lit(0L), (a, x) => a + x).as("px_sum"))
      .orderBy("media_id", "frame_idx")
  }

  /** Baseline JPEG decode over the committed reference fixtures
    * (src/main/resources/graft/jpeg, encoded ONCE by the JDK ImageIO
    * reference encoder — see JpegFixtureGen). JPEG mandates no
    * bit-exact IDCT, so no SQL replica can recompute decoded samples
    * from a formula; the oracle instead pins this engine's decode of
    * the fixed bytes as constants, and JpegSuite ties those same
    * committed fixtures to the ImageIO reference decoder within a
    * tight numeric band (±2 unsubsampled / ±12 on 4:2:0 chroma
    * edges). Regenerate fixtures → regenerate constants. */
  val mediaJpegStats: Q = Q(
    "media_jpeg_stats",
    """SELECT * FROM (VALUES
      |  ('gray_64x48_q85', 64, 48, 1, CAST(3072 AS BIGINT), CAST(197750 AS BIGINT)),
      |  ('gray_57x33_q70', 57, 33, 1, CAST(1881 AS BIGINT), CAST(129191 AS BIGINT)),
      |  ('gray_8x8_q95', 8, 8, 1, CAST(64 AS BIGINT), CAST(5077 AS BIGINT)),
      |  ('rgb_64x48_q85', 64, 48, 3, CAST(9216 AS BIGINT), CAST(1170865 AS BIGINT)),
      |  ('rgb_57x33_q70', 57, 33, 3, CAST(5643 AS BIGINT), CAST(736995 AS BIGINT)),
      |  ('rgb_80x56_q92', 80, 56, 3, CAST(13440 AS BIGINT), CAST(1716187 AS BIGINT)))
      |  t(name, width, height, channels, n_units, sum_val)
      |ORDER BY name""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val names = Seq("gray_64x48_q85", "gray_57x33_q70", "gray_8x8_q95",
      "rgb_64x48_q85", "rgb_57x33_q70", "rgb_80x56_q92")
    val rows = names.map { n =>
      val in = getClass.getResourceAsStream(s"/graft/jpeg/$n.jpg")
      require(in != null, s"missing committed fixture $n.jpg")
      try (n, in.readAllBytes()) finally in.close()
    }
    import s.implicits._
    rows.toDF("name", "payload")
      .select(col("name"), jpegDecode(col("payload")).as("dec"))
      .select(col("name"),
        col("dec.width").as("width"), col("dec.height").as("height"),
        col("dec.channels").as("channels"),
        size(col("dec.pixels")).cast("long").as("n_units"),
        aggregate(col("dec.pixels"), lit(0L), (a, x) => a + x).as("sum_val"))
      .orderBy("name")
  }

  /** Compressed VIDEO end-to-end: RIFF/AVI Motion-JPEG containers
    * (assembled from the committed ImageIO-pinned JPEG fixtures) →
    * native AviFrames demux → posexplode → per-frame JpegDecode →
    * stats. The oracle pins the expected rows as constants: container
    * geometry (fps, n_frames) proves the demux header walk, and the
    * per-frame sums are exactly the media_jpeg_stats constants, so a
    * regression in either the container walk or the JPEG entropy/IDCT
    * path breaks the match. Plan shape: demux and decode are map-only;
    * payload bytes never reach a shuffle. */
  val mediaMjpegFrames: Q = Q(
    "media_mjpeg_frames",
    """SELECT * FROM (VALUES
      |  ('v1_64x48', 25, 3, 0, 3, CAST(9216 AS BIGINT), CAST(1170865 AS BIGINT)),
      |  ('v1_64x48', 25, 3, 1, 1, CAST(3072 AS BIGINT), CAST(197750 AS BIGINT)),
      |  ('v1_64x48', 25, 3, 2, 3, CAST(9216 AS BIGINT), CAST(1170865 AS BIGINT)),
      |  ('v2_57x33', 10, 2, 0, 1, CAST(1881 AS BIGINT), CAST(129191 AS BIGINT)),
      |  ('v2_57x33', 10, 2, 1, 3, CAST(5643 AS BIGINT), CAST(736995 AS BIGINT)),
      |  ('v3_80x56', 50, 1, 0, 3, CAST(13440 AS BIGINT), CAST(1716187 AS BIGINT)))
      |  t(vid, fps, n_frames, frame_idx, channels, n_units, sum_val)
      |ORDER BY vid, frame_idx""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    def fixture(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/jpeg/$n.jpg")
      require(in != null, s"missing committed fixture $n.jpg")
      try in.readAllBytes() finally in.close()
    }
    val rgb64 = fixture("rgb_64x48_q85"); val gray64 = fixture("gray_64x48_q85")
    val gray57 = fixture("gray_57x33_q70"); val rgb57 = fixture("rgb_57x33_q70")
    val rgb80 = fixture("rgb_80x56_q92")
    val videos = Seq(
      ("v1_64x48", AviMjpeg.aviEncode(64, 48, 25, Array(rgb64, gray64, rgb64))),
      ("v2_57x33", AviMjpeg.aviEncode(57, 33, 10, Array(gray57, rgb57))),
      ("v3_80x56", AviMjpeg.aviEncode(80, 56, 50, Array(rgb80))))
    import s.implicits._
    videos.toDF("vid", "payload")
      .select(col("vid"), aviFrames(col("payload")).as("demux"))
      .select(col("vid"), col("demux.fps").as("fps"),
        col("demux.n_frames").as("n_frames"),
        posexplode(col("demux.frames")).as(Seq("frame_idx", "jpeg")))
      .select(col("vid"), col("fps"), col("n_frames"),
        col("frame_idx").cast("int").as("frame_idx"),
        jpegDecode(col("jpeg")).as("dec"))
      .select(col("vid"), col("fps"), col("n_frames"), col("frame_idx"),
        col("dec.channels").as("channels"),
        size(col("dec.pixels")).cast("long").as("n_units"),
        aggregate(col("dec.pixels"), lit(0L), (a, x) => a + x).as("sum_val"))
      .orderBy("vid", "frame_idx")
  }

  /** Compressed VIDEO through the from-scratch H.264 decoder, lossless
    * path: every document becomes a real Annex B stream (SPS + PPS +
    * one IDR I-slice per frame, all-I_PCM macroblocks), demuxed and
    * decoded by the native H264Decode expression. I_PCM is bit-exact,
    * so the oracle recomputes the decoded plane sums straight from the
    * generation formula (Multimodal.fabricateH264 scaladoc) without
    * ever parsing a stream — any bug in NAL/EP/SPS/PPS/slice/MB-layer
    * parsing on the decode side OR in the writer breaks the match.
    * CAVLC/intra/IDCT correctness is gated by `media_h264_stats` and
    * H264Suite. Plan: map-only decode, payloads never shuffle. */
  val mediaH264Pcm: Q = Q(
    "media_h264_pcm",
    """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |f AS (SELECT doc_id, text, len,
      |        unnest(range(0, 1 + doc_id % 3)) AS fi
      |      FROM d)
      |SELECT doc_id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
      |  32 AS width, 16 AS height,
      |  CAST(list_sum(list_transform(range(0, 512),
      |    j -> unicode(substr(text, CAST((fi*11 + j) % len AS INT) + 1, 1))))
      |    AS BIGINT) AS y_sum,
      |  CAST(list_sum(list_transform(range(0, 128),
      |    j -> unicode(substr(text, CAST((fi*11 + 2*j + 3) % len AS INT) + 1, 1))))
      |    AS BIGINT) AS cb_sum,
      |  CAST(list_sum(list_transform(range(0, 128),
      |    j -> unicode(substr(text, CAST((fi*11 + 3*j + 5) % len AS INT) + 1, 1))))
      |    AS BIGINT) AS cr_sum
      |FROM f ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val media = Multimodal.fabricateH264(Tables.documents(s, d), "doc_id", "text")
    def sumOf(values: org.apache.spark.sql.Column) =
      aggregate(values, lit(0L), (a, x) => a + x)
    // explode(array(...)) is a Generate barrier: the decode lands in an
    // attribute and runs ONCE per row (plain projection collapse was
    // re-evaluating it 6x — once per struct-field read; measured via
    // H264DecodeCounter, 3000 invocations for 500 docs)
    media.select(col("media_id"),
        explode(array(h264Decode(col("payload")))).as("dec"))
      .select(col("media_id"),
        col("dec.width").as("width"), col("dec.height").as("height"),
        posexplode(col("dec.frames")).as(Seq("frame_idx", "px")))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("width"), col("height"),
        sumOf(slice(col("px"), 1, 512)).as("y_sum"),
        sumOf(slice(col("px"), 513, 128)).as("cb_sum"),
        sumOf(slice(col("px"), 641, 128)).as("cr_sum"))
      .orderBy("media_id", "frame_idx")
  }

  /** H.264 CAVLC + intra + IDCT over the committed fixtures
    * (src/main/resources/graft/h264, generated ONCE by H264FixtureGen's
    * mixed I_PCM / I_16x16 / I_4x4 encoder — see its scaladoc). H.264's
    * lossy path has no SQL replica, so like `media_jpeg_stats` the
    * oracle pins this engine's decode of the fixed bytes as constants;
    * H264Suite independently ties the decoder to hand-authored
    * bitstreams and exact encoder-reconstruction parity. Regenerate
    * fixtures -> regenerate constants. */
  val mediaH264Stats: Q = Q(
    "media_h264_stats",
    """SELECT * FROM (VALUES
      |  ('crop_34x18_q20', 34, 18, 1, 0, CAST(89432 AS BIGINT), CAST(20020 AS BIGINT), CAST(22557 AS BIGINT)),
      |  ('gradient_48x32_q24', 48, 32, 2, 0, CAST(206085 AS BIGINT), CAST(48888 AS BIGINT), CAST(48976 AS BIGINT)),
      |  ('gradient_48x32_q24', 48, 32, 2, 1, CAST(193714 AS BIGINT), CAST(47572 AS BIGINT), CAST(52666 AS BIGINT)),
      |  ('gradient_64x48_q30', 64, 48, 1, 0, CAST(390352 AS BIGINT), CAST(107300 AS BIGINT), CAST(95797 AS BIGINT)),
      |  ('lowqp_32x32_q12', 32, 32, 3, 0, CAST(137225 AS BIGINT), CAST(35027 AS BIGINT), CAST(35499 AS BIGINT)),
      |  ('lowqp_32x32_q12', 32, 32, 3, 1, CAST(128966 AS BIGINT), CAST(29438 AS BIGINT), CAST(37384 AS BIGINT)),
      |  ('lowqp_32x32_q12', 32, 32, 3, 2, CAST(121359 AS BIGINT), CAST(28578 AS BIGINT), CAST(34921 AS BIGINT)))
      |  t(name, width, height, n_frames, frame_idx, y_sum, cb_sum, cr_sum)
      |ORDER BY name, frame_idx""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val names = Seq("gradient_48x32_q24", "gradient_64x48_q30",
      "crop_34x18_q20", "lowqp_32x32_q12")
    val rows = names.map { n =>
      val in = getClass.getResourceAsStream(s"/graft/h264/$n.264")
      require(in != null, s"missing committed fixture $n.264")
      try (n, in.readAllBytes()) finally in.close()
    }
    import s.implicits._
    def sumOf(values: org.apache.spark.sql.Column) =
      aggregate(values, lit(0L), (a, x) => a + x)
    val ysz = col("width") * col("height")
    val csz = (col("width") / 2).cast("int") * (col("height") / 2).cast("int")
    rows.toDF("name", "payload")
      .select(col("name"), explode(array(h264Decode(col("payload")))).as("dec"))
      .select(col("name"),
        col("dec.width").as("width"), col("dec.height").as("height"),
        col("dec.n_frames").as("n_frames"),
        posexplode(col("dec.frames")).as(Seq("frame_idx", "px")))
      .select(col("name"), col("width"), col("height"), col("n_frames"),
        col("frame_idx").cast("int").as("frame_idx"),
        sumOf(slice(col("px"), lit(1), ysz)).as("y_sum"),
        sumOf(slice(col("px"), ysz + 1, csz)).as("cb_sum"),
        sumOf(slice(col("px"), ysz + csz + 1, csz)).as("cr_sum"))
      .orderBy("name", "frame_idx")
  }

  /** Capstone: the full curation pipeline (language floor → quality
    * filters → exact dedup → MinHash near-dedup keep-first → token
    * accounting) with EVERY stage replicated in the oracle SQL. The
    * near-dedup stage is oracle-valid for the same reason as
    * minhash_dedup_pairs: exact-Jaccard verification with fixture pairs
    * far from the threshold. */
  val curateCorpus: Q = Q(
    "curate_corpus",
    {
      val profiles = LangId.Profiles
      val scoreExprs = profiles.map { case (_, words) =>
        val set = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(lts, t2 -> t2 IN ($set))) AS DOUBLE) / greatest(len(lts), 1)"
      }.mkString(",\n        ")
      s"""WITH t AS (
         |  SELECT doc_id, text, n_chars,
         |    list_filter(string_split_regex(lower(text), '[ ,.;:!?''"]+'),
         |                x -> x <> '') AS lts,
         |    string_split(text, ' ') AS ts
         |  FROM documents),
         |s AS (SELECT doc_id, text, ts, n_chars,
         |        greatest($scoreExprs) AS best FROM t),
         |f AS (SELECT doc_id, text, ts FROM s
         |      WHERE best >= 0.02
         |        AND (1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)) <= 0.6
         |        AND n_chars BETWEEN 100 AND 100000),
         |e AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text)),
         |fe AS (SELECT f.doc_id, f.ts FROM f JOIN e USING (doc_id)),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |         range(1, greatest(len(ts) - 3, 0) + 2),
         |         i -> array_to_string(ts[i:i+2], ' '))) AS grams
         |       FROM fe),
         |drops AS (
         |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      / len(list_distinct(a.grams || b.grams)) >= 0.8),
         |kept AS (SELECT doc_id, len(ts) AS n_tokens FROM fe
         |         WHERE doc_id NOT IN (SELECT doc_id FROM drops))
         |SELECT (SELECT count(*) FROM documents) AS n_raw,
         |       count(*) AS n_kept,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM kept""".stripMargin
    }) { (s, d) =>
    graft.pipeline.Curate.report(Tables.documents(s, d))
  }

  /** Framed audio feature extraction over the WAV corpus slice — the
    * speech-pipeline front end (50-sample frames ≈ the classic 25 ms
    * hop at 2 kHz): per-frame ENERGY Σs² and ZERO-CROSSING count,
    * collapsed to per-clip features (frame count, total crossings,
    * peak frame + its energy). Decode runs through the real RIFF/WAV
    * codec; the oracle recomputes the expected samples from the
    * fixture formula, so the gate proves decoder + framing + feature
    * algebra together. Everything is EXACT integer arithmetic
    * (products cast to BIGINT before squaring — 16-bit samples square
    * past int32), map-only per clip; only the 4-column feature row
    * flows onward (the 100 TB discipline: features leave, payloads
    * don't). */
  val audioFeatures: Q = Q(
    "audio_features",
    """WITH w AS (SELECT doc_id, text, length(text) AS len,
      |    200 + (doc_id % 100) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (SELECT doc_id, t.i AS i, CAST(t.i // 50 AS BIGINT) AS fr,
      |    unicode(substr(text, CAST(t.i % len AS INT) + 1, 1)) * 257
      |      - 16384 AS v
      |  FROM w, LATERAL (SELECT unnest(range(0, n)) AS i) t(i)),
      |lagd AS (SELECT doc_id, fr, v,
      |    lag(v) OVER (PARTITION BY doc_id, fr ORDER BY i) AS pv
      |  FROM s),
      |fe AS (SELECT doc_id, fr,
      |    CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS e,
      |    CAST(sum(CASE WHEN CAST(pv AS BIGINT) * v < 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS zc
      |  FROM lagd GROUP BY 1, 2),
      |pk AS (SELECT doc_id, fr, e, zc,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, fr)
      |      AS rn,
      |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS nf,
      |    CAST(sum(zc) OVER (PARTITION BY doc_id) AS BIGINT) AS tzc
      |  FROM fe)
      |SELECT doc_id AS media_id, nf AS n_frames, tzc AS total_zc,
      |  fr AS peak_frame, e AS peak_energy
      |FROM pk WHERE rn = 1 ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.functions.GraftFunctions._
    val media = Multimodal
      .fabricateMedia(Tables.documents(s, d), "doc_id", "text")
      .filter(col("format") === "wav")
    media
      .select(col("media_id"),
        wavDecode(col("payload")).getField("samples").as("sm"))
      .withColumn("nf", expr("CAST((size(sm) + 49) div 50 AS BIGINT)"))
      .withColumn("frs", expr("transform(sequence(0, CAST(nf AS INT) - 1), " +
        "f -> slice(sm, f * 50 + 1, 50))"))
      .withColumn("es", expr("transform(frs, " +
        "fr -> aggregate(fr, 0L, (a, x) -> a + CAST(x AS BIGINT) * x))"))
      // guard: a 1-sample tail frame has no adjacent pair (Spark's
      // sequence(1, 0) DESCENDS, so the unguarded fold indexed past
      // the frame)
      .withColumn("tzc", expr("aggregate(frs, 0L, (a, fr) -> " +
        "a + IF(size(fr) > 1, aggregate(sequence(1, size(fr) - 1), 0L, " +
        "(z, i) -> z + IF(CAST(fr[i - 1] AS BIGINT) * fr[i] < 0, 1L, 0L))" +
        ", 0L))"))
      .withColumn("pk", expr("aggregate(sequence(0, CAST(nf AS INT) - 1), " +
        "struct(CAST(-1 AS BIGINT) AS e, CAST(0 AS BIGINT) AS f), " +
        "(a, i) -> IF(es[i] > a.e, " +
        "struct(es[i] AS e, CAST(i AS BIGINT) AS f), a))"))
      .select(col("media_id"), col("nf").as("n_frames"),
        col("tzc").as("total_zc"), col("pk.f").as("peak_frame"),
        col("pk.e").as("peak_energy"))
      .orderBy("media_id")
  }

  val all: Seq[Q] = Seq(tokenCounts, langidProfile, multimodalFeats,
    mediaDecodeStats, mediaThumbnail, mediaFrameSample, mediaPngStats,
    mediaGifFrames, mediaJpegStats, mediaMjpegFrames, mediaH264Pcm,
    mediaH264Stats, curateCorpus, audioFeatures)
}
