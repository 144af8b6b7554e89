package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star op): media as opaque `binary`
  * payloads + a typed metadata struct, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, the
  * binary column flowing through parquet — is real and tested. The
  * codec layer is split by what this container can honestly support:
  *
  *  - WAV / BMP / Y4M / PNG / GIF / baseline JPEG are REAL codecs
  *    ([[Codecs]]: RIFF/WAVE PCM, 24-bit BI_RGB BMP, YUV4MPEG2,
  *    RFC-2083 PNG — chunk walk + CRC + JDK-Inflater + all five
  *    unfilters; [[GifCodec]]: LZW + palette, incl. animations;
  *    [[JpegCodec]]: Huffman + dequant + IDCT + 4:2:0 upsample),
  *    decoded by native expressions (graft.functions.{WavDecode,
  *    BmpDecode,Y4mDecode,PngDecode,GifDecode,JpegDecode}) and
  *    oracle-checked end-to-end via `media_decode_stats` /
  *    `media_png_stats` / `media_gif_frames` / `media_jpeg_stats`.
  *  - H.264 is the one format that genuinely needs an external codec
  *    library (entropy decode + inter-frame motion compensation);
  *    `decodeBytes` below stays a DETERMINISTIC FAKE for that path,
  *    and a production deployment swaps only that expression (e.g. a
  *    JNI/javacv call in the same shape) — every other stage is
  *    codec-agnostic. MJPEG-style compressed video decodes for real
  *    via GIF animations (and per-frame JpegDecode).
  *
  * Scale: payloads never shuffle — all feature stages are map-only
  * column ops; only extracted (small) features flow into joins/aggs.
  */
object Multimodal {

  /** Spread the doc corpus across the session's parallelism BEFORE the
    * per-row encode UDF (optimization round 13 — the CosineDedup.scala
    * r12 discipline): the fixture is a single small parquet file, so
    * the scan is ONE input split and every codec encode+decode ran on
    * one core (measured: media_h264_pcm 2.9s at sf0.1, ~all of it a
    * single-task stage). The repartition moves only (id, text) rows —
    * payloads are synthesized after it, so the "payloads never
    * shuffle" contract is untouched. At production file counts the
    * scan is already wide and this is a no-op-sized safety net. */
  private def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)

  /** media schema: (media_id, modality, payload, meta{width,height,
    * n_frames,sample_rate,format}). Fabricated deterministically from
    * any (id, text) corpus so every sf dir yields a media table. */
  def fabricate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    val h = pmod(xxhash64(col(idCol)), lit(3L))
    docs.select(
      col(idCol).as("media_id"),
      when(h === 0, "image").when(h === 1, "audio").otherwise("video")
        .as("modality"),
      payload.as("payload"),
      struct(
        (pmod(xxhash64(col(textCol)), lit(64L)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(64L)) + 16).cast("int")
          .as("height"),
        (pmod(xxhash64(col(idCol), lit(2)), lit(30L)) + 1).cast("int")
          .as("n_frames"),
        lit(16000).as("sample_rate"),
        when(h === 0, "png").when(h === 1, "wav").otherwise("mp4")
          .as("format")).as("meta"))
  }

  /** Media table with REAL container bytes — BMP / PCM-WAV / Y4M built
    * by [[Codecs]] from deterministic text-derived content, so the
    * decode expressions ([[graft.functions.GraftFunctions.bmpDecode]]
    * etc.) parse genuine formats and the `media_decode_stats` oracle
    * can recompute the expected decoded sums straight from the
    * generation formula (any encode OR decode bug breaks the match).
    * Generation formulas (replicated in the oracle SQL; text is ASCII
    * so code point == byte):
    *   - modality = doc_id % 3 → 0 bmp, 1 wav, 2 y4m
    *   - bmp: w = 16 + 2*(id%8), h = 16 + 2*((id/8)%8),
    *     pixel[j] = cp(text[j % len]) for j < w*h*3
    *   - wav: n = 200 + id%100 samples @16 kHz,
    *     s[i] = cp(text[i % len]) * 257 - 16384 (Int16-safe: cp <= 121)
    *   - y4m: 16x16, nf = 1 + id%8 frames, y[k] = cp(text[k % len])
    * The synthesis UDF is fixture-side only — production payloads
    * arrive from storage; decode is the operator under test. */
  def fabricateMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // floorMod/floorDiv throughout: the format LABEL below uses pmod,
    // and Scala's signed % would disagree with it for negative ids
    // (mislabeled container + negative dims)
    val enc = udf { (id: Long, text: String) =>
      require(text.nonEmpty, "media synthesis needs non-empty text")
      val len = text.length
      // Same non-Latin-1 guard fabricateGif/fabricateH264 enforce: a
      // code point > 255 would silently wrap in the .toByte payload
      // while the oracle replays the full unicode() value — a
      // confusing hash mismatch instead of a loud error (r9 advisor).
      def cp(j: Int): Int = {
        val c = text.charAt(j % len).toInt
        require(c < 256, s"media synthesis needs Latin-1 text; got code point $c")
        c
      }
      Math.floorMod(id, 3L) match {
        case 0L =>
          val w = (16 + 2 * Math.floorMod(id, 8L)).toInt
          val h = (16 + 2 * Math.floorMod(Math.floorDiv(id, 8L), 8L)).toInt
          val rgb = Array.tabulate(w * h * 3)(j => cp(j).toByte)
          graft.multimodal.Codecs.bmpEncode(w, h, rgb)
        case 1L =>
          val n = (200 + Math.floorMod(id, 100L)).toInt
          val samples = Array.tabulate(n)(i => (cp(i) * 257 - 16384).toShort)
          graft.multimodal.Codecs.wavEncode(samples, 16000)
        case _ =>
          val nf = (1 + Math.floorMod(id, 8L)).toInt
          val frames = Array.tabulate(nf)(f =>
            Array.tabulate(256)(j => cp(f * 256 + j).toByte))
          graft.multimodal.Codecs.y4mEncode(16, 16, frames)
      }
    }
    val m = pmod(col(idCol), lit(3L))
    spread(docs).select(
      col(idCol).as("media_id"),
      when(m === 0, "bmp").when(m === 1, "wav").otherwise("y4m").as("format"),
      // asNondeterministic is an OPTIMIZER FENCE, not a statement about
      // enc (which is a pure function of (id, text)): downstream
      // derived predicates — e.g. a join's inferred
      // isnotnull(f(payload)) where f decodes — must not be pushed
      // through this Project, because predicate-level common-
      // subexpression elimination then evaluates the decode EAGERLY on
      // every row, including payloads of other modalities, and the
      // strict codecs throw on foreign bytes (observed: a banded
      // self-join over bmp hashes pushed a chunk-key null filter into
      // the scan and bmpDecode met WAV bytes).
      enc.asNondeterministic()(col(idCol), col(textCol)).as("payload"))
  }

  /** PNG media table: one real RFC-2083 container per document, with
    * the same text-derived generation discipline as [[fabricateMedia]]
    * so the `media_png_stats` oracle recomputes expected decoded sums
    * straight from the formula:
    *   w = 8 + id%9, h = 8 + (id/9)%9  (odd dims exercise row stride),
    *   pixel[j] = cp(text[j % len]) for j < w*h*3.
    * The encoder cycles all five PNG row filters, so the oracle match
    * proves inflate + every unfilter path, not just the container
    * walk. */
  def fabricatePng(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = udf { (id: Long, text: String) =>
      require(text.nonEmpty, "media synthesis needs non-empty text")
      val len = text.length
      val w = (8 + Math.floorMod(id, 9L)).toInt
      val h = (8 + Math.floorMod(Math.floorDiv(id, 9L), 9L)).toInt
      val rgb = Array.tabulate(w * h * 3)(j => text.charAt(j % len).toByte)
      graft.multimodal.Codecs.pngEncode(w, h, rgb)
    }
    spread(docs).select(
      col(idCol).as("media_id"),
      lit("png").as("format"),
      enc(col(idCol), col(textCol)).as("payload"))
  }

  /** GIF media table: one real LZW-compressed animation per document,
    * same generation discipline as [[fabricatePng]] so the
    * `media_gif_frames` oracle recomputes expected per-frame sums from
    * the formula (gray palette ⇒ RGB = 3× the index sum):
    *   w = 8 + id%9, h = 8 + (id/9)%9, nf = 1 + id%4,
    *   frame f index[j] = cp(text[(f*w*h + j) % len]).
    * Text is ASCII so indices stay < 128; the LZW stream still
    * exercises dictionary growth and width bumps on repeats. */
  def fabricateGif(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = udf { (id: Long, text: String) =>
      require(text.nonEmpty, "media synthesis needs non-empty text")
      val len = text.length
      val w = (8 + Math.floorMod(id, 9L)).toInt
      val h = (8 + Math.floorMod(Math.floorDiv(id, 9L), 9L)).toInt
      val nf = (1 + Math.floorMod(id, 4L)).toInt
      val frames = Array.tabulate(nf)(f =>
        Array.tabulate(w * h) { j =>
          val c = text.charAt((f * w * h + j) % len)
          // toByte would silently wrap code points > 255 and the
          // media_gif_frames oracle replays unicode() — a non-Latin-1
          // fixture must fail loudly, not hash-mismatch confusingly
          require(c < 256, f"non-Latin-1 char U+${c.toInt}%04X in GIF fixture text")
          c.toByte
        })
      GifCodec.gifEncode(w, h, frames)
    }
    spread(docs).select(
      col(idCol).as("media_id"),
      lit("gif").as("format"),
      enc(col(idCol), col(textCol)).as("payload"))
  }

  /** H.264 media table: one real Annex B stream per document — SPS /
    * PPS / one IDR I-slice per frame, all-I_PCM macroblocks so the
    * decode is LOSSLESS and the `media_h264_pcm` oracle can recompute
    * the decoded plane sums straight from the generation formula (the
    * same discipline as [[fabricateMedia]]'s BMP/WAV/Y4M). Generation
    * (text is ASCII, cp <= 127, a valid sample value):
    *   w = 32, h = 16, nf = 1 + id%3,
    *   y[j]  = cp((f*11 + j)     % len)   for j < 512
    *   cb[j] = cp((f*11 + 2j+3)  % len)   for j < 128
    *   cr[j] = cp((f*11 + 3j+5)  % len)   for j < 128
    * The CAVLC/intra/IDCT paths are gated separately by the pinned
    * `media_h264_stats` fixtures and H264Suite. */
  def fabricateH264(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = udf { (id: Long, text: String) =>
      require(text.nonEmpty, "media synthesis needs non-empty text")
      val len = text.length
      def cp(j: Int): Int = {
        val c = text.charAt(j % len)
        require(c < 128, f"non-ASCII char U+${c.toInt}%04X in H.264 fixture text")
        c.toInt
      }
      val nf = (1 + Math.floorMod(id, 3L)).toInt
      val frames = (0 until nf).map { f =>
        (Array.tabulate(512)(j => cp(f * 11 + j)),
          Array.tabulate(128)(j => cp(f * 11 + 2 * j + 3)),
          Array.tabulate(128)(j => cp(f * 11 + 3 * j + 5)))
      }
      H264Encoder.encode(32, 16, frames, qp = 26, allPcm = true)._1
    }
    spread(docs).select(
      col(idCol).as("media_id"),
      lit("h264").as("format"),
      enc(col(idCol), col(textCol)).as("payload"))
  }

  /** Feature extraction over the decoded sample: mean/min/max byte and
    * a coarse 4-bucket histogram — the plumbing a real embedding model
    * would replace. */
  def featurize(media: DataFrame, sampleBytes: Int = 64): DataFrame = {
    val px = col("px")
    media
      .withColumn("px", decodeBytes(col("payload"), sampleBytes))
      .select(
        col("media_id"), col("modality"), col("meta"),
        length(col("payload")).as("n_bytes"),
        round(aggregate(px, lit(0L), (a, x) => a + x).cast("double")
          / greatest(size(px), lit(1)), 4).as("mean_byte"),
        array_min(px).as("min_byte"),
        array_max(px).as("max_byte"))
  }

  /** STUB CODEC (compressed-format path only — see the object scaladoc;
    * uncompressed formats decode for real via graft.functions.*Decode):
    * deterministic fake decode, payload → first n bytes as unsigned
    * ints ("pixels"/"samples"). A real deployment swaps this one
    * expression for an actual codec; the array<long> + meta-dims
    * contract downstream stages consume stays identical. */
  def decodeBytes(payload: Column, n: Int): Column = {
    // hex → pairs → ints keeps everything in codegen'd functions:
    // hex(payload) gives 2 chars per byte; conv(pair, 16, 10) → int.
    val hx = hex(payload)
    transform(
      sequence(lit(0), greatest(least(length(payload), lit(n)), lit(1)) - 1),
      i => conv(substring(hx, lit(1) + i * 2, lit(2)), 16, 10).cast("long"))
  }

  /** Resize: downsample the decoded sample to a fixed-length feature
    * vector by bucketed means — the plan shape of a thumbnail/resample
    * stage (a real codec swaps the per-bucket reduction, the schema
    * contract array<double> of length `outLen` stays). */
  def resize(media: DataFrame, sampleBytes: Int = 64, outLen: Int = 8): DataFrame = {
    require(sampleBytes % outLen == 0, "sampleBytes must divide into outLen buckets")
    val bucket = sampleBytes / outLen
    media
      .withColumn("px", decodeBytes(col("payload"), sampleBytes))
      .withColumn("resized",
        transform(sequence(lit(0), lit(outLen - 1)), b => {
          val sliceCol = slice(col("px"), b * bucket + lit(1), lit(bucket))
          aggregate(sliceCol, lit(0L), (a, x) => a + x).cast("double") /
            greatest(size(sliceCol), lit(1))
        }))
      .select(col("media_id"), col("modality"), col("meta"), col("resized"))
  }

  /** Frame sampling for video payloads: split the payload into
    * `meta.n_frames` equal byte-ranges and keep every strideth frame's
    * first-byte feature — the plan shape of real frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val nf = col("meta.n_frames")
    val frameLen = greatest((length(col("payload")) / nf).cast("int"), lit(1))
    media.filter(col("modality") === "video")
      .select(col("media_id"), nf.as("n_frames"),
        explode(
          filter(
            transform(sequence(lit(0), nf - 1),
              f => struct(f.as("frame_idx"),
                conv(substring(hex(col("payload")),
                  f * frameLen * 2 + lit(1), lit(2)), 16, 10).cast("long")
                  .as("first_byte"))),
            s => pmod(s.getField("frame_idx"), lit(stride)) === 0))
          .as("fr"))
      .select(col("media_id"), col("n_frames"),
        col("fr.frame_idx"), col("fr.first_byte"))
  }
}
