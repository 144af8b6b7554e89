package graft.text

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.multimodal.Multimodal

/** Gates for language-ID and the multimodal binary plumbing. */
class PipelineSuite extends SparkSpec {

  test("LangId classifies real-language sentences correctly") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy that day", "en"),
      (2L, "el perro corre en la casa y no se detiene por nada", "es"),
      (3L, "der Hund läuft in den Park und die Kinder spielen mit dem Ball", "de"),
      (4L, "le chien court dans le jardin et les enfants jouent pour une heure", "fr"),
      (5L, "il cane corre per il parco ma non si ferma con gli amici", "it"))
    val got = LangId.classify(samples.toDF("id", "text", "expected"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.foreach { case (id, _, expected) =>
      assert(got(id) === expected, s"sample $id")
    }
  }

  test("native LangScores classify matches the HOF detect form") {
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
    val viaHof = docs
      .select(col("doc_id").as("id"), LangId.detect(col("text")).as("d"))
      .select(col("id"), col("d.lang").as("lang"),
        col("d.confidence").as("confidence"))
    val viaNative = LangId.classify(docs, "doc_id", "text")
    assert(viaNative.exceptAll(viaHof).count() === 0)
    assert(viaHof.exceptAll(viaNative).count() === 0)
  }

  test("LangId yields 'und' below the confidence floor") {
    import spark.implicits._
    val got = LangId.classify(
      Seq((1L, "zzz qqq xxx www yyy kkk")).toDF("id", "text"), "id", "text")
      .collect().head
    assert(got.getString(1) === "und")
  }

  test("multimodal: binary payload round-trips through parquet") {
    val media = Multimodal.fabricate(
      Tables.documents(spark, sfDir).limit(50), "doc_id", "text")
    val out = tmpDir("media").resolve("media_parquet").toString
    media.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("payload").dataType.typeName === "binary")
    assert(back.count() === 50)
    // payload decodes back to the original text bytes
    import spark.implicits._
    val joined = back
      .select(col("media_id").as("doc_id"),
        col("payload").cast("string").as("decoded"))
      .join(Tables.documents(spark, sfDir).select("doc_id", "text"), "doc_id")
    assert(joined.filter(col("decoded") =!= col("text")).count() === 0)
  }

  test("multimodal: decodeBytes equals the text's UTF-8 bytes") {
    import spark.implicits._
    val df = Seq((1L, "AB c")).toDF("id", "text")
    val media = Multimodal.fabricate(df, "id", "text")
    val px = media.select(Multimodal.decodeBytes(col("payload"), 64).as("px"))
      .as[Seq[Long]].collect().head
    assert(px === Seq(65L, 66L, 32L, 99L))
  }

  test("multimodal: featurize emits deterministic byte stats per modality") {
    val media = Multimodal.fabricate(
      Tables.documents(spark, sfDir).limit(30), "doc_id", "text")
    val feats = Multimodal.featurize(media).collect()
    assert(feats.length === 30)
    feats.foreach { r =>
      val mean = r.getAs[Double]("mean_byte")
      val lo = r.getAs[Long]("min_byte")
      val hi = r.getAs[Long]("max_byte")
      assert(lo <= mean && mean <= hi, s"stats ordering for $r")
      assert(lo >= 32 && hi < 127, "fixture text is printable ASCII")
    }
    val modalities = feats.map(_.getAs[String]("modality")).toSet
    assert(modalities.subsetOf(Set("image", "audio", "video")))
  }

  test("multimodal: resize downsamples to fixed-length bucketed means") {
    import spark.implicits._
    // payload "AAAABBBB…" → buckets of 4 identical bytes → exact means
    val text = "AAAA" + "BBBB" + "CCCC" + "DDDD"
    val media = Multimodal.fabricate(Seq((1L, text)).toDF("id", "text"), "id", "text")
    val out = media.transform(Multimodal.resize(_, sampleBytes = 16, outLen = 4))
      .select("resized").as[Seq[Double]].collect().head
    assert(out === Seq(65.0, 66.0, 67.0, 68.0))
    // short payloads: trailing buckets are empty → mean over empty slice = 0
    val shortM = Multimodal.fabricate(Seq((2L, "AAAA")).toDF("id", "text"), "id", "text")
    val shortOut = shortM.transform(Multimodal.resize(_, sampleBytes = 16, outLen = 4))
      .select("resized").as[Seq[Double]].collect().head
    assert(shortOut.head === 65.0 && shortOut.length === 4)
  }

  test("multimodal: frame sampling respects stride and frame count") {
    import spark.implicits._
    val df = Seq((7L, "x" * 100)).toDF("id", "text")
    val media = Multimodal.fabricate(df, "id", "text")
      .withColumn("modality", lit("video"))
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    val nf = frames.head.getAs[Int]("n_frames")
    assert(frames.length === (nf + 1) / 2, "every 2nd frame kept")
    assert(frames.map(_.getAs[Int]("frame_idx")).forall(_ % 2 == 0))
    assert(frames.map(_.getAs[Long]("first_byte")).forall(_ == 'x'.toLong))
  }
}
