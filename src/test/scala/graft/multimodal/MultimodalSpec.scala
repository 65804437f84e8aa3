package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The multimodal plumbing is real (schemas, batched mapPartitions,
  * struct outputs, chunk explosion); image decode has a REAL JDK ImageIO
  * codec and audio a REAL javax.sound codec, each with a documented
  * deterministic fake for formats the JDK can't read. Container video
  * is out of scope (no JDK codec, no external deps) — chunkSample is a
  * raw fixed-stride sampler, not a demuxer.
  */
class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder decodes a real PNG: dimensions, means, quadrants") {
    // left half pure red, right half pure blue, 8x4
    val bytes = pngBytes(8, 4)((x, _) => if (x < 4) 0xFF0000 else 0x0000FF)
    val d = Multimodal.ImageIoDecoder.decodeImage(bytes)
    d.width shouldBe 8
    d.height shouldBe 4
    d.channels shouldBe 3
    d.meanPixel shouldBe (1.0 / 3) +- 1e-9 // (0.5 + 0 + 0.5) / 3
    val f = d.features.map(_.toDouble)
    f(0) shouldBe 0.5 +- 1e-6 // mean R
    f(1) shouldBe 0.0 +- 1e-6 // mean G
    f(2) shouldBe 0.5 +- 1e-6 // mean B
    // quadrants: left = red luminance .299, right = blue luminance .114
    f(4) shouldBe 0.299 +- 1e-3
    f(5) shouldBe 0.114 +- 1e-3
    f(6) shouldBe 0.299 +- 1e-3
    f(7) shouldBe 0.114 +- 1e-3
  }

  test("resizeImage rescales with real rasterization, content preserved") {
    // left half red, right half blue, 16x8 -> 4x2: structure survives
    val bytes = pngBytes(16, 8)((x, _) => if (x < 8) 0xFF0000 else 0x0000FF)
    val resized = Multimodal.resizeImage(bytes, 4, 2)
    val d = Multimodal.ImageIoDecoder.decodeImage(resized)
    d.width shouldBe 4
    d.height shouldBe 2
    val f = d.features.map(_.toDouble)
    f(0) shouldBe 0.5 +- 0.1 // mean R roughly preserved
    f(2) shouldBe 0.5 +- 0.1 // mean B roughly preserved
    f(1) shouldBe 0.0 +- 0.1 // no green appears from nowhere
    // determinism per (payload, target)
    Multimodal.resizeImage(bytes, 4, 2) shouldBe resized
    // upscale works too
    val up = Multimodal.ImageIoDecoder.decodeImage(
      Multimodal.resizeImage(bytes, 32, 16))
    up.width shouldBe 32
    up.height shouldBe 16
  }

  test("withResizedImages runs distributed, nulls pass through, bytes shrink") {
    val big = pngBytes(64, 64)((x, y) => (x * 4) << 16 | (y * 4))
    val df = Seq((1L, big), (2L, null: Array[Byte]))
      .toDF("id", "img").repartition(2)
    val got = Multimodal.withResizedImages(df, "img", 8, 8)
      .orderBy("id").collect()
    val r1 = got(0).getAs[Array[Byte]]("image_resized")
    val d = Multimodal.ImageIoDecoder.decodeImage(r1)
    d.width shouldBe 8
    d.height shouldBe 8
    r1.length should be < big.length // normalize-early shrinks payloads
    got(1).isNullAt(got(1).fieldIndex("image_resized")) shouldBe true
  }

  test("resizeImage rejects garbage and bad targets") {
    an[Exception] should be thrownBy
      Multimodal.resizeImage(Array[Byte](1, 2, 3), 4, 4)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizeImage(pngBytes(4, 4)((_, _) => 0), 0, 4)
  }

  test("ImageIoDecoder runs distributed through withImageFeatures") {
    val rows = Seq(
      (1L, pngBytes(6, 6)((_, _) => 0xFFFFFF)),
      (2L, pngBytes(3, 3)((_, _) => 0x000000)),
      (3L, null))
    val df = rows.toDF("id", "img").repartition(2)
    val out = Multimodal.withImageFeatures(
      df, "img", decoder = Multimodal.ImageIoDecoder, batchSize = 2)
      .orderBy("id").collect()
    val white = out(0).getStruct(out(0).fieldIndex("image_features"))
    white.getAs[Int]("width") shouldBe 6
    white.getAs[Double]("mean_pixel") shouldBe 1.0 +- 1e-6
    val black = out(1).getStruct(out(1).fieldIndex("image_features"))
    black.getAs[Double]("mean_pixel") shouldBe 0.0 +- 1e-6
    out(2).isNullAt(out(2).fieldIndex("image_features")) shouldBe true
  }

  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JavaSoundDecoder decodes a real WAV: rate, frames, window energies") {
    // constant-amplitude square wave: every window's mean |amplitude|
    // is exactly amp/32767
    val amp: Short = 16384
    val samples = Array.tabulate[Short](2048)(i => if (i % 2 == 0) amp else (-amp).toShort)
    val d = Multimodal.JavaSoundDecoder.decodeAudio(wavBytes(8000, samples), 512)
    d.sampleRate shouldBe 8000
    d.nSamples shouldBe 2048
    d.windowEnergies.length shouldBe 4
    d.windowEnergies.foreach(_.toDouble shouldBe (amp.toDouble / Short.MaxValue) +- 1e-4)
  }

  test("JavaSoundDecoder runs distributed through withAudioFeatures") {
    val rows = Seq(
      (1L, wavBytes(16000, Array.fill[Short](1000)(8192))),
      (2L, null))
    val df = rows.toDF("id", "audio").repartition(2)
    val out = Multimodal.withAudioFeatures(
      df, "audio", decoder = Multimodal.JavaSoundDecoder, windowSamples = 500)
      .orderBy("id").collect()
    val f = out(0).getStruct(out(0).fieldIndex("audio_features"))
    f.getAs[Int]("sample_rate") shouldBe 16000
    f.getAs[Int]("n_samples") shouldBe 1000
    f.getAs[Seq[Float]]("window_energies").length shouldBe 2
    out(1).isNullAt(out(1).fieldIndex("audio_features")) shouldBe true
  }

  test("JavaSoundDecoder rejects garbage payloads") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.JavaSoundDecoder.decodeAudio(Array[Byte](9, 9, 9, 9), 100)
  }

  test("ImageIoDecoder rejects garbage payloads") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.ImageIoDecoder.decodeImage(Array[Byte](1, 2, 3, 4))
  }

  test("end-to-end: decode image features, then embedding near-dup finds duplicate images") {
    // the multimodal decode column composes with the similarity operators:
    // two copies of the same picture land at cosine 1.0 on their feature
    // embeddings, distinct pictures don't reach the threshold
    def shaded(r: Int, g: Int, b: Int) = pngBytes(8, 8) { (x, y) =>
      ((r * (x + 1) / 8) << 16) | ((g * (y + 1) / 8) << 8) | (b * (x + y + 1) / 15)
    }
    val rows = Seq(
      (1L, shaded(200, 10, 10)),
      (2L, shaded(200, 10, 10)), // exact duplicate of 1
      (3L, shaded(10, 200, 10)),
      (4L, shaded(10, 10, 200)),
      (5L, shaded(90, 90, 90)))
    val df = rows.toDF("img_id", "img").repartition(2)
    val features = Multimodal.withImageFeatures(
      df, "img", decoder = Multimodal.ImageIoDecoder, dropBinary = true)
      .select(col("img_id"), col("image_features.embedding").as("embedding"))
    val pairs = graft.sim.Similarity.embeddingNearDuplicates(
      features, "img_id", "embedding", threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs.foreach { case (a, b) => Set(a, b) shouldBe Set(1L, 2L) }
  }

  test("image features: schema, determinism, null passthrough") {
    val rows = Seq(
      (1L, Multimodal.fakeImageBytes(64, 48, 1)),
      (2L, Multimodal.fakeImageBytes(32, 32, 2)),
      (3L, null))
    val df = rows.toDF("id", "img").repartition(2)
    val out = Multimodal.withImageFeatures(df, "img", batchSize = 2)
    val schema = out.schema("image_features").dataType.asInstanceOf[StructType]
    schema.fieldNames.toSeq shouldBe
      Seq("width", "height", "channels", "mean_pixel", "embedding")

    val collected = out.orderBy("id").collect()
    val f1 = collected(0).getStruct(collected(0).fieldIndex("image_features"))
    f1.getAs[Int]("width") shouldBe 64
    f1.getAs[Int]("height") shouldBe 48
    f1.getAs[Seq[Float]]("embedding").size shouldBe 8
    collected(2).isNullAt(collected(2).fieldIndex("image_features")) shouldBe true

    // determinism: same payload -> same features
    val again = Multimodal.withImageFeatures(df, "img", batchSize = 1)
      .orderBy("id").collect()
    again(0).getStruct(again(0).fieldIndex("image_features"))
      .getAs[Seq[Float]]("embedding") shouldBe f1.getAs[Seq[Float]]("embedding")
  }

  test("dropBinary removes the payload column after decode") {
    val df = Seq((1L, Multimodal.fakeImageBytes(8, 8, 3))).toDF("id", "img")
    val out = Multimodal.withImageFeatures(df, "img", dropBinary = true)
    out.schema.fieldNames.toSeq shouldBe Seq("id", "image_features")
  }

  test("chunk sampling explodes every n-th fixed-size chunk") {
    val payload = Array.tabulate(1024)(_.toByte) // 4 chunks of 256
    val df = Seq((1L, payload), (2L, null)).toDF("id", "payload")
    val chunks = Multimodal.chunkSample(df, "payload", everyN = 2, chunkBytes = 256)
      .orderBy("id", "chunk_idx").collect()
    chunks.map(r => (r.getLong(0), r.getInt(r.fieldIndex("chunk_idx")))).toSeq shouldBe
      Seq((1L, 0), (1L, 2)) // null payload row contributes nothing
    chunks(0).getAs[Array[Byte]]("chunk_bytes").toSeq shouldBe
      payload.slice(0, 256).toSeq
    chunks(1).getAs[Array[Byte]]("chunk_bytes").toSeq shouldBe
      payload.slice(512, 768).toSeq
  }

  test("audio features: window energies, sample rate, null passthrough") {
    val loud = Seq.fill(2048)(Short.MaxValue)
    val quiet = Seq.fill(2048)(0.toShort)
    val rows = Seq(
      (1L, Multimodal.fakeAudioBytes(16000, loud ++ quiet)),
      (2L, null))
    val df = rows.toDF("id", "audio")
    val out = Multimodal.withAudioFeatures(df, "audio", windowSamples = 2048)
      .orderBy("id").collect()
    val f = out(0).getStruct(out(0).fieldIndex("audio_features"))
    f.getAs[Int]("sample_rate") shouldBe 16000
    f.getAs[Int]("n_samples") shouldBe 4096
    val energies = f.getAs[collection.Seq[Float]]("window_energies")
    energies.size shouldBe 2
    energies(0) shouldBe 1.0f +- 1e-4f // full-scale window
    energies(1) shouldBe 0.0f
    out(1).isNullAt(out(1).fieldIndex("audio_features")) shouldBe true
  }

  test("decoder rejects non-GRF payloads") {
    an[IllegalArgumentException] should be thrownBy {
      Multimodal.FakeImageDecoder.decodeImage("nope".getBytes)
    }
  }
}
