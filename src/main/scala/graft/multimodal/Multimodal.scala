package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio media
  * as opaque `BinaryType` columns with typed metadata structs, plus
  * decode / feature-extract / chunk-sample operators.
  *
  * The Spark-side plumbing — schemas, batched `mapPartitions`, struct
  * outputs, partition behavior — is real and tested. The codec is
  * pluggable behind [[MediaDecoder]]: [[ImageIoDecoder]] is a REAL
  * image codec over the JDK's `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF,
  * no external dependency); [[JavaSoundDecoder]] is a REAL audio codec
  * over `javax.sound.sampled` (WAV/AU/AIFF). [[FakeImageDecoder]] /
  * [[FakePcmDecoder]] are clearly-marked DETERMINISTIC FAKEs kept for
  * hash-reproducible tests and formats the JDK can't read.
  *
  * CONTAINER VIDEO IS OUT OF SCOPE: the JDK ships no mp4/mkv/codec
  * demuxer and this build takes no external dependencies, so the
  * library deliberately claims NO video-decode capability. What it does
  * provide for video-shaped payloads is [[chunkSample]] — an honest
  * fixed-stride sampler over RAW binary payloads (uncompressed frame
  * dumps, fixed-record tensors) that distributes per-chunk work; a real
  * demuxer would slot in front of it as a `MediaDecoder`-style plugin
  * in a deployment that adds one.
  *
  * 100 TB notes: media bytes dominate row size — the operators keep them
  * streaming (batched `mapPartitions`, no collect), and feature
  * extraction drops the binary column as early as possible so downstream
  * shuffles move features, not payloads.
  */
object Multimodal {

  /** Typed metadata carried next to an opaque media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  final case class DecodedImage(
      width: Int, height: Int, channels: Int, meanPixel: Double,
      features: Array[Float])

  /** Pluggable media codec. Implementations must be deterministic per
    * byte payload (retries and speculative tasks re-decode).
    */
  trait MediaDecoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): DecodedImage
  }

  /** DETERMINISTIC FAKE decoder — STUB standing in for a real image
    * codec. Payload layout it expects (produced by [[fakeImageBytes]]):
    * magic "GRF" · format byte · width int32 BE · height int32 BE ·
    * payload. "Pixels" are a splitmix64 stream seeded by the payload
    * hash, so every derived feature is reproducible.
    */
  object FakeImageDecoder extends MediaDecoder {
    def decodeImage(bytes: Array[Byte]): DecodedImage = {
      require(bytes.length >= 12 && bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F',
        "not a GRF payload")
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, 8)
      val width = bb.getInt
      val height = bb.getInt
      var h = java.util.Arrays.hashCode(bytes).toLong
      def next(): Long = {
        h += 0x9e3779b97f4a7c15L
        var z = h
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val features = Array.fill(8)(((next() >>> 11).toDouble / (1L << 53).toDouble).toFloat)
      DecodedImage(width, height, 3, features.map(_.toDouble).sum / 8, features)
    }
  }

  /** REAL image decoder over the JDK's `javax.imageio.ImageIO` —
    * PNG/JPEG/BMP/GIF/WBMP with zero external dependencies. Deterministic
    * per payload (pure function of the decoded pixel grid). Features are
    * an 8-dim content embedding: mean R/G/B, mean luminance, and the four
    * quadrant luminance means (all in [0,1]) — enough signal for
    * near-dup bucketing and quality filters while staying cheap.
    *
    * `ImageIO.read` is thread-safe per call and needs no native libs, so
    * the decoder runs unmodified inside executor `mapPartitions` tasks.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decodeImage(bytes: Array[Byte]): DecodedImage = {
      // memory-cached stream: the default file cache creates+deletes an
      // executor temp file per image (payload is already in memory)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself on
      // success; close again only to cover the failure path
      val img = try javax.imageio.ImageIO.read(iis)
        finally { try iis.close() catch { case _: java.io.IOException => () } }
      require(img != null, "unsupported or corrupt image payload")
      val w = img.getWidth
      val h = img.getHeight
      // one bulk fetch: per-pixel getRGB(x, y) pays a color-model
      // conversion call per pixel and dominates decode time
      val pixels = img.getRGB(0, 0, w, h, null, 0, w)
      var sr = 0.0
      var sg = 0.0
      var sb = 0.0
      val quadLum = new Array[Double](4)
      val quadN = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = pixels(y * w + x)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quadLum(q) += 0.299 * r + 0.587 * g + 0.114 * b
          quadN(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val mr = sr / n / 255.0
      val mg = sg / n / 255.0
      val mb = sb / n / 255.0
      val features = Array(
        mr, mg, mb,
        0.299 * mr + 0.587 * mg + 0.114 * mb,
        quadLum(0) / math.max(quadN(0), 1L) / 255.0,
        quadLum(1) / math.max(quadN(1), 1L) / 255.0,
        quadLum(2) / math.max(quadN(2), 1L) / 255.0,
        quadLum(3) / math.max(quadN(3), 1L) / 255.0).map(_.toFloat)
      DecodedImage(w, h, img.getColorModel.getNumComponents,
        (mr + mg + mb) / 3.0, features)
    }
  }

  /** Build a fake GRF payload (test/data-generation helper). */
  def fakeImageBytes(width: Int, height: Int, seedByte: Byte): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.put('G'.toByte).put('R'.toByte).put('F'.toByte).put(0.toByte)
    bb.putInt(width).putInt(height).putInt(seedByte.toInt)
    bb.array()
  }

  /** Decode an image binary column into a features struct, batched via
    * `mapPartitions`. `dropBinary` removes the payload column after
    * decode so downstream stages shuffle features, not bytes.
    */
  def withImageFeatures(
      df: DataFrame,
      binaryCol: String,
      decoder: MediaDecoder = FakeImageDecoder,
      outputCol: String = "image_features",
      batchSize: Int = 64,
      dropBinary: Boolean = false): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val featType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("mean_pixel", DoubleType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val outSchema = df.schema.add(outputCol, featType, nullable = true)
    val decoded = df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val payload = row.getAs[Array[Byte]](idx)
          val feat =
            if (payload == null) null
            else {
              val d = decoder.decodeImage(payload)
              Row(d.width, d.height, d.channels, d.meanPixel, d.features.toSeq)
            }
          Row.fromSeq(row.toSeq :+ feat)
        }
      }
    }(Encoders.row(outSchema))
    if (dropBinary) decoded.drop(binaryCol) else decoded
  }

  final case class DecodedAudio(
      sampleRate: Int, nSamples: Int, windowEnergies: Array[Float])

  /** Audio codec surface. [[JavaSoundDecoder]] is a REAL codec over the
    * JDK's `javax.sound.sampled` (WAV/AU/AIFF); [[FakePcmDecoder]] is a
    * DETERMINISTIC FAKE for a raw headerless payload (4-byte BE sample
    * rate then 16-bit BE PCM), kept for hash-reproducible tests.
    * Features are per-window mean absolute amplitudes either way.
    */
  trait AudioDecoder extends Serializable {
    def decodeAudio(bytes: Array[Byte], windowSamples: Int): DecodedAudio
  }

  /** REAL audio decoder via `javax.sound.sampled.AudioSystem` — parses
    * WAV/AU/AIFF containers with zero external dependencies, converts to
    * 16-bit signed PCM, mixes channels down to mono, and emits
    * per-window mean absolute amplitudes in [0, 1]. Headless-safe and
    * stateless, so it runs unchanged inside executor tasks.
    */
  object JavaSoundDecoder extends AudioDecoder {
    def decodeAudio(bytes: Array[Byte], windowSamples: Int): DecodedAudio = {
      require(windowSamples > 0)
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              "unsupported or corrupt audio payload", e)
        }
      try {
        val fmt = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          fmt.getSampleRate, 16, fmt.getChannels, true, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val data =
          try pcm.readAllBytes()
          finally pcm.close()
        val channels = fmt.getChannels
        val frames = data.length / (2 * channels)
        val energies = (0 until frames by windowSamples).map { start =>
          val end = math.min(start + windowSamples, frames)
          var acc = 0.0
          var f = start
          while (f < end) {
            // mono mixdown: average the channels of the frame
            var mix = 0.0
            var c = 0
            while (c < channels) {
              val off = 2 * (f * channels + c)
              // little-endian 16-bit signed
              val s = ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
              mix += s.toDouble
              c += 1
            }
            acc += math.abs(mix / channels)
            f += 1
          }
          (acc / math.max(end - start, 1) / Short.MaxValue).toFloat
        }
        DecodedAudio(fmt.getSampleRate.toInt, frames, energies.toArray)
      } finally in.close()
    }
  }

  object FakePcmDecoder extends AudioDecoder {
    def decodeAudio(bytes: Array[Byte], windowSamples: Int): DecodedAudio = {
      require(bytes.length >= 4, "not a PCM payload")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val sampleRate = bb.getInt
      val nSamples = bb.remaining() / 2
      val energies = (0 until nSamples by windowSamples).map { start =>
        val end = math.min(start + windowSamples, nSamples)
        var acc = 0.0
        var i = start
        while (i < end) { acc += math.abs(bb.getShort(4 + 2 * i).toDouble); i += 1 }
        (acc / math.max(end - start, 1) / Short.MaxValue).toFloat
      }
      DecodedAudio(sampleRate, nSamples, energies.toArray)
    }
  }

  /** Fake PCM payload builder (test/data-generation helper). */
  def fakeAudioBytes(sampleRate: Int, samples: Seq[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 2 * samples.size)
    bb.putInt(sampleRate)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode an audio binary column into (sample_rate, n_samples,
    * window_energies), batched via `mapPartitions` like the image path.
    */
  def withAudioFeatures(
      df: DataFrame,
      binaryCol: String,
      decoder: AudioDecoder = FakePcmDecoder,
      windowSamples: Int = 1024,
      outputCol: String = "audio_features",
      batchSize: Int = 64): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val featType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("window_energies", ArrayType(FloatType, containsNull = false))))
    val outSchema = df.schema.add(outputCol, featType, nullable = true)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val payload = row.getAs[Array[Byte]](idx)
          val feat =
            if (payload == null) null
            else {
              val d = decoder.decodeAudio(payload, windowSamples)
              Row(d.sampleRate, d.nSamples, d.windowEnergies.toSeq)
            }
          Row.fromSeq(row.toSeq :+ feat)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize an image payload to `targetW` × `targetH` with REAL JDK
    * rasterization (Graphics2D, bilinear) and re-encode as PNG —
    * the standard normalize-before-embedding step. Deterministic per
    * (payload, target) on a given JDK; PNG output because it is
    * lossless and always writable through ImageIO.
    */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW >= 1 && targetH >= 1,
      s"target dimensions must be >= 1, got ${targetW}x$targetH")
    // memory-cached ImageIO streams: the default file cache would
    // create+delete an executor temp file per image in the hot path
    // (payloads are already in-memory byte arrays)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself on
    // success; close again only to cover the failure path
    val src = try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(src != null, "unsupported or corrupt image payload")
    // ARGB destination: PNG encodes alpha losslessly, so a transparent
    // source keeps its alpha instead of being composited onto black
    // (which would skew every downstream luminance/mean feature)
    val dst = new java.awt.image.BufferedImage(
      targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      javax.imageio.ImageIO.write(dst, "png", ios)
      ios.flush()
    } finally ios.close()
    out.toByteArray
  }

  /** Resize an image binary column via `mapPartitions` (schema-stable,
    * null payloads pass through as null; rows stream one at a time —
    * each resize is independent, so there is nothing to batch).
    * Resizing early SHRINKS the bytes that every downstream shuffle
    * carries, which is the point at scale: normalize once, then
    * everything else moves small payloads.
    */
  def withResizedImages(
      df: DataFrame,
      binaryCol: String,
      targetW: Int,
      targetH: Int,
      outputCol: String = "image_resized"): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"target dimensions must be >= 1, got ${targetW}x$targetH")
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = df.schema.add(outputCol, BinaryType, nullable = true)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](idx)
        val resized =
          if (payload == null) null
          else resizeImage(payload, targetW, targetH)
        Row.fromSeq(row.toSeq :+ resized)
      }
    }(Encoders.row(outSchema))
  }

  /** Sample every `everyN`-th fixed-size chunk of a RAW binary payload
    * into one row per chunk: (originalRow..., chunk_idx, chunk_bytes).
    * `explode`-shaped output so per-chunk work distributes.
    *
    * This is NOT a video demuxer (see the object doc: container video
    * is out of scope — no JDK codec, no external deps). It is the
    * distribution step for payloads that really are fixed-stride
    * records: uncompressed frame dumps, fixed-shape tensor blobs,
    * fixed-length sensor records.
    */
  def chunkSample(
      df: DataFrame,
      binaryCol: String,
      everyN: Int,
      chunkBytes: Int = 256): DataFrame = {
    require(everyN > 0 && chunkBytes > 0)
    val idx = df.schema.fieldIndex(binaryCol)
    val outSchema = df.schema
      .add("chunk_idx", IntegerType, nullable = false)
      .add("chunk_bytes", BinaryType, nullable = true)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val payload = row.getAs[Array[Byte]](idx)
        if (payload == null) Iterator.empty
        else {
          val nChunks = payload.length / chunkBytes
          (0 until nChunks by everyN).iterator.map { c =>
            val chunk = java.util.Arrays.copyOfRange(
              payload, c * chunkBytes, (c + 1) * chunkBytes)
            Row.fromSeq(row.toSeq ++ Seq(c, chunk))
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}
