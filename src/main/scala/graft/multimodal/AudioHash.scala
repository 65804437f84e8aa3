package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Perceptual audio hashing — the audio member of the multimodal
  * near-dup family ([[ImageHash]] for stills): a clip collapses to a
  * 64-bit energy-profile fingerprint, re-encoded copies collide
  * (the hash sees PCM SAMPLES, not container bytes), and Hamming-near
  * variants ride the existing SimHash banding machinery. Shazam-class
  * spectral fingerprints need an FFT; the average-energy profile is
  * the same shape-over-time idea in exact integer arithmetic, which
  * buys the property everything else in this repo is built on:
  * engine-replayability (q118 re-derives the hash from the sample
  * FORMULA of synthesized WAVs — math, not pinned constants).
  *
  *   - the clip's frames map to 64 equal-share windows
  *     `w = ⌊frame·64/n⌋` (every frame in exactly one window, no
  *     remainder frames dropped);
  *   - window energy `e_w = Σ |sample|` over 16-bit integer samples
  *     (multi-channel frames sum channels — integer, no mixdown
  *     rounding);
  *   - threshold at the integer mean `⌊Σe/64⌋`: bit w = 1 iff
  *     `e_w > mean` — the same mean-relative scheme as [[ImageHash]],
  *     VOLUME-invariant for exact scaling and robust to re-encoding.
  *
  * Scale shape: decode+hash is map-only `mapPartitions`; the payload
  * drops before any shuffle (8 bytes per clip move, not minutes of
  * PCM); grouping reuses [[ImageHash.duplicateGroups]] (the function
  * is hash-generic).
  */
object AudioHash {

  /** 64-bit energy-profile hash of an encoded clip (WAV/AU/AIFF via
    * `javax.sound.sampled`; converted to 16-bit signed PCM first).
    */
  def aHash64Audio(bytes: Array[Byte]): Long = {
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
      val data = try pcm.readAllBytes() finally pcm.close()
      val channels = fmt.getChannels
      val frames = data.length / (2 * channels)
      require(frames >= 1, "empty audio payload")
      val e = new Array[Long](64)
      var f = 0
      while (f < frames) {
        val w = ((f.toLong * 64) / frames).toInt
        var c = 0
        var mix = 0L
        while (c < channels) {
          val off = 2 * (f * channels + c)
          // little-endian 16-bit signed
          mix += ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort.toLong
          c += 1
        }
        e(w) += math.abs(mix)
        f += 1
      }
      var sum = 0L
      var k = 0
      while (k < 64) { sum += e(k); k += 1 }
      val mean = sum / 64
      var hash = 0L
      k = 0
      while (k < 64) {
        if (e(k) > mean) hash |= (1L << k)
        k += 1
      }
      hash
    } finally in.close()
  }

  /** Deterministic synthetic mono WAV for pattern `p`: sample
    * `s_i = ((i·(p+3)) mod 199 − 99) · 300` — an ANALYTIC waveform, so
    * the hash is re-derivable from the formula by any engine, while the
    * bytes still round-trip the real RIFF/WAV codec. The audio analog
    * of [[ImageHash.syntheticPngBytes]].
    */
  def syntheticWavBytes(
      pattern: Int, nSamples: Int = 640, sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples >= 1, s"need at least one sample, got $nSamples")
    val data = new Array[Byte](2 * nSamples)
    var i = 0
    while (i < nSamples) {
      val s = (((i.toLong * (pattern + 3)) % 199 - 99) * 300).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach a [[syntheticWavBytes]] payload per row keyed by an integer
    * pattern column (corpus generation for tests/benches).
    */
  def withSyntheticWav(
      df: DataFrame, patternCol: String, outCol: String = "audio",
      nSamples: Int = 640, sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, org.apache.spark.sql.types.BinaryType,
        nullable = false))
    val idx = df.schema.fieldIndex(patternCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.get(idx) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => sys.error(s"withSyntheticWav: non-integer pattern $other")
        }
        Row.fromSeq(r.toSeq :+ syntheticWavBytes(p, nSamples, sampleRate))
      }
    }(Encoders.row(outSchema))
  }

  /** Append the 64-bit audio hash of `binaryCol`, dropping the payload
    * by default. NULL payloads raise.
    */
  def withAudioHash(
      df: DataFrame, binaryCol: String, outCol: String = "ahash",
      dropBinary: Boolean = true): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val idx = df.schema.fieldIndex(binaryCol)
    val hashed = df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(idx)
        require(bytes != null,
          s"withAudioHash: NULL $binaryCol — filter corrupt media explicitly")
        Row.fromSeq(r.toSeq :+ aHash64Audio(bytes.asInstanceOf[Array[Byte]]))
      }
    }(Encoders.row(outSchema))
    if (dropBinary) hashed.drop(binaryCol) else hashed
  }
}
