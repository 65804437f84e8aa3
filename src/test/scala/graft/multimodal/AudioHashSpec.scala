package graft.multimodal

import graft.SparkSpec

class AudioHashSpec extends SparkSpec {
  import sqlImplicits._

  /** The analytic hash for the synthetic waveform (the q118 oracle's
    * arithmetic, in Scala). */
  private def expectedHash(p: Int, n: Int = 640): Long = {
    val e = new Array[Long](64)
    for (i <- 0 until n) {
      val w = (i.toLong * 64 / n).toInt
      e(w) += math.abs(((i.toLong * (p + 3)) % 199 - 99) * 300)
    }
    val mean = e.sum / 64
    e.zipWithIndex.foldLeft(0L) { case (acc, (v, k)) =>
      if (v > mean) acc | (1L << k) else acc
    }
  }

  test("WAV codec round-trip preserves the analytic hash") {
    for (p <- Seq(0, 7, 19)) {
      AudioHash.aHash64Audio(
        AudioHash.syntheticWavBytes(p)) shouldBe expectedHash(p)
    }
  }

  test("re-encoding the same samples as AIFF hashes identically") {
    val wav = AudioHash.syntheticWavBytes(4)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    aiff should not equal wav
    AudioHash.aHash64Audio(aiff) shouldBe AudioHash.aHash64Audio(wav)
  }

  test("frame count not divisible by 64 still covers every frame") {
    // n = 100: windows get 1 or 2 frames; the floor mapping drops none
    val h = AudioHash.aHash64Audio(AudioHash.syntheticWavBytes(3, nSamples = 100))
    h shouldBe expectedHash(3, 100)
  }

  test("withAudioHash drops the payload; duplicateGroups keeps min id") {
    val p2 = (1 until 20).find(p => expectedHash(p) != expectedHash(0)).get
    val df = Seq((0L, 0), (1L, p2), (2L, 0)).toDF("id", "pattern")
    val hashed = AudioHash.withAudioHash(
      AudioHash.withSyntheticWav(df, "pattern"), "audio")
    hashed.columns should not contain "audio"
    val groups = ImageHash.duplicateGroups(hashed, "id", "ahash")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    groups shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 0L)
  }

  test("corrupt payloads fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      AudioHash.aHash64Audio(Array[Byte](1, 2, 3, 4))
  }

  test("NULL payloads raise") {
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "audio")
    val e = intercept[Exception] {
      AudioHash.withAudioHash(df, "audio").collect()
    }
    e.getMessage should include("NULL")
  }
}
