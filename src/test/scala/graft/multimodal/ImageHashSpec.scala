package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {
  import sqlImplicits._

  /** The analytic hash for the synthetic pattern, computed from the
    * pixel formula alone (the q115 oracle's arithmetic, in Scala). */
  private def expectedHash(p: Int, w: Int = 32, h: Int = 32): Long = {
    val g = for (j <- 0 until 8; i <- 0 until 8) yield {
      val x = i * w / 8
      val y = j * h / 8
      299L * ((7 * x + 13 * p) % 256) + 587L * ((11 * y + 29 * p) % 256) +
        114L * ((x + y + p) % 256)
    }
    val mean = g.sum / 64
    g.zipWithIndex.foldLeft(0L) { case (acc, (v, k)) =>
      if (v > mean) acc | (1L << k) else acc
    }
  }

  test("codec round-trip preserves the analytic hash") {
    for (p <- Seq(0, 7, 24)) {
      ImageHash.aHash64(ImageHash.syntheticPngBytes(p)) shouldBe expectedHash(p)
    }
  }

  test("re-encoding the same pixels in another format hashes identically") {
    val png = ImageHash.syntheticPngBytes(3)
    // decode + re-encode as BMP: different bytes, same pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    bmp should not equal png
    ImageHash.aHash64(bmp) shouldBe ImageHash.aHash64(png)
  }

  test("hash is scale-invariant for nearest-neighbor-compatible sizes") {
    // 64x64 with the same 8x8 sample grid content at sampled points is
    // NOT guaranteed (the formula moves with x) — but the SAME pattern
    // at the same size is always stable across encodes
    val a = ImageHash.aHash64(ImageHash.syntheticPngBytes(5))
    val b = ImageHash.aHash64(ImageHash.syntheticPngBytes(5))
    a shouldBe b
  }

  test("patterns collapse only by design: mean-relative bits absorb " +
    "near-uniform brightness shifts, structure still separates") {
    // the additive pattern offset p shifts most pixels uniformly and
    // aHash thresholds against the image's OWN mean — so some pattern
    // pairs legitimately collide (brightness-shift invariance, the
    // point of the mean threshold); wraparound pairs still separate
    val hashes = (0 until 25)
      .map(p => ImageHash.aHash64(ImageHash.syntheticPngBytes(p))).toSet
    hashes.size should be > 10
    hashes.size should be < 25
  }

  test("withImageHash drops the payload and duplicateGroups keeps min id") {
    // pick two patterns with provably different hashes (shift-invariance
    // makes some pairs collide, so select by the analytic hash)
    val p2 = (1 until 25).find(p => expectedHash(p) != expectedHash(0)).get
    val df = Seq((0L, 0), (1L, p2), (2L, 0), (3L, p2))
      .toDF("id", "pattern")
    val hashed = ImageHash.withImageHash(
      ImageHash.withSyntheticPng(df, "pattern"), "img")
    hashed.columns should not contain "img"
    val groups = ImageHash.duplicateGroups(hashed, "id", "ahash")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    groups shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L)
  }

  test("NULL payloads raise") {
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "img")
    val e = intercept[Exception] {
      ImageHash.withImageHash(df, "img").collect()
    }
    e.getMessage should include("NULL")
  }

  test("a flat image hashes to all-zero bits (no pixel above the mean)") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    ImageHash.aHash64(bos.toByteArray) shouldBe 0L
  }
}
