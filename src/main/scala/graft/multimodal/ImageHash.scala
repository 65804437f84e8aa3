package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Perceptual image hashing (average-hash family) — image NEAR-DUP
  * detection as a fingerprint problem, closing the multimodal loop
  * with the text-side dedup machinery: once every image collapses to
  * a 64-bit hash, exact-equal grouping finds re-encoded copies (PNG
  * vs JPEG re-save of the same picture hashes identically because the
  * hash sees PIXELS, not bytes) and the SimHash banding machinery
  * ([[graft.dedup.Dedup.simhashNearDuplicatesFromFingerprints]])
  * finds small-edit variants by Hamming distance — no new join shapes
  * needed.
  *
  * The hash is EXACT INTEGER end to end, so it is a pure function of
  * the decoded pixel grid and replayable by any engine that can
  * compute the pixel formula (q115 replays it in SQL for analytically
  * synthesized images — the first multimodal oracle that re-derives
  * the MATH rather than pinning constants):
  *
  *   - grayscale: `g = 299·R + 587·G + 114·B` (integer, ×1000 scale —
  *     no float luminance);
  *   - nearest-neighbor 8×8 downsample: cell (i, j) samples pixel
  *     `(⌊i·w/8⌋, ⌊j·h/8⌋)` — integer division, no interpolation
  *     (interpolated resamplers vary by platform/filter; this never
  *     does);
  *   - threshold at the integer mean `⌊Σg/64⌋`: bit k = 1 iff
  *     `g_k > mean`, k = j·8 + i.
  *
  * Scale shape: decode+hash is map-only `mapPartitions` (the payload
  * column is dropped before any shuffle — 8 bytes per image move, not
  * megapixels); duplicate grouping is one map-side-combinable
  * aggregate on the hash.
  */
object ImageHash {

  /** 64-bit average-hash of an encoded image (any ImageIO format). */
  def aHash64(bytes: Array[Byte]): Long = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val img = try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(img != null, "unsupported or corrupt image payload")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 1 && h >= 1, s"degenerate image ${w}x$h")
    val pixels = img.getRGB(0, 0, w, h, null, 0, w)
    val g = new Array[Long](64)
    var sum = 0L
    var j = 0
    while (j < 8) {
      val py = j * h / 8
      var i = 0
      while (i < 8) {
        val px = i * w / 8
        val rgb = pixels(py * w + px)
        val v = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        g(j * 8 + i) = v
        sum += v
        i += 1
      }
      j += 1
    }
    val mean = sum / 64
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (g(k) > mean) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** Deterministic synthetic RGB PNG for pattern `p`: pixel (x, y) =
    * (r, g, b) = ((7x+13p) mod 256, (11y+29p) mod 256, (x+y+p) mod
    * 256) — an ANALYTIC pixel grid, so every downstream pixel-derived
    * statistic (the aHash above all) is re-derivable by any engine
    * from the formula alone, while the bytes still round-trip through
    * the real PNG codec. The multimodal analog of
    * [[Multimodal.fakeImageBytes]], but a REAL image.
    */
  def syntheticPngBytes(
      pattern: Int, width: Int = 32, height: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (7 * x + 13 * pattern) % 256
        val g = (11 * y + 29 * pattern) % 256
        val b = (x + y + pattern) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a [[syntheticPngBytes]] payload per row keyed by an
    * integer pattern column (corpus generation for tests/benches;
    * executor-side, batched — no driver materialization).
    */
  def withSyntheticPng(
      df: DataFrame, patternCol: String, outCol: String = "img",
      width: Int = 32, height: Int = 32): DataFrame = {
    val schema0 = df.schema
    val outSchema = StructType(schema0.fields :+
      StructField(outCol, org.apache.spark.sql.types.BinaryType,
        nullable = false))
    val idx = schema0.fieldIndex(patternCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.get(idx) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => sys.error(s"withSyntheticPng: non-integer pattern $other")
        }
        Row.fromSeq(r.toSeq :+ syntheticPngBytes(p, width, height))
      }
    }(Encoders.row(outSchema))
  }

  /** Append the 64-bit perceptual hash of `binaryCol`, dropping the
    * payload by default so downstream stages shuffle 8 bytes per
    * image, never the image. NULL payloads raise (a silent skip would
    * hide corrupt media).
    */
  def withImageHash(
      df: DataFrame, binaryCol: String, outCol: String = "ahash",
      dropBinary: Boolean = true): DataFrame = {
    val schema0 = df.schema
    val outSchema = StructType(schema0.fields :+
      StructField(outCol, LongType, nullable = false))
    val idx = schema0.fieldIndex(binaryCol)
    val hashed = df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(idx)
        require(bytes != null,
          s"withImageHash: NULL $binaryCol — filter corrupt media explicitly")
        Row.fromSeq(r.toSeq :+ aHash64(bytes.asInstanceOf[Array[Byte]]))
      }
    }(Encoders.row(outSchema))
    if (dropBinary) hashed.drop(binaryCol) else hashed
  }

  /** `(id, ahash, canonical_id)` — exact-duplicate grouping on the
    * hash: canonical = smallest id sharing the hash (the
    * [[graft.dedup.Dedup.exactDedup]] keep-min convention). One
    * map-side-combinable min aggregate + one hash-keyed join-back;
    * only (hash, id) pairs ride the shuffle.
    */
  def duplicateGroups(
      df: DataFrame, idCol: String, hashCol: String,
      materialize: Boolean = true): DataFrame = {
    // the hash column is typically a real codec decode (ImageIO /
    // javax.sound) and this plan reads it twice (canonical aggregate +
    // join-back); materialize = true persists the 16-byte (id, hash)
    // projection so the decode runs ONCE — the payload column is
    // dropped BEFORE the checkpoint, so no image bytes are pinned
    val keyed0 = df.select(col(idCol), col(hashCol))
    val keyed = if (materialize) keyed0.localCheckpoint(true) else keyed0
    val canon = keyed.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("canonical_id"))
    keyed.join(canon, Seq(hashCol))
      .select(col(idCol), col(hashCol), col("canonical_id"))
  }
}
