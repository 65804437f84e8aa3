package graft.streaming

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.sql.Timestamp

import javax.imageio.ImageIO

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.ImageHash

/** The multimodal family on a STREAM: image payloads decode and hash
  * statelessly per micro-batch (real ImageIO, the batch operator
  * unchanged — stateless ops are streaming-safe by construction), and
  * the 64-bit perceptual hashes ride the generic fingerprint-banded
  * near-dup state machinery exactly as SimHashes do. Pins the
  * composition the batch side proves in q134, end to end on a
  * MemoryStream.
  */
class MultimodalStreamSpec extends SparkSpec {
  import sqlImplicits._

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image payload stream hashes per batch and pairs near-dup images") {
    implicit val sc = spark.sqlContext
    // two visually identical gradients (one with a tiny corner tweak)
    // and one inverse gradient: the first two must pair, the third not
    val grad = png(16, 16)((x, y) => ((x * 16) << 16) | (y * 16))
    val gradTweak = png(16, 16) { (x, y) =>
      if (x == 0 && y == 0) 0x080808 else ((x * 16) << 16) | (y * 16)
    }
    val inverse = png(16, 16)((x, y) => ((255 - x * 16) << 16) | 0xFF - y)

    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val payloads = input.toDF.toDF("id", "ts", "img")
    val hashed = ImageHash.withImageHash(payloads, "img", outCol = "fp")
    val pairs = Streaming.streamingSimhashNearDuplicatesFromFingerprints(
      hashed, "id", "fp", "ts", maxDistance = 3)
    val q = pairs.writeStream.format("memory")
      .queryName("img_pairs").outputMode("append").start()
    try {
      input.addData(
        (1L, new Timestamp(1000L), grad),
        (2L, new Timestamp(2000L), gradTweak),
        (3L, new Timestamp(3000L), inverse))
      q.processAllAvailable()
      val got = spark.table("img_pairs")
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
        .map(p => (p._1 min p._2, p._1 max p._2)).toSet
      got should contain((1L, 2L))
      got.flatMap(p => Seq(p._1, p._2)) should not contain 3L
    } finally q.stop()
  }
}
