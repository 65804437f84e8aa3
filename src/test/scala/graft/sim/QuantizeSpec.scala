package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import sqlImplicits._

  private def quantized(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("id", "v")
      .select(col("id"), col("v"), Quantize.int8Scale(col("v")).as("scale"))
      .select(col("id"), col("v"), col("scale"),
        Quantize.int8Codes(col("v"), col("scale")).as("codes"))

  test("codes stay in [-127, 127] and the max-magnitude element hits ±127") {
    val df = quantized(Seq(
      (1L, Seq(0.5f, -2.0f, 1.0f)),
      (2L, Seq(1e-4f, -1e-4f, 3e-5f))))
    val rows = df.select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows(1L) shouldBe Seq(32, -127, 64)  // round(0.5/ (2/127)) = round(31.75)
    rows(1L).map(math.abs).max shouldBe 127
    rows(2L).map(math.abs).max shouldBe 127 // tiny vectors still use the range
  }

  test("all-zero and empty vectors quantize to scale 0 and zero codes") {
    val df = quantized(Seq((1L, Seq(0f, 0f)), (2L, Seq.empty[Float])))
    val rows = df.select(col("id"), col("scale"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toList
    rows.find(_._1 == 1L).get._2 shouldBe 0.0
    rows.find(_._1 == 1L).get._3 shouldBe Seq(0, 0)
    rows.find(_._1 == 2L).get._2 shouldBe 0.0
  }

  test("dequantized reconstruction error is bounded by scale/2 per element") {
    val vecs = (1L to 50L).map { i =>
      i -> (0 until 16).map(j => math.sin(i * 37 + j * 11).toFloat).toSeq
    }
    val rows = quantized(vecs)
      .select(col("id"), col("v"), col("scale"),
        Quantize.dequantize(col("codes"), col("scale")).as("deq"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val deq = r.getSeq[Double](3)
      v.zip(deq).foreach { case (x, d) =>
        math.abs(x.toDouble - d) should be <= (scale / 2 + 1e-12)
      }
    }
  }

  test("integer dot product approximates the float dot product") {
    val vecs = (1L to 40L).map { i =>
      i -> (0 until 32).map(j => math.cos(i * 13 + j * 7).toFloat).toSeq
    }
    val df = quantized(vecs)
    val a = df.select(col("id").as("ida"), col("v").as("va"),
      col("scale").as("sa"), col("codes").as("ca"))
    val b = df.select(col("id").as("idb"), col("v").as("vb"),
      col("scale").as("sb"), col("codes").as("cb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(
        (Quantize.dotInt(col("ca"), col("cb")) * col("sa") * col("sb"))
          .as("qdot"),
        aggregate(zip_with(col("va"), col("vb"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("fdot"))
      .collect()
    pairs.foreach { r =>
      // 32 dims, per-element error <= scale/2 each side; loose bound
      math.abs(r.getDouble(0) - r.getDouble(1)) should be < 0.5
    }
    // and the approximation is actually informative, not constant
    pairs.map(_.getDouble(0)).distinct.length should be > 10
  }
}
