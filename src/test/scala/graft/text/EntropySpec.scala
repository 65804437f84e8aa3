package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {
  import sqlImplicits._

  private def ref(text: String): (Long, Long, Long) = {
    // Independent Q20 reference via the scalar ilog2Q20.
    val counts = text.groupBy(identity).map(_._2.length.toLong)
    val n = text.length.toLong
    def l(x: Long) = graft.text.Dsir.ilog2Q20(x << 20)
    val num = n * l(n) - counts.map(c => c * l(c)).sum
    (n, counts.size.toLong, num)
  }

  test("golden: matches the scalar Q20 reference on mixed documents") {
    val docs = Seq((1L, "aaabbc"), (2L, "abcdef"), (3L, "aaaaaa"),
      (4L, "the quick brown fox"), (5L, "x"))
      .toDF("id", "text")
    val out = Entropy.charEntropy(docs, Seq("id"), $"text")
      .orderBy($"id").collect()
    out.length shouldBe 5
    out.foreach { r =>
      val (n, dc, num) =
        ref(Seq("aaabbc", "abcdef", "aaaaaa", "the quick brown fox", "x")(
          r.getAs[Long]("id").toInt - 1))
      r.getAs[Long]("n_chars") shouldBe n
      r.getAs[Long]("distinct_chars") shouldBe dc
      r.getAs[Long]("entropy_num_q20") shouldBe num
      r.getAs[Double]("entropy_bits") shouldBe
        num.toDouble / (n * 1048576L).toDouble
    }
  }

  test("entropy separates prose, floods, and uniform noise") {
    val flood = "a" * 200
    val prose = "it was the best of times it was the worst of times " * 4
    val noise = (0 until 200).map(i => ((i * 131) % 94 + 33).toChar).mkString
    val out = Entropy.charEntropy(
      Seq((1L, flood), (2L, prose), (3L, noise)).toDF("id", "text"),
      Seq("id"), $"text")
      .orderBy($"id").select($"entropy_bits").as[Double].collect()
    out(0) shouldBe 0.0 // single-char flood: zero entropy
    out(1) should (be > 2.5 and be < 4.5) // prose band
    out(2) should be > 6.0 // near-uniform printable noise
    out(1) should be > out(0)
    out(2) should be > out(1)
  }

  test("empty text produces no row; single char produces zero entropy") {
    val out = Entropy.charEntropy(
      Seq((1L, ""), (2L, "z")).toDF("id", "text"), Seq("id"), $"text")
      .orderBy($"id").collect()
    out.map(_.getAs[Long]("id")) shouldBe Array(2L)
    out.head.getAs[Long]("entropy_num_q20") shouldBe 0L
    out.head.getAs[Double]("entropy_bits") shouldBe 0.0
  }

  test("layout-independent") {
    val rnd = new scala.util.Random(17)
    val docs = (1 to 50).map(i =>
      (i.toLong, (1 to 300).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString))
      .toDF("id", "text")
    val a = Entropy.charEntropy(docs, Seq("id"), $"text").orderBy($"id").collect()
    val b = Entropy.charEntropy(docs.repartition(7), Seq("id"), $"text")
      .orderBy($"id").collect()
    a shouldBe b
  }
}
