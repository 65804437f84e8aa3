package graft.vocab

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoverageSpec extends SparkSpec {
  import sqlImplicits._

  // a×5, b×3, c×3, d×1 → total 12, distinct 4.
  private def corpus = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
    Seq.fill(3)("c") ++ Seq("d")).toDF("tok")

  test("golden: exact top-k mass with a tie class at the boundary") {
    val rep = Coverage.coverageReport(corpus, $"tok", Seq(1L, 2L, 3L, 4L, 10L))
      .orderBy($"k").collect()
    // k=1 → a (5/12); k=2 → a + one of {b,c} (8/12) — tie class split
    // exactly; k=3 → 11/12; k=4 and beyond → 12/12.
    rep.map(r => (r.getAs[Long]("k"), r.getAs[Long]("covered_tokens"))) shouldBe
      Array((1L, 5L), (2L, 8L), (3L, 11L), (4L, 12L), (10L, 12L))
    rep.map(_.getAs[Long]("tokens_used")) shouldBe Array(1L, 2L, 3L, 4L, 4L)
    rep.foreach { r =>
      r.getAs[Long]("total_tokens") shouldBe 12L
      r.getAs[Long]("distinct_tokens") shouldBe 4L
      r.getAs[Double]("coverage") shouldBe
        r.getAs[Long]("covered_tokens").toDouble / 12.0
      r.getAs[Double]("oov_rate") shouldBe
        (12L - r.getAs[Long]("covered_tokens")).toDouble / 12.0
    }
  }

  test("coverage is monotone in k and hits 1.0 at the full vocabulary") {
    val rnd = new scala.util.Random(3)
    val big = (1 to 5000).map(_ => s"t${rnd.nextInt(300)}").toDF("tok")
    val ks = Seq(1L, 10L, 50L, 100L, 300L, 1000L)
    val cov = Coverage.coverageReport(big, $"tok", ks)
      .orderBy($"k").select($"coverage").as[Double].collect()
    cov.sliding(2).foreach { case Array(a, b) => b should be >= a; case _ => }
    cov.last shouldBe 1.0
  }

  test("layout-independent") {
    val rnd = new scala.util.Random(9)
    val big = (1 to 2000).map(_ => s"t${rnd.nextInt(100)}").toDF("tok")
    val a = Coverage.coverageReport(big, $"tok", Seq(7L, 31L)).orderBy($"k").collect()
    val b = Coverage.coverageReport(big.repartition(13), $"tok", Seq(7L, 31L))
      .orderBy($"k").collect()
    a shouldBe b
  }

  test("empty or invalid sizes fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Coverage.coverageReport(corpus, $"tok", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Coverage.coverageReport(corpus, $"tok", Seq(0L))
  }
}
