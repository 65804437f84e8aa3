package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MomentsSpec extends SparkSpec {
  import sqlImplicits._

  private def vals(gv: (String, Double)*) = gv.toDF("g", "v")

  test("power sums are exact on a hand-checked group") {
    val sk = Moments.sketch(
      vals("a" -> 1.0, "a" -> 2.0, "a" -> 3.0), "g", "v", decimals = 0)
    val r = sk.head()
    r.getAs[Long]("n") shouldBe 3L
    r.getAs[java.math.BigDecimal]("q_absmax").longValueExact() shouldBe 3L
    r.getAs[java.math.BigDecimal]("s1").longValueExact() shouldBe 6L
    r.getAs[java.math.BigDecimal]("s2").longValueExact() shouldBe 14L
    r.getAs[java.math.BigDecimal]("s3").longValueExact() shouldBe 36L
    r.getAs[java.math.BigDecimal]("s4").longValueExact() shouldBe 98L
  }

  test("finish matches brute-force central moments") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val f = Moments.finish(
      Moments.sketch(vals(xs.map("g" -> _): _*), "g", "v", decimals = 0))
      .head()
    val n = xs.size.toDouble
    val mean = xs.sum / n
    f.getAs[Double]("mean_q") shouldBe mean
    // population variance 4.0 for this classic example
    f.getAs[Double]("var_q2") shouldBe xs.map(x => (x - mean) * (x - mean))
      .sum / n
    // m3·n³ and m4·n⁴ are exact integers: Σ(x−mean)³·n³ etc. — compare
    // against the integer-exact expansion with mean = s1/n rational
    val s1 = xs.sum.toLong
    val qs = xs.map(_.toLong)
    val m3n3 = qs.map(q => { val d = q * n.toLong - s1; d * d * d }).sum
    val m4n4 = qs.map(q => {
      val d = q * n.toLong - s1; d * d * d * d
    }).sum
    f.getAs[java.math.BigDecimal]("m3_n3").longValueExact() shouldBe m3n3 / n.toLong
    f.getAs[java.math.BigDecimal]("m4_n4").longValueExact() shouldBe m4n4 / n.toLong
  }

  test("merging batch sketches equals the sketch of the concatenation") {
    val a = vals("x" -> 1.5, "x" -> 2.5, "y" -> 3.0)
    val b = vals("x" -> 4.0, "z" -> -1.25)
    val merged = Moments.mergeSketches(
      Moments.sketch(a, "g", "v", 2), Moments.sketch(b, "g", "v", 2))
    val whole = Moments.sketch(a.unionAll(b), "g", "v", 2)
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("sketch is order- and partitioning-independent") {
    val data = vals((1 to 100).map(i => s"g${i % 3}" -> (i * 0.37)): _*)
    val one = Moments.sketch(data.repartition(1), "g", "v", 3).collect()
    val many = Moments.sketch(
      data.repartition(13).sortWithinPartitions(desc("v")), "g", "v", 3)
    many.collect().toSet shouldBe one.toSet
  }

  test("negative values keep exact signs through odd powers") {
    val r = Moments.sketch(vals("n" -> -2.0, "n" -> -3.0), "g", "v", 0)
      .head()
    r.getAs[java.math.BigDecimal]("s1").longValueExact() shouldBe -5L
    r.getAs[java.math.BigDecimal]("s3").longValueExact() shouldBe -35L
    r.getAs[java.math.BigDecimal]("q_absmax").longValueExact() shouldBe 3L
  }

  test("NULL values raise instead of silently dropping") {
    val df = Seq(("a", Some(1.0)), ("a", None))
      .toDF("g", "v")
    val ex = intercept[Exception] {
      Moments.sketch(df, "g", "v").collect()
    }
    ex.getMessage should include("NULL v")
  }

  test("outlier gate matches the brute-force sigma rule") {
    // group of 20 near-identical values + one far point
    val data = (1 to 20).map(i => "g" -> (10.0 + (i % 3))) :+ ("g" -> 500.0)
    val got = Moments.flagOutliers(vals(data: _*), "g", "v", k = 3)
      .collect().map(r => r.getAs[Long]("q") -> r.getAs[Boolean]("is_outlier"))
    got.count(_._1 == 500L) shouldBe 1
    got.filter(_._1 == 500L).head._2 shouldBe true
    all(got.filter(_._1 != 500L).map(_._2)) shouldBe false
    // cross-check every flag against the IEEE z-score rule (no
    // boundary-ambiguous points in this construction)
    val xs = data.map(_._2)
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
    got.foreach { case (q, flag) =>
      flag shouldBe math.abs(q - mean) > 3 * sd
    }
  }

  test("outlier gate is per-group") {
    val data = vals("a" -> 1.0, "a" -> 1.0, "a" -> 1.0, "a" -> 100.0,
      "b" -> 100.0, "b" -> 100.0, "b" -> 100.0, "b" -> 100.0)
    val got = Moments.flagOutliers(data, "g", "v", k = 1)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("q")) ->
        r.getAs[Boolean]("is_outlier")).toMap
    got(("a", 100L)) shouldBe true
    got(("b", 100L)) shouldBe false // 100 is b's normal
  }

  test("finish fail-louds past the overflow ceiling") {
    // max|q| = 10^9 with n = 10: the sketch sums still fit
    // (Σq⁴ = 10³⁷ < 10³⁸) but the n³·Σq⁴-scale finish terms would
    // not — the guard must fire BEFORE the decimal arithmetic does
    val big = vals((1 to 10).map(_ => "g" -> 1.0e9): _*)
    val sk = Moments.sketch(big, "g", "v", 0)
    sk.count() shouldBe 1L // sums themselves are representable
    val ex = intercept[Exception] {
      Moments.finish(sk).collect()
    }
    ex.getMessage should include("decimal(38,0) range")
  }
}
