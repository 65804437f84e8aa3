package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import sqlImplicits._

  // group a: exact line y = 2x + 1 ; group b: constant x
  private def rows = Seq(
    ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
    ("b", 4.0, 9.0), ("b", 4.0, 11.0)).toDF("g", "x", "y")

  test("a perfect line is recovered exactly") {
    val out = Trend.fitLines(Trend.sketch(rows, "g", "x", "y"))
      .filter($"group" === "a")
      .select($"slope_q", $"intercept_q").as[(Double, Double)].head()
    out shouldBe ((2.0, 1.0))
  }

  test("a constant-x group fits NULL, not an error") {
    val out = Trend.fitLines(Trend.sketch(rows, "g", "x", "y"))
      .filter($"group" === "b")
      .select($"slope_q", $"intercept_q")
      .as[(Option[Double], Option[Double])].head()
    out shouldBe ((None, None))
  }

  test("least squares on noisy data matches the closed form") {
    // x = 0,1,2 ; y = 0,1,3 -> slope = 3/2, intercept = -1/6
    val df = Seq(("g", 0.0, 0.0), ("g", 1.0, 1.0), ("g", 2.0, 3.0))
      .toDF("g", "x", "y")
    val (s, i) = Trend.fitLines(Trend.sketch(df, "g", "x", "y"))
      .select($"slope_q", $"intercept_q").as[(Double, Double)].head()
    s shouldBe 9.0 / 6.0
    i shouldBe -1.0 / 6.0
  }

  test("sketches merge: split corpus = whole corpus") {
    val half1 = rows.filter($"x" < 2.0)
    val half2 = rows.filter($"x" >= 2.0)
    val merged = Trend.mergeSketches(
      Trend.sketch(half1, "g", "x", "y"),
      Trend.sketch(half2, "g", "x", "y"))
    val whole = Trend.sketch(rows, "g", "x", "y")
    merged.orderBy($"group").collect().toSeq shouldBe
      whole.orderBy($"group").collect().toSeq
  }

  test("quantization: decimals shift values into integer units") {
    val df = Seq(("g", 0.1, 0.25), ("g", 0.2, 0.45)).toDF("g", "x", "y")
    val sk = Trend.sketch(df, "g", "x", "y", xDecimals = 1, yDecimals = 2)
    val r = sk.select($"sx", $"sy").as[(BigDecimal, BigDecimal)].head()
    r._1.toLong shouldBe 3L // 1 + 2
    r._2.toLong shouldBe 70L // 25 + 45
  }

  test("NULL x or y raises") {
    val bad = Seq(("g", Some(1.0), 2.0), ("g", None: Option[Double], 3.0))
      .toDF("g", "x", "y")
    intercept[Exception] {
      Trend.sketch(bad, "g", "x", "y").collect()
    }.getMessage should include("NULL x")
  }

  test("overflow guard fail-louds on oversized magnitudes") {
    val big = Seq(("g", 1e18, 1e18), ("g", 2e18, 2e18)).toDF("g", "x", "y")
    intercept[Exception] {
      Trend.fitLines(Trend.sketch(big, "g", "x", "y")).collect()
    }.getMessage should include("decimal(38,0) range")
  }

  test("sketch is partitioning- and order-independent") {
    val a = Trend.sketch(rows.repartition(7), "g", "x", "y")
      .orderBy($"group").collect().toSeq
    val b = Trend.sketch(rows.orderBy($"y".desc).repartition(1), "g", "x", "y")
      .orderBy($"group").collect().toSeq
    a shouldBe b
  }
}
