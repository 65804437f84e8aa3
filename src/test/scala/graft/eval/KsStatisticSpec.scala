package graft.eval

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KsStatisticSpec extends SparkSpec {
  import sqlImplicits._

  private def side(rows: (String, Long)*) = rows.toDF("g", "v")

  test("identical samples give D = 0") {
    val a = side("x" -> 1L, "x" -> 2L, "x" -> 3L)
    val r = Ranking.ksStatistic(a, a, "v", Seq("g")).head()
    r.getLong(3) shouldBe 0L // d_num
    r.getDouble(4) shouldBe 0.0 // ks
  }

  test("disjoint supports give ks = 1") {
    val a = side("x" -> 1L, "x" -> 2L)
    val b = side("x" -> 10L, "x" -> 11L, "x" -> 12L)
    val r = Ranking.ksStatistic(a, b, "v", Seq("g")).head()
    r.getLong(3) shouldBe 6L // n_a * n_b
    r.getDouble(4) shouldBe 1.0
    r.getLong(5) shouldBe 2L // smallest value attaining the max
  }

  test("hand-checked example: D at the right value") {
    // A = [1,2,2,3], B = [2,4]: cum pairs (1,0)(3,1)(4,1)(4,2),
    // d = |cumA*2 - cumB*4| = 2,2,4,0 -> max 4 at v=3, ks = 4/8 = .5
    val a = side("x" -> 1L, "x" -> 2L, "x" -> 2L, "x" -> 3L)
    val b = side("x" -> 2L, "x" -> 4L)
    val r = Ranking.ksStatistic(a, b, "v", Seq("g")).head()
    r.getLong(1) shouldBe 4L
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 4L
    r.getDouble(4) shouldBe 0.5
    r.getLong(5) shouldBe 3L
  }

  test("ungrouped form works and matches the grouped result") {
    val a = side("x" -> 1L, "x" -> 2L, "x" -> 2L, "x" -> 3L)
    val b = side("x" -> 2L, "x" -> 4L)
    val r = Ranking.ksStatistic(a, b, "v").head()
    r.getLong(2) shouldBe 4L // d_num (no group col in output)
    r.getDouble(3) shouldBe 0.5
  }

  test("a group empty on one side emits NULL statistics, not 0") {
    val a = side("x" -> 1L, "y" -> 5L)
    val b = side("x" -> 2L)
    val rows = Ranking.ksStatistic(a, b, "v", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    rows("y").isNullAt(3) shouldBe true
    rows("y").isNullAt(4) shouldBe true
    rows("y").isNullAt(5) shouldBe true
    rows("x").isNullAt(3) shouldBe false
  }

  test("NULL values raise instead of silently shifting the CDF") {
    val a = Seq(("x", Some(1L)), ("x", None)).toDF("g", "v")
    val b = side("x" -> 2L)
    val e = intercept[Exception] {
      Ranking.ksStatistic(a, b, "v", Seq("g")).collect()
    }
    e.getMessage should include("NULL")
  }

  test("reserved output names are rejected as group columns") {
    an[IllegalArgumentException] should be thrownBy
      Ranking.ksStatistic(side("x" -> 1L).withColumnRenamed("g", "ks"),
        side("x" -> 1L), "v", Seq("ks"))
  }
}
