package graft.operators

import graft.SparkSpec

class ChangePointSpec extends SparkSpec {
  import sqlImplicits._

  /** The textbook sequential recurrences, as ground truth. */
  private def localCusum(xs: Seq[Long], k: Long): Seq[(Long, Long)] =
    xs.scanLeft((0L, 0L)) { case ((hi, lo), x) =>
      (math.max(0L, hi + (x - k)), math.max(0L, lo + (k - x)))
    }.tail

  private def run(xs: Seq[Long], k: Long, threshold: Long) =
    ChangePoint.cusum(
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x"),
      Nil, "t", "x", k, threshold)
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("cusum_high"), r.getAs[Long]("cusum_low"),
        r.getAs[Boolean]("alarm_high"), r.getAs[Boolean]("alarm_low")))
      .toSeq

  test("closed form matches the sequential recurrence") {
    val xs = Seq(10L, 9L, 11L, 10L, 25L, 24L, 26L, 2L, 3L, 10L, 10L)
    val expect = localCusum(xs, k = 10L)
    run(xs, 10L, 20L).map(t => (t._1, t._2)) shouldBe expect
  }

  test("an immediate shift registers from the first bucket") {
    // the empty-prefix term: C never dips below C_0 = 0 here, yet the
    // very first +15 deviation must count
    run(Seq(25L, 25L), 10L, 20L) shouldBe
      Seq((15L, 0L, false, false), (30L, 0L, true, false))
  }

  test("sustained small drops accumulate on the low side") {
    val got = run(Seq(10L, 7L, 7L, 7L, 7L, 7L), 10L, 10L)
    got.map(_._2) shouldBe Seq(0L, 3L, 6L, 9L, 12L, 15L)
    got.map(_._4) shouldBe Seq(false, false, false, false, true, true)
  }

  test("a recovered spike resets (the max(0, .) floor)") {
    val xs = Seq(30L, 10L, 10L, 5L, 5L, 10L)
    val expect = localCusum(xs, 10L)
    run(xs, 10L, 100L).map(t => (t._1, t._2)) shouldBe expect
    expect.last._1 shouldBe 10L // the +20 spike decayed, then floored
  }

  test("grouped series are independent and layout-stable") {
    val rows = for {
      g <- Seq("a", "b"); t <- 0L until 20L
    } yield (g, t, if (g == "a" && t >= 10) 30L else 10L)
    val df = rows.toDF("g", "t", "x")
    def got(d: org.apache.spark.sql.DataFrame) =
      ChangePoint.cusum(d, Seq("g"), "t", "x", 10L, 50L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getAs[Long]("cusum_high"), r.getAs[Boolean]("alarm_high"))))
        .toMap
    val a = got(df)
    a(("a", 12L)) shouldBe ((60L, true))
    a(("b", 19L)) shouldBe ((0L, false))
    got(df.repartition(7)) shouldBe a
  }

  test("NULL values raise") {
    val df = Seq((0L, Some(1L)), (1L, None)).toDF("t", "x")
    intercept[Exception] {
      ChangePoint.cusum(df, Nil, "t", "x", 0L, 1L).collect()
    }
  }
}
