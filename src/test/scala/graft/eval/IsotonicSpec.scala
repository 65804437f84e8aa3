package graft.eval

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import sqlImplicits._

  // rows (predQ, label) expanded from per-bin (n, n_pos)
  private def rowsFor(bins: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    bins.flatMap { case (q, n, pos) =>
      Seq.fill(pos.toInt)((q, 1L)) ++ Seq.fill((n - pos).toInt)((q, 0L))
    }

  private def fit(bins: Seq[(Long, Long, Long)]) =
    Isotonic.fitCalibration(
      rowsFor(bins).toDF("predQ", "y"), Nil, "predQ", "y")
      .collect()
      .map(r => r.getAs[Long]("predQ") ->
        ((r.getAs[Long]("cal_num"), r.getAs[Long]("cal_den"),
          r.getAs[Double]("calibrated"))))
      .toMap

  test("already-isotonic bins pass through untouched") {
    val got = fit(Seq((0L, 4L, 1L), (1L, 4L, 2L), (2L, 4L, 3L)))
    got shouldBe Map(
      0L -> ((1L, 4L, 0.25)), 1L -> ((2L, 4L, 0.5)), 2L -> ((3L, 4L, 0.75)))
  }

  test("a violating pair pools to its weighted mean") {
    // means 0.75 then 0.25 violate -> pool (4/8 = 0.5) for both bins
    val got = fit(Seq((0L, 4L, 3L), (1L, 4L, 1L)))
    got shouldBe Map(0L -> ((4L, 8L, 0.5)), 1L -> ((4L, 8L, 0.5)))
  }

  test("cascading merge: a low late bin drags earlier pools down") {
    // 0.2, 0.8, 0.0: (0.8, 0.0) pool to 0.4; 0.2 <= 0.4 stands.
    val got = fit(Seq((0L, 5L, 1L), (1L, 5L, 4L), (2L, 5L, 0L)))
    got(0L) shouldBe ((1L, 5L, 0.2))
    got(1L) shouldBe ((4L, 10L, 0.4))
    got(2L) shouldBe ((4L, 10L, 0.4))
    // all-violating sequence pools to the global mean
    val all = fit(Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 2L, 0L)))
    all.values.toSet shouldBe Set((3L, 6L, 0.5))
  }

  test("calibrated values are non-decreasing in predQ") {
    val bins = (0L until 20L).map(q => (q, 10L, (q * 7 + 3) % 11))
    val got = fit(bins).toSeq.sortBy(_._1).map(_._2._3)
    got shouldBe got.sorted
  }

  test("grouped fits are independent and layout-stable") {
    val rows = Seq("a", "b").flatMap { grp =>
      rowsFor(Seq((0L, 4L, if (grp == "a") 3L else 1L), (1L, 4L, 2L)))
        .map { case (q, y) => (grp, q, y) }
    }
    val df = rows.toDF("g", "predQ", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Isotonic.fitCalibration(d, Seq("g"), "predQ", "y")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(6)).toMap
    val a = run(df)
    a(("a", 0L)) shouldBe 0.625 // (3+2)/8 pooled
    a(("a", 1L)) shouldBe 0.625
    a(("b", 0L)) shouldBe 0.25 // isotonic already
    a(("b", 1L)) shouldBe 0.5
    run(df.repartition(7)) shouldBe a
  }

  test("applyCalibration joins the bin value; unseen bins get NULL") {
    val mapping = Isotonic.fitCalibration(
      rowsFor(Seq((0L, 4L, 1L), (1L, 4L, 3L))).toDF("predQ", "y"),
      Nil, "predQ", "y")
    val got = Isotonic.applyCalibration(
      Seq(0L, 1L, 9L).toDF("predQ"), mapping, Nil, "predQ")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    got shouldBe Map(0L -> Some(0.25), 1L -> Some(0.75), 9L -> None)
  }

  test("applyCalibration matches NULL-group bins null-safely") {
    // fitCalibration's groupBy RETAINS a NULL group key — a bin the
    // fit saw; apply must serve it (=== would return NULL for every
    // NULL-group row, silently treating a fitted bin as unseen)
    val rows = Seq(
      (Option("a"), 0L, 0L), (Option("a"), 0L, 1L),
      (Option.empty[String], 0L, 1L), (Option.empty[String], 0L, 1L))
    val mapping = Isotonic.fitCalibration(
      rows.toDF("g", "predQ", "y"), Seq("g"), "predQ", "y")
    val got = Isotonic.applyCalibration(
      Seq((Option("a"), 0L), (Option.empty[String], 0L))
        .toDF("g", "predQ"),
      mapping, Seq("g"), "predQ")
      .collect()
      .map(r => Option(r.getString(0)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    got shouldBe Map(Some("a") -> Some(0.5), None -> Some(1.0))
  }

  test("bad labels, negative predictions and the bin cap raise") {
    intercept[Exception] {
      Isotonic.fitCalibration(
        Seq((0L, 2L)).toDF("predQ", "y"), Nil, "predQ", "y").collect()
    }
    intercept[Exception] {
      Isotonic.fitCalibration(
        Seq((-1L, 1L)).toDF("predQ", "y"), Nil, "predQ", "y").collect()
    }
    intercept[IllegalArgumentException] {
      Isotonic.fitCalibration(
        rowsFor(Seq((0L, 1L, 1L), (1L, 1L, 0L))).toDF("predQ", "y"),
        Nil, "predQ", "y", maxBins = 1L)
    }
  }
}
