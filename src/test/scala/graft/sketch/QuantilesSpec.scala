package graft.sketch

import org.apache.spark.sql.functions.percent_rank

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import sqlImplicits._

  test("matches the brute-force definition on a known group") {
    // values 1..10 once each: Q(q) = smallest v with cum >= ceil(10q)
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("g", "v")
    val got = Quantiles.grouped(df, Seq("g"), "v", Seq(0.1, 0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    got(0.1) shouldBe 1L
    got(0.25) shouldBe 3L // ceil(2.5) = 3rd value
    got(0.5) shouldBe 5L
    got(0.9) shouldBe 9L
    got(1.0) shouldBe 10L
  }

  test("respects duplicates and skew") {
    val df = (Seq.fill(97)(5L) ++ Seq(1L, 9L, 10L)).map(("g", _)).toDF("g", "v")
    val got = Quantiles.grouped(df, Seq("g"), "v", Seq(0.01, 0.5, 0.98, 0.99))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    got(0.01) shouldBe 1L  // ceil(1) = 1st value
    got(0.5) shouldBe 5L
    got(0.98) shouldBe 5L  // 98 values <= 5
    got(0.99) shouldBe 9L
  }

  test("groups are independent") {
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++
      (1 to 10).map(v => ("b", v * 1000L))).toDF("g", "v")
    val got = Quantiles.grouped(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    got("a") shouldBe 50L
    got("b") shouldBe 5000L
  }

  test("global quantiles with no group columns") {
    val df = (1 to 1000).map(v => Tuple1(v.toLong)).toDF("v")
    val got = Quantiles.grouped(df, Seq.empty, "v", Seq(0.5, 0.999))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    got(0.5) shouldBe 500L
    got(0.999) shouldBe 999L
    Quantiles.grouped(df, Seq.empty, "v", Seq(0.5)).columns shouldBe
      Array("q", "value")
  }

  test("agrees with a sorted-scan reference on random data") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)((rnd.nextInt(40) + 1).toLong)
    val df = vals.map(("g", _)).toDF("g", "v")
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.3, 0.62, 0.77, 0.95)) {
      val expect = sorted(math.ceil(q * vals.size).toInt - 1)
      val got = Quantiles.grouped(df, Seq("g"), "v", Seq(q))
        .head().getLong(2)
      got shouldBe expect
    }
  }

  test("NULL values are not data: quantiles ignore them") {
    val df = (Seq.fill(50)(null: java.lang.Long) ++
      (1L to 10L).map(java.lang.Long.valueOf))
      .map(v => ("g", v)).toDF("g", "v")
    val got = Quantiles.grouped(df, Seq("g"), "v", Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    got(0.5) shouldBe 5L // median over the 10 real values, not 60 rows
    got(1.0) shouldBe 10L
  }

  test("a value column named 'q' or 'value' still computes correctly") {
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("g", "q")
    val got = Quantiles.grouped(df, Seq("g"), "q", Seq(0.5))
      .head().getLong(2)
    got shouldBe 5L
    an[IllegalArgumentException] should be thrownBy
      Quantiles.grouped(df.withColumnRenamed("g", "value"),
        Seq("value"), "q", Seq(0.5))
  }

  test("invalid fractions rejected") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      Quantiles.grouped(df, Seq("g"), "v", Seq(0.0))
    an[IllegalArgumentException] should be thrownBy
      Quantiles.grouped(df, Seq("g"), "v", Seq(1.1))
    an[IllegalArgumentException] should be thrownBy
      Quantiles.grouped(df, Seq("g"), "v", Seq(0.5, 0.5))
  }

  test("group percentile matches percent_rank, ties share the rank") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 60).map(i => (s"g${i % 3}", (i * 7 % 11).toLong, i))
    val df = rows.toDF("g", "v", "id")
    val got = Quantiles.withGroupPercentile(df, Seq("g"), "v")
    // reference: the built-in percent_rank window (small data only)
    val ref = df.withColumn("pct",
      percent_rank().over(Window.partitionBy("g").orderBy("v")))
    got.collect().map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(3))
      .toMap shouldBe
      ref.collect().map(r => (r.getString(0), r.getInt(2)) -> r.getDouble(3))
        .toMap
  }

  test("single-row group gets percentile 0.0") {
    val df = Seq(("a", 5L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val got = Quantiles.withGroupPercentile(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    got(("a", 5L)) shouldBe 0.0
    got(("b", 1L)) shouldBe 0.0
    got(("b", 2L)) shouldBe 1.0
  }

  test("weighted quantiles rank by mass, not rows") {
    // 10 docs of length 1 (1 token each) + 1 doc of length 100
    // (100 tokens): row-median is 1, token-median is 100
    val df = ((1 to 10).map(i => ("g", 1L, 1L)) :+ (("g", 100L, 100L)))
      .toDF("g", "v", "w")
    Quantiles.grouped(df, Seq("g"), "v", Seq(0.5))
      .head().getLong(2) shouldBe 1L
    Quantiles.groupedWeighted(df, Seq("g"), "v", "w", Seq(0.5))
      .head().getLong(2) shouldBe 100L
  }

  test("weighted quantiles match brute-force mass expansion") {
    val rows = (1 to 40).map(i => ("g", (i * 13 % 7).toLong, (i % 4).toLong))
    val df = rows.toDF("g", "v", "w")
    val expanded = rows.flatMap { case (_, v, w) =>
      Seq.fill(w.toInt)(v)
    }.sorted
    val got = Quantiles.groupedWeighted(
      df, Seq("g"), "v", "w", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val rank = math.ceil(q * expanded.size).toInt
      got(q) shouldBe expanded(rank - 1)
    }
  }

  test("weighted quantiles raise on NULL or negative weights") {
    val df = Seq(("g", 1L, Some(2L)), ("g", 2L, None)).toDF("g", "v", "w")
    val ex = intercept[Exception] {
      Quantiles.groupedWeighted(df, Seq("g"), "v", "w", Seq(0.5)).collect()
    }
    ex.getMessage should include("NULL or negative w")
  }

  test("median and MAD match brute force; MAD survives the outlier sigma misses") {
    // 17 values near 10 plus THREE outliers masking each other: they
    // inflate sigma enough that none is 3 sigma from the mean
    val xs = (1 to 17).map(i => 10L + (i % 3)) ++ Seq(1000L, 1000L, 1000L)
    val df = xs.map(("g", _)).toDF("g", "v")
    val r = Quantiles.medianMad(df, Seq("g"), "v").head()
    val sorted = xs.sorted
    val med = sorted(math.ceil(0.5 * xs.size).toInt - 1)
    val mad = xs.map(x => math.abs(x - med)).sorted
      .apply(math.ceil(0.5 * xs.size).toInt - 1)
    r.getLong(1) shouldBe med
    r.getLong(2) shouldBe mad
    // the robust gate flags the outliers; 3σ does NOT (σ inflated)
    val mean = xs.sum.toDouble / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
    (math.abs(1000L - med) > 3 * mad) shouldBe true
    (math.abs(1000.0 - mean) > 3 * sd) shouldBe false
  }

  test("group percentile raises on NULL values") {
    val df = Seq(("g", Some(1L)), ("g", None)).toDF("g", "v")
    val ex = intercept[Exception] {
      Quantiles.withGroupPercentile(df, Seq("g"), "v").collect()
    }
    ex.getMessage should include("NULL v")
  }

  test("group percentile keeps NULL-group rows (null-safe join)") {
    val df = Seq((Option("g"), 1L), (Option("g"), 2L),
      (Option.empty[String], 5L), (Option.empty[String], 6L))
      .toDF("g", "v")
    val got = Quantiles.withGroupPercentile(df, Seq("g"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getDouble(2)).toMap
    got.size shouldBe 4 // no row vanished
    got((None, 5L)) shouldBe 0.0
    got((None, 6L)) shouldBe 1.0
  }

  /** Local replay of the pinned normalization rule. */
  private def localQN(rows: Seq[(String, Long)]): Map[(String, Long), Long] = {
    val pooled = rows.map(_._2).sorted
    val nPool = pooled.size.toLong
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size.toLong
      vs.distinct.map { vv =>
        val before = vs.count(_ < vv).toLong
        val r =
          if (n == 1L) (nPool + 1L) / 2L
          else math.max(1L, (before * nPool + (n - 2L)) / (n - 1L))
        (g, vv) -> pooled((r - 1L).toInt)
      }
    }.toMap
  }

  test("quantileNormalize maps each group onto the pooled scale") {
    // group a: 10..59 (low scorer), group b: 1000..1049 (high scorer):
    // after normalization both groups span the SAME pooled range
    val rows = (0 until 50).map(i => ("a", 10L + i)) ++
      (0 until 50).map(i => ("b", 1000L + i))
    val got = Quantiles.quantileNormalize(
        rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = localQN(rows)
    got shouldBe want
    // the harmonization property: both groups' max maps to the pooled
    // max, both mins to the pooled min's side of the scale
    got(("a", 59L)) shouldBe got(("b", 1049L)) // both p100 → pooled max
    got(("a", 59L)) shouldBe 1049L
    got(("a", 10L)) shouldBe got(("b", 1000L)) // both p0 → pooled min
  }

  test("quantileNormalize: singletons, NULL groups, NULL values") {
    val rows = Seq((Option("a"), 5L), (Option("a"), 7L), (Option("a"), 9L),
      (Option("s"), 100L), // singleton → pooled median rank
      (Option.empty[String], 6L), (Option.empty[String], 8L))
      .toDF("g", "v")
    val got = Quantiles.quantileNormalize(rows, Seq("g"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getLong(2)).toMap
    got.size shouldBe 6 // NULL-group rows survive
    // pooled sorted: 5,6,7,8,9,100 (N=6); singleton rank (6+1)/2 = 3 → 7
    got((Some("s"), 100L)) shouldBe 7L
    // NULL group {6, 8}: before(8)=1, n=2 → rank 6 → pooled max 100
    got((None, 8L)) shouldBe 100L
    got((None, 6L)) shouldBe 5L
    intercept[Exception] {
      Quantiles.quantileNormalize(
        Seq((Option("a"), Option(1L)), (Option("a"), Option.empty[Long]))
          .toDF("g", "v"), Seq("g"), "v").collect()
    }
  }

  test("quantileNormalize matches the local replay on mixed ties") {
    val rows = (0 until 90).map(i =>
      (s"g${i % 3}", (i * 7 % 13).toLong)) // heavy ties across groups
    val got = Quantiles.quantileNormalize(
        rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    got shouldBe localQN(rows)
  }

  test("winsorize clips to the exact in-data group quantiles") {
    // group a: values 1..100 → p05 = 5, p95 = 95; one group b
    val rows = (1L to 100L).map(v => ("a", v)) ++ Seq(("b", 7L), ("b", 9L))
    val got = Quantiles.winsorize(rows.toDF("g", "v"), Seq("g"), "v",
        pLo = 0.05, pHi = 0.95)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    got(("a", 1L)) shouldBe 5L
    got(("a", 4L)) shouldBe 5L
    got(("a", 5L)) shouldBe 5L
    got(("a", 50L)) shouldBe 50L
    got(("a", 95L)) shouldBe 95L
    got(("a", 99L)) shouldBe 95L
    // thresholds are data elements: b's p05 = 7, p95 = 9
    got(("b", 7L)) shouldBe 7L
    got(("b", 9L)) shouldBe 9L
  }

  test("winsorize: NULL values pass through; NULL groups clip in-group") {
    val rows = Seq((Option("a"), Option(1L)), (Option("a"), Option(100L)),
      (Option("a"), Option.empty[Long]),
      (Option.empty[String], Option(3L)), (Option.empty[String], Option(30L)))
      .toDF("g", "v")
    val got = Quantiles.winsorize(rows, Seq("g"), "v", 0.5, 1.0)
      .collect().map(r => (Option(r.getString(0)),
        Option(r.get(1)).map(_.asInstanceOf[Long])) ->
        Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    got((Some("a"), None)) shouldBe None // NULL passes through
    got((Some("a"), Some(1L))) shouldBe Some(1L) // p50 of {1,100} is 1
    got((None, Some(3L))) shouldBe Some(3L)
    got((None, Some(30L))) shouldBe Some(30L) // p100 = 30, unclipped
  }
}
