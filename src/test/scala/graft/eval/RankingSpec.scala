package graft.eval

import graft.SparkSpec

/** Exact tie-aware ROC-AUC. */
class RankingSpec extends SparkSpec {
  import sqlImplicits._

  test("perfect, inverted, and random-coin rankings") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    Ranking.rocAuc(perfect, "score", "label")
      .collect().head.getDouble(0) shouldBe 1.0
    val inverted = Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))
      .toDF("score", "label")
    Ranking.rocAuc(inverted, "score", "label")
      .collect().head.getDouble(0) shouldBe 0.0
    val coin = Seq((0.5, 1), (0.5, 0)).toDF("score", "label")
    Ranking.rocAuc(coin, "score", "label")
      .collect().head.getDouble(0) shouldBe 0.5 // ties count half
  }

  test("matches a brute-force pair count on random data with heavy ties") {
    val rng = new scala.util.Random(41)
    val rows = Seq.fill(300)((rng.nextInt(12).toDouble, rng.nextInt(2)))
    val df = rows.toDF("score", "label")
    val got = Ranking.rocAuc(df, "score", "label").collect().head.getDouble(0)
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    got shouldBe num.toDouble / (2L * pos.size * neg.size).toDouble
  }

  test("grouped AUC computes per group and NULLs degenerate groups") {
    val df = Seq(
      ("a", 0.9, 1), ("a", 0.1, 0),      // perfect within a
      ("b", 0.1, 1), ("b", 0.9, 0),      // inverted within b
      ("c", 0.5, 1), ("c", 0.6, 1))      // no negatives: undefined
      .toDF("g", "score", "label")
    val out = Ranking.rocAuc(df, "score", "label", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    out("a") shouldBe Some(1.0)
    out("b") shouldBe Some(0.0)
    out("c") shouldBe None
  }

  test("non-binary or NULL labels fail loudly") {
    val bad = Seq((0.5, 2)).toDF("score", "label")
    val e = intercept[Exception] {
      Ranking.rocAuc(bad, "score", "label").collect()
    }
    e.getMessage should include("must be 0/1")
  }

  test("prCurve matches hand-computed operating points with ties") {
    // scores: 0.9:{1}, 0.5:{1,0}, 0.1:{0}  (a tie block at 0.5)
    val df = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0))
      .toDF("score", "label")
    val rows = Ranking.prCurve(df, "score", "label")
      .orderBy(org.apache.spark.sql.functions.col("threshold").desc)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    rows shouldBe Array(
      // t=0.9: tp=1 fp=0 fn=1  P=1    R=0.5  F1=2/3
      (0.9, 1L, 0L, 1L, 1.0, 0.5, 2.0 / 3.0),
      // t=0.5: tp=2 fp=1 fn=0  P=2/3  R=1    F1=4/5
      (0.5, 2L, 1L, 0L, 2.0 / 3.0, 1.0, 0.8),
      // t=0.1: tp=2 fp=2 fn=0  P=1/2  R=1    F1=2/3
      (0.1, 2L, 2L, 0L, 0.5, 1.0, 2.0 / 3.0))
  }

  test("prCurve on a positive-free group: recall NULL, precision 0, f1 0") {
    val df = Seq(("g1", 0.7, 0), ("g1", 0.3, 0), ("g2", 0.5, 1))
      .toDF("g", "score", "label")
    val out = Ranking.prCurve(df, "score", "label", Seq("g"))
    val g1 = out.filter(org.apache.spark.sql.functions.col("g") === "g1")
      .orderBy(org.apache.spark.sql.functions.col("threshold").desc)
      .collect()
    g1.length shouldBe 2
    g1.foreach { r =>
      r.isNullAt(6) shouldBe true        // recall undefined
      r.getDouble(5) shouldBe 0.0        // precision = 0/(0+fp)
      r.getDouble(7) shouldBe 0.0        // f1 = 0
    }
    // and the healthy group is unaffected
    val g2 = out.filter(org.apache.spark.sql.functions.col("g") === "g2")
      .collect().head
    g2.getDouble(5) shouldBe 1.0
    g2.getDouble(6) shouldBe 1.0
  }

  test("cohensKappa matches hand-computed values and the sklearn identity") {
    // confusion: n11=20 n10=5 n01=10 n00=15, N=50
    val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(15)((0, 0))
    val df = rows.toDF("a", "b")
    val got = Ranking.cohensKappa(df, "a", "b").collect().head
    // po = 35/50, pe = (25·30 + 25·20)/2500 = 0.5 -> κ = 0.4
    got.getDouble(0) shouldBe 0.4 +- 1e-15
    got.getLong(1) shouldBe 50L
  }

  test("cohensKappa: perfect agreement 1, perfect disagreement negative, constant NULL") {
    Ranking.cohensKappa(
      Seq((1, 1), (0, 0), (1, 1)).toDF("a", "b"), "a", "b")
      .collect().head.getDouble(0) shouldBe 1.0
    Ranking.cohensKappa(
      Seq((1, 0), (0, 1)).toDF("a", "b"), "a", "b")
      .collect().head.getDouble(0) shouldBe -1.0
    // both labelings constant: chance agreement 1, kappa undefined
    Ranking.cohensKappa(
      Seq((1, 1), (1, 1)).toDF("a", "b"), "a", "b")
      .collect().head.isNullAt(0) shouldBe true
  }

  test("cohensKappa groups independently and guards labels") {
    val df = Seq(("g1", 1, 1), ("g1", 0, 0), ("g2", 1, 0), ("g2", 0, 1))
      .toDF("g", "a", "b")
    val out = Ranking.cohensKappa(df, "a", "b", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("g1") shouldBe 1.0
    out("g2") shouldBe -1.0
    intercept[Exception] {
      Ranking.cohensKappa(Seq((2, 1)).toDF("a", "b"), "a", "b").collect()
    }.getMessage should include("must be 0/1")
  }

  test("calibrationTable bins, counts, and single-divide means are exact") {
    // scale=100, bins=10: predQ 95,95 -> bin 9; 42 -> bin 4; 100 -> bin 9
    val df = Seq((95L, 1), (95L, 0), (42L, 0), (100L, 1))
      .toDF("pq", "label")
    val rows = Ranking.calibrationTable(df, "pq", 100L, "label", bins = 10)
      .orderBy(org.apache.spark.sql.functions.col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows shouldBe Array(
      (4L, 1L, 0L, 42.0 / 100.0, 0.0, 0.0 - 42.0 / 100.0),
      (9L, 3L, 2L, 290.0 / 300.0, 2.0 / 3.0, 2.0 / 3.0 - 290.0 / 300.0))
  }

  test("calibrationTable groups independently and guards inputs") {
    val df = Seq(("g1", 50L, 1), ("g2", 50L, 0)).toDF("g", "pq", "label")
    val out = Ranking.calibrationTable(df, "pq", 100L, "label",
        bins = 10, groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    out("g1") shouldBe 1.0 - 0.5
    out("g2") shouldBe 0.0 - 0.5
    intercept[Exception] {
      Ranking.calibrationTable(
        Seq((101L, 1)).toDF("pq", "label"), "pq", 100L, "label").collect()
    }.getMessage should include("[0, 100]")
    intercept[Exception] {
      Ranking.calibrationTable(
        Seq((50L, 7)).toDF("pq", "label"), "pq", 100L, "label").collect()
    }.getMessage should include("must be 0/1")
  }

  test("calibrationSummary ece/mce/brier match hand-computed exact rationals") {
    // scale=100, bins=10. Rows: (95,1) (95,0) -> bin 9; (42,0) -> bin 4;
    // (100,1) -> bin 9 (clamped).
    // bin 4: n=1 np=0 sq=42  -> |100*0-42|  = 42;  sq2 = 42²            = 1764
    // bin 9: n=3 np=2 sq=290 -> |100*2-290| = 90;  sq2 = 25+9025+0      = 9050
    // ece = (42+90)/(4*100);  mce = max(42/100, 90/300);
    // brier = (1764+9050)/(4*10000)
    val df = Seq((95L, 1), (95L, 0), (42L, 0), (100L, 1))
      .toDF("pq", "label")
    val r = Ranking.calibrationSummary(df, "pq", 100L, "label", bins = 10)
      .collect()
    r should have length 1
    r(0).getLong(0) shouldBe 4L
    r(0).getDouble(1) shouldBe 132.0 / 400.0
    r(0).getDouble(2) shouldBe 42.0 / 100.0
    r(0).getDouble(3) shouldBe 10814.0 / 40000.0
  }

  test("calibrationSummary: perfect predictor scores 0, groups independent") {
    // predQ = 100*y exactly: ece = mce = brier = 0 in exact arithmetic.
    val perfect = Seq((100L, 1), (0L, 0), (100L, 1), (0L, 0))
      .toDF("pq", "label")
    val p = Ranking.calibrationSummary(perfect, "pq", 100L, "label").collect()
    (p(0).getDouble(1), p(0).getDouble(2), p(0).getDouble(3)) shouldBe
      ((0.0, 0.0, 0.0))
    val grouped = Seq(("g1", 100L, 1), ("g2", 0L, 1)).toDF("g", "pq", "label")
    val out = Ranking.calibrationSummary(grouped, "pq", 100L, "label",
        groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    out("g1") shouldBe 0.0 // brier: (100-100)²
    out("g2") shouldBe 1.0 // brier: (0-100)²/10000
    intercept[Exception] {
      Ranking.calibrationSummary(
        Seq((-1L, 1)).toDF("pq", "label"), "pq", 100L, "label").collect()
    }.getMessage should include("[0, 100]")
  }

  test("prCurve totals at the lowest threshold cover the whole group") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(400)((rng.nextInt(15).toDouble, rng.nextInt(2)))
    val df = rows.toDF("score", "label")
    val last = Ranking.prCurve(df, "score", "label")
      .orderBy(org.apache.spark.sql.functions.col("threshold"))
      .collect().head
    last.getLong(1) shouldBe rows.count(_._2 == 1).toLong // tp = all pos
    last.getLong(2) shouldBe rows.count(_._2 == 0).toLong // fp = all neg
    last.getLong(3) shouldBe 0L                           // fn = 0
    last.getDouble(5) shouldBe 1.0                        // recall 1
  }
}
