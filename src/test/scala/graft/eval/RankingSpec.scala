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
}
