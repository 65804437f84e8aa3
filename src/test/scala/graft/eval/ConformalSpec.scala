package graft.eval

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import sqlImplicits._

  private def run(scores: Seq[Long], aNum: Long, aDen: Long) = {
    val r = Conformal.thresholds(
      scores.toDF("s"), Nil, "s", aNum, aDen).collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("rank"),
      Option(r.get(r.fieldIndex("threshold"))).map(_.asInstanceOf[Long]))
  }

  test("finite-sample rank: ceil((n+1)(1-alpha)/1) picks the element") {
    // n=10, alpha=1/10: rank = ceil(11*9/10) = ceil(9.9) = 10
    run((1L to 10L), 1, 10) shouldBe ((10L, 10L, Some(10L)))
    // n=10, alpha=1/2: rank = ceil(11/2) = 6
    run((1L to 10L), 1, 2) shouldBe ((10L, 6L, Some(6L)))
    // exact division: n=9, alpha=1/2 -> rank = ceil(10*1/2) = 5
    run((1L to 9L), 1, 2) shouldBe ((9L, 5L, Some(5L)))
  }

  test("rank past n yields NULL, never a silent max clamp") {
    // n=5, alpha=1/10: rank = ceil(6*9/10) = 6 > 5
    run((1L to 5L), 1, 10) shouldBe ((5L, 6L, None))
  }

  test("ties: the rank-th smallest counts duplicates") {
    // scores 1,1,1,2: n=4, alpha=1/2 -> rank = ceil(5/2) = 3 -> value 1
    run(Seq(1L, 1L, 1L, 2L), 1, 2) shouldBe ((4L, 3L, Some(1L)))
  }

  test("grouped thresholds are independent and layout-stable") {
    val rows = Seq("a", "b").flatMap(g =>
      (1L to (if (g == "a") 20L else 8L)).map(s => (g, s * 10)))
    def got(d: org.apache.spark.sql.DataFrame) =
      Conformal.thresholds(d, Seq("g"), "s", 1, 4).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("rank"),
            r.getAs[Long]("threshold")))).toMap
    val a = got(rows.toDF("g", "s"))
    // a: n=20, rank = ceil(21*3/4) = 16 -> 160
    a("a") shouldBe ((20L, 16L, 160L))
    // b: n=8, rank = ceil(27/4) = 7 -> 70
    a("b") shouldBe ((8L, 7L, 70L))
    got(rows.toDF("g", "s").repartition(7)) shouldBe a
  }

  test("a group too large for the rank product raises, never wraps") {
    // aDen = 2^62: nMax = 0, so even a 2-row group would overflow
    // (n+1)·(aDen−aNum) in long arithmetic — fail loud, not a wrong
    // (possibly negative) rank
    intercept[Exception] {
      Conformal.thresholds(
        Seq(1L, 2L).toDF("s"), Nil, "s", 1L, 1L << 62).collect()
    }
  }

  test("NULL scores and degenerate alpha raise") {
    intercept[Exception] {
      Conformal.thresholds(
        Seq(Option.empty[Long]).toDF("s"), Nil, "s", 1, 2).collect()
    }
    intercept[IllegalArgumentException] {
      Conformal.thresholds(Seq(1L).toDF("s"), Nil, "s", 2, 2)
    }
  }
}
