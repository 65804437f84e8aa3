package graft.eval

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalMetricsSpec extends SparkSpec {
  import sqlImplicits._

  private def ranked(rows: (String, String, Int)*) = rows.toDF("q", "d", "r")
  private def gold(rows: (String, String)*) = rows.toDF("q", "d")

  test("perfect ranking scores ndcg 1.0 and mrr 2^20") {
    val rk = ranked(("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3))
    val g = gold(("q1", "a"), ("q1", "b"), ("q1", "c"))
    val m = RetrievalMetrics.mrrNdcg(rk, g, "q", "d", "r", k = 3).head()
    m.getAs[Long]("mrr_q") shouldBe (1L << 20)
    m.getAs[Long]("dcg_q") shouldBe m.getAs[Long]("idcg_q")
    m.getAs[Double]("ndcg") shouldBe 1.0
  }

  test("matches a hand-computed IEEE NDCG within fixed-point error") {
    // relevant at positions 1 and 3 of 4; one gold item unranked
    val rk = ranked(("q", "a", 1), ("q", "b", 2), ("q", "c", 3),
      ("q", "e", 4))
    val g = gold(("q", "a"), ("q", "c"), ("q", "zz"))
    val m = RetrievalMetrics.mrrNdcg(rk, g, "q", "d", "r", k = 4).head()
    m.getAs[Long]("n_rel") shouldBe 3L
    m.getAs[Long]("first_rel_rank") shouldBe 1L
    val dcg = 1.0 / (math.log(2) / math.log(2)) +
      1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) +
      1.0 / (math.log(4) / math.log(2))
    m.getAs[Double]("ndcg") shouldBe (dcg / idcg) +- 1e-4
  }

  test("no relevant in the corpus yields NULL ndcg, not zero") {
    val m = RetrievalMetrics.mrrNdcg(
      ranked(("q", "a", 1)), gold(("other", "x")), "q", "d", "r").head()
    m.getAs[Long]("n_rel") shouldBe 0L
    m.getAs[Long]("mrr_q") shouldBe 0L
    m.isNullAt(m.fieldIndex("ndcg")) shouldBe true
  }

  test("relevant items past k do not count; idcg caps at k") {
    val rk = ranked(("q", "a", 1), ("q", "b", 2))
    val g = gold((1 to 20).map(i => ("q", s"g$i")): _*)
    val m = RetrievalMetrics.mrrNdcg(rk, g, "q", "d", "r", k = 2).head()
    // idcg = prefix sum of the first 2 discounts even with 20 gold
    m.getAs[Long]("idcg_q") shouldBe
      (RetrievalMetrics.invDiscountQ20(1) + RetrievalMetrics.invDiscountQ20(2))
  }

  test("mrr uses the FIRST relevant rank") {
    val rk = ranked(("q", "a", 1), ("q", "b", 2), ("q", "c", 3))
    val g = gold(("q", "b"), ("q", "c"))
    val m = RetrievalMetrics.mrrNdcg(rk, g, "q", "d", "r").head()
    m.getAs[Long]("first_rel_rank") shouldBe 2L
    m.getAs[Long]("mrr_q") shouldBe (1L << 20) / 2
  }
}
