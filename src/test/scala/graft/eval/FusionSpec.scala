package graft.eval

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import sqlImplicits._

  private def list(rows: (String, String, Int)*) =
    rows.toDF("q", "d", "r")

  test("fused score is the exact integer sum of 2^20 div (60 + rank)") {
    val a = list(("q1", "d1", 1), ("q1", "d2", 2))
    val b = list(("q1", "d2", 1), ("q1", "d3", 2))
    val got = Fusion.rrfFuse(Seq(a, b), "q", "d", "r")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val u = 1L << 20
    got(("q1", "d1")) shouldBe (u / 61, 1L)
    got(("q1", "d2")) shouldBe (u / 62 + u / 61, 2L)
    got(("q1", "d3")) shouldBe (u / 62, 1L)
    // agreement wins: d2 (ranked by both) beats d1 (rank 1 in one)
    got(("q1", "d2"))._1 should be > got(("q1", "d1"))._1
  }

  test("fusion is per-query: same item under different queries stays apart") {
    val a = list(("q1", "d", 1), ("q2", "d", 5))
    val got = Fusion.rrfFuse(Seq(a), "q", "d", "r")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    got("q1") shouldBe (1L << 20) / 61
    got("q2") shouldBe (1L << 20) / 65
  }

  test("single-list fusion is a monotone transform of the input ranks") {
    val a = list((1 to 50).map(i => ("q", s"d$i", i)): _*)
    val got = Fusion.rrfFuse(Seq(a), "q", "d", "r")
      .orderBy(desc("rrf_q"), col("item"))
      .collect().map(_.getString(1))
    // descending fused score recovers ascending rank order (ranks this
    // shallow never tie at Q20)
    got.take(5) shouldBe Array("d1", "d2", "d3", "d4", "d5")
  }

  test("result is order- and partitioning-independent") {
    val a = list((1 to 100).map(i => (s"q${i % 5}", s"d${i % 17}", i % 9 + 1)): _*)
    val b = list((1 to 80).map(i => (s"q${i % 5}", s"d${i % 13}", i % 7 + 1)): _*)
    val base = Fusion.rrfFuse(Seq(a, b), "q", "d", "r").collect().toSet
    val flipped = Fusion.rrfFuse(
      Seq(b.repartition(7), a.repartition(3)), "q", "d", "r")
      .collect().toSet
    flipped shouldBe base
  }

  test("zero and NULL ranks raise instead of dominating the fusion") {
    val bad = list(("q", "d", 0))
    val ex = intercept[Exception] {
      Fusion.rrfFuse(Seq(bad), "q", "d", "r").collect()
    }
    ex.getMessage should include("1-based")
    val badNull = Seq(("q", "d", None: Option[Int])).toDF("q", "d", "r")
    val ex2 = intercept[Exception] {
      Fusion.rrfFuse(Seq(badNull), "q", "d", "r").collect()
    }
    ex2.getMessage should include("1-based")
  }

  test("deeper shift separates deep ranks that Q20 ties") {
    val a = list(("q", "x", 4001), ("q", "y", 4002))
    val q20 = Fusion.rrfFuse(Seq(a), "q", "d", "r", shift = 20)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    q20("x") shouldBe q20("y") // tied at Q20
    val q30 = Fusion.rrfFuse(Seq(a), "q", "d", "r", shift = 30)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    q30("x") should be > q30("y")
  }
}
