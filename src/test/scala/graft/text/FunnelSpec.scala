package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import sqlImplicits._

  private def rule(name: String, fails: org.apache.spark.sql.Column) =
    QualityFilter.Rule(name, fails)

  test("funnelReport attributes each doc to its FIRST failing stage") {
    // doc: (tokens, a-fails, b-fails). 10|a, 20|a+b (attributed a),
    // 30|b, 40|pass, 50|pass
    val df = Seq(
      (10L, true, false), (20L, true, true), (30L, false, true),
      (40L, false, false), (50L, false, false))
      .toDF("tok", "fa", "fb")
    val rows = Funnel.funnelReport(df,
        Seq(rule("a", col("fa")), rule("b", col("fb"))), col("tok"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    rows shouldBe Array(
      //        docs_in dropped out tokens_in dropped out
      ("a", 5L, 2L, 3L, 150L, 30L, 120L),
      ("b", 3L, 1L, 2L, 120L, 30L, 90L))
  }

  test("funnelReport: stages with no drops still appear, totals telescope") {
    val df = Seq((7L, false), (11L, false)).toDF("tok", "f")
    val rows = Funnel.funnelReport(df,
        Seq(rule("never", col("f"))), col("tok"))
      .collect()
    rows should have length 1
    rows(0).getLong(2) shouldBe 2L  // docs_in
    rows(0).getLong(3) shouldBe 0L  // docs_dropped
    rows(0).getLong(4) shouldBe 2L  // docs_out = survivors
    rows(0).getLong(7) shouldBe 18L // tokens_out
  }

  test("funnelReport: NULL predicate is a pass, NULL weight raises") {
    val df = Seq((Option(5L), Option(true)), (Option(6L), Option.empty[Boolean]))
      .toDF("tok", "f")
    val rows = Funnel.funnelReport(df,
        Seq(rule("s", col("f"))), col("tok"))
      .collect()
    rows(0).getLong(3) shouldBe 1L // only the true row dropped
    rows(0).getLong(4) shouldBe 1L // NULL-predicate row survives
    intercept[Exception] {
      Funnel.funnelReport(
        Seq((Option.empty[Long], false)).toDF("tok", "f"),
        Seq(rule("s", col("f"))), col("tok")).collect()
    }.getMessage should include("token weight")
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelReport(df, Seq.empty, col("tok"))
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelReport(df,
        Seq(rule("s", col("f")), rule("s", col("f"))), col("tok"))
  }

  test("funnelReport matches a sequentially-filtered brute force") {
    val rng = new scala.util.Random(11)
    val docs = Seq.fill(300)((rng.nextInt(100).toLong, rng.nextInt(100)))
    val df = docs.toDF("tok", "x")
    val stages = Seq(
      rule("s0", col("x") % 7 === 0),
      rule("s1", col("x") > 80),
      rule("s2", col("tok") < 10))
    val got = Funnel.funnelReport(df, stages, col("tok"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    // brute force: filter survivors stage by stage
    var cur = docs
    val exp = Seq(
      (x: (Long, Int)) => x._2 % 7 == 0,
      (x: (Long, Int)) => x._2 > 80,
      (x: (Long, Int)) => x._1 < 10).map { p =>
      val (drop, keep) = cur.partition(p)
      val row = (cur.size.toLong, drop.size.toLong, keep.size.toLong,
        cur.map(_._1).sum, drop.map(_._1).sum, keep.map(_._1).sum)
      cur = keep
      row
    }
    got.toSeq shouldBe exp
  }
}
