package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FightinWordsSpec extends SparkSpec {
  import sqlImplicits._

  private def docs = Seq(
    ("A", "alpha alpha shared"),
    ("A", "alpha shared"),
    ("B", "beta shared"),
    ("B", "beta beta shared shared")).toDF("corpus", "text")

  private def table = FightinWords.logOdds(docs, "text", $"corpus" === "A")

  test("tokens skewed to A get positive delta, to B negative") {
    val m = table.select($"token", $"delta_q20").as[(String, Long)]
      .collect().toMap
    m("alpha") should be > 0L
    m("beta") should be < 0L
  }

  test("delta matches the closed form computed on the driver") {
    import graft.text.Dsir.ilog2Q20
    // corpus A: alpha=3, shared=2 (total 5); B: beta=3, shared=3 (total 6)
    // V = 3, alpha prior = 1
    def L(x: Long) = ilog2Q20(x << 20)
    def delta(a: Long, b: Long): Long =
      L(a + 1) - L(5 + 3 - a - 1) - (L(b + 1) - L(6 + 3 - b - 1))
    val m = table.select($"token", $"delta_q20").as[(String, Long)]
      .collect().toMap
    m("alpha") shouldBe delta(3, 0)
    m("shared") shouldBe delta(2, 3)
    m("beta") shouldBe delta(0, 3)
  }

  test("variance shrinks with evidence (rare words are less trusted)") {
    val m = table.select($"token", $"var_est").as[(String, Double)]
      .collect().toMap
    // shared: seen on both sides -> smallest variance
    m("shared") should be < m("alpha")
    m("shared") should be < m("beta")
    m("shared") shouldBe (2.0 + 3.0 + 2.0) / ((2.0 + 1.0) * (3.0 + 1.0))
  }

  test("an empty corpus raises") {
    val oneSided = docs.filter($"corpus" === "A")
    intercept[Exception] {
      FightinWords.logOdds(oneSided, "text", $"corpus" === "A").collect()
    }.getMessage should include("one corpus is empty")
  }

  test("result is partitioning-independent (integer end to end)") {
    val a = FightinWords.logOdds(docs.repartition(7), "text",
      $"corpus" === "A").orderBy($"token").collect().toSeq
    val b = FightinWords.logOdds(docs.repartition(1), "text",
      $"corpus" === "A").orderBy($"token").collect().toSeq
    a shouldBe b
  }

  test("no nested-loop join (scalar totals ride the constant-key join)") {
    val plan = table.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
