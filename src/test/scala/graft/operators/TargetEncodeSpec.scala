package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TargetEncodeSpec extends SparkSpec {
  import sqlImplicits._

  // cat a: targets 1.00, 3.00 ; cat b: 5.00 (singleton); global mean 3.00
  private def rows = Seq(
    (1L, "a", 1.00), (2L, "a", 3.00), (3L, "b", 5.00))
    .toDF("id", "cat", "y")

  test("encoding table shrinks category means toward the global mean") {
    val t = TargetEncode.encodingTable(rows, "cat", "y", k = 1L)
      .orderBy($"cat").as[(String, Long, Double)].collect()
    // a: (4 + 1*3) / (2+1) = 7/3 ; b: (5 + 3) / 2 = 4
    t.toSeq shouldBe Seq(("a", 2L, 7.0 / 3.0), ("b", 1L, 4.0))
  }

  test("k=0 table is the raw category mean") {
    val t = TargetEncode.encodingTable(rows, "cat", "y", k = 0L)
      .orderBy($"cat").select($"enc").as[Double].collect()
    t.toSeq shouldBe Seq(2.0, 5.0)
  }

  test("LOO excludes the row's own target") {
    val out = TargetEncode.withLooEncoding(rows, "cat", "y", k = 1L)
      .orderBy($"id").select($"enc").as[Double].collect()
    // row1 (a, 1): ((4-1) + 1*3) / (2-1+1) = 3.0
    // row2 (a, 3): ((4-3) + 3) / 2 = 2.0
    // row3 (b, 5): ((5-5) + 3) / 1 = 3.0  <- singleton falls back to prior
    out.toSeq shouldBe Seq(3.0, 2.0, 3.0)
  }

  test("a singleton category LOO-encodes to the global mean exactly") {
    val out = TargetEncode.withLooEncoding(rows, "cat", "y", k = 1L)
      .filter($"cat" === "b").select($"enc").as[Double].head()
    out shouldBe 3.0 // no self-leakage: its own 5.0 never contributes
  }

  test("LOO with k=0 is refused (singleton 0/0)") {
    intercept[IllegalArgumentException] {
      TargetEncode.withLooEncoding(rows, "cat", "y", k = 0L)
    }
  }

  test("NULL target raises instead of silently biasing the mean") {
    val bad = Seq((1L, "a", Some(1.0)), (2L, "a", None: Option[Double]))
      .toDF("id", "cat", "y")
    intercept[Exception] {
      TargetEncode.withLooEncoding(bad, "cat", "y", k = 1L).collect()
    }.getMessage should include("NULL target")
  }

  test("encoding is partitioning-independent (exact integer sums)") {
    val many = (1 to 500).map(i => (i.toLong, s"c${i % 7}", i / 100.0))
      .toDF("id", "cat", "y")
    val a = TargetEncode.withLooEncoding(many.repartition(13), "cat", "y", 5L)
      .orderBy($"id").select($"enc").as[Double].collect().toSeq
    val b = TargetEncode.withLooEncoding(many.repartition(1), "cat", "y", 5L)
      .orderBy($"id").select($"enc").as[Double].collect().toSeq
    a shouldBe b // bit-equality: integer sums, one final divide
  }

  test("no nested-loop join in the plan (constant-key scalar attach)") {
    val plan = TargetEncode.withLooEncoding(rows, "cat", "y", 1L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
