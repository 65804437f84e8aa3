package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(us: Long) = new Timestamp(us / 1000)

  // key a: values at t=10s and t=25s ; key b: one value at t=22s
  private def events = Seq(
    ("a", ts(10000000L), 1.0), ("a", ts(25000000L), 2.0),
    ("b", ts(22000000L), 9.0)).toDF("k", "t", "v")

  test("grid points carry the latest observation at or before them") {
    val out = Resample.forwardFillGrid(events, "k", "t", stepUs = 10000000L)
      .orderBy($"k", $"t").as[(String, Long, Option[Double])].collect()
    out.toSeq shouldBe Seq(
      ("a", 10000000L, Some(1.0)), // exact hit (<= wins)
      ("a", 20000000L, Some(1.0)), // forward fill
      ("a", 30000000L, Some(2.0)),
      ("b", 10000000L, None), // leading gap is NULL, not zero
      ("b", 20000000L, None),
      ("b", 30000000L, Some(9.0)))
  }

  test("the lattice is shared across keys (corpus min/max, step-aligned)") {
    val t = Resample.forwardFillGrid(events, "k", "t", 10000000L)
      .select($"t").distinct().as[Long].collect().sorted
    t.toSeq shouldBe Seq(10000000L, 20000000L, 30000000L)
  }

  test("an exploding grid fails loudly instead of materializing") {
    intercept[IllegalArgumentException] {
      Resample.forwardFillGrid(events, "k", "t", stepUs = 1L,
        maxGridRows = 1000L)
    }.getMessage should include("exceeds maxGridRows")
  }

  test("result is partitioning-independent") {
    val a = Resample.forwardFillGrid(
      events.repartition(5), "k", "t", 10000000L)
      .orderBy($"k", $"t").collect().toSeq
    val b = Resample.forwardFillGrid(
      events.repartition(1), "k", "t", 10000000L)
      .orderBy($"k", $"t").collect().toSeq
    a shouldBe b
  }
}
