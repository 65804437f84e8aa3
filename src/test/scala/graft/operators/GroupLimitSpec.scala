package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GroupLimitSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    ("en", 1L, 100L), ("en", 2L, 300L), ("en", 3L, 200L), ("en", 4L, 50L),
    ("fr", 5L, 10L), ("fr", 6L, 20L),
    ("de", 7L, 5L)
  ).toDF("lang", "id", "len")

  test("topKPerGroup keeps the k first rows per group in order") {
    val got = GroupLimit.topKPerGroup(
      docs, Seq("lang"), Seq(col("len").desc, col("id").asc), k = 2)
      .select(col("lang"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldBe Set(("en", 2L), ("en", 3L), ("fr", 6L), ("fr", 5L), ("de", 7L))
  }

  test("topKPerGroup exposes the rank when asked") {
    val got = GroupLimit.topKPerGroup(
      docs, Seq("lang"), Seq(col("len").desc, col("id").asc), k = 2,
      rankCol = "r")
      .filter(col("lang") === "en")
      .select(col("id"), col("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    got shouldBe Set((2L, 1), (3L, 2))
  }

  test("topKPerGroup plans a WindowGroupLimit (map-side bounded heap)") {
    val plan = GroupLimit.topKPerGroup(
      docs, Seq("lang"), Seq(col("len").desc, col("id").asc), k = 2)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("deterministicSamplePerGroup is stable and respects k") {
    val many = (1L to 1000L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val a = GroupLimit.deterministicSamplePerGroup(many, Seq("g"), "id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = GroupLimit.deterministicSamplePerGroup(
      many.repartition(13), Seq("g"), "id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    a shouldBe b // layout-independent
    a.groupBy(_._1).values.map(_.size).toSet shouldBe Set(10)
    // different seed draws a different sample
    val c = GroupLimit.deterministicSamplePerGroup(
      many, Seq("g"), "id", k = 10, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    c should not be a
  }
}
