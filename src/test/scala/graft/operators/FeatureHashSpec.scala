package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureHashSpec extends SparkSpec {
  import sqlImplicits._

  private def df = Seq(
    ("ab", "c"), ("a", "bc"), ("ab", "c"), (null, "c"))
    .toDF("x", "y")

  test("buckets are stable, in range, and equal values collide") {
    val out = FeatureHash.withHashedFeature(df, "x", "hx", 1000)
      .select($"x", $"hx").as[(Option[String], Long)].collect()
    all(out.map(_._2)) should (be >= 0L and be < 1000L)
    val abBuckets = out.filter(_._1.contains("ab")).map(_._2).distinct
    abBuckets.length shouldBe 1
  }

  test("the separator keeps crosses unambiguous") {
    val out = FeatureHash.withHashedCross(df, Seq("x", "y"), "hc", 1 << 20)
      .select($"x", $"y", $"hc").as[(Option[String], String, Long)]
      .collect().toSeq
    val ab_c = out.collect { case (Some("ab"), "c", h) => h }.head
    val a_bc = out.collect { case (Some("a"), "bc", h) => h }.head
    ab_c should not be a_bc // "_"-style joining would alias these
  }

  test("NULL components hash the missing token, not the whole-row null") {
    val out = FeatureHash.withHashedCross(df, Seq("x", "y"), "hc", 1000)
      .filter($"x".isNull).select($"hc").as[Long].collect()
    out.length shouldBe 1
    out.head should (be >= 0L and be < 1000L)
  }

  test("distinct salts give a different assignment (independent spaces)") {
    val vals = (0 until 500).map(i => s"v$i").toDF("x")
    val both = vals
      .withColumn("a", FeatureHash.hashFeature($"x", 64, salt = "s1"))
      .withColumn("b", FeatureHash.hashFeature($"x", 64, salt = "s2"))
    val agree = both.filter($"a" === $"b").count()
    // independent uniform: ~500/64 ≈ 8 expected agreements
    agree.toDouble should be < 50.0
  }

  test("sign is ±1 and roughly balanced") {
    val vals = (0 until 1000).map(i => s"v$i").toDF("x")
    val signs = vals.select(FeatureHash.hashSign($"x").as("s"))
      .groupBy($"s").count().as[(Int, Long)].collect().toMap
    signs.keySet shouldBe Set(1, -1)
    signs(1).toDouble shouldBe 500.0 +- 150.0
  }

  test("hashing is partitioning-independent (pure function of value)") {
    val vals = (0 until 100).map(i => s"v$i").toDF("x")
    val a = FeatureHash.withHashedFeature(vals.repartition(7), "x", "h", 256)
      .orderBy($"x").select($"h").as[Long].collect().toSeq
    val b = FeatureHash.withHashedFeature(vals.repartition(1), "x", "h", 256)
      .orderBy($"x").select($"h").as[Long].collect().toSeq
    a shouldBe b
  }

  test("the projection is map-only (no exchange in the plan)") {
    val plan = FeatureHash.withHashedCross(df, Seq("x", "y"), "h", 100)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
