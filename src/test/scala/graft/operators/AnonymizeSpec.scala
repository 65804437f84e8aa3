package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnonymizeSpec extends SparkSpec {
  import sqlImplicits._

  // (id, zip, age_band)
  private def rows = Seq(
    (1L, "10001", "30s"), (2L, "10001", "30s"), (3L, "10001", "30s"),
    (4L, "10002", "30s"), (5L, "10002", "30s"),
    (6L, "10003", "40s")).toDF("id", "zip", "age_band")

  test("rows in groups below k are suppressed, others pass") {
    val out = Anonymize.suppressBelowK(rows, Seq("zip", "age_band"), 3L)
      .select($"id").as[Long].collect().sorted
    out.toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("k=1 keeps everything") {
    Anonymize.suppressBelowK(rows, Seq("zip", "age_band"), 1L)
      .count() shouldBe 6L
  }

  test("group sizes report flags at-risk groups") {
    val rep = Anonymize.groupSizes(rows, Seq("zip", "age_band"), 3L)
      .orderBy($"zip").as[(String, String, Long, Boolean)].collect()
    rep.toSeq shouldBe Seq(
      ("10001", "30s", 3L, false),
      ("10002", "30s", 2L, true),
      ("10003", "40s", 1L, true))
  }

  test("NULL is a QI value, not a singleton per row") {
    val df = Seq(
      (1L, None: Option[String]), (2L, None: Option[String]),
      (3L, Some("x"))).toDF("id", "zip")
    val out = Anonymize.suppressBelowK(df, Seq("zip"), 2L)
      .select($"id").as[Long].collect().sorted
    out.toSeq shouldBe Seq(1L, 2L) // the two null-zip rows protect each other
  }

  test("output schema equals input schema") {
    Anonymize.suppressBelowK(rows, Seq("zip"), 2L).columns.toSeq shouldBe
      rows.columns.toSeq
  }

  test("suppression is partitioning-independent") {
    val a = Anonymize.suppressBelowK(
      rows.repartition(7), Seq("zip", "age_band"), 3L)
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Anonymize.suppressBelowK(
      rows.repartition(1), Seq("zip", "age_band"), 3L)
      .select($"id").as[Long].collect().sorted.toSeq
    a shouldBe b
  }
}
