package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import sqlImplicits._

  private def batch = Seq(
    (1L, Some("a"), 10L),
    (2L, Some("b"), -5L),
    (2L, None, 20L),     // dup id + null name
    (4L, Some("d"), 30L))
    .toDF("id", "name", "v")

  private def dim = Seq(1L, 2L, 3L).toDF("k")

  private def audit(checks: Seq[Checks.Check]) =
    Checks.runChecks(batch, checks).collect()
      .map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("violations"), r.getAs[Long]("total"),
          r.getAs[Boolean]("passed"))))
      .toMap

  test("complete / satisfies / unique / row count / referential") {
    val got = audit(Seq(
      Checks.Complete("name"),
      Checks.Satisfies("v_nonneg", col("v") >= 0),
      Checks.Unique(Seq("id")),
      Checks.RowCountBetween(1, 3),
      Checks.ReferencedIn("id", dim, "k")))
    got("complete(name)") shouldBe ((1L, 4L, false))
    got("satisfies(v_nonneg)") shouldBe ((1L, 4L, false))
    got("unique(id)") shouldBe ((1L, 4L, false))      // one extra row on id=2
    got("row_count_between(1,3)") shouldBe ((1L, 4L, false)) // 1 over the cap
    got("referenced_in(id)") shouldBe ((1L, 4L, false))      // id=4 orphan
  }

  test("all green on a clean batch") {
    val clean = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "name", "v")
    val got = Checks.runChecks(clean, Seq(
      Checks.Complete("name"),
      Checks.Satisfies("v_pos", col("v") > 0),
      Checks.Unique(Seq("id", "name")),
      Checks.RowCountBetween(2, 2),
      Checks.ReferencedIn("id", dim, "k"))).collect()
    all(got.map(_.getAs[Boolean]("passed"))) shouldBe true
    Checks.assertAll(clean, Seq(Checks.Complete("name"))).count() shouldBe 1L
  }

  test("NULL predicate results are violations, not passes") {
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "v")
    val got = Checks.runChecks(df,
      Seq(Checks.Satisfies("v_big", col("v") > 0))).collect()
    got.head.getAs[Long]("violations") shouldBe 1L
  }

  test("NULL foreign keys are not referential violations") {
    val df = Seq((Some(1L), "x"), (None, "y")).toDF("fk", "p")
    val got = Checks.runChecks(df,
      Seq(Checks.ReferencedIn("fk", dim, "k"))).collect()
    got.head.getAs[Long]("violations") shouldBe 0L
    got.head.getAs[Boolean]("passed") shouldBe true
  }

  test("check_idx carries declaration position through kind regrouping") {
    // Interleave kinds so output regrouping differs from declaration
    // order: scan-level checks plan first, then Unique, then
    // ReferencedIn — check_idx must still name each declared slot.
    val got = Checks.runChecks(batch, Seq(
      Checks.Unique(Seq("id")),             // 0
      Checks.Complete("name"),              // 1
      Checks.ReferencedIn("id", dim, "k"),  // 2
      Checks.RowCountBetween(1, 3)))        // 3
      .collect()
      .map(r => r.getAs[Long]("check_idx") -> r.getAs[String]("check"))
      .toMap
    got shouldBe Map(
      0L -> "unique(id)",
      1L -> "complete(name)",
      2L -> "referenced_in(id)",
      3L -> "row_count_between(1,3)")
  }

  test("assertAll raises listing every failing check with counts") {
    val ex = intercept[IllegalStateException] {
      Checks.assertAll(batch, Seq(
        Checks.Complete("name"),
        Checks.Unique(Seq("id")),
        Checks.RowCountBetween(1, 100)))
    }
    ex.getMessage should include("complete(name) (1/4)")
    ex.getMessage should include("unique(id) (1/4)")
    ex.getMessage should not include "row_count_between"
  }

  test("empty batch: completeness trivially green, count gate red") {
    val empty = batch.filter(lit(false))
    val got = Checks.runChecks(empty, Seq(
      Checks.Complete("name"),
      Checks.RowCountBetween(1, 10))).collect()
      .map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("violations"), r.getAs[Boolean]("passed")))).toMap
    got("complete(name)") shouldBe ((0L, true))
    got("row_count_between(1,10)") shouldBe ((1L, false))
  }
}
