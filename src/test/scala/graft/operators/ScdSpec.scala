package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import sqlImplicits._

  private val changes = Seq(
    // key, ts, tie, status
    ("u1", 10L, 1L, "bronze"),
    ("u1", 20L, 2L, "bronze"), // unchanged: extends, never splits
    ("u1", 30L, 3L, "silver"),
    ("u1", 40L, 4L, "gold"),
    ("u2", 15L, 5L, "silver")).toDF("k", "ts", "id", "status")

  test("scd2 collapses runs and chains valid_from/valid_to per key") {
    val rows = Scd.scd2(changes, Seq("k"), "ts", "status", Seq("id"))
      .orderBy($"k", $"valid_from")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect()
    rows.toSeq shouldBe Seq(
      ("u1", "bronze", 10L, Some(30L), false),
      ("u1", "silver", 30L, Some(40L), false),
      ("u1", "gold", 40L, None, true),
      ("u2", "silver", 15L, None, true))
  }

  test("null attribute transitions are real changes (null-safe compare)") {
    val df = Seq(
      ("k", 1L, Some("a")), ("k", 2L, None: Option[String]),
      ("k", 3L, None: Option[String]), ("k", 4L, Some("a")))
      .toDF("k", "ts", "status")
    val rows = Scd.scd2(df, Seq("k"), "ts", "status")
      .orderBy($"valid_from")
      .select($"status", $"valid_from")
      .as[(Option[String], Long)]
      .collect()
    rows.toSeq shouldBe Seq(
      (Some("a"), 1L), (None, 2L), (Some("a"), 4L))
  }

  test("scd2 plans a single exchange for both window passes") {
    val plan = Scd.scd2(changes, Seq("k"), "ts", "status", Seq("id"))
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }

  test("an as-of style probe against the built dimension resolves status") {
    val dim = Scd.scd2(changes, Seq("k"), "ts", "status", Seq("id"))
    val probe = Seq(("u1", 35L)).toDF("k", "at")
    val got = probe.join(dim,
      probe("k") === dim("k") && $"at" >= $"valid_from" &&
        ($"valid_to".isNull || $"at" < $"valid_to"))
      .select($"status").as[String].collect()
    got.toSeq shouldBe Seq("silver")
  }
}
