package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import sqlImplicits._

  test("profile computes per-column rows/nulls/distinct/min/max in one row each") {
    val df = Seq(
      (1L, Some("a"), Some(2.5), Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, None, Some(-1.0), Timestamp.valueOf("2024-01-02 00:00:00")),
      (3L, Some("b"), None, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "s", "v", "t")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap

    p.keySet shouldBe Set("id", "s", "v", "t")
    val id = p("id")
    (id.getLong(2), id.getLong(3), id.getLong(4)) shouldBe ((3L, 0L, 3L))
    (id.getDouble(5), id.getDouble(6)) shouldBe ((1.0, 3.0))
    (id.getString(7), id.getString(8)) shouldBe (("", ""))

    val s = p("s")
    (s.getLong(2), s.getLong(3), s.getLong(4)) shouldBe ((3L, 1L, 2L))
    s.isNullAt(5) shouldBe true
    (s.getString(7), s.getString(8)) shouldBe (("a", "b"))

    val v = p("v")
    (v.getLong(3), v.getLong(4)) shouldBe ((1L, 2L))
    (v.getDouble(5), v.getDouble(6)) shouldBe ((-1.0, 2.5))

    val t = p("t")
    t.getString(1) shouldBe "timestamp"
    t.getLong(4) shouldBe 2L
    t.getDouble(5) shouldBe 1.7040672e15 // 2024-01-01 UTC in micros
  }

  test("profile of an all-null column reports sentinels, not engine nulls") {
    val df = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "s")
    val s = Profile.profile(df).filter($"column_name" === "s").head()
    (s.getLong(3), s.getLong(4)) shouldBe ((2L, 0L))
    (s.getString(7), s.getString(8)) shouldBe (("", ""))
  }

  test("profile runs in a single aggregate pass (one scan, Expand for distincts)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df).queryExecution.optimizedPlan.toString
    // one Expand feeding the multi-distinct aggregate; the source
    // appears exactly once in the optimized plan
    "LocalRelation|Scan".r.findAllIn(plan).length shouldBe 1
  }
}
