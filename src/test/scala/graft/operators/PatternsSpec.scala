package graft.operators

import graft.SparkSpec

class PatternsSpec extends SparkSpec {
  import sqlImplicits._

  private val events = Seq(
    // key, ts, id, type
    ("u1", 1L, 1L, "view"), ("u1", 2L, 2L, "click"),
    ("u1", 3L, 3L, "click"), ("u1", 4L, 4L, "purchase"),
    ("u1", 5L, 5L, "view"), ("u1", 6L, 6L, "purchase"),
    ("u2", 1L, 7L, "purchase"), ("u2", 2L, 8L, "view"),
    ("u3", 1L, 9L, "signup")).toDF("k", "ts", "id", "event_type")

  private val syms = Map("view" -> "v", "click" -> "c", "purchase" -> "p")

  test("folds ordered histories and counts non-overlapping matches") {
    val rows = Patterns.matchPattern(
      events, Seq("k"), "ts", "event_type", syms, "vc*p", Seq("id"))
      .orderBy($"k")
      .as[(String, String, Long, Long)]
      .collect()
    rows.toSeq shouldBe Seq(
      ("u1", "vccpvp", 6L, 2L), // vccp, then vp
      ("u2", "pv", 2L, 0L))     // order matters: p before v never matches
    // u3 only has unmapped events — no row at all
  }

  test("tie-break column orders same-timestamp events deterministically") {
    val tied = Seq(
      ("k", 1L, 2L, "purchase"), ("k", 1L, 1L, "view"))
      .toDF("k", "ts", "id", "event_type")
    Patterns.matchPattern(tied, Seq("k"), "ts", "event_type", syms,
      "vp", Seq("id"))
      .select("seq").as[String].head() shouldBe "vp"
  }

  test("alternation and repetition count like the regex says") {
    val df = Seq(
      ("k", 1L, 1L, "view"), ("k", 2L, 2L, "view"),
      ("k", 3L, 3L, "purchase")).toDF("k", "ts", "id", "event_type")
    Patterns.matchPattern(df, Seq("k"), "ts", "event_type", syms,
      "v+p", Seq("id"))
      .select("n_matches").as[Long].head() shouldBe 1L
    Patterns.matchPattern(df, Seq("k"), "ts", "event_type", syms,
      "v", Seq("id"))
      .select("n_matches").as[Long].head() shouldBe 2L
  }

  test("multi-char symbols and empty mappings fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Patterns.matchPattern(events, Seq("k"), "ts", "event_type",
        Map("view" -> "vv"), "v")
    an[IllegalArgumentException] should be thrownBy
      Patterns.matchPattern(events, Seq("k"), "ts", "event_type",
        Map.empty, "v")
  }
}
