package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CohortsSpec extends SparkSpec {
  import sqlImplicits._

  test("retention triangle matches a hand-built cohort") {
    // user 1: weeks 0,1,2; user 2: weeks 0,2; user 3: week 1 only
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 2L),
      (3L, 1L)).toDF("u", "wk")
    val got = Cohorts.retention(ev, "u", "wk")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    got shouldBe Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L)
  }

  test("duplicate events in a period count the user once") {
    val ev = Seq((1L, 0L), (1L, 0L), (1L, 0L)).toDF("u", "wk")
    Cohorts.retention(ev, "u", "wk").collect()
      .map(r => r.getLong(2)).toSeq shouldBe Seq(1L)
  }

  test("ordered funnel requires strict ordering between stages") {
    val ev = Seq(
      // u1: full ordered journey
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // u2: clicked BEFORE viewing — conversion must not count
      (2L, "click", 5L), (2L, "view", 10L),
      // u3: view+click same time — strict ordering rejects the click
      (3L, "view", 10L), (3L, "click", 10L),
      // u4: view then click, no buy
      (4L, "view", 1L), (4L, "click", 2L))
      .toDF("u", "stage", "t")
    val got = Cohorts.orderedFunnel(ev, "u", "stage", "t",
      Seq("view", "click", "buy"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    got shouldBe Map("view" -> 4L, "click" -> 2L, "buy" -> 1L)
  }

  test("later same-stage events can still qualify after the anchor") {
    // u1 clicks at 5 (before view) AND at 15 (after): qualifies via 15
    val ev = Seq((1L, "view", 10L), (1L, "click", 5L), (1L, "click", 15L))
      .toDF("u", "stage", "t")
    val got = Cohorts.orderedFunnel(ev, "u", "stage", "t",
      Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    got("click") shouldBe 1L
  }
}
