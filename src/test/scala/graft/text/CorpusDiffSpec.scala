package graft.text

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import sqlImplicits._

  private val old = Seq(
    ("web", "one two three"), ("web", "four"),
    ("books", "five six"), ("gone", "seven"))
  private val neu = Seq(
    ("web", "one two three"), ("web", "four five"),
    ("books", "five six"), ("fresh", "eight nine"))

  test("added/removed/changed/unchanged statuses and exact deltas") {
    val got = CorpusDiff.diff(
      old.toDF("source", "text"), neu.toDF("source", "text"),
      "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    got shouldBe Seq(
      ("books", 1L, 1L, 0L, 2L, 2L, 0L, "unchanged"),
      ("fresh", 0L, 1L, 1L, 0L, 2L, 2L, "added"),
      ("gone", 1L, 0L, -1L, 1L, 0L, -1L, "removed"),
      ("web", 2L, 2L, 0L, 4L, 5L, 1L, "changed"))
  }

  test("the corpora never meet in a shuffle: join inputs are aggregates") {
    val df = CorpusDiff.diff(
      old.toDF("source", "text"), neu.toDF("source", "text"),
      "source", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the full-outer join must sit above both aggregates (group-sized
    // inputs), i.e. aggregates appear BELOW (after, in tree text) it
    plan should include("FullOuter")
    val joinAt = plan.indexOf("FullOuter")
    plan.indexOf("HashAggregate", joinAt) should be > joinAt
  }
}
