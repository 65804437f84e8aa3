package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two sessions with a 30-min gap rule (gap of 31 min splits)
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, 11L, ts("2024-01-01 10:10:00"), 2.0),
    (1L, 12L, ts("2024-01-01 10:41:00"), 3.0),
    // user 2: single session, exactly-gap boundary stays merged (> rule)
    (2L, 20L, ts("2024-01-01 09:00:00"), 5.0),
    (2L, 21L, ts("2024-01-01 09:30:00"), 7.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("withSessionIds numbers sessions per key under the strict-gap rule") {
    val got = Sessionize.withSessionIds(
      events, Seq("user_id"), "ts", gapSeconds = 1800L,
      tieBreak = Seq(col("event_id")))
      .select(col("event_id"), col("session_idx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 20L -> 1L, 21L -> 1L)
  }

  test("sessionStats aggregates bounds, counts and exact value sums") {
    val got = Sessionize.sessionStats(
      events, Seq("user_id"), "ts", gapSeconds = 1800L,
      tieBreak = Seq(col("event_id")), valueCol = Some("value"))
      .select(col("user_id"), col("session_idx"), col("session_start"),
        col("session_end"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString,
        r.getLong(4), r.getDouble(5))).toSet
    got shouldBe Set(
      (1L, 1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0),
      (1L, 2L, "2024-01-01 10:41:00.0", "2024-01-01 10:41:00.0", 1L, 3.0),
      (2L, 1L, "2024-01-01 09:00:00.0", "2024-01-01 09:30:00.0", 2L, 12.0))
  }

  test("duplicate timestamps are ordered by the tie-break deterministically") {
    val dup = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00")),
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 3L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.withSessionIds(
      dup, Seq("user_id"), "ts", gapSeconds = 3600L,
      tieBreak = Seq(col("event_id")))
      .select(col("event_id"), col("session_idx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 2L)
  }

  test("the two window passes share one exchange (single shuffle)") {
    val plan = Sessionize.withSessionIds(
      events, Seq("user_id"), "ts", gapSeconds = 1800L,
      tieBreak = Seq(col("event_id")))
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }

  test("matches Spark's native session_window away from exact-gap boundaries") {
    // random-ish events with gaps never exactly equal to the gap length
    val evs = (0 until 200).map { i =>
      val user = i % 5
      val jitterSec = (i * 37 % 50) * 60 + 17 // never a multiple of 30 min
      (user.toLong, i.toLong,
        new Timestamp(ts("2024-01-01 00:00:00").getTime +
          (i / 5) * 23L * 60000L + jitterSec * 1000L))
    }.toDF("user_id", "event_id", "ts")
    val batch = Sessionize.sessionStats(
      evs, Seq("user_id"), "ts", gapSeconds = 1800L,
      tieBreak = Seq(col("event_id")))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    val native = evs
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    batch shouldBe native
  }
}
