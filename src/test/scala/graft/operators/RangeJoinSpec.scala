package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def naivePointInterval(points: DataFrame, intervals: DataFrame)
      : Set[(Long, Long)] =
    points.as("p").crossJoin(intervals.as("i"))
      .filter(col("p.v") >= col("i.lo") && col("p.v") <= col("i.hi"))
      .select(col("p.pid"), col("i.iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointIntervalJoin equals the naive cross-join semantics") {
    // points 0..199, intervals of assorted widths crossing bin borders
    val points = (0L until 200L).map(p => (p, p)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 5L, 14L),    // spans two width-10 bins
      (2L, 10L, 10L),   // single value on a bin boundary
      (3L, 95L, 130L),  // spans four bins
      (4L, 198L, 260L), // runs past the point domain
      (5L, 300L, 310L), // no matching points
      (6L, 50L, 40L)    // empty (hi < lo) — must match nothing
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointIntervalJoin(
      points, "v", intervals, "lo", "hi", binWidth = 10L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe naivePointInterval(points, intervals)
    got.count(_._2 == 1L) shouldBe 10 // 5..14 inclusive
    got.count(_._2 == 6L) shouldBe 0
  }

  test("pointIntervalJoin handles negative domains with exact floor bins") {
    val points = (-50L to 50L).map(p => (p, p)).toDF("pid", "v")
    val intervals = Seq((1L, -35L, -28L), (2L, -5L, 5L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointIntervalJoin(
      points, "v", intervals, "lo", "hi", binWidth = 10L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe naivePointInterval(points, intervals)
    got.count(_._2 == 1L) shouldBe 8
    got.count(_._2 == 2L) shouldBe 11
  }

  test("pointIntervalJoin on timestamps with equi-keys") {
    val points = Seq(
      (1L, "u1", ts("2024-01-01 00:05:00")),
      (2L, "u1", ts("2024-01-01 02:00:00")),
      (3L, "u2", ts("2024-01-01 00:05:00"))
    ).toDF("eid", "user", "at")
    val windows = Seq(
      ("u1", 10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      ("u2", 20L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"))
    ).toDF("user", "wid", "w_lo", "w_hi")
    val got = RangeJoin.pointIntervalJoin(
      points, "at", windows, "w_lo", "w_hi",
      binWidth = 900L, equiKeys = Seq("user"))
      .select(col("eid"), col("wid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // eid 2 is outside the window; eid 1/3 match only their own user's
    got shouldBe Set((1L, 10L), (3L, 20L))
  }

  test("pointIntervalJoin null points and bounds never match") {
    val points = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "v")
    val intervals = Seq(
      (1L, Some(0L), Some(10L)),
      (2L, None, Some(10L)),
      (3L, Some(0L), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointIntervalJoin(
      points, "v", intervals, "lo", "hi", binWidth = 4L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 1L))
  }

  test("pointIntervalJoin fails fast on intervals spanning too many bins") {
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val intervals = Seq((1L, 0L, 10000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointIntervalJoin(points, "v", intervals, "lo", "hi",
        binWidth = 10L, maxBinsPerInterval = 100L).collect()
    }
    e.getMessage should include("rangeJoin")
  }

  test("pointIntervalJoin plans an equi-join, not a nested loop") {
    val points = (0L until 100L).map(p => (p, p)).toDF("pid", "v")
    val intervals = (0L until 50L).map(i => (i, i * 3, i * 3 + 5)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointIntervalJoin(
      points, "v", intervals, "lo", "hi", binWidth = 8L)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  // set semantics: empty intervals (hi < lo) overlap nothing
  private def naiveOverlap(a: DataFrame, b: DataFrame): Set[(Long, Long)] =
    a.as("a").crossJoin(b.as("b"))
      .filter(col("a.lo") <= col("a.hi") && col("b.lo") <= col("b.hi") &&
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
      .select(col("a.aid"), col("b.bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("intervalOverlapJoin equals naive semantics with no duplicate pairs") {
    val a = Seq(
      (1L, 0L, 25L),   // long interval: shares many bins with partners
      (2L, 40L, 45L),
      (3L, 100L, 100L),
      (4L, 60L, 50L)   // empty
    ).toDF("aid", "lo", "hi")
    val b = Seq(
      (10L, 20L, 60L),  // overlaps 1 and 2 across several shared bins
      (20L, 24L, 26L),
      (30L, 99L, 101L),
      (40L, 200L, 210L)
    ).toDF("bid", "lo", "hi")
    val rows = RangeJoin.intervalOverlapJoin(
      a.withColumnRenamed("lo", "a_lo").withColumnRenamed("hi", "a_hi"),
      "a_lo", "a_hi",
      b.withColumnRenamed("lo", "b_lo").withColumnRenamed("hi", "b_hi"),
      "b_lo", "b_hi",
      binWidth = 10L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe rows.toSet.size // first-shared-bin dedup, no distinct()
    rows.toSet shouldBe naiveOverlap(a, b)
    rows.toSet should contain allOf ((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L))
  }

  test("pointIntervalJoin bins mixed date/timestamp columns in one domain") {
    // Date points against timestamp windows: dates must promote to the
    // seconds domain — binned in days against second-binned bounds the
    // bins would never line up and true matches would silently vanish.
    val points = Seq(
      (1L, java.sql.Date.valueOf("2024-01-03")),
      (2L, java.sql.Date.valueOf("2024-01-10"))
    ).toDF("pid", "v")
    val windows = Seq(
      (10L, ts("2024-01-02 12:00:00"), ts("2024-01-04 00:00:00")),
      (20L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointIntervalJoin(
      points, "v", windows, "lo", "hi", binWidth = 3600L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 10L))
  }

  test("pointIntervalJoin rejects time/numeric domain mixes") {
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val windows = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointIntervalJoin(points, "v", windows, "lo", "hi",
        binWidth = 3600L)
    }
    e.getMessage should include("binnable domain")
  }

  test("intervalOverlapJoin on pure dates bins in the day domain") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val a = Seq((1L, d("2024-01-01"), d("2024-01-05")),
      (2L, d("2024-03-01"), d("2024-03-02"))).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, d("2024-01-04"), d("2024-01-08"))).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapJoin(
      a, "a_lo", "a_hi", b, "b_lo", "b_hi", binWidth = 2L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 10L))
  }

  test("intervalOverlapJoin respects equi-keys") {
    val a = Seq((1L, "x", 0L, 10L), (2L, "y", 0L, 10L)).toDF("aid", "k", "a_lo", "a_hi")
    val b = Seq((10L, "x", 5L, 15L)).toDF("bid", "k", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapJoin(
      a, "a_lo", "a_hi", b, "b_lo", "b_hi",
      binWidth = 4L, equiKeys = Seq("k"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 10L))
  }
}
