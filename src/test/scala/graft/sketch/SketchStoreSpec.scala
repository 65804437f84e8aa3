package graft.sketch

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchStoreSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(day: Long, s: Long) = new Timestamp(day * 86400000L + s)

  private def events = Seq(
    (ts(0, 1), "a", 1.0), (ts(0, 2), "a", 2.0), (ts(0, 3), "b", 5.0),
    (ts(1, 1), "a", 3.0), (ts(1, 2), "b", 7.0),
    (ts(2, 1), "a", 4.0)).toDF("t", "g", "v")

  test("range read equals the direct sketch of the range's rows") {
    val path = Files.createTempDirectory("skstore_").toString
    SketchStore.writeDaily(events, "t", "g", "v", path)
    val got = SketchStore.readRange(spark, path, 0L, 1L)
      .orderBy($"group").collect().toSeq
    val want = Moments.sketch(
      events.filter(expr("unix_micros(t) div 86400000000") <= 1L), "g", "v")
      .orderBy($"group").collect().toSeq
    got shouldBe want
  }

  test("day filter is a partition filter (pruned before file reads)") {
    val path = Files.createTempDirectory("skstore_").toString
    SketchStore.writeDaily(events, "t", "g", "v", path)
    val plan = spark.read.parquet(path)
      .filter($"day" >= 1L && $"day" <= 2L)
      .queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    "PartitionFilters: \\[[^]]*day".r.findFirstIn(plan) should not be None
  }

  test("writeDay replaces exactly its partition (idempotent re-run)") {
    val path = Files.createTempDirectory("skstore_").toString
    SketchStore.writeDaily(events, "t", "g", "v", path)
    // re-run day 1 with corrected data: a single 10.0 for group a
    val fixed = Seq((ts(1, 5), "a", 10.0)).toDF("t", "g", "v")
    SketchStore.writeDay(fixed, "t", "g", "v", path, day = 1L)
    // day 0 and day 2 untouched, day 1 replaced
    val d1 = SketchStore.readRange(spark, path, 1L, 1L)
      .select($"group", $"n", $"s1".cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    d1 shouldBe Seq(("a", 1L, 10L))
    SketchStore.readRange(spark, path, 0L, 0L)
      .agg(sum($"n")).as[Long].head() shouldBe 3L
    SketchStore.readRange(spark, path, 2L, 2L)
      .agg(sum($"n")).as[Long].head() shouldBe 1L
  }

  test("a batch with rows outside the declared day raises") {
    val path = Files.createTempDirectory("skstore_").toString
    intercept[Exception] {
      SketchStore.writeDay(events, "t", "g", "v", path, day = 1L)
    }.getMessage should include("outside day")
  }

  test("distinct-count store: range estimate equals the direct sketch") {
    val path = Files.createTempDirectory("skstore_hll_").toString
    val users = Seq(
      (ts(0, 1), "a", 10L), (ts(0, 2), "a", 11L), (ts(1, 1), "a", 10L),
      (ts(1, 2), "a", 12L), (ts(2, 1), "a", 99L)).toDF("t", "g", "u")
    SketchStore.writeDailyDistinct(users, "t", "g", $"u".cast("string"), path, p = 6)
    val viaStore = Hll.estimate(
      SketchStore.readRangeDistinct(spark, path, 0L, 1L)
        .withColumnRenamed("grp", "g"),
      Seq("g"), p = 6).collect().toSeq
    val direct = Hll.estimate(
      Hll.sketch(users.filter(expr("unix_micros(t) div 86400000000") <= 1),
        Seq("g"), $"u".cast("string"), p = 6),
      Seq("g"), p = 6).collect().toSeq
    viaStore shouldBe direct
  }

  test("idempotent merge: overlapping day rewrites cannot double-count") {
    val path = Files.createTempDirectory("skstore_hll2_").toString
    val users = Seq((ts(0, 1), "a", 10L), (ts(0, 2), "a", 11L))
      .toDF("t", "g", "u")
    SketchStore.writeDailyDistinct(users, "t", "g", $"u".cast("string"), path, p = 6)
    // write the SAME day again (retry): registers max-merge to identity
    SketchStore.writeDailyDistinct(users, "t", "g", $"u".cast("string"), path, p = 6)
    val regs = SketchStore.readRangeDistinct(spark, path, 0L, 0L)
    val direct = Hll.sketch(users, Seq("g"), $"u".cast("string"), p = 6)
      .withColumnRenamed("g", "grp")
    regs.orderBy($"bucket").collect().toSeq shouldBe
      direct.orderBy($"bucket").collect().toSeq
  }

  test("finish works directly on a range read") {
    val path = Files.createTempDirectory("skstore_").toString
    SketchStore.writeDaily(events, "t", "g", "v", path)
    val m = Moments.finish(SketchStore.readRange(spark, path, 0L, 2L))
      .filter($"group" === "a").select($"mean_q").as[Double].head()
    m shouldBe 2.5 // (1+2+3+4)/4
  }
}
