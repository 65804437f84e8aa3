// SURVEY §5 upgrade properties live in SamplingInvariantsSpec
package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ports the reference's sampling golden matrix
  * (`tests/tensorflow/test_sampling.py:11-111`) verbatim: the entropy column
  * is injected directly (samplingColOverride), so rate logic is tested
  * independently of the hash function — same strategy as the reference's
  * mock of `add_deterministic_sampling_col`.
  */
class SamplingSpec extends SparkSpec {
  import sqlImplicits._

  private def baseDf = Seq(
    (0.2, 13L, 3L, 1L),
    (0.4, 13L, 3L, 1L),
    (0.6, 2L, 1L, 0L),
    (0.8, 6L, 7L, 0L),
    (0.85, 33L, 3L, 1L),
    (0.9, 5L, 9L, 1L)
  ).toDF("sampling_hash", "feature1", "feature2", "label")

  private val rateMatrix = Seq(
    // (global, pos, neg, expectedCount)
    (1.0, 1.0, 1.0, 6),
    (0.0, 1.0, 1.0, 0),
    (1.0, 0.0, 1.0, 2),
    (1.0, 1.0, 0.0, 4),
    (1.0, 0.5, 1.0, 4),
    (1.0, 0.5, 0.5, 2),
    (1.0, 0.3, 0.3, 1))

  for ((g, p, n, expected) <- rateMatrix) {
    test(s"rate matrix g=$g p=$p n=$n keeps $expected of 6") {
      val out = Sampling.sampleWithPredicate(
        baseDf, g, p, n, col("label") > 0,
        samplingColOverride = Some("sampling_hash"))
      out.count() shouldBe expected
    }

    test(s"rate matrix g=$g p=$p n=$n keeps $expected of 6 (null labels)") {
      val df = baseDf.withColumn("label", expr("IF(label == 0, null, label)"))
      val out = Sampling.sampleWithPredicate(
        df, g, p, n, col("label") > 0,
        samplingColOverride = Some("sampling_hash"))
      out.count() shouldBe expected
    }
  }

  test("weight rescale goldens (g=0.9 p=0.5 n=0.9 on the 8-row table)") {
    val df = Seq(
      // sampled out:
      (0.9, 13L, 3L, 1L, 10.0),
      (0.9, 6L, 7L, 0L, 10.0),
      (0.9, 33L, 3L, 1L, 10.0),
      (0.9, 5L, 9L, 1L, 10.0),
      // kept:
      (0.1, 13L, 3L, 1L, 10.0),
      (0.1, 13L, 30L, 1L, 20.0),
      (0.1, 2L, 1L, 0L, 10.0),
      (0.1, 2L, 10L, 0L, 20.0)
    ).toDF("sampling_hash", "feature1", "feature2", "label", "weight")

    val rows = Sampling.sampleWithPredicate(
      df, 0.9, 0.5, 0.9, col("label") > 0,
      samplingColOverride = Some("sampling_hash"))
      .orderBy(col("label").desc, col("weight"))
      .collect()

    rows.length shouldBe 4
    rows(0).getAs[Double]("weight") shouldBe (10.0 * 0.9 / 0.5) +- 1e-9
    rows(1).getAs[Double]("weight") shouldBe (20.0 * 0.9 / 0.5) +- 1e-9
    rows(2).getAs[Double]("weight") shouldBe 10.0 +- 1e-9
    rows(3).getAs[Double]("weight") shouldBe 20.0 +- 1e-9
  }

  test("weight column created at 1.0 when absent") {
    val out = Sampling.sampleWithPredicate(
      baseDf, 1.0, 1.0, 1.0, col("label") > 0,
      samplingColOverride = Some("sampling_hash"))
    out.columns should contain("weight")
    out.select("weight").collect().map(_.getDouble(0)).toSet shouldBe Set(1.0)
  }

  test("deterministic hash path: rows equal on entropy cols sample together") {
    val df = Seq(
      (1L, "a", 1L), (1L, "a", 2L), (2L, "b", 3L), (3L, "c", 4L),
      (4L, "d", 5L), (5L, "e", 6L), (6L, "f", 7L), (7L, "g", 8L)
    ).toDF("uid", "tag", "other")
    val out = Sampling.sampleWithPredicate(
      df, 0.5, 1.0, 1.0, col("other") > 0,
      columnsForSample = Seq("uid", "tag"))
    // rows 1/2 share (uid, tag): they must be kept or dropped together
    val kept = out.select("other").collect().map(_.getLong(0)).toSet
    (kept.contains(1L) == kept.contains(2L)) shouldBe true
    // and the whole thing is deterministic across runs
    val again = Sampling.sampleWithPredicate(
      df, 0.5, 1.0, 1.0, col("other") > 0,
      columnsForSample = Seq("uid", "tag"))
      .select("other").collect().map(_.getLong(0)).toSet
    again shouldBe kept
  }

  test("sampling_hash affine map lands in [0,1)") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"v$i")).toDF("uid", "tag")
    val (c, out) = Sampling.addDeterministicSamplingCol(df, Seq("uid", "tag"))
    val vals = out.select(c).collect().map(_.getDouble(0))
    all(vals) should (be >= 0.0 and be < 1.0)
  }

  test("random path keeps roughly the requested rate") {
    val df = spark.range(20000).toDF("id")
    val out = Sampling.sampleWithPredicate(
      df, 1.0, 0.5, 0.5, col("id") % 2 === 0)
    out.count().toDouble shouldBe 10000.0 +- 600.0
  }

  private lazy val strat =
    ((0L until 300L).map(i => (i, "a", s"t$i")) ++
      (300L until 400L).map(i => (i, "b", s"t$i")) ++
      (400L until 403L).map(i => (i, "c", s"t$i"))).toDF("id", "s", "payload")

  test("sampleExactK returns exactly min(k, |stratum|) rows per stratum") {
    val out = Sampling.sampleExactK(strat, "s", "id", k = 10)
    val counts = out.groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("a" -> 10L, "b" -> 10L, "c" -> 3L)
    out.columns.toSeq shouldBe Seq("id", "s", "payload") // no helpers leak
  }

  test("sampleExactK matches the row_number-over-hash-order reference") {
    val k = 7
    val got = Sampling.sampleExactK(strat, "s", "id", k, salt = "v1")
      .select("id").collect().map(_.getLong(0)).toSet
    // reference: same bucket hash, same (bucket, id) order, per stratum
    val ord = strat.select(col("id"), col("s"),
        Splits.bucketOf(col("id"), "v1", 1 << 20).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ord.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (id, _, b) => (b, id) }.take(k).map(_._1).toSeq
    }.toSet
    got shouldBe expect
  }

  test("sampleExactK is layout-independent and salt-independent") {
    def ids(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.sampleExactK(df, "s", "id", 20, salt)
        .select("id").collect().map(_.getLong(0)).toSet
    ids(strat.repartition(17), "x") shouldBe ids(strat.repartition(2), "x")
    ids(strat, "x") should not be ids(strat, "y")
  }

  test("sampleExactK plans an aggregate, not a window sort") {
    val plan = Sampling.sampleExactK(strat, "s", "id", 5)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("Aggregate")
  }

  test("topKByScore keeps the k highest scores per stratum, ties to smaller id") {
    val df = Seq(
      (1L, "a", 5.0), (2L, "a", 9.0), (3L, "a", 9.0), (4L, "a", 1.0),
      (5L, "b", 2.0)).toDF("id", "s", "q")
    val got = Sampling.topKByScore(df, "s", "id", "q", k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    got shouldBe Set(2L, 3L, 5L) // 9.0-tie resolves to ids 2,3; b has 1 row
  }

  test("topKByScore matches a row_number reference on random scores") {
    val rng = new scala.util.Random(11)
    val df = (0L until 500L)
      .map(i => (i, s"s${i % 7}", rng.nextInt(50).toDouble))
      .toDF("id", "s", "q")
    val got = Sampling.topKByScore(df, "s", "id", "q", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val expect = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, q) => (-q, id) }.take(10).map(_._1).toSeq
      }.toSet
    got shouldBe expect
  }

  test("topKByScore fails loudly on NULL and NaN scores") {
    val withNull = Seq((1L, "a", java.lang.Double.valueOf(1.0)),
      (2L, "a", null.asInstanceOf[java.lang.Double])).toDF("id", "s", "q")
    intercept[Exception] {
      Sampling.topKByScore(withNull, "s", "id", "q", 5).collect()
    }.getMessage should include("NULL or NaN")
    val withNan = Seq((1L, "a", 1.0), (2L, "a", Double.NaN)).toDF("id", "s", "q")
    intercept[Exception] {
      Sampling.topKByScore(withNan, "s", "id", "q", 5).collect()
    }.getMessage should include("NULL or NaN")
  }

  test("sampleExactK fails loudly on NULL ids and non-positive k") {
    intercept[IllegalArgumentException] {
      Sampling.sampleExactK(strat, "s", "id", 0)
    }
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "a")).toDF("id", "s")
    intercept[Exception] {
      Sampling.sampleExactK(withNull, "s", "id", 5).collect()
    }.getMessage should include("NULL")
  }

  test("samplePps distributes exactly k picks per stratum, PPS-weighted") {
    val rng = new scala.util.Random(3)
    val df = (0L until 400L).map(i =>
      (s"g${i % 4}", i, rng.nextInt(50).toLong + 1L)).toDF("s", "id", "w")
    val got = Sampling.samplePps(df, "s", "id", "w", k = 7, salt = "v1")
    val picks = got.groupBy("s").agg(sum("n_picks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    picks.values.toSet shouldBe Set(7L)
    // every emitted row carries >= 1 pick
    got.filter(col("n_picks") < 1).count() shouldBe 0L
  }

  test("samplePps: heavy rows absorb multiple picks; zero weight never picked") {
    // one row with 90% of the mass at k=5 must take >= 4 picks
    val df = Seq(("g", 1L, 90L), ("g", 2L, 5L), ("g", 3L, 5L),
      ("g", 4L, 0L)).toDF("s", "id", "w")
    val got = Sampling.samplePps(df, "s", "id", "w", k = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    got.values.sum shouldBe 5L
    got(1L) should be >= 4L
    got.contains(4L) shouldBe false // zero weight
  }

  test("samplePps is layout-independent and guards inputs") {
    val df = (0L until 300L).map(i => ("g", i, (i % 9) + 1L)).toDF("s", "id", "w")
    val a = Sampling.samplePps(df, "s", "id", "w", k = 11, salt = "x")
      .collect().map(r => (r.getLong(1), r.getLong(3))).sorted
    val b = Sampling.samplePps(df.repartition(13), "s", "id", "w",
        k = 11, salt = "x")
      .collect().map(r => (r.getLong(1), r.getLong(3))).sorted
    a shouldBe b
    intercept[Exception] {
      Sampling.samplePps(Seq(("g", 1L, -2L)).toDF("s", "id", "w"),
        "s", "id", "w", k = 2).collect()
    }.getMessage should include("non-negative")
    intercept[Exception] {
      Sampling.samplePps(Seq(("g", 1L, 0L)).toDF("s", "id", "w"),
        "s", "id", "w", k = 2).collect()
    }.getMessage should include("total weight is 0")
  }
}
