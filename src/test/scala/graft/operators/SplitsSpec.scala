package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import sqlImplicits._

  private def keys = (0L until 10000L).toDF("id")

  test("weights are honored within bucket resolution") {
    val got = Splits.withSplit(keys, "id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "v1")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.values.sum shouldBe 10000L
    // KrHash buckets are uniform enough that 10k keys land within a few
    // percent of the target on each split
    got("train").toDouble shouldBe 8000.0 +- 300.0
    got("valid").toDouble shouldBe 1000.0 +- 150.0
    got("test").toDouble shouldBe 1000.0 +- 150.0
  }

  test("assignment is per-key deterministic and layout-independent") {
    val a = Splits.withSplit(keys, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.withSplit(keys.repartition(17), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b
  }

  test("distinct salts give independent assignments") {
    val a = Splits.withSplit(keys, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.withSplit(keys, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a should not be b
    // ~half the keys flip between independent fair coin flips
    val flips = a.count { case (k, v) => b(k) != v }
    flips.toDouble shouldBe 5000.0 +- 500.0
  }

  test("hand-computed KrHash bucket matches") {
    // key 7, salt "v1" -> "7:v1" bytes [55, 58, 118, 49]
    val bytes = "7:v1".getBytes("UTF-8")
    var h = 0L
    bytes.foreach(b => h = (h * 257 + (b & 0xFF)) % 2147483647L)
    val got = Splits.withSplit(Seq(7L).toDF("id"), "id",
      Seq("lo" -> 0.5, "hi" -> 0.5), salt = "v1")
      .select(Splits.bucketOf(col("id"), "v1", 10000)).head().getLong(0)
    got shouldBe (h * h) % 2147483647L % 10000
  }

  test("every bucket is covered despite rounding") {
    // weights that do NOT hit round bucket boundaries
    val got = Splits.withSplit(keys, "id",
      Seq("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3)))
    got.filter(col("split").isNull).count() shouldBe 0L
    got.select("split").distinct().count() shouldBe 3L
  }

  test("stable sample: reproducible, proportional, salt-independent") {
    val a = Splits.stableSample(keys, "id", 0.1, salt = "s")
      .collect().map(_.getLong(0)).toSet
    val b = Splits.stableSample(keys.repartition(13), "id", 0.1, salt = "s")
      .collect().map(_.getLong(0)).toSet
    a shouldBe b // layout-independent
    a.size.toDouble shouldBe 1000.0 +- 150.0
    val c = Splits.stableSample(keys, "id", 0.1, salt = "t")
      .collect().map(_.getLong(0)).toSet
    c should not be a // different salt, different sample
    Splits.stableSample(keys, "id", 0.0).count() shouldBe 0L
    Splits.stableSample(keys, "id", 1.0).count() shouldBe 10000L
  }

  test("invalid weights are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Splits.withSplit(keys, "id", Seq("a" -> 0.5, "b" -> 0.6))
    an[IllegalArgumentException] should be thrownBy
      Splits.withSplit(keys, "id", Seq("a" -> 0.5, "a" -> 0.5))
  }

  test("splitExactCounts: sizes are exact cumulative-floor differences") {
    // strata of deliberately awkward sizes: 7, 10, 503
    val df = ((0L until 7L).map(("s7", _)) ++
      (100L until 110L).map(("s10", _)) ++
      (1000L until 1503L).map(("s503", _))).toDF("stratum", "id")
    val got = Splits.splitExactCounts(df, "stratum", "id",
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), salt = "v1")
      .groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def exp(n: Long) = {
      val t = Seq(8L, 9L, 10L).map(c => n * c / 10L)
      (t(0), t(1) - t(0), t(2) - t(1))
    }
    for ((s, n) <- Seq(("s7", 7L), ("s10", 10L), ("s503", 503L))) {
      val (tr, va, te) = exp(n)
      got.getOrElse((s, "train"), 0L) shouldBe tr
      got.getOrElse((s, "val"), 0L) shouldBe va
      got.getOrElse((s, "test"), 0L) shouldBe te
    }
    // exact coverage: every row labeled
    got.values.sum shouldBe (7L + 10L + 503L)
  }

  test("splitExactCounts is layout-independent and salt-independent") {
    val df = (0L until 2000L).map(i => (s"g${i % 3}", i)).toDF("stratum", "id")
    val a = Splits.splitExactCounts(df, "stratum", "id",
        Seq("a" -> 1L, "b" -> 1L), salt = "s1")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    val b = Splits.splitExactCounts(df.repartition(17), "stratum", "id",
        Seq("a" -> 1L, "b" -> 1L), salt = "s1")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    a shouldBe b
    val c = Splits.splitExactCounts(df, "stratum", "id",
        Seq("a" -> 1L, "b" -> 1L), salt = "s2")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    c should not be a
    // both salts still split each stratum exactly in half
    val flips = a.count { case (k, v) => c(k) != v }
    flips.toDouble shouldBe 1000.0 +- 200.0
  }

  test("splitExactCounts guards ids, weights, and column collisions") {
    val df = Seq(("g", 1L), ("g", 2L)).toDF("stratum", "id")
    an[IllegalArgumentException] should be thrownBy
      Splits.splitExactCounts(df, "stratum", "id", Seq("a" -> 0L))
    an[IllegalArgumentException] should be thrownBy
      Splits.splitExactCounts(df, "stratum", "id",
        Seq("a" -> 1L, "a" -> 1L))
    an[IllegalArgumentException] should be thrownBy
      Splits.splitExactCounts(df.withColumn("split", lit("x")),
        "stratum", "id", Seq("a" -> 1L))
    intercept[Exception] {
      Splits.splitExactCounts(
        Seq(("g", Option.empty[java.lang.Long])).toDF("stratum", "id"),
        "stratum", "id", Seq("a" -> 1L)).collect()
    }.getMessage should include("NULL id")
  }

  test("splitExactCounts keeps NULL strata as their own group") {
    val df = Seq((Option("g"), 1L), (Option("g"), 2L),
      (Option.empty[String], 3L), (Option.empty[String], 4L))
      .toDF("stratum", "id")
    val got = Splits.splitExactCounts(df, "stratum", "id",
        Seq("a" -> 1L, "b" -> 1L))
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    got.size shouldBe 4 // no row vanished through the restore join
    Seq(3L, 4L).map(got).sorted shouldBe Seq("a", "b")
  }

  test("withTemporalEmbargo: three-way labels with boundary semantics") {
    val rows = Seq(
      (1L, "2024-01-10 00:00:00"), // train
      (2L, "2024-01-16 23:59:59"), // train (strictly before cut-emb)
      (3L, "2024-01-17 00:00:00"), // embargo (at the boundary)
      (4L, "2024-01-19 23:59:59"), // embargo
      (5L, "2024-01-20 00:00:00"), // test (at the cutoff)
      (6L, "2024-01-25 12:00:00")) // test
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    val got = Splits.withTemporalEmbargo(rows, "ts",
        java.time.Instant.parse("2024-01-20T00:00:00Z"), 3L * 86400L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    got shouldBe Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test", 6L -> "test")
  }

  test("withTemporalEmbargo: NULL timestamps raise; bad args raise") {
    val rows = Seq((1L, Option("2024-01-10 00:00:00")),
      (2L, Option.empty[String])).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    intercept[Exception] {
      Splits.withTemporalEmbargo(rows, "ts",
        java.time.Instant.parse("2024-01-20T00:00:00Z"), 86400L)
        .collect()
    }
    an[IllegalArgumentException] should be thrownBy {
      Splits.withTemporalEmbargo(rows, "ts",
        java.time.Instant.parse("2024-01-20T00:00:00Z"), -1L)
    }
  }

  test("withTemporalEmbargo: unparseable string timestamps raise, " +
    "never silently label embargo") {
    // unix_timestamp returns NULL for an unparseable string — the
    // guard must fire on the parse RESULT, not just a NULL input,
    // or the row falls through both when-branches into "embargo"
    val rows = Seq((1L, "2024-01-10 00:00:00"), (2L, "not-a-date"))
      .toDF("id", "ts")
    val ex = intercept[Exception] {
      Splits.withTemporalEmbargo(rows, "ts",
        java.time.Instant.parse("2024-01-20T00:00:00Z"), 86400L)
        .collect()
    }
    // ANSI mode: unix_timestamp itself raises CANNOT_PARSE_TIMESTAMP;
    // non-ANSI: it returns NULL and our cast-then-raise guard fires.
    // Either way the row must raise, never label "embargo".
    assert(ex.getMessage.contains("unplaceable") ||
      ex.getMessage.contains("CANNOT_PARSE_TIMESTAMP"))
  }
}
