package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import sqlImplicits._

  test("salted join equals the unsalted equi-join") {
    // skewed: 90% of rows share key 1
    val big = ((1 to 900).map(_ => (1L, "x")) ++ (1 to 100).map(i => (i.toLong + 1, "y")))
      .toDF("k", "payload")
    val small = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val expected = big.join(small, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Skew.saltedJoin(big, small, Seq("k"), buckets = 8)
      .groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
    got(1L) shouldBe 900L
  }

  test("salted join spreads a hot key over salt buckets") {
    val big = (1 to 1000).map(_ => (1L, "x")).toDF("k", "payload")
    val salted = big.withColumn("__salt", floor(rand(42L) * 8).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
    buckets.length should be > 4 // the hot key occupies many buckets
  }

  test("salted left join keeps unmatched big-side rows") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "payload")
    val small = Seq((1L, "d1"), (2L, "d2")).toDF("k", "dim")
    val got = Skew.saltedJoin(big, small, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("dim"))))
    got.length shouldBe 3
    got.find(_._1 == 99L).get._2 shouldBe None
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val df = ((1 to 500).map(_ => ("hot", 2.0)) ++ Seq(("cold", 5.0), ("cold", 7.0)))
      .toDF("k", "v")
    val got = Skew.saltedAggregate(
      df, Seq("k"), rand(7L), buckets = 16,
      aggs = Seq("total" -> (c => sum(c)), "mx" -> (c => max(c))),
      valueCols = Seq("v", "v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got("hot") shouldBe ((1000.0, 2.0))
    got("cold") shouldBe ((12.0, 7.0))
  }

  test("deterministic salted join equals the plain join under skew") {
    val left = (1L to 1000L).map(i =>
      (i, if (i <= 900) "hot" else s"k${i % 17}")).toDF("id", "key")
    val right = (Seq("hot") ++ (0 until 17).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val plain = left.join(right, Seq("key"))
      .select("key", "id", "attr").collect().toSet
    val salted = Skew.saltedJoinDeterministic(left, right, "key", "id", 8)
      .select("key", "id", "attr").collect().toSet
    salted shouldBe plain
    salted.size shouldBe 1000
  }

  test("deterministic salt spreads the hot key and repeats across runs") {
    val left = (1L to 400L).map(i => (i, "hot")).toDF("id", "key")
    val counts = left
      .withColumn("salt", pmod(xxhash64(col("id")), lit(8L)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    counts.length shouldBe 8
    counts.max.toDouble / counts.min should be < 3.0
    val right = Seq(("hot", "x")).toDF("key", "attr")
    val a = Skew.saltedJoinDeterministic(left, right, "key", "id", 8)
      .collect().toSet
    val b = Skew.saltedJoinDeterministic(left, right, "key", "id", 8)
      .collect().toSet
    a shouldBe b
  }
}
