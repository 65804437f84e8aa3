package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import sqlImplicits._

  test("ilog2Q20 matches floating log2 within a few Q20 ulps") {
    val rng = new scala.util.Random(3)
    val cases = Seq(1L, 2L, 1L << 20, (1L << 20) + 1, 3L << 19, 1L << 40) ++
      Seq.fill(200)(math.abs(rng.nextLong()) % (1L << 41) + 1)
    cases.foreach { s =>
      val got = Dsir.ilog2Q20(s) / Dsir.Scale.toDouble
      val expect = math.log(s.toDouble / Dsir.Scale) / math.log(2.0)
      // truncation in normalization + 20 squarings accumulates a few
      // ulps; the contract is determinism, not last-bit log accuracy
      math.abs(got - expect) should be <= 4.0 / Dsir.Scale
    }
    // exact anchors
    Dsir.ilog2Q20(1L << 20) shouldBe 0L
    Dsir.ilog2Q20(1L << 21) shouldBe Dsir.Scale
    Dsir.ilog2Q20(1L << 19) shouldBe -Dsir.Scale
  }

  test("hashedGrams emits unigram + bigram occurrences, empty-safe") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "solo")).toDF("id", "text")
    val got = Dsir.hashedGrams(df, "id", "text", maxN = 2, buckets = 64)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(1L) shouldBe 5L // a, b, c, "a b", "b c"
    got.get(2L) shouldBe None // no grams -> no rows
    got(3L) shouldBe 1L
  }

  test("selection prefers target-like documents") {
    // target: documents about "spark shuffle join"; raw corpus has two
    // target-like docs among noise
    val target = (0L until 20L)
      .map(i => (i, "spark shuffle join stage executor task"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "spark shuffle join executor"),
      (101L, "spark stage task shuffle"),
      (102L, "cat dog fish bird mouse"),
      (103L, "red green blue yellow pink"),
      (104L, "one two three four five"))
      .toDF("doc_id", "text")
    val top = Dsir.selectTopK(raw, "doc_id", "text", target, k = 2,
      buckets = 512)
      .collect().map(_.getLong(0)).toSet
    top shouldBe Set(100L, 101L)
  }

  test("scores are exact integers, stable under repartitioning") {
    val rng = new scala.util.Random(9)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def doc(n: Int) = (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    val target = (0L until 10L).map(i => (i, doc(30))).toDF("doc_id", "text")
    val raw = (100L until 140L).map(i => (i, doc(25))).toDF("doc_id", "text")
    def scores(r: org.apache.spark.sql.DataFrame) =
      Dsir.importanceScores(r, "doc_id", "text", target, buckets = 256)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    scores(raw.repartition(1)) shouldBe scores(raw.repartition(13))
  }

  test("sub-2^-20 ratios clamp to one Q20 ulp instead of diverging") {
    Dsir.ilog2Q20(0L) shouldBe Dsir.ilog2Q20(1L)
    Dsir.ilog2Q20(1L) shouldBe -20L * Dsir.Scale
  }
}
