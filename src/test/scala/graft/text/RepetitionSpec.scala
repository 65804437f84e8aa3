package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import sqlImplicits._

  test("ngrams builds space-joined word n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a b", "a").toDF("text")
    val got = df.select(Repetition.ngrams(TextStats.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq()
    got(2) shouldBe Seq()
  }

  test("dup n-gram fraction counts occurrences beyond the first") {
    // 2-grams of "a b a b a": (a b, b a, a b, b a) -> 4 grams, 2 distinct
    val df = Seq("a b a b a").toDF("text")
    df.select(Repetition.dupNgramFraction(col("text"), 2))
      .collect().head.getDouble(0) shouldBe 0.5
    // no repeats -> 0
    Seq("x y z").toDF("text")
      .select(Repetition.dupNgramFraction(col("text"), 2))
      .collect().head.getDouble(0) shouldBe 0.0
    // fewer than n tokens -> 0 by definition
    Seq("x").toDF("text")
      .select(Repetition.dupNgramFraction(col("text"), 2))
      .collect().head.getDouble(0) shouldBe 0.0
  }

  test("top n-gram char fraction covers count * gram chars over text chars") {
    // "ab cd ab cd ab": top 2-gram is "ab cd" (x2) or "cd ab" (x2);
    // tie breaks to the lexicographically GREATEST gram: "cd ab" (5 chars)
    val text = "ab cd ab cd ab"
    val df = Seq(text).toDF("text")
    df.select(Repetition.topNgramCharFraction(col("text"), 2))
      .collect().head.getDouble(0) shouldBe (2.0 * 5) / text.length
    // single dominant gram: "x x x x" -> "x x" appears 3 times
    val t2 = "x x x x"
    Seq(t2).toDF("text")
      .select(Repetition.topNgramCharFraction(col("text"), 2))
      .collect().head.getDouble(0) shouldBe (3.0 * 3) / t2.length
  }

  test("line signals trim, drop blanks, and measure repeats by chars too") {
    val text = "hello world\n\n  hello world  \nunique line\n"
    val df = Seq(text).toDF("text")
    val r = Repetition.withRepetitionStats(df, "text", ngramNs = Seq(2))
      .collect().head
    // lines: [hello world, hello world, unique line] -> 1 of 3 is a repeat
    r.getAs[Double]("dup_line_frac") shouldBe 1.0 / 3
    // chars: 11 + 11 + 11 = 33 total, 11 in the repeat
    r.getAs[Double]("dup_line_char_frac") shouldBe 11.0 / 33
  }

  test("signals match a brute-force Scala computation on varied docs") {
    val docs = Seq(
      "key agg row scan slow fast table value part hash",
      "a a a a a a",
      "merge batch part value fast spark a a the line sort",
      "one two one two one two three",
      "solo")
    val got = Repetition.withRepetitionStats(
      docs.toDF("text"), "text", ngramNs = Seq(2, 3))
      .select("dup_2gram_frac", "top_2gram_char_frac", "dup_3gram_frac")
      .collect()
    docs.zip(got).foreach { case (text, row) =>
      val toks = text.split(" ").toSeq
      def grams(n: Int) = if (toks.size < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val g2 = grams(2)
      val expDup2 = if (g2.isEmpty) 0.0
        else (g2.size - g2.distinct.size).toDouble / g2.size
      row.getDouble(0) shouldBe expDup2
      val expTop2 = if (g2.isEmpty) 0.0 else {
        val (gram, c) = g2.groupBy(identity).view.mapValues(_.size).toSeq
          .maxBy { case (g, c) => (c, g) }
        c * gram.length.toDouble / text.length
      }
      row.getDouble(1) shouldBe expTop2
      val g3 = grams(3)
      val expDup3 = if (g3.isEmpty) 0.0
        else (g3.size - g3.distinct.size).toDouble / g3.size
      row.getDouble(2) shouldBe expDup3
    }
  }

  test("native stats match the HOF witness bit-for-bit on adversarial docs") {
    val rng = new scala.util.Random(41)
    val words = Seq("a", "bb", "ccc", "dd", "a", "é", "日本", "x")
    val random = (0 until 80).map { _ =>
      (0 until rng.nextInt(30)).map(_ => words(rng.nextInt(words.size)))
        .mkString(" ")
    }
    val edges = Seq(
      "", " ", "  ", "a", "a ", " a", "a  b", "a b a b a",
      "é é é", "日本 語 日本 語", "a b", "x x x x",
      "tie z tie z a tie z") // count tie: greatest gram must win
    val docs = (random ++ edges).toDF("text")
    val got = docs.select(
      Repetition.dupNgramFraction(col("text"), 2).as("d2"),
      Repetition.topNgramCharFraction(col("text"), 2).as("t2"),
      Repetition.dupNgramFraction(col("text"), 3).as("d3"),
      Repetition.topNgramCharFraction(col("text"), 3).as("t3"),
      Repetition.dupNgramFractionHof(col("text"), 2).as("hd2"),
      Repetition.topNgramCharFractionHof(col("text"), 2).as("ht2"),
      Repetition.dupNgramFractionHof(col("text"), 3).as("hd3"),
      Repetition.topNgramCharFractionHof(col("text"), 3).as("ht3"))
      .collect()
    got.foreach { r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(4))
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(5))
      java.lang.Double.doubleToRawLongBits(r.getDouble(2)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(6))
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(7))
    }
  }

  test("native stats run under forced codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq("a b a b a", "solo", "")
        .toDF("text")
        .select(Repetition.ngramStats(col("text"), 2).as("s"))
        .select(col("s.total"), col("s.distinct"), col("s.top_count"),
          col("s.top_chars"))
        .collect()
      got(0).toSeq shouldBe Seq(4, 2, 2, 3) // grams: a b, b a, a b, b a
      got(1).toSeq shouldBe Seq(0, 0, 0, 0)
      got(2).toSeq shouldBe Seq(0, 0, 0, 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("the plan is map-only: no exchange, no UDF") {
    val df = Repetition.withRepetitionStats(
      Seq("a b c a b").toDF("text"), "text")
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should not include "batchevalpython"
  }
}
