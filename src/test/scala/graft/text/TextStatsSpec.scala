package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import sqlImplicits._

  test("token count and whitespace tokens") {
    val df = Seq("a b c", "single").toDF("text")
    df.select(TextStats.tokenCount(col("text"))).collect().map(_.getInt(0)).toSeq shouldBe
      Seq(3, 1)
  }

  test("regex tokenizer splits letter runs, digit runs, and symbols") {
    val df = Seq("foo123 bar!baz, qux").toDF("text")
    val got = df.select(TextStats.tokenizeRegex(col("text"))).collect()
      .head.getSeq[String](0)
    got shouldBe Seq("foo", "123", "bar", "!", "baz", ",", "qux")
  }

  test("quality stats on a known string") {
    val text = "The cat, the hat!"
    val df = TextStats.withQualityStats(Seq(text).toDF("text"), "text")
    val r = df.collect().head
    r.getAs[Int]("n_chars_text") shouldBe 17
    r.getAs[Int]("n_tokens") shouldBe 4
    // tokens: The / cat, / the / hat! -> avg token len (17 - 3) / 4
    r.getAs[Double]("avg_token_len") shouldBe 3.5
    r.getAs[Double]("punct_ratio") shouldBe 2.0 / 17
    r.getAs[Double]("upper_ratio") shouldBe 1.0 / 17
    r.getAs[Double]("digit_ratio") shouldBe 0.0
    // lowercase "the" is a stopword; "The" (capitalized) is not
    r.getAs[Double]("stopword_ratio") shouldBe 1.0 / 4
  }

  test("language id picks the language with the most marker tokens") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "le chat est sur la table et il est content",
      "der hund und die katze sind nicht da",
      "el gato y el perro en la casa",
      "no markers whatsoever here xyzzy").toDF("text")
    val got = df.select(TextStats.langId(col("text"))).collect().map(_.getString(0)).toSeq
    got shouldBe Seq("en", "fr", "de", "es", "en") // no markers -> first lang
  }

  test("fingerprints are stable under normalization") {
    val df = Seq(
      ("Hello   World", "hello world"),
      ("  hello world ", "hello world")).toDF("a", "b")
    val rows = df.select(
      TextStats.fingerprint64(col("a")) === TextStats.fingerprint64(col("b")),
      TextStats.fingerprintMd5(col("a")) === TextStats.fingerprintMd5(col("b"))).collect()
    all(rows.map(r => (r.getBoolean(0), r.getBoolean(1)))) shouldBe (true, true)
  }

  test("different texts fingerprint differently") {
    val df = Seq(("hello world", "goodbye world")).toDF("a", "b")
    val r = df.select(
      TextStats.fingerprint64(col("a")) === TextStats.fingerprint64(col("b"))).collect().head
    r.getBoolean(0) shouldBe false
  }

  test("tokenSetRatio counts duplicate hits") {
    val df = Seq("the cat the dog the bird").toDF("text")
    val r = df.select(TextStats.tokenSetRatio(col("text"), Seq("the"))).collect().head
    r.getDouble(0) shouldBe 3.0 / 6
  }
}
