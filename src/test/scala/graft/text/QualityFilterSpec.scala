package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFilterSpec extends SparkSpec {
  import sqlImplicits._

  private def filtered(rows: (Long, String)*) =
    QualityFilter.withQualityFilter(
      rows.toDF("id", "text"), "text",
      QualityFilter.gopherRules(col("text"),
        minWords = 3, maxWords = 6, minMeanWordLen = 2.0,
        maxMeanWordLen = 8.0, minStopwordRatio = 0.2,
        stopwords = Seq("the", "a")))
      .select("id", "fail_reasons", "keep")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap

  test("clean documents keep with empty reasons") {
    val got = filtered((1L, "the quick brown fox jumps"))
    got(1L) shouldBe (("", true))
  }

  test("each violated rule contributes its code, in rule order") {
    val got = filtered(
      (1L, "hi yo"), // 2 words < 3; mean len 2.5 ok; no stopwords
      (2L, "one two three four five six seven"), // 7 > 6 words, no stopwords
      (3L, "the aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb")) // mean len > 8
    got(1L)._1 shouldBe "too_few_words|low_stopword_ratio"
    got(1L)._2 shouldBe false
    got(2L)._1 shouldBe "too_many_words|low_stopword_ratio"
    got(3L)._1 shouldBe "mean_word_length"
  }

  test("drop rates count each rule across the corpus") {
    val df = QualityFilter.withQualityFilter(
      Seq((1L, "hi yo"), (2L, "ho he"), (3L, "the quick brown fox jumps"))
        .toDF("id", "text"),
      "text",
      QualityFilter.gopherRules(col("text"), minWords = 3, maxWords = 100,
        minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
        minStopwordRatio = 0.2, stopwords = Seq("the")))
    val rates = QualityFilter.dropRates(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates("too_few_words") shouldBe 2L
    rates("low_stopword_ratio") shouldBe 2L
    df.filter(col("keep")).count() shouldBe 1L
  }

  test("null text is rejected, not silently passed") {
    // every rule predicate is NULL on null text — without the explicit
    // guard such rows would keep=true with no reasons
    val got = QualityFilter.withQualityFilter(
      Seq((1L, null: String), (2L, "the quick brown fox jumps"))
        .toDF("id", "text"),
      "text",
      QualityFilter.gopherRules(org.apache.spark.sql.functions.col("text"),
        minWords = 3, maxWords = 100, minMeanWordLen = 1.0,
        maxMeanWordLen = 10.0, minStopwordRatio = 0.1,
        stopwords = Seq("the")))
      .select("id", "fail_reasons", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    got(1L) shouldBe (("null_text", false))
    got(2L)._2 shouldBe true
  }

  test("rule names containing the separator, empty or reserved are rejected") {
    def run(name: String) =
      QualityFilter.withQualityFilter(
        Seq((1L, "x")).toDF("id", "text"), "text",
        Seq(QualityFilter.Rule(name, lit(true))))
    an[IllegalArgumentException] should be thrownBy run("a|b")
    an[IllegalArgumentException] should be thrownBy run("")
    an[IllegalArgumentException] should be thrownBy run("null_text")
  }

  test("duplicate rule names rejected") {
    an[IllegalArgumentException] should be thrownBy
      QualityFilter.withQualityFilter(
        Seq((1L, "x")).toDF("id", "text"), "text",
        Seq(QualityFilter.Rule("r", lit(true)),
          QualityFilter.Rule("r", lit(false))))
  }

  test("a NULL rule result counts as not-violated, explicitly") {
    // a caller-supplied rule whose predicate evaluates to NULL on
    // non-NULL text (divide-by-zero ratio) must not poison the whole
    // reason string: other rules still report, keep is still honest
    val nullRule = QualityFilter.Rule(
      "bad_ratio", expr("try_divide(1.0, length(text) - length(text)) > 0.5"))
    val always = QualityFilter.Rule("always", lit(true))
    val got = QualityFilter.withQualityFilter(
      Seq((1L, "hello world")).toDF("id", "text"), "text",
      Seq(nullRule, always))
      .select("fail_reasons", "keep").collect().head
    got.getString(0) shouldBe "always" // NULL rule skipped, not poisoning
    got.getBoolean(1) shouldBe false
    // and a doc failing NO evaluable rule keeps despite the NULL rule
    val kept = QualityFilter.withQualityFilter(
      Seq((1L, "hello world")).toDF("id", "text"), "text",
      Seq(nullRule))
      .select("keep").collect().head.getBoolean(0)
    kept shouldBe true
  }
}
