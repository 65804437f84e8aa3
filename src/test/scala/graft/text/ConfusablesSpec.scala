package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConfusablesSpec extends SparkSpec {
  import sqlImplicits._

  test("a Cyrillic-spoofed word skeletons to its plain form") {
    // "pаypаl": Cyrillic а in both positions
    val df = Seq("p\u0430yp\u0430l", "paypal").toDF("t")
    val sk = df.select(Confusables.skeleton($"t").as("s"))
      .as[String].collect()
    sk.toSeq.distinct shouldBe Seq("paypal")
  }

  test("invisible characters are stripped") {
    val df = Seq("foo\u200Bbar\u200D baz\u00AD").toDF("t")
    df.select(Confusables.skeleton($"t")).as[String].head() shouldBe
      "foobar baz"
  }

  test("uppercase homoglyphs fold then lowercase") {
    // Greek capital Rho + Cyrillic capital О
    val df = Seq("\u03A1\u041Eboto").toDF("t")
    df.select(Confusables.skeleton($"t")).as[String].head() shouldBe
      "poboto"
  }

  test("plain ASCII is only lowercased, never altered") {
    val df = Seq("Hello, World! 123").toDF("t")
    df.select(Confusables.skeleton($"t")).as[String].head() shouldBe
      "hello, world! 123"
  }

  test("the mapping table is well-formed") {
    Confusables.From.length shouldBe
      Confusables.To.length + Confusables.Invisible.length
    Confusables.From.toSeq.distinct.length shouldBe Confusables.From.length
    all(Confusables.To.toSeq) should be < 128.toChar // targets are ASCII
    all(Confusables.Mapped.map(_._1)) should be >= 128.toChar // sources aren't
  }

  test("skeleton keys restore exact-dedup grouping under spoofing") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick br\u043Ewn f\u043Ex\u200B"), // spoofed copy of 1
      (3L, "an unrelated document")).toDF("id", "t")
    val groups = docs
      .groupBy(Confusables.skeleton($"t").as("k"))
      .agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect().sorted
    groups.toSeq shouldBe Seq(1L, 2L)
  }
}
