package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PseudonymizeSpec extends SparkSpec {
  import sqlImplicits._

  test("same entity gets the same token; different entities differ") {
    val df = Seq("hi a@b.com and c@d.net plus a@b.com end").toDF("t")
    val out = Pseudonymize.withPseudonymizedEmails(df, "t")
      .select($"text_pseudo").as[String].head()
    val tokens = "<EMAIL-[0-9]+>".r.findAllIn(out).toSeq
    tokens.length shouldBe 3
    tokens(0) shouldBe tokens(2) // a@b.com twice
    tokens(0) should not be tokens(1)
    out should startWith("hi <EMAIL-")
    out should endWith(" end")
    out should not include "a@b.com"
    out should not include "c@d.net"
  }

  test("consistency holds ACROSS rows (zero-coordination linkability)") {
    val df = Seq(
      (1L, "contact a@b.com here"),
      (2L, "again a@b.com there")).toDF("id", "t")
    val toks = Pseudonymize.withPseudonymizedEmails(df, "t")
      .select(regexp_extract($"text_pseudo", "<EMAIL-[0-9]+>", 0))
      .as[String].collect()
    toks.toSeq.distinct.length shouldBe 1
  }

  test("text without matches passes through unchanged") {
    val df = Seq("no entities at all.").toDF("t")
    Pseudonymize.withPseudonymizedEmails(df, "t")
      .select($"text_pseudo").as[String].head() shouldBe
      "no entities at all."
  }

  test("a match at the start or end of the text stitches correctly") {
    val df = Seq("x@y.org starts, ends z@w.org").toDF("t")
    val out = Pseudonymize.withPseudonymizedEmails(df, "t")
      .select($"text_pseudo").as[String].head()
    out should fullyMatch regex "<EMAIL-[0-9]+> starts, ends <EMAIL-[0-9]+>"
  }

  test("distinct salts produce distinct token spaces") {
    val df = Seq("a@b.com").toDF("t")
    val t1 = df.select(Pseudonymize.pseudonymize(
      $"t", Redact.EmailPattern, "EMAIL", salt = "s1")).as[String].head()
    val t2 = df.select(Pseudonymize.pseudonymize(
      $"t", Redact.EmailPattern, "EMAIL", salt = "s2")).as[String].head()
    t1 should not be t2
  }

  test("the whole expression is map-only (no exchange, no UDF)") {
    val df = Seq("a@b.com").toDF("t")
    val plan = Pseudonymize.withPseudonymizedEmails(df, "t")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should not include "batchevalpython"
  }
}
