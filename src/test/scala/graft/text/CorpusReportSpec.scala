package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CorpusReportSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    ("web", "one two three"),
    ("web", "four five"),
    ("books", "six seven eight nine"),
    ("books", ""),
    ("books", "ten"))

  test("per-source rows plus one grand total, all integers exact") {
    val got = CorpusReport.report(
      docs.toDF("source", "text"), "source", "text")
      .orderBy(col("is_total"), col("source"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    got shouldBe Seq(
      (Some("books"), false, 3L, 5L, 23L, 0L, 4L),
      (Some("web"), false, 2L, 5L, 22L, 2L, 3L),
      (None, true, 5L, 10L, 45L, 0L, 4L))
  }

  test("empty documents count zero tokens, not one") {
    val got = CorpusReport.report(
      Seq(("s", "")).toDF("source", "text"), "source", "text")
      .filter(col("is_total")).collect().head
    got.getAs[Long]("n_tokens") shouldBe 0L
    got.getAs[Long]("n_docs") shouldBe 1L
  }

  test("one aggregate computes every level: a single Expand, no union") {
    val plan = CorpusReport.report(
      docs.toDF("source", "text"), "source", "text")
      .queryExecution.executedPlan.toString
    plan should include("Expand")
    plan should not include "Union"
  }
}
