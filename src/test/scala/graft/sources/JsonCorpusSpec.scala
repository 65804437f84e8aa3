package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonCorpusSpec extends SparkSpec {
  import sqlImplicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def stage(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toString
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("good lines parse, truncated lines land in the corrupt column") {
    val dir = stage(Seq(
      """{"id":1,"text":"alpha"}""",
      """{"id":2,"text":"beta""", // truncated — no closing brace/quote
      """{"id":3,"text":"gamma"}""",
      """not json at all"""))
    val (valid, corrupt) = JsonCorpus.splitValid(
      JsonCorpus.readJsonl(spark, dir, schema))
    valid.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Seq((1L, "alpha"), (3L, "gamma"))
    corrupt.count() shouldBe 2L
  }

  test("readJsonlWithAudit attaches the corrupt count to every valid row") {
    val dir = stage(Seq(
      """{"id":1,"text":"a"}""", "{{{", """{"id":2,"text":"b"}"""))
    val got = JsonCorpus.readJsonlWithAudit(spark, dir, schema)
    got.count() shouldBe 2L
    got.select("n_corrupt").distinct().collect()
      .map(_.getLong(0)) shouldBe Array(1L)
    // the scalar attaches via a broadcast HASH join, not a nested loop
    val plan = got.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("zero corrupt lines still yields n_corrupt = 0, not an empty join") {
    val dir = stage(Seq("""{"id":7,"text":"x"}"""))
    val got = JsonCorpus.readJsonlWithAudit(spark, dir, schema).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("n_corrupt") shouldBe 0L
  }

  test("a schema already containing the corrupt column is rejected") {
    an[IllegalArgumentException] should be thrownBy
      JsonCorpus.readJsonl(spark, "/tmp/unused",
        schema.add(JsonCorpus.CorruptCol, StringType))
  }

  test("writeJsonl round-trips exactly") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val df = Seq((1L, "with \"quotes\" and \\ slashes"), (2L, "plain"))
      .toDF("id", "text")
    JsonCorpus.writeJsonl(df, dir)
    val (valid, corrupt) = JsonCorpus.splitValid(
      JsonCorpus.readJsonl(spark, dir, schema))
    corrupt.count() shouldBe 0L
    valid.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Seq((1L, "with \"quotes\" and \\ slashes"), (2L, "plain"))
  }
}
