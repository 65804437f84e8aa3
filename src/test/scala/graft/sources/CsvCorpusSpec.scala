package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class CsvCorpusSpec extends SparkSpec {
  import sqlImplicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("n", LongType)))

  private def stage(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("csv").toString
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("good rows parse; mistyped and over-wide rows land in the corrupt column") {
    val dir = stage(Seq(
      "1,alpha,10",
      "2,beta,xx",      // type error in a LONG column
      "3,gamma,30",
      "4,delta,40,EXTRA")) // too many fields
    val (valid, corrupt) = CsvCorpus.splitValid(
      CsvCorpus.readCsv(spark, dir, schema))
    valid.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))) shouldBe
      Seq((1L, "alpha", 10L), (3L, "gamma", 30L))
    corrupt.collect().map(_.getString(0)).sorted shouldBe
      Array("2,beta,xx", "4,delta,40,EXTRA")
  }

  test("readCsvWithAudit attaches the corrupt count via a broadcast hash join") {
    val dir = stage(Seq("1,a,1", "oops", "2,b,2"))
    val got = CsvCorpus.readCsvWithAudit(spark, dir, schema)
    got.count() shouldBe 2L
    got.select("n_corrupt").distinct().collect()
      .map(_.getLong(0)) shouldBe Array(1L)
    val plan = got.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("zero corrupt rows still yields n_corrupt = 0") {
    val dir = stage(Seq("7,x,70"))
    val got = CsvCorpus.readCsvWithAudit(spark, dir, schema).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("n_corrupt") shouldBe 0L
  }

  test("alternate delimiter (TSV) round-trips through the native sink") {
    val dir = Files.createTempDirectory("tsv_out").toString
    val df = Seq((1L, "a b", 10L), (2L, "c,d", 20L)).toDF("id", "name", "n")
    CsvCorpus.writeCsv(df, dir, delimiter = "\t")
    val back = CsvCorpus.readCsv(spark, dir, schema, delimiter = "\t")
    val (valid, corrupt) = CsvCorpus.splitValid(back)
    corrupt.count() shouldBe 0L
    valid.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))) shouldBe
      Seq((1L, "a b", 10L), (2L, "c,d", 20L))
  }
}
