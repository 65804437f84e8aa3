package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import sqlImplicits._

  test("metrics ride the write pass and report consumed rows exactly") {
    val df = Seq((1L, Some("a")), (2L, None: Option[String]),
      (3L, Some("c"))).toDF("id", "text")
    val out = Files.createTempDirectory("audit_").toString
    val m = Audit.observed(df, Map(
      "rows" -> count(lit(1)),
      "null_texts" -> count(when($"text".isNull, 1)),
      "id_sum" -> sum($"id")))(
      _.write.mode("overwrite").parquet(out))
    m("rows") shouldBe 3L
    m("null_texts") shouldBe 1L
    m("id_sum") shouldBe 6L
    spark.read.parquet(out).count() shouldBe 3L // the write really ran
  }

  test("metrics see the rows the ACTION consumed (filtered branch)") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("id")
    val m = Audit.observed(df, Map("rows" -> count(lit(1)))) { d =>
      d.filter($"id" > 2L).write.format("noop").mode("overwrite").save()
    }
    // the observe node sits below the filter: all 4 rows flow past it
    m("rows") shouldBe 4L
  }
}
