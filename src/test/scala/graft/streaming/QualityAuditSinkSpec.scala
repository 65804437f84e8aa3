package graft.streaming

import graft.SparkSpec
import graft.operators.Checks
import org.apache.spark.sql.functions._

class QualityAuditSinkSpec extends SparkSpec {
  import sqlImplicits._

  private val checks = Seq(
    Checks.Complete("payload"),
    Checks.Satisfies("v_pos", col("v") > 0),
    Checks.RowCountBetween(1, 10))

  private def stage(base: String): Unit = {
    // three block files; block b1 carries the violations
    Seq((0L, Some("a"), 1L), (1L, Some("b"), 2L)).toDF("id", "payload", "v")
      .withColumn("block", lit("b0")).coalesce(1)
      .write.partitionBy("block").mode("append").parquet(base)
    Seq((10L, None: Option[String], -5L)).toDF("id", "payload", "v")
      .withColumn("block", lit("b1")).coalesce(1)
      .write.partitionBy("block").mode("append").parquet(base)
    Seq((20L, Some("c"), 3L)).toDF("id", "payload", "v")
      .withColumn("block", lit("b2")).coalesce(1)
      .write.partitionBy("block").mode("append").parquet(base)
  }

  private def runSink(src: String, audit: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = Streaming.qualityAuditSink(
      stream, checks,
      b => b.agg(min(col("block")).as("batch_block")),
      audit, ckpt)
    q.awaitTermination()
  }

  test("per-batch audit rows, content-keyed, idempotent under re-runs") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_qaudit_").toString
    stage(s"$base/src")
    runSink(s"$base/src", s"$base/audit", s"$base/ckpt1")
    val got = spark.read.parquet(s"$base/audit")
      .collect().map(r => (r.getAs[String]("batch_block"),
        r.getAs[String]("check")) ->
        (r.getAs[Long]("violations"), r.getAs[Long]("total"),
          r.getAs[Boolean]("passed"))).toMap
    got.size shouldBe 9 // 3 blocks × 3 checks
    got(("b0", "complete(payload)")) shouldBe ((0L, 2L, true))
    got(("b1", "complete(payload)")) shouldBe ((1L, 1L, false))
    got(("b1", "satisfies(v_pos)")) shouldBe ((1L, 1L, false))
    got(("b2", "satisfies(v_pos)")) shouldBe ((0L, 1L, true))
    got(("b0", "row_count_between(1,10)")) shouldBe ((0L, 2L, true))

    // replay with a FRESH checkpoint: dynamic partition overwrite keeps
    // one row per (block, check) — no duplicate audit rows
    runSink(s"$base/src", s"$base/audit", s"$base/ckpt2")
    spark.read.parquet(s"$base/audit").count() shouldBe 9L
  }
}
