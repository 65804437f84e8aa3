package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StoredCusumSpec extends SparkSpec {
  import sqlImplicits._

  test("split and re-delivered buckets merge by sum; store == batch") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_storedcusum_").toString
    // batch b00 and b01 both carry part of bucket (g, 1): the store
    // must sum them; b01 landed twice (partition overwrite) — the
    // second write replaces, not duplicates
    Seq(("g", 0L, 10L, "b00"), ("g", 1L, 4L, "b00"))
      .toDF("grp", "ord", "x", "batch_block")
      .write.partitionBy("batch_block").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(base)
    for (_ <- 1 to 2)
      Seq(("g", 1L, 6L, "b01"), ("g", 2L, 30L, "b01"))
        .toDF("grp", "ord", "x", "batch_block")
        .write.partitionBy("batch_block").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(base)

    val stored = Streaming.storedCusum(spark, base, Seq("grp"), "ord",
      "x", k = 10L, threshold = 15L)
      .collect()
      .map(r => r.getAs[Long]("ord") ->
        ((r.getAs[Long]("x"), r.getAs[Long]("cusum_high"),
          r.getAs[Boolean]("alarm_high"))))
      .toMap

    val batch = graft.operators.ChangePoint.cusum(
      Seq(("g", 0L, 10L), ("g", 1L, 10L), ("g", 2L, 30L))
        .toDF("grp", "ord", "x"),
      Seq("grp"), "ord", "x", k = 10L, threshold = 15L)
      .collect()
      .map(r => r.getAs[Long]("ord") ->
        ((r.getAs[Long]("x"), r.getAs[Long]("cusum_high"),
          r.getAs[Boolean]("alarm_high"))))
      .toMap

    stored shouldBe batch
    stored(1L)._1 shouldBe 10L // 4 + 6 merged, not 4,6 or 16
    stored(2L) shouldBe ((30L, 20L, true))
  }
}
