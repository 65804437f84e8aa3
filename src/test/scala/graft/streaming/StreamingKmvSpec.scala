package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sketch.Kmv

class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_skmv_in_").toString
    (0 until 40)
      .map(i => (i.toLong, s"g${i % 2}", s"tok${i % 7} tok${(i + 1) % 7}",
        f"b${i / 20}%02d"))
      .toDF("id", "g", "text", "block")
      .repartition(col("block"))
      .write.partitionBy("block").mode("overwrite").parquet(p)
    p
  }

  private def runSink(staged: String, base: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(staged).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .select(col("block"), col("g"),
        explode(split(col("text"), " ")).as("tok"))
    Streaming.kmvSketchSink(
      stream, Seq("g"), col("tok"), k = 4,
      b => b.agg(min(col("block")).as("batch_block")),
      s"$base/sketch", ckpt).awaitTermination()
  }

  test("merged streaming sketch equals the batch sketch exactly") {
    val staged = stage()
    val base = java.nio.file.Files
      .createTempDirectory("graft_skmv_out_").toString
    runSink(staged, base, s"$base/ckpt1")
    val merged = Streaming.mergedKmvSketch(spark, s"$base/sketch", Seq("g"), 4)
      .orderBy("g", "h").collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = spark.read.parquet(staged)
      .select(col("g"), explode(split(col("text"), " ")).as("tok"))
    val batch = Kmv.sketch(toks, Seq("g"), col("tok"), 4)
      .orderBy("g", "h").collect().map(r => (r.getString(0), r.getLong(1)))
    merged shouldBe batch
    merged.length shouldBe 8 // 2 groups x k=4 (7 distinct toks > k)
  }

  test("a full replay is idempotent: the store is unchanged") {
    val staged = stage()
    val base = java.nio.file.Files
      .createTempDirectory("graft_skmv_out2_").toString
    runSink(staged, base, s"$base/ckptA")
    val first = spark.read.parquet(s"$base/sketch")
      .orderBy("batch_block", "g", "h").collect().toSeq
    // fresh checkpoint = the whole stream replays into the same store
    runSink(staged, base, s"$base/ckptB")
    val second = spark.read.parquet(s"$base/sketch")
      .orderBy("batch_block", "g", "h").collect().toSeq
    second shouldBe first
  }
}
