package graft.streaming

import graft.SparkSpec
import graft.dedup.SubstringDedup
import org.apache.spark.sql.functions._

/** Streaming ingest into the substring-fingerprint index — the third
  * index family's [[Streaming.substringIngestSink]]: streamed ≡ batch
  * (winnowing is order-free), replay-idempotent via batchId-named
  * segments, and the takedown seam fails loud per batch.
  */
class SubstringIngestSinkSpec extends SparkSpec {
  import sqlImplicits._

  // base corpus + two ingest blocks; doc 20 plants a shared >= 23-byte
  // substring with base doc 1 so cross-generation matches are served
  private val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight again"),
    (2L, "a second corpus document sharing nothing with any other"))
  private val block0 = Seq(
    (10L, "first streamed doc with its own completely novel span here"))
  private val block1 = Seq(
    (20L, "prefix the quick brown fox jumps over the lazy dog tonight"))

  private def stage(root: java.nio.file.Path): Unit = {
    Seq(block0, block1).zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_sis_blk_")
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) part = p
      }
      val dst = root.resolve(f"block$i%04d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + i * 60000L))
    }
  }

  private def runSink(src: String, indexPath: String, ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    Streaming.substringIngestSink(stream, indexPath, ckpt,
      "doc_id", "text").awaitTermination()
  }

  private val probe = Seq(
    (90L, "xx the quick brown fox jumps over the lazy dog tonight yy"),
    (91L, "also first streamed doc with its own completely novel span"))
    .toDF("doc_id", "text")

  private def matches(p: String) =
    SubstringDedup.matchesAgainstIndex(spark, p, probe, "doc_id", "text")
      .select($"batch_id", $"corpus_id", $"pos_b", $"pos_c", $"snippet")
      .collect().toSet

  test("streamed index equals batch-built over the union; replay with " +
    "a fresh checkpoint is idempotent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sis_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_sis_src_")
    stage(src)
    val indexPath = s"$base/index"
    SubstringDedup.writeFingerprintIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text", indexPath,
      k = 8, window = 8, maxDocFreq = 10L)
    runSink(src.toString, indexPath, s"$base/ckpt1")

    // one batchId-named segment per block
    new java.io.File(s"$indexPath/segments").list().sorted.toSeq shouldBe
      Seq("seg_b00000", "seg_b00001")

    // served matches equal a one-shot batch build over the union (the
    // df cap never binds on this corpus, so the scopes agree exactly)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_sis_rebuild_").toString
    SubstringDedup.writeFingerprintIndex(
      (corpusDocs ++ block0 ++ block1).toDF("doc_id", "text"),
      "doc_id", "text", rebuilt, k = 8, window = 8, maxDocFreq = 10L)
    val got = matches(indexPath)
    got shouldBe matches(rebuilt)
    // both generations serve: base doc 1 and streamed docs 10/20
    got.map(_.getLong(1)) should contain allOf (1L, 10L, 20L)

    // replay: same blocks, fresh checkpoint → segments overwritten in
    // place, answers unchanged (no duplicate segment, no drift)
    runSink(src.toString, indexPath, s"$base/ckpt2")
    new java.io.File(s"$indexPath/segments").list().sorted.toSeq shouldBe
      Seq("seg_b00000", "seg_b00001")
    matches(indexPath) shouldBe got

    // compaction folds the streamed segments; answers unchanged
    SubstringDedup.compactFingerprintIndex(spark, indexPath)
    new java.io.File(s"$indexPath/segments").exists() shouldBe false
    matches(indexPath) shouldBe got
  }

  test("takedown seam: a stream carrying a tombstoned id fails the " +
    "batch loud instead of resurrecting taken-down text") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sis_td_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_sis_td_src_")
    stage(src)
    val indexPath = s"$base/index"
    SubstringDedup.writeFingerprintIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text", indexPath,
      k = 8, window = 8, maxDocFreq = 10L)
    // doc 20 is taken down before the stream replays it in block 1
    SubstringDedup.deleteFromFingerprintIndex(indexPath,
      Seq(20L).toDF("doc_id"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runSink(src.toString, indexPath, s"$base/ckpt")
    }
    err.getMessage should include("tombstoned")
    // block 0 (before the poisoned batch) landed; block 1 did not
    new java.io.File(s"$indexPath/segments").list().sorted.toSeq shouldBe
      Seq("seg_b00000")
    // purge lifts the fence; a restart with a fresh checkpoint drains
    SubstringDedup.purgeFingerprintIndex(spark, indexPath,
      Seq(20L).toDF("doc_id"))
    runSink(src.toString, indexPath, s"$base/ckpt2")
    new java.io.File(s"$indexPath/segments").list().sorted.toSeq shouldBe
      Seq("seg_b00000", "seg_b00001")
    matches(indexPath).map(_.getLong(1)) should contain (20L)
  }
}
