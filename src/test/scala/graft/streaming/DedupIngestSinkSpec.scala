package graft.streaming

import graft.SparkSpec
import graft.dedup.DedupIndex
import org.apache.spark.sql.functions._

class DedupIngestSinkSpec extends SparkSpec {
  import sqlImplicits._

  // corpus + three ingest blocks exercising every dedup edge:
  //   block 0: one exact corpus dup (drops), one fresh doc (survives)
  //   block 1: one near-dup OF A BLOCK-0 SURVIVOR (drops — the proof
  //            survivors joined the index), one fresh doc
  //   block 2: one exact dup of a BLOCK-1 survivor (drops), one fresh
  private val corpusDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"))
  private val block0 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"), // exact corpus dup
    (11L, "red orange yellow green blue indigo violet"))
  private val block1 = Seq(
    (20L, "red orange yellow green blue indigo"), // near-dup of 11
    (21L, "cat dog bird fish mouse horse"))
  private val block2 = Seq(
    (30L, "cat dog bird fish mouse horse"), // exact dup of 21
    (31L, "north south east west up down"))

  /** One parquet file per block, names and mtimes both increasing so
    * the file stream's batch order is pinned under either ordering.
    */
  private def stage(root: java.nio.file.Path): Unit = {
    val blocks = Seq(block0, block1, block2)
    blocks.zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_dis_blk_")
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

  private def runSink(src: String, indexPath: String, base: String,
      ckpt: String): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    Streaming.dedupIngestSink(
      stream, indexPath, s"$base/survivors", ckpt,
      "doc_id", "text", threshold = 0.8)
      .awaitTermination()
  }

  test("batch-by-batch survivors; survivors join the index; idempotent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dis_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_dis_src_")
    stage(src)
    val indexPath = s"$base/index"
    DedupIndex.write(corpusDocs.toDF("doc_id", "text"),
      "doc_id", "text", indexPath,
      DedupIndex.Params(shingleSize = 1, numHashes = 64, bands = 16))

    runSink(src.toString, indexPath, base, s"$base/ckpt1")

    val survivors = spark.read.parquet(s"$base/survivors")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // 10 exact-dups corpus; 20 near-dups survivor 11 (jaccard 6/7 ≥
    // 0.8 — only possible if 11's segment is served); 30 exact-dups
    // survivor 21
    survivors shouldBe Set(11L, 21L, 31L)

    // the index now holds base + one NAMED segment per batch
    val segs = new java.io.File(s"$indexPath/segments").list().sorted
    segs.toSeq shouldBe Seq("seg_b00000", "seg_b00001", "seg_b00002")

    // a later batch deduped against the grown index sees the survivors
    val later = DedupIndex.dedupAgainst(
      Seq((40L, "north south east west up down"), // dup of 31
        (41L, "totally fresh content here")).toDF("doc_id", "text"),
      DedupIndex.read(spark, indexPath), "doc_id", "text", 0.8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    later shouldBe Set(41L)

    // replay with a FRESH checkpoint: same batch order → same named
    // segments overwritten with the same content, same survivors —
    // nothing duplicated, nothing self-deduped
    runSink(src.toString, indexPath, base, s"$base/ckpt2")
    spark.read.parquet(s"$base/survivors")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet shouldBe
      Set(11L, 21L, 31L)
    new java.io.File(s"$indexPath/segments").list().sorted.toSeq shouldBe
      Seq("seg_b00000", "seg_b00001", "seg_b00002")
  }

  test("takedown before ingest: a streamed batch serves rebuild-" +
    "without-deleted, and compact folds tombstones with the segments") {
    // the round-13 delete composed with the round-12 streaming
    // lifecycle: corpus doc 1 is taken down BEFORE the stream runs, so
    // block-0's doc 10 — whose ONLY dedup cause was doc 1 — must now
    // SURVIVE and join the index; everything downstream is unchanged
    // (20 still near-dups block-0 survivor 11, 30 still exact-dups 21)
    val base = java.nio.file.Files
      .createTempDirectory("graft_dis_del_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_dis_del_src_")
    stage(src)
    val indexPath = s"$base/index"
    DedupIndex.write(corpusDocs.toDF("doc_id", "text"),
      "doc_id", "text", indexPath,
      DedupIndex.Params(shingleSize = 1, numHashes = 64, bands = 16))
    DedupIndex.delete(indexPath, Seq(1L).toDF("doc_id"))

    runSink(src.toString, indexPath, base, s"$base/ckpt")
    spark.read.parquet(s"$base/survivors")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet shouldBe
      Set(10L, 11L, 21L, 31L)

    // one compact folds BOTH the pending tombstone and the stream's
    // segments; the served index equals a rebuild over the live set
    DedupIndex.compact(spark, indexPath)
    new java.io.File(s"$indexPath/tombstones").exists() shouldBe false
    new java.io.File(s"$indexPath/segments").exists() shouldBe false
    val probe = Seq(
      (90L, "alpha beta gamma delta epsilon zeta"), // dup of streamed 10
      (91L, "one two three four five six seven"),   // dup of corpus 2
      (92L, "fresh never seen before text"))
      .toDF("doc_id", "text")
    DedupIndex.dedupAgainst(probe, DedupIndex.read(spark, indexPath),
      "doc_id", "text", 0.8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet shouldBe
      Set(92L)
  }

  test("read with excludeSegments hides exactly the named segment") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dis_ex_").toString
    DedupIndex.write(corpusDocs.toDF("doc_id", "text"),
      "doc_id", "text", base,
      DedupIndex.Params(shingleSize = 1, numHashes = 64, bands = 16))
    DedupIndex.appendSegment(spark, base,
      Seq((50L, "red orange yellow green blue indigo violet"))
        .toDF("doc_id", "text"),
      "doc_id", "text", Some("seg_b00007"))
    DedupIndex.read(spark, base).sets.count() shouldBe 3L
    DedupIndex.read(spark, base, Set("seg_b00007")).sets.count() shouldBe 2L
    // auto-numbered appends skip over named segments without parsing
    DedupIndex.appendSegment(spark, base,
      Seq((51L, "some more fresh text rows")).toDF("doc_id", "text"),
      "doc_id", "text")
    new java.io.File(s"$base/segments").list().sorted.toSeq shouldBe
      Seq("seg0000", "seg_b00007")
  }
}
