package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupIndex
import graft.sim.Similarity

/** Crash-window coverage for the index-maintenance swap machinery:
  * [[FsSwap.swapIntoPlace]]'s recover-before-destroy guard and the
  * fail-loud maintenance markers ([[Similarity.readIvfIndex]]'s
  * retrain_pending / compact_pending, [[DedupIndex.read]]'s
  * compact_pending). Each test SIMULATES the half-done state a crash
  * would leave and asserts (a) the next operation fails loud with the
  * documented recovery in its message, and (b) the documented recovery
  * actually restores a working index.
  */
class FsSwapSpec extends SparkSpec {
  import sqlImplicits._

  private def fs = new HPath("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def mkTree(): (String, String) = {
    val root = Files.createTempDirectory("fsswap_spec_").toString
    val tmp = s"$root/compact_tmp"
    (root, tmp)
  }

  private def writeOneRow(dir: String, v: Long): Unit =
    Seq(v).toDF("v").repartition(1).write.mode("overwrite").parquet(dir)

  private def readOne(dir: String): Long =
    spark.read.parquet(dir).head.getLong(0)

  test("a clean swap replaces the live copy and leaves no backup") {
    val (root, tmp) = mkTree()
    writeOneRow(s"$root/data", 1L)
    writeOneRow(s"$tmp/data", 2L)
    FsSwap.swapIntoPlace(fs, root, tmp, "data")
    readOne(s"$root/data") shouldBe 2L
    fs.exists(new HPath(s"$root/data_old")) shouldBe false
  }

  test("leftover backup from a prior FINISHED swap is cleared, not " +
    "treated as the live copy") {
    // crash state: swap completed (dst is the new copy) but the final
    // bak delete didn't run — data_old is stale and must not block or
    // pollute the next swap
    val (root, tmp) = mkTree()
    writeOneRow(s"$root/data", 2L)
    writeOneRow(s"$root/data_old", 1L) // stale leftover
    writeOneRow(s"$tmp/data", 3L)
    FsSwap.swapIntoPlace(fs, root, tmp, "data")
    readOne(s"$root/data") shouldBe 3L
    fs.exists(new HPath(s"$root/data_old")) shouldBe false
  }

  test("bak-live-dst-missing (crash between the two renames) fails " +
    "loud and never deletes the only copy; renaming bak back recovers") {
    // crash state: rename(dst -> bak) done, rename(tmp -> dst) not —
    // bak holds the ONLY live copy. A naive delete-bak-first retry
    // would destroy it; the guard must refuse with the recovery hint.
    val (root, tmp) = mkTree()
    writeOneRow(s"$root/data_old", 1L) // the only live copy
    writeOneRow(s"$tmp/data", 2L)
    val err = intercept[IllegalArgumentException] {
      FsSwap.swapIntoPlace(fs, root, tmp, "data")
    }
    err.getMessage should include("prior swap crashed")
    err.getMessage should include("data_old")
    // the only copy survived the refused swap
    readOne(s"$root/data_old") shouldBe 1L
    // documented recovery: rename bak back, then retry
    fs.rename(new HPath(s"$root/data_old"), new HPath(s"$root/data"))
    FsSwap.swapIntoPlace(fs, root, tmp, "data")
    readOne(s"$root/data") shouldBe 2L
    fs.exists(new HPath(s"$root/data_old")) shouldBe false
  }

  // --- maintenance markers: readers must fail loud on half-done
  // maintenance, and the documented recovery must restore service ---

  private def vec(xs: Float*): Array[Float] = xs.toArray

  private def mkIvf(): String = {
    val path = Files.createTempDirectory("fsswap_ivf_").toString
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("id", "vec")
    val idx = Similarity.buildIvfWithCentroids(corpus, "id", "vec",
      Seq((0, vec(1f, 0f)), (1, vec(0f, 1f))))
    Similarity.writeIvfIndex(idx, path)
    path
  }

  test("retrain_pending marker: readIvfIndex fails loud mid-retrain " +
    "and serves again once the marker is cleared") {
    val path = mkIvf()
    val marker = new HPath(s"$path/retrain_pending")
    fs.create(marker, true).close()
    val err = intercept[IllegalArgumentException] {
      Similarity.readIvfIndex(spark, path, "id", "vec")
    }
    err.getMessage should include("mid-retrain")
    err.getMessage should include("remove the marker")
    // documented recovery for the post-swap crash: tables are complete,
    // delete the marker (no *_old copies in this simulated state)
    fs.delete(marker, false)
    Similarity.readIvfIndex(spark, path, "id", "vec")
      .assigned.count() shouldBe 4L
  }

  test("compact_pending marker: readIvfIndex refuses the duplicate- " +
    "serving window and recovery drops the merged-again segments") {
    val path = mkIvf()
    // simulate: compact crashed AFTER the swap (base already holds the
    // segment rows) but BEFORE deleting segments/ — a marker is live
    val batch = Seq((5L, Seq(0.8f, 0.2f))).toDF("id", "vec")
    Similarity.appendToIvfIndex(spark, path, batch, "id", "vec")
    // base now has 5 rows; fake a still-live segment holding a COPY
    val segDir = s"$path/segments/seg0000"
    Similarity.buildIvfWithCentroids(batch, "id", "vec",
      Similarity.readIvfCentroids(spark, path))
      .assigned.write.partitionBy("cell").parquet(s"$segDir/assigned")
    fs.create(new HPath(s"$path/compact_pending"), true).close()
    val err = intercept[IllegalArgumentException] {
      Similarity.readIvfIndex(spark, path, "id", "vec")
    }
    err.getMessage should include("mid-compaction")
    // documented recovery: delete segments/ + compact_tmp/, then marker
    fs.delete(new HPath(s"$path/segments"), true)
    fs.delete(new HPath(s"$path/compact_pending"), false)
    // no duplicates: id 5 served exactly once
    val served = Similarity.readIvfIndex(spark, path, "id", "vec").assigned
    served.count() shouldBe 5L
    served.filter(col("id") === 5L).count() shouldBe 1L
  }

  test("compact_pending marker: DedupIndex.read refuses and recovery " +
    "restores rebuild-equivalent answers") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("fsswap_dedup_").toString
    val params = DedupIndex.Params(shingleSize = 1)
    DedupIndex.write(corpus, "doc_id", "text", path, params)
    // simulate the post-swap, pre-cleanup crash: base already merged
    // (it is — write() produced it), a segment copy still live
    DedupIndex.appendSegment(spark, path,
      Seq((4L, "kappa alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text")
    fs.create(new HPath(s"$path/compact_pending"), true).close()
    val err = intercept[IllegalArgumentException] {
      DedupIndex.read(spark, path)
    }
    err.getMessage should include("mid-compaction")
    err.getMessage should include("remove the marker")
    // the marker also gates everything built on read()
    intercept[IllegalArgumentException] {
      DedupIndex.stats(spark, path)
    }
    intercept[IllegalArgumentException] {
      DedupIndex.compact(spark, path)
    }
    // documented recovery in the swaps-complete case exercised here:
    // treat the segment rows as merged — here the segment is NOT yet
    // merged, so the correct recovery is rename-back-free: just clear
    // the marker (no swap ever ran; the segment union is the truth)
    fs.delete(new HPath(s"$path/compact_pending"), false)
    DedupIndex.read(spark, path).exact.count() shouldBe 4L
  }

  test("a crashed retrain-with-marker end-to-end: compact completes " +
    "after manual recovery and clears the marker") {
    val path = mkIvf()
    val batch = Seq((5L, Seq(0.8f, 0.2f))).toDF("id", "vec")
    Similarity.appendToIvfIndex(spark, path, batch, "id", "vec")
    // healthy retrain: marker must be gone afterwards and the index
    // must serve (i.e. the marker bracketed but did not outlive it)
    Similarity.compactIvfIndexWithRetrain(spark, path, "id", "vec",
      iters = 2)
    fs.exists(new HPath(s"$path/retrain_pending")) shouldBe false
    fs.exists(new HPath(s"$path/segments")) shouldBe false
    fs.exists(new HPath(s"$path/compact_tmp")) shouldBe false
    Similarity.readIvfIndex(spark, path, "id", "vec")
      .assigned.count() shouldBe 5L
  }
}
