package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generation-pointer IVF compaction (round 15): the base assigned
  * table swaps by COMMITTED GENERATION instead of in place, so a
  * reader racing one compaction always observes a consistent base —
  * the race the old compact_pending marker could only fail loud on.
  */
class IvfGenerationSpec extends SparkSpec {
  import sqlImplicits._

  private def randomVec(rng: Random, d: Int): Seq[Float] =
    Seq.fill(d)(rng.nextFloat() - 0.5f)

  private def corpus(n: Int, d: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new Random(seed)
    (0L until n.toLong).map(i => (i, randomVec(rng, d)))
  }

  private def mkIndex(n: Int = 60, seed: Int = 11): (String, Seq[(Long, Seq[Float])]) = {
    val data = corpus(n, 8, seed)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_gen_").toString + "/idx"
    Similarity.writeIvfIndex(
      Similarity.buildIvf(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", nCells = 4), dir)
    (dir, data)
  }

  private def served(dir: String): Set[Long] =
    Similarity.readIvfIndex(spark, dir, "vec_id", "embedding")
      .assigned.select("vec_id").collect().map(_.getLong(0)).toSet

  test("compact publishes a committed generation, keeps the previous " +
    "base as the grace copy, and serves identically") {
    val (dir, data) = mkIndex()
    Similarity.appendIvfSegment(spark, dir,
      Seq((100L, Seq.fill(8)(0.3f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val want = data.map(_._1).toSet + 100L
    served(dir) shouldBe want

    Similarity.compactIvfIndex(spark, dir)
    // gen=0 committed, manifest records the folded segment, the
    // folded segment dir is GC'd eagerly
    new java.io.File(s"$dir/generations/gen=0/_COMMITTED.1")
      .exists() shouldBe true
    Similarity.servedAssignedDir(spark, dir) shouldBe
      s"$dir/generations/gen=0/assigned"
    new java.io.File(s"$dir/segments").exists() shouldBe false
    // the legacy flat base survives ONE compaction as the grace copy
    new java.io.File(s"$dir/assigned").exists() shouldBe true
    served(dir) shouldBe want

    // second compact: gen=1 commits, gen=0 stays as grace, the
    // legacy flat base is GC'd
    Similarity.compactIvfIndex(spark, dir)
    Similarity.servedAssignedDir(spark, dir) shouldBe
      s"$dir/generations/gen=1/assigned"
    new java.io.File(s"$dir/assigned").exists() shouldBe false
    new java.io.File(s"$dir/generations/gen=0").exists() shouldBe true
    served(dir) shouldBe want

    // third: gen=0 is now pre-previous — GC'd
    Similarity.compactIvfIndex(spark, dir)
    new java.io.File(s"$dir/generations/gen=0").exists() shouldBe false
    new java.io.File(s"$dir/generations/gen=1").exists() shouldBe true
    served(dir) shouldBe want
  }

  test("a reader that resolved BEFORE the compact keeps a consistent " +
    "view through it (the race the marker could only fail loud on)") {
    val (dir, data) = mkIndex()
    Similarity.appendIvfSegment(spark, dir,
      Seq((100L, Seq.fill(8)(0.3f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    Similarity.compactIvfIndex(spark, dir) // upgrade to generational
    val want = data.map(_._1).toSet + 100L

    // reader resolves the index (directory resolution happens NOW)...
    val preResolved = Similarity
      .readIvfIndex(spark, dir, "vec_id", "embedding").assigned
    // ...compaction swaps a new generation in underneath it...
    Similarity.compactIvfIndex(spark, dir)
    // ...and the pre-resolved plan still executes against its grace
    // generation: complete, no duplicates, no missing rows, no error
    preResolved.select("vec_id").collect()
      .map(_.getLong(0)).toSet shouldBe want
    // a fresh reader resolves the new generation, same answer
    served(dir) shouldBe want
  }

  test("an uncommitted (crashed) generation is invisible; re-running " +
    "compact overwrites it and commits") {
    val (dir, data) = mkIndex()
    Similarity.compactIvfIndex(spark, dir) // gen=0 committed
    // simulate a compact that crashed mid-write: gen=1 exists with
    // data but NO _COMMITTED manifest
    val partial = new java.io.File(s"$dir/generations/gen=1/assigned")
    partial.mkdirs() shouldBe true
    java.nio.file.Files.write(
      partial.toPath.resolve("junk"), Array[Byte](1, 2, 3))
    Similarity.servedAssignedDir(spark, dir) shouldBe
      s"$dir/generations/gen=0/assigned"
    served(dir) shouldBe data.map(_._1).toSet
    // the retry writes gen=1 whole (overwriting the partial) and
    // commits it
    Similarity.compactIvfIndex(spark, dir)
    Similarity.servedAssignedDir(spark, dir) shouldBe
      s"$dir/generations/gen=1/assigned"
    served(dir) shouldBe data.map(_._1).toSet
  }

  test("retrain commits assigned and centroids TOGETHER in the " +
    "generation — no cross-table crash window, no marker; a later " +
    "plain compact carries the retrained centroids forward") {
    val (dir, data) = mkIndex(n = 80, seed = 23)
    val rest = corpus(20, 8, seed = 41).map { case (i, v) => (200L + i, v) }
    Similarity.appendIvfSegment(spark, dir,
      rest.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val dayZero = Similarity.readIvfCentroids(spark, dir)
    Similarity.compactIvfIndexWithRetrain(spark, dir,
      "vec_id", "embedding", iters = 2)
    // no marker machinery on the generational layout
    new java.io.File(s"$dir/retrain_pending").exists() shouldBe false
    new java.io.File(s"$dir/generations/gen=0/centroids")
      .exists() shouldBe true
    val retrained = Similarity.readIvfCentroids(spark, dir)
    retrained.map(_._2.toSeq) should not be dayZero.map(_._2.toSeq)
    // retrained index equals a fresh build over the union with the
    // same centroids (the q245 contract, now generational)
    val all = (data ++ rest).toDF("vec_id", "embedding")
    val fresh = Similarity.buildIvfWithCentroids(
      all, "vec_id", "embedding", retrained)
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    cells(Similarity.readIvfIndex(spark, dir, "vec_id", "embedding")
      .assigned) shouldBe cells(fresh.assigned)

    // a PLAIN compact after the retrain must keep serving the
    // retrained centroids (generation-local resolution never falls
    // back to the stale day-0 top-level table)
    Similarity.compactIvfIndex(spark, dir)
    Similarity.readIvfCentroids(spark, dir)
      .map(_._2.toSeq) shouldBe retrained.map(_._2.toSeq)
  }

  test("a stream restart reusing a folded batchId name is not " +
    "silently excluded (stale manifest entries are dropped on append)") {
    val (dir, data) = mkIndex()
    // streamed segment seg_b00000 lands, compact folds + GCs it
    Similarity.appendIvfSegment(spark, dir,
      Seq((100L, Seq.fill(8)(0.3f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", segmentName = Some("seg_b00000"))
    Similarity.compactIvfIndex(spark, dir)
    served(dir) shouldBe (data.map(_._1).toSet + 100L)
    // a NEW stream with a fresh checkpoint restarts batchIds at 0 and
    // reuses the name for DIFFERENT vectors — the stale folded entry
    // must not exclude it
    Similarity.appendIvfSegment(spark, dir,
      Seq((300L, Seq.fill(8)(0.7f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", segmentName = Some("seg_b00000"))
    served(dir) shouldBe (data.map(_._1).toSet + 100L + 300L)
    // and the next compact folds the reused segment correctly
    Similarity.compactIvfIndex(spark, dir)
    served(dir) shouldBe (data.map(_._1).toSet + 100L + 300L)
  }

  test("maintenance on the generational layout: surgical delete and " +
    "appendToIvfIndex operate on the served generation") {
    val (dir, data) = mkIndex()
    Similarity.compactIvfIndex(spark, dir)
    Similarity.removeFromIvfIndex(spark, dir,
      Seq(data.head._1).toDF("vec_id"), "vec_id")
    served(dir) shouldBe data.map(_._1).toSet - data.head._1
    Similarity.appendToIvfIndex(spark, dir,
      Seq((500L, Seq.fill(8)(0.2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    served(dir) shouldBe (data.map(_._1).toSet - data.head._1 + 500L)
    // stats resolve the generation too
    val st = Similarity.ivfStats(spark, dir, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("base_rows") shouldBe data.size.toLong // -1 deleted +1 appended
    st("segments_pending") shouldBe 0L
  }
}
