package graft.streaming

import graft.SparkSpec
import graft.dedup.{DedupIndex, SubstringDedup}
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** The replay-idempotency contract for IN-LOOP streaming maintenance,
  * pinned at the API layer the sinks call: foreachBatch is
  * at-least-once, and the maintenance step runs AFTER the current
  * batch's segment lands but BEFORE Spark commits the batch offsets.
  * A compact that folded that segment would bake its rows into the
  * generation base; the replayed batch then re-lands the same segment
  * (prepareSegmentLanding drops the stale manifest entry) and every
  * row serves TWICE — permanently, after the next fold. The fix:
  * `excludeSegments` on compact/autoMaintain leaves the named segment
  * out of the fold (not merged, not manifest-listed, not GC'd), so a
  * replayed overwrite of that segment is invisible. Per family:
  *
  *   - dedup: fold-with-exclusion + replayed re-land keeps exact/sets
  *     row counts at the maintenance-free values; pending tombstones
  *     SURVIVE an excluding compact (the excluded segment's rows were
  *     not anti-joined, so the mask must hold) and clear on the next
  *     exclusion-free compact;
  *   - IVF: a RETRAIN with an excluded segment re-assigns that
  *     segment's rows in place under the new centroids — the served
  *     index stays geometrically consistent (every stored cell equals
  *     the assignment the stored centroid table implies), and a
  *     replayed re-land (which assigns against the newly committed
  *     centroids) changes nothing;
  *   - substring: fold-with-exclusion + replayed re-land keeps
  *     fingerprint_rows at the maintenance-free value.
  */
class ReplayIdempotencySpec extends SparkSpec {
  import sqlImplicits._

  test("dedup: compact with excludeSegments never folds the named " +
    "segment, a replayed re-land does not double rows, and pending " +
    "tombstones survive until an exclusion-free compact") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_dedup_").toString
    val idxPath = s"$base/index"
    DedupIndex.write(
      Seq((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six seven"),
        (3L, "nu xi omicron pi rho sigma"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idxPath,
      DedupIndex.Params(shingleSize = 1, numHashes = 16, bands = 4))
    val batchA = Seq((10L, "red orange yellow green blue"),
      (11L, "cat dog bird fish mouse"))
    val batchB = Seq((20L, "north south east west up"),
      (21L, "gold silver bronze iron tin"))
    DedupIndex.appendSegment(spark, idxPath,
      batchA.toDF("doc_id", "text"), "doc_id", "text",
      Some("seg_b00000"))
    DedupIndex.appendSegment(spark, idxPath,
      batchB.toDF("doc_id", "text"), "doc_id", "text",
      Some("seg_b00001"))
    DedupIndex.delete(idxPath, Seq(1L).toDF("doc_id"))

    // the in-loop maintenance of batch 1: fold everything EXCEPT the
    // current batch's segment (its offsets are not yet committed)
    DedupIndex.compact(spark, idxPath,
      excludeSegments = Set("seg_b00001"))
    val folded = graft.core.Generations.latest(spark, idxPath).get._3
    folded should contain("seg_b00000")
    folded should not contain "seg_b00001"
    new java.io.File(s"$idxPath/segments/seg_b00001")
      .exists() shouldBe true
    val st1 = DedupIndex.stats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st1("exact_rows") shouldBe 6L // 3 corpus - 1 tombstoned + 2 + 2
    st1("tombstones_pending") shouldBe 1L // mask survives the exclusion
    st1("segments_pending") shouldBe 1L

    // THE REPLAY: the batch redelivers and re-lands the same segment.
    // Pre-fix (segment folded), these rows would now serve twice.
    DedupIndex.appendSegment(spark, idxPath,
      batchB.toDF("doc_id", "text"), "doc_id", "text",
      Some("seg_b00001"))
    val st2 = DedupIndex.stats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st2("exact_rows") shouldBe 6L
    st2("sets_rows") shouldBe 6L
    DedupIndex.read(spark, idxPath).exact
      .groupBy(col("corpus_id")).count()
      .filter(col("count") > 1).count() shouldBe 0L

    // the next exclusion-free compact folds the replayed segment once
    // and clears the tombstones
    DedupIndex.compact(spark, idxPath)
    val st3 = DedupIndex.stats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st3("exact_rows") shouldBe 6L
    st3("segments_pending") shouldBe 0L
    st3("tombstones_pending") shouldBe 0L
  }

  test("ivf: retrain with excludeSegments re-assigns the live excluded " +
    "segment in place under the new centroids — geometrically " +
    "consistent, and a replayed re-land changes nothing") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_ivf_").toString
    val idxPath = s"$base/index"
    def vec(sign: Double, j: Int): Seq[Float] =
      Seq.tabulate(4)(i => (if (i == 0) sign else 0.03 * (j + i)).toFloat)
    val baseRows = (0 until 8).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))
    val built = Similarity.buildIvfWithCentroids(
      baseRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(-1f, 0f, 0f, 0f))))
    Similarity.writeIvfIndex(built, idxPath)
    val batch = (100 until 104).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))
    Similarity.appendIvfSegment(spark, idxPath,
      batch.toDF("vec_id", "embedding"), "vec_id", "embedding",
      Some("seg_b00001"))

    Similarity.compactIvfIndexWithRetrain(spark, idxPath,
      "vec_id", "embedding", iters = 2,
      excludeSegments = Set("seg_b00001"))

    def consistent(): Unit = {
      val cents = Similarity.readIvfCentroids(spark, idxPath)
      val idx = Similarity.readIvfIndex(
        spark, idxPath, "vec_id", "embedding")
      val stored = idx.assigned.select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = Similarity.buildIvfWithCentroids(
        idx.assigned.drop("cell"), "vec_id", "embedding", cents)
        .assigned.select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      stored shouldBe expect
    }
    // segment survived the retrain, un-folded, and was re-assigned in
    // place under the NEW centroid table
    val st = Similarity.ivfStats(spark, idxPath, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("segments_pending") shouldBe 1L
    st("base_rows") shouldBe 8L
    st("segment_rows") shouldBe 4L
    consistent()

    // THE REPLAY: re-land the same batch under the same name — the
    // assignment now runs against the newly committed centroids, so
    // the index is row-identical to the pre-replay state
    Similarity.appendIvfSegment(spark, idxPath,
      batch.toDF("vec_id", "embedding"), "vec_id", "embedding",
      Some("seg_b00001"))
    val st2 = Similarity.ivfStats(spark, idxPath, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st2("base_rows") shouldBe 8L
    st2("segment_rows") shouldBe 4L
    consistent()
    // and probing at nProbe = nCells is exhaustive: the served top-k
    // equals brute force over base ∪ segment, rows served exactly once
    val idx = Similarity.readIvfIndex(spark, idxPath, "vec_id", "embedding")
    val q = Seq((0L, Array(1f, 0.1f, 0.1f, 0.1f)))
    val probed = Similarity.ivfTopK(idx, q, k = 3, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(
      idx.assigned.drop("cell"), "vec_id", "embedding", q, 3)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    probed shouldBe brute
  }

  test("substring: compact with excludeSegments never folds the named " +
    "segment and a replayed re-land does not double fingerprints") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_replay_sub_").toString
    val idxPath = s"$base/index"
    SubstringDedup.writeFingerprintIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six seven"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idxPath, k = 8, window = 4, maxDocFreq = 50L)
    val batchA = Seq((10L, "red orange yellow green blue indigo"))
    val batchB = Seq((20L, "north south east west up down"))
    SubstringDedup.appendToFingerprintIndex(spark, idxPath,
      batchA.toDF("doc_id", "text"), "doc_id", "text",
      segmentName = Some("seg_b00000"))
    SubstringDedup.appendToFingerprintIndex(spark, idxPath,
      batchB.toDF("doc_id", "text"), "doc_id", "text",
      segmentName = Some("seg_b00001"))

    SubstringDedup.compactFingerprintIndex(spark, idxPath,
      excludeSegments = Set("seg_b00001"))
    val folded = graft.core.Generations.latest(spark, idxPath).get._3
    folded should contain("seg_b00000")
    folded should not contain "seg_b00001"
    val rows1 = SubstringDedup.fingerprintIndexStats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // THE REPLAY
    SubstringDedup.appendToFingerprintIndex(spark, idxPath,
      batchB.toDF("doc_id", "text"), "doc_id", "text",
      segmentName = Some("seg_b00001"))
    val rows2 = SubstringDedup.fingerprintIndexStats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows2("fingerprint_rows") shouldBe rows1("fingerprint_rows")
    rows2("distinct_docs") shouldBe rows1("distinct_docs")
    rows2("segments_pending") shouldBe 1L

    // exclusion-free compact folds the replayed segment exactly once
    SubstringDedup.compactFingerprintIndex(spark, idxPath)
    val rows3 = SubstringDedup.fingerprintIndexStats(spark, idxPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows3("fingerprint_rows") shouldBe rows1("fingerprint_rows")
    rows3("segments_pending") shouldBe 0L
  }
}
