package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The measure → decide → ACT loop with the EMPIRICAL recall audit in
  * the verdict ([[Similarity.ivfMaintenanceAdviceAudited]] /
  * [[Similarity.ivfAutoMaintainAudited]]) — closing the loop q271's
  * auditor measured but nothing consumed: a corpus whose SHAPE passes
  * every stats threshold can still serve under-target recall when the
  * day-0 centroids are decoupled from the data (planted here: both
  * centroids point into cluster A's halfspace, so cluster B's vectors
  * scatter across cells and a 1-probe query over B misses most true
  * neighbors). Pins:
  *
  *   - the audit rule fires on measured deficit while all four stats
  *     rules read false — the verdict provably flips to `retrain` on
  *     evidence ONLY the empirical audit can see;
  *   - ACTING on it (retrain re-fits centroids to the corpus) restores
  *     measured recall to ≥ the target at the same probe count;
  *   - fixpoint: the post-action audited advice is `none`;
  *   - a healthy index (measured recall at target) never fires the
  *     audit rule — the audited advice equals the stats-only advice.
  */
class IvfRecallAuditSpec extends SparkSpec {
  import sqlImplicits._

  // two well-separated cosine clusters in R^4: A along +x, B along -x,
  // with small deterministic jitter in the other coordinates. ids
  // interleave so KMeans' first-k init sees one vector of each.
  private def vec(sign: Double, j: Int): Seq[Float] =
    Seq.tabulate(4)(i =>
      (if (i == 0) sign else 0.02 * ((j + i) % 5 + 1)).toFloat)
  private val corpus = (0 until 16).map(i =>
    (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))

  // the planted-BAD day-0 centroids: both in cluster A's halfspace,
  // separated only by jitter direction — B's vectors assign across the
  // two cells by noise, so nProbe = 1 over a B query scans roughly
  // half of B
  private val badCentroids = Seq(
    (0, Array(1f, 0.3f, 0f, 0f)), (1, Array(1f, 0f, 0.3f, 0f)))

  private def mkIndex(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_recall_audit_").toString + "/index"
    Similarity.writeIvfIndex(
      Similarity.buildIvfWithCentroids(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        badCentroids),
      path)
    path
  }

  // audit over B-cluster queries (the ones the planted centroids
  // fail): k = 6 true neighbors are B's vectors, scattered over cells
  private val audit = corpus.filter(_._1 % 2 == 1).take(4)
    .map { case (id, v) => (id, v.toArray) }
  private val target = 950000L
  // thresholds no stats rule can fire at
  private val lax = Similarity.IvfAdviceThresholds(
    maxSegments = 1000, maxSegmentRowsPct = 1000000,
    maxSkewX100 = 1000000, maxDeletedPct = 1000000)

  private def meanMeasuredPpm(path: String): Long = {
    val m = Similarity.ivfMeasuredRecall(
      spark, path, "vec_id", "embedding", audit, k = 6, nProbe = 1)
    m.agg(sum(col("recall_ppm"))).head.getLong(0) / audit.size
  }

  test("audit-failing corpus: the recall_deficit rule alone flips the " +
    "verdict to retrain, acting restores measured recall >= target, " +
    "and the post-action audited advice is none") {
    val path = mkIndex()
    meanMeasuredPpm(path) should be < target // the planted failure

    val advice = Similarity.ivfMaintenanceAdviceAudited(
      spark, path, "vec_id", "embedding",
      audit, auditK = 6, auditNProbe = 1, targetRecallPpm = target,
      thresholds = lax)
    val rows = advice.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
      .toMap
    rows.keySet shouldBe Set("deleted_mass", "recall_deficit",
      "segment_rows", "segments", "skew")
    // the flip: every stats rule false, the audit rule fired
    Seq("deleted_mass", "segment_rows", "segments", "skew")
      .foreach(r => rows(r)._3 shouldBe false)
    rows("recall_deficit")._3 shouldBe true
    rows("recall_deficit")._1 should be > 0L // the exact deficit
    rows("recall_deficit")._2 shouldBe 0L
    rows.values.foreach(_._4 shouldBe "retrain")

    // ACT: retrain re-fits the centroids (first-k init sees both
    // clusters, 2 Lloyd rounds separate them) — measured recall at
    // the SAME probe count comes back above the target
    val acted = Similarity.ivfAutoMaintainAudited(
      spark, path, "vec_id", "embedding",
      audit, auditK = 6, auditNProbe = 1, targetRecallPpm = target,
      thresholds = lax)
    acted.select("action").head.getString(0) shouldBe "retrain"
    meanMeasuredPpm(path) should be >= target

    // fixpoint: the audited advice is now none and nothing fires
    val again = Similarity.ivfAutoMaintainAudited(
      spark, path, "vec_id", "embedding",
      audit, auditK = 6, auditNProbe = 1, targetRecallPpm = target,
      thresholds = lax)
    again.select("action").head.getString(0) shouldBe "none"
    again.filter(col("fired")).count() shouldBe 0L
  }

  test("a healthy index never fires the audit rule: audited advice " +
    "equals the stats-only advice") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_recall_audit_ok_").toString + "/index"
    // GOOD centroids (the cluster directions themselves)
    Similarity.writeIvfIndex(
      Similarity.buildIvfWithCentroids(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(-1f, 0f, 0f, 0f)))),
      path)
    meanMeasuredPpm(path) should be >= target
    val audited = Similarity.ivfMaintenanceAdviceAudited(
      spark, path, "vec_id", "embedding",
      audit, auditK = 6, auditNProbe = 1, targetRecallPpm = target,
      thresholds = lax)
    audited.filter(col("fired")).count() shouldBe 0L
    audited.select("advice").head.getString(0) shouldBe "none"
    Similarity.ivfMaintenanceAdvice(
      spark, path, "vec_id", "embedding", lax)
      .select("advice").head.getString(0) shouldBe "none"
  }
}
