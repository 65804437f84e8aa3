package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generation-keyed probe-plan caching ([[Similarity.IvfPlanHandle]] /
  * [[Similarity.ivfPlanHandle]] / [[Similarity.ivfTopKWithHandle]]) —
  * the amortization [[Similarity.ivfTopKPlanned]] documented as caller
  * policy, promoted to an operator: the cell histogram only moves when
  * maintenance commits a new generation, so a serving batch plans once
  * and reuses. Pins:
  *
  *   - handle-served results are row-identical to per-call
  *     [[Similarity.ivfTopKPlanned]] at the same tree state, and the
  *     returned handle is the same object (no silent re-plan);
  *   - a maintenance commit (compact) invalidates the handle: with
  *     `replanOnStale = true` the serve re-derives at the same target
  *     and returns the NEW generation's handle; with false it fails
  *     loud naming both generations;
  *   - the re-derived handle serves the same rows the fresh per-call
  *     path does (compaction is row-preserving, so results also match
  *     the pre-compact serve).
  */
class IvfPlanHandleSpec extends SparkSpec {
  import sqlImplicits._

  private def vec(sign: Double, j: Int): Seq[Float] =
    Seq.tabulate(4)(i =>
      (if (i == 0) sign else 0.02 * ((j + i) % 5 + 1)).toFloat)
  private val corpus = (0 until 12).map(i =>
    (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))
  private val queries = Seq(
    (100L, Array(1f, 0.05f, 0.05f, 0.05f)),
    (101L, Array(-1f, 0.05f, 0.05f, 0.05f)))

  private def mkIndex(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_plan_handle_").toString + "/index"
    Similarity.writeIvfIndex(
      Similarity.buildIvfWithCentroids(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(-1f, 0f, 0f, 0f)))),
      path)
    path
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("handle-served results equal per-call ivfTopKPlanned and the " +
    "fresh handle is reused unchanged") {
    val path = mkIndex()
    val h = Similarity.ivfPlanHandle(
      spark, path, "vec_id", "embedding", targetRecallPpm = 900000L)
    h.generation shouldBe -1 // no compaction yet: legacy layout
    val perCall = Similarity.ivfTopKPlanned(
      spark, path, "vec_id", "embedding", queries, k = 4,
      targetRecallPpm = 900000L)
    val (h2, served) = Similarity.ivfTopKWithHandle(
      spark, path, "vec_id", "embedding", queries, k = 4, h)
    h2 shouldBe h // same generation -> zero planning, same handle back
    rows(served) shouldBe rows(perCall)
  }

  test("a maintenance commit invalidates the handle: replanOnStale " +
    "re-derives at the new generation, strict mode fails loud") {
    val path = mkIndex()
    val h = Similarity.ivfPlanHandle(
      spark, path, "vec_id", "embedding", targetRecallPpm = 900000L)
    val (_, before) = Similarity.ivfTopKWithHandle(
      spark, path, "vec_id", "embedding", queries, k = 4, h)
    // maintenance commits generation 0: append a segment, compact
    Similarity.appendIvfSegment(spark, path,
      Seq((200L, vec(1.0, 7)), (201L, vec(-1.0, 8)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", Some("seg_b00000"))
    Similarity.compactIvfIndex(spark, path)

    val boom = intercept[IllegalStateException] {
      Similarity.ivfTopKWithHandle(spark, path, "vec_id", "embedding",
        queries, k = 4, h, replanOnStale = false)
    }
    boom.getMessage should include("generation -1")
    boom.getMessage should include("generation 0")

    val (h2, after) = Similarity.ivfTopKWithHandle(
      spark, path, "vec_id", "embedding", queries, k = 4, h)
    h2.generation shouldBe 0
    h2.targetRecallPpm shouldBe h.targetRecallPpm
    // the re-derived serve equals the fresh per-call path over the
    // compacted tree, still k rows per query
    rows(after) shouldBe rows(Similarity.ivfTopKPlanned(
      spark, path, "vec_id", "embedding", queries, k = 4,
      targetRecallPpm = 900000L))
    after.count() shouldBe before.count()
  }
}
