package graft.sim

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-corpus (batch × reference-corpus) embedding matching — the
  * semantic-decontamination surface.
  */
class CrossCorpusSimilaritySpec extends SparkSpec {
  import sqlImplicits._

  private def noise(n: Int, dim: Int, seed: Int, idBase: Long) = {
    val rng = new Random(seed)
    (0 until n).map(i =>
      (idBase + i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  test("finds planted batch vectors that duplicate corpus vectors") {
    val dim = 16
    val corpus = noise(80, dim, seed = 3, idBase = 0L)
    // batch: 5 near-copies of corpus vectors (tiny jitter) + fresh noise
    val rng = new Random(9)
    val copies = corpus.take(5).zipWithIndex.map { case ((_, v), i) =>
      (1000L + i, v.map(x => x + rng.nextGaussian().toFloat * 0.001f))
    }
    val fresh = noise(40, dim, seed = 77, idBase = 2000L)
    val batchDf = (copies ++ fresh).toDF("id", "vec")
    val corpusDf = corpus.toDF("id", "vec")

    val exact = Similarity.exactCosinePairsAcross(
      batchDf, corpusDf, "id", "vec", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.map(_._1) shouldBe (1000L until 1005L).toSet

    // LSH path: planted near-copies have cosine ~1 (collision prob ~1
    // per band), so all five must surface
    val lsh = Similarity.embeddingNearDuplicatesAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe exact

    // and the dedup form drops exactly those batch rows
    val kept = Similarity.embeddingDedupAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.999)
      .select("id").collect().map(_.getLong(0)).toSet
    kept shouldBe (fresh.map(_._1).toSet)
  }

  test("equal id values on the two sides are compared, not excluded") {
    // batch and corpus are different datasets — id 7 on both sides is a
    // coincidence, and a cosine match between them is a real leak
    val v = Seq.fill(8)(1.0f)
    val batchDf = Seq((7L, v)).toDF("id", "vec")
    val corpusDf = Seq((7L, v)).toDF("id", "vec")
    val exact = Similarity.exactCosinePairsAcross(
      batchDf, corpusDf, "id", "vec", threshold = 0.99).collect()
    exact.length shouldBe 1
    exact.head.getLong(0) shouldBe 7L
    exact.head.getLong(1) shouldBe 7L
    // and the LSH path agrees
    Similarity.embeddingNearDuplicatesAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.99).count() shouldBe 1L
  }

  test("pure-noise batch survives decontamination untouched") {
    val corpusDf = noise(60, 12, seed = 1, idBase = 0L).toDF("id", "vec")
    val batchDf = noise(30, 12, seed = 2, idBase = 500L).toDF("id", "vec")
    val kept = Similarity.embeddingDedupAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.999)
    kept.count() shouldBe 30L
  }

  test("empty sides yield no matches and pass batches through") {
    val some = noise(10, 8, seed = 5, idBase = 0L).toDF("id", "vec")
    val none = some.filter(col("id") < 0)
    Similarity.embeddingNearDuplicatesAgainst(
      none, some, "id", "vec").count() shouldBe 0L
    Similarity.embeddingNearDuplicatesAgainst(
      some, none, "id", "vec").count() shouldBe 0L
    Similarity.embeddingDedupAgainst(
      some, none, "id", "vec").count() shouldBe 10L
  }

  test("hot-bucket cap drops degenerate piles instead of exploding") {
    // adversarial pile: 50 IDENTICAL corpus vectors share every single
    // (band, bucket) — the worst case the cap exists for
    val base = Seq.fill(50)(Seq.fill(8)(1.0f))
    val corpusDf = base.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val batchDf = Seq((900L, Seq.fill(8)(1.0f))).toDF("id", "vec")
    // cap below the pile: every bucket overflows and is DROPPED — zero
    // candidates, zero matches, bounded memory (the documented contract:
    // graceful recall loss, never a quadratic bucket)
    Similarity.embeddingNearDuplicatesAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.99,
      maxBucketSize = 10).count() shouldBe 0L
    // cap above the pile: all 50 matches surface
    Similarity.embeddingNearDuplicatesAgainst(
      batchDf, corpusDf, "id", "vec", threshold = 0.99,
      maxBucketSize = 100).count() shouldBe 50L
  }

  test("mismatched embedding dimensions fail loudly up front") {
    // batch dim 8, corpus dim 12: sizing hyperplanes off one side only
    // would throw deep in a task (shorter corpus) or silently truncate
    // signatures (longer corpus) — require equality before any job
    val batchDf = Seq((1L, Seq.fill(8)(1.0f))).toDF("id", "vec")
    val corpusDf = Seq((2L, Seq.fill(12)(1.0f))).toDF("id", "vec")
    val ex = intercept[IllegalArgumentException] {
      Similarity.embeddingNearDuplicatesAgainst(
        batchDf, corpusDf, "id", "vec", threshold = 0.9)
    }
    ex.getMessage should include("dimension mismatch")
    ex.getMessage should include("8")
    ex.getMessage should include("12")
  }
}
