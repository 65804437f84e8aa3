package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §5 upgrade properties for the sampler: with a deterministic
  * uniform grid as the entropy source, kept-rates are exact (floor of
  * rate × class size) and the reweighting preserves each class's total
  * weight mass in expectation — exactly, on the grid.
  */
class SamplingInvariantsSpec extends SparkSpec {
  import sqlImplicits._

  private val n = 10000

  /** u = (i + 0.5) / n: an exact uniform grid — `count(u < r) = floor(n·r)`
    * up to the half-step offset, with no randomness.
    */
  private def grid = (0 until n).map { i =>
    val positive = i % 4 == 0 // 25% positives, interleaved so both
    (i.toLong, positive, (i + 0.5) / n) // classes see the full grid
  }.toDF("id", "is_pos", "u")

  test("kept rates are exact on a deterministic uniform grid") {
    for ((g, p, neg) <- Seq((1.0, 0.5, 0.25), (0.8, 1.0, 0.5), (1.0, 1.0, 1.0))) {
      val kept = Sampling.sampleWithPredicate(
        grid, g, p, neg, col("is_pos"), samplingColOverride = Some("u"))
      val byClass = kept.groupBy("is_pos").count().collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val nPos = n / 4
      val nNeg = n - nPos
      // class members' u values stride the grid uniformly; the tolerance
      // is the stride width
      byClass.getOrElse(true, 0L).toDouble shouldBe (nPos * g * p) +- 4.0
      byClass.getOrElse(false, 0L).toDouble shouldBe (nNeg * g * neg) +- 4.0
    }
  }

  test("reweighting preserves per-class weight mass on the grid") {
    val g = 1.0; val p = 0.5; val neg = 0.25
    val kept = Sampling.sampleWithPredicate(
      grid, g, p, neg, col("is_pos"), samplingColOverride = Some("u"))
    val mass = kept.groupBy("is_pos").agg(sum("weight").as("w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val nPos = n / 4
    val nNeg = n - nPos
    // kept_count × (max/g·rate) ≈ class_size × max — the relative-weight
    // contract: total mass scales every class by the same max factor
    val maxRate = math.max(g * p, g * neg)
    mass(true) shouldBe (nPos * maxRate) +- 8.0
    mass(false) shouldBe (nNeg * maxRate) +- 8.0
  }

  test("trivial rates keep everything / drop a class entirely") {
    val all = Sampling.sampleWithPredicate(
      grid, 1.0, 1.0, 1.0, col("is_pos"), samplingColOverride = Some("u"))
    all.count() shouldBe n.toLong
    val noNeg = Sampling.sampleWithPredicate(
      grid, 1.0, 1.0, 0.0, col("is_pos"), samplingColOverride = Some("u"))
    noNeg.filter(!col("is_pos")).count() shouldBe 0L
    noNeg.filter(col("is_pos")).count() shouldBe (n / 4).toLong
  }
}
