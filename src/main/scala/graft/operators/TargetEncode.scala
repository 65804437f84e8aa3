package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Scalars

/** Smoothed target encoding — replace a high-cardinality categorical
  * with the (shrunken) mean of the target within its category, the
  * workhorse tabular-ML feature (Micci-Barreca 2001) for CTR-style
  * models where one-hot explodes and the hashing trick
  * ([[FeatureHash]]) discards the label signal. Two forms:
  *
  *   - [[encodingTable]]: the per-category mapping to apply at
  *     inference time;
  *   - [[withLooEncoding]]: the LEAVE-ONE-OUT training-time form — a
  *     row's own target is excluded from its category mean. Without
  *     LOO the feature memorizes each row's label through its own
  *     contribution (worst at singleton categories, where the "mean"
  *     IS the label) and validation scores lie.
  *
  * Shrinkage: category means pull toward the global mean with prior
  * weight `k` — `enc = (S_c + k·μ) / (n_c + k)` — so rare categories
  * don't swing to their noisy sample means.
  *
  * Exactness: the textbook formula nests two divides (μ, then enc).
  * Substituting μ = S_g/n_g and clearing denominators gives
  * `enc = ((S_c − y)·n_g + k·S_g) / (n_g·(n_c − 1 + k) · 10^scale)` —
  * integer numerator and denominator (targets are fixed-point with
  * `scale` decimal digits) and ONE IEEE divide at the end, the repo's
  * bit-reproducibility contract for float aggregates.
  *
  * Scale shape: one tiny global aggregate attached via
  * [[Scalars.withScalars]] (constant-key broadcast hash join, no
  * nested loop), one map-side-combinable `groupBy(category)` whose
  * table is category-domain-sized, and one equi-join back (AQE
  * broadcasts it at runtime). The target never rides a shuffle wider
  * than the category aggregate.
  */
object TargetEncode {

  private def fixedPoint(target: Column, scale: Int): Column =
    (target.cast(s"decimal(30,$scale)") *
      math.pow(10, scale).toLong).cast("long")

  private def guarded(target: Column, catCol: String, scale: Int): Column =
    when(target.isNull,
      raise_error(lit(s"TargetEncode: NULL target — drop or impute " +
        s"explicitly, a silent skip would bias every $catCol mean")))
      .otherwise(fixedPoint(target, scale))

  /** Per-category inference mapping `(catCol, n, enc)`:
    * `enc = (S_c·n_g + k·S_g) / (n_g·(n_c + k))` (one divide).
    */
  def encodingTable(
      df: DataFrame, catCol: String, targetCol: String, k: Long,
      scale: Int = 2): DataFrame = {
    require(k >= 0, s"prior weight k must be >= 0, got $k")
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val y = guarded(col(targetCol), catCol, scale)
    val cats = df.select(col(catCol), y.as("__y"))
      .groupBy(col(catCol))
      .agg(sum(col("__y")).as("__sc"), count(lit(1)).as("__nc"))
    val globals = df.select(guarded(col(targetCol), catCol, scale).as("__y"))
      .agg(sum(col("__y")).as("__sg"), count(lit(1)).as("__ng"))
    val pow = math.pow(10, scale).toLong
    Scalars.withScalars(cats, globals)
      .select(col(catCol), col("__nc").as("n"),
        ((col("__sc") * col("__ng") + lit(k) * col("__sg")).cast("double") /
          (col("__ng") * (col("__nc") + lit(k)) * lit(pow)).cast("double"))
          .as("enc"))
  }

  /** `df` plus `outCol`: the row's leave-one-out smoothed category
    * mean. Requires `k >= 1` — with `k = 0` a singleton category has
    * nothing left after excluding its own row (0/0); a positive prior
    * is what LOO encodes singletons with.
    */
  def withLooEncoding(
      df: DataFrame, catCol: String, targetCol: String, k: Long,
      outCol: String = "enc", scale: Int = 2): DataFrame = {
    require(k >= 1, s"LOO encoding needs prior weight k >= 1, got $k")
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val y = guarded(col(targetCol), catCol, scale)
    val rows = df.withColumn("__y", y)
    val cats = rows.groupBy(col(catCol))
      .agg(sum(col("__y")).as("__sc"), count(lit(1)).as("__nc"))
    val globals = rows.agg(sum(col("__y")).as("__sg"),
      count(lit(1)).as("__ng"))
    val pow = math.pow(10, scale).toLong
    Scalars.withScalars(rows.join(cats, Seq(catCol)), globals)
      .withColumn(outCol,
        ((col("__sc") - col("__y")) * col("__ng") + lit(k) * col("__sg"))
          .cast("double") /
          (col("__ng") * (col("__nc") - 1 + lit(k)) * lit(pow))
            .cast("double"))
      .drop("__y", "__sc", "__nc", "__sg", "__ng")
  }
}
