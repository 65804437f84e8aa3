package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction thresholds (Vovk et al.; the Angelopoulos
  * & Bates 2023 tutorial form) — turn any model's nonconformity scores
  * on a held-out calibration set into a threshold with a
  * FINITE-SAMPLE coverage guarantee: predictions whose score is ≤ the
  * threshold form a set containing the truth with probability ≥ 1 − α,
  * no distributional assumptions. The curation use: "gate documents
  * with the quality model, but with a calibrated false-drop rate" —
  * the guarantee [[Isotonic]]'s calibrated probabilities and q80's
  * diagnostics don't by themselves give.
  *
  * Exactness: the conformal quantile is NOT the plain q-quantile —
  * it is the `⌈(n+1)(1−α)⌉`-th smallest calibration score (the +1 is
  * the finite-sample correction). With α as a rational `aNum/aDen`,
  * the rank is `⌈(n+1)(aDen−aNum)/aDen⌉` — exact integer arithmetic —
  * and the threshold is an ELEMENT of the data, so the whole table
  * replays bit-for-bit (q218). When the rank exceeds n (α too small
  * for the calibration size), no finite threshold guarantees coverage:
  * the threshold is NULL, visibly, never silently clamped to the max.
  *
  * Scale shape: the [[graft.sketch.Quantiles]] histogram contract —
  * one map-side-combinable (group, score) aggregate (the shuffle
  * carries distinct scores, never rows), a per-group cumulative window
  * bounded by distinct-score count, and a threshold pick.
  */
object Conformal {

  /** One row per group: `(groupCols…, n, rank, threshold)` where
    * `threshold` is the rank-th smallest `scoreCol` (NULL when
    * `rank > n`). NULL scores raise — an unscored calibration row
    * would silently shift the rank.
    */
  def thresholds(
      df: DataFrame, groupCols: Seq[String], scoreCol: String,
      aNum: Long, aDen: Long): DataFrame = {
    require(aDen >= 1 && aNum >= 1 && aNum < aDen,
      s"alpha must be a fraction in (0, 1), got $aNum/$aDen")
    require(!groupCols.contains("n") && !groupCols.contains("rank") &&
      !groupCols.contains("threshold"),
      "group columns may not be named 'n', 'rank' or 'threshold'")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    val v = when(col(scoreCol).isNull, raise_error(lit(
      s"Conformal.thresholds: NULL $scoreCol — drop explicitly, an " +
        "unscored calibration row would shift the rank")))
      .otherwise(col(scoreCol))
    val hist = base0
      .select((keys.map(col) :+ v.as("__v")): _*)
      .groupBy((keys :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val byGroup = Window.partitionBy(keys.map(col): _*)
    val cumW = byGroup.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // rank = ceil((n+1)(aDen−aNum)/aDen), exact integer ceiling.
    // (n+1)·(aDen−aNum)+(aDen−1) must fit a long or the SQL product
    // silently wraps to a wrong (possibly negative) rank — fail loud
    // on groups past the bound (computed driver-side in BigInt so the
    // bound itself cannot wrap)
    val nMax = ((BigInt(Long.MaxValue) - (aDen - 1)) / (aDen - aNum) - 1)
      .min(BigInt(Long.MaxValue)).toLong
    val out = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("n", sum(col("__c")).over(byGroup))
      .withColumn("rank",
        when(col("n") > lit(nMax), raise_error(lit(
          s"Conformal.thresholds: a calibration group exceeds $nMax " +
            s"rows — (n+1)·(aDen−aNum) would overflow exact long " +
            s"arithmetic at alpha = $aNum/$aDen; use a coarser alpha " +
            "denominator or smaller groups")))
          .otherwise(expr(
            s"((n + 1L) * ${aDen - aNum}L + ${aDen - 1}L) div ${aDen}L")))
      .groupBy((keys.map(col) :+ col("n") :+ col("rank")): _*)
      .agg(min(when(col("__cum") >= col("rank"), col("__v")))
        .as("threshold"))
    if (groupCols.nonEmpty) out else out.drop("__all")
  }
}
