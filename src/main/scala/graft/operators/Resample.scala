package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — irregular event streams →
  * a fixed-step grid per key, each grid point carrying the most recent
  * observation at or before it (pandas `resample().ffill()`, the
  * telemetry-normalization step before any model that assumes evenly
  * spaced inputs, and the feature-freshness view of the [[AsOf]]
  * family: as-of PROBES one instant, resample probes a whole lattice).
  *
  * Semantics: per key, grid instants run from the CORPUS min to the
  * corpus max timestamp (floored/ceiled to step multiples — a shared
  * lattice across keys, so downstream pivots align columns); each
  * instant left-as-of-joins the key's events (`event.ts <= grid.t`
  * wins, latest first). Keys with no event before a grid instant get
  * NULL — leading gaps are data, not zeros.
  *
  * Scale shape: the grid is `keys × (span/step)` rows — generated
  * distributed (per-key `sequence` + explode, never a driver loop) and
  * GUARDED: `maxGridRows` fail-louds when span/step explodes (a
  * microsecond step over a year is 3·10¹³ instants per key — a config
  * bug, not a workload). The fill itself is [[AsOf.joinAsOf]]: one
  * shuffle + one sort over grid+events. The corpus span comes from one
  * 2-scalar aggregate ([[graft.core.Scalars]] keeps it join-shaped,
  * but min/max here is a bounded driver collect by the same contract
  * as every scalar bound in the library).
  */
object Resample {

  /** `(keyCol, t, <payload…>)`: one row per key per grid instant `t`
    * (microseconds), payload = the forward-filled right columns of
    * `df` (everything but key and ts).
    *
    * @param stepUs grid step in microseconds (e.g. 3_600_000_000L for
    *               hourly).
    */
  def forwardFillGrid(
      df: DataFrame, keyCol: String, tsCol: String, stepUs: Long,
      maxGridRows: Long = 100000000L): DataFrame = {
    require(stepUs >= 1, s"stepUs must be >= 1, got $stepUs")
    val spark = df.sparkSession

    val events = df
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .drop(tsCol)
    val Array(lo, hi, nKeys) = events
      .agg(min(col("__us")), max(col("__us")),
        countDistinct(col(keyCol)).cast("long"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray // bounded: 3 scalars
    val t0 = Math.floorDiv(lo, stepUs) * stepUs
    val t1 = (Math.floorDiv(hi, stepUs) +
      (if (Math.floorMod(hi, stepUs) == 0) 0 else 1)) * stepUs
    val nSteps = (t1 - t0) / stepUs + 1
    require(nSteps * nKeys <= maxGridRows,
      s"forwardFillGrid: $nKeys keys x $nSteps instants exceeds " +
        s"maxGridRows=$maxGridRows — widen stepUs (currently $stepUs)")

    val grid = events.select(col(keyCol)).distinct()
      .withColumn("t",
        explode(sequence(lit(t0), lit(t1), lit(stepUs))))
    AsOf.joinAsOf(
      grid, events.withColumnRenamed("__us", "t"),
      Seq(keyCol), "t")
      .drop("t_right")
  }
}
