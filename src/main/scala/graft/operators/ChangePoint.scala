package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection — the TEMPORAL member of the drift
  * family: [[graft.text.Drift]]/q109/q114 compare two snapshots
  * ("did the distribution move between corpus A and B?"); this watches
  * ONE metric series and raises the earliest alarm that a persistent
  * shift started ("ingest volume for source X sagged on Tuesday") —
  * Page's 1954 cumulative-sum scheme, the standard ops monitor for
  * pipeline metrics because it accumulates small sustained deviations
  * that per-point thresholds miss.
  *
  * The textbook form is a sequential recurrence
  * `S⁺_t = max(0, S⁺_{t−1} + (x_t − k))`, which looks
  * window-inexpressible — but it has an exact closed form:
  * `S⁺_t = C_t − min(0, min_{j≤t} C_j)` where `C_t = Σ_{i≤t} (x_i − k)`
  * and the 0 is the empty prefix `C_0` (the running sum minus its own
  * running floor; a shift UP makes `C` climb away from that floor).
  * Dually, `S⁻_t = max(0, max_{j≤t} C_j) − C_t` accumulates sustained
  * drops. Both are
  * two window aggregates sharing ONE sort, all integer arithmetic —
  * bit-deterministic and replayable as plain SQL windows (q209).
  *
  * Contract: the series must be PRE-BUCKETED (one row per (group,
  * time bucket) — aggregate raw events first, the q04/q167 shape), so
  * a group's window partition is bounded by its bucket count, never by
  * raw event count. Integer metrics only; NULLs raise.
  */
object ChangePoint {

  /** Input rows plus `(cusum_high, cusum_low, alarm_high, alarm_low)`:
    * the one-sided CUSUM statistics against drift allowance `k` (the
    * "acceptable" per-bucket level — typically the historical mean)
    * and alarm flags at `threshold`.
    *
    * @param k         per-bucket reference level: deviations above it
    *                  feed `cusum_high`, below it feed `cusum_low`.
    * @param threshold alarm when a cusum reaches it (Page's decision
    *                  interval `h`).
    */
  def cusum(
      df: DataFrame, groupCols: Seq[String], orderCol: String,
      valueCol: String, k: Long, threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val x = when(col(valueCol).isNull, raise_error(lit(
      s"cusum: NULL $valueCol — an absent bucket is a 0, not a NULL; " +
        "fill explicitly (Resample.ffill) so the scheme sees the gap")))
      .otherwise(col(valueCol).cast("long"))
    val byGroup =
      if (groupCols.nonEmpty) Window.partitionBy(groupCols.map(col): _*)
      else Window.partitionBy()
    val cumW = byGroup.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__c", sum(x - lit(k)).over(cumW))
      // least/greatest with 0: the running extremum must include the
      // empty prefix C_0 = 0, or an immediate shift never registers
      .withColumn("cusum_high",
        col("__c") - least(lit(0L), min(col("__c")).over(cumW)))
      .withColumn("cusum_low",
        greatest(lit(0L), max(col("__c")).over(cumW)) - col("__c"))
      .withColumn("alarm_high", col("cusum_high") >= threshold)
      .withColumn("alarm_low", col("cusum_low") >= threshold)
      .drop("__c")
  }
}
