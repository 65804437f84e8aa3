package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) scan-pruning audit — the tool that
  * answers "is this LAYOUT any good for this WORKLOAD" from statistics
  * alone, before a single query runs. Parquet/Delta/Iceberg readers
  * skip a file when its per-column min/max cannot intersect the
  * predicate; how much they skip is purely a property of how rows were
  * assigned to files. This operator computes those per-zone stats and
  * replays a workload of range predicates against them, reporting the
  * zones/rows each query would have to scan — the number that decides
  * between a linear sort, a [[ZOrder]] layout, or a re-cluster
  * ([[Compaction]]) at 100 TB, measured instead of guessed (q196 runs
  * exactly that linear-vs-z-order comparison).
  *
  * Scale shape: stats are one map-side-combinable aggregate to a
  * #zones-sized table; the audit pairs that table with the
  * query-list-sized workload through the zero-key broadcast hash join
  * ([[graft.core.Scalars.withEach]] — no nested-loop operator) and
  * reduces back to one row per query. Nothing row-level survives the
  * first aggregate.
  */
object ZoneMap {

  /** Per-zone stats `(zone, n_rows, a_min, a_max, b_min, b_max)` over
    * two numeric layout keys. NULL key values leave a zone's bound
    * NULL; the audit then treats that zone as unprunable on that key
    * (scan it — conservative, like real readers).
    */
  def zoneStats(
      df: DataFrame, zoneCol: String, aCol: String, bCol: String): DataFrame =
    df.groupBy(col(zoneCol).as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("a_min"), max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"), max(col(bCol)).as("b_max"))

  /** One row per workload query: `(query_id, zones_scanned,
    * zones_total, rows_scanned, rows_total)`. The workload table has
    * `(query_id, a_lo, a_hi, b_lo, b_hi)` with NULL bounds meaning
    * unbounded; a zone is scanned iff its [min,max] box can intersect
    * the query's range box (missing stats ⇒ scanned).
    */
  def scanAudit(stats: DataFrame, workload: DataFrame): DataFrame = {
    def overlaps(mn: String, mx: String, lo: String, hi: String) =
      (col(lo).isNull || col(mx).isNull || col(mx) >= col(lo)) &&
        (col(hi).isNull || col(mn).isNull || col(mn) <= col(hi))
    val scanned = when(
      overlaps("a_min", "a_max", "a_lo", "a_hi") &&
        overlaps("b_min", "b_max", "b_lo", "b_hi"), 1L).otherwise(0L)
    graft.core.Scalars.withEach(stats, workload)
      .withColumn("__s", scanned)
      .groupBy(col("query_id"))
      .agg(sum(col("__s")).as("zones_scanned"),
        count(lit(1)).as("zones_total"),
        sum(col("__s") * col("n_rows")).as("rows_scanned"),
        sum(col("n_rows")).as("rows_total"))
  }
}
