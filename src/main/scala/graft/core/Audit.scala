package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Free audit metrics — row counts, null counts, checksums observed
  * DURING an action's single pass over the data (Spark's `Observation`
  * API), instead of the second full scan a naive
  * `write(); df.agg(...).collect()` pays. At 100 TB the difference is
  * a day of cluster time: the write already streams every row past
  * the metric expressions, so the aggregates ride along in the task
  * metrics for free.
  *
  * The metrics must be aggregate expressions Spark can evaluate
  * per-task and merge (sums, counts, min/max — the same algebraic
  * family every sketch in `graft.sketch` is built from). The returned
  * map reflects exactly the rows the ACTION consumed — if the action
  * only reads a filtered branch, the metrics see the filtered rows,
  * which is the honest number for a write audit.
  */
object Audit {

  /** Run `action` over `df` with `metrics` observed in the same pass;
    * returns the metric values after the action completes.
    *
    * {{{
    * val m = Audit.observed(df, Map(
    *   "rows" -> count(lit(1)),
    *   "null_texts" -> count(when(col("text").isNull, 1)),
    *   "checksum" -> sum(crc32(col("text").cast("binary")))))(
    *   _.write.parquet(out))
    * }}}
    */
  def observed(
      df: DataFrame, metrics: Map[String, Column])(
      action: DataFrame => Unit): Map[String, Any] = {
    require(metrics.nonEmpty, "observed needs at least one metric")
    val obs = Observation()
    val named = metrics.toSeq
    action(df.observe(obs, named.head._2.as(named.head._1),
      named.tail.map { case (n, c) => c.as(n) }: _*))
    obs.get
  }
}
