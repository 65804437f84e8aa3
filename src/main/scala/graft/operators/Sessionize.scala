package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — turning an event stream into behavioral
  * sessions is the first transform of most training pipelines over
  * interaction logs.
  *
  * Semantics: events with the same key belong to one session while
  * consecutive gaps are `<= gapSeconds`; a gap strictly greater starts a
  * new session (the classic SQL convention; Spark's built-in
  * `session_window` differs only at the exact boundary — it closes at
  * `last + gap`, i.e. a gap of exactly `gapSeconds` already splits).
  *
  * Scale shape: ONE shuffle on the key, then two window passes over the
  * *same* (key, order) spec — `lag` to flag session starts, running
  * `sum` to number them — which share a single exchange+sort. Session
  * stats add a hash aggregation on (key, session) that partially
  * aggregates map-side. No driver state, no iteration; a key's whole
  * history must fit a partition's sort spill budget, which holds for
  * user-keyed logs (it's the per-user event count, not the table size).
  *
  * For unbounded streams use `session_window` + watermark in a
  * streaming aggregation (see `streaming/Streaming.sessionStats`) —
  * same sessions, incremental state instead of a sort.
  */
object Sessionize {

  /** Append `sessionCol`: 1-based session index per key, in
    * `(tsCol, tieBreak)` order. `tieBreak` must make the order total
    * (duplicate timestamps per key are real in event logs) or session
    * numbering is nondeterministic under retries.
    */
  def withSessionIds(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[Column] = Nil,
      sessionCol: String = "session_idx"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val order = col(tsCol).asc +: tieBreak
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val gapMicros = gapSeconds * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val starts = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > gapMicros, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(starts).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** One row per session: start/end timestamps, event count, and the
    * exact decimal sum of `valueCol` (when provided).
    */
  def sessionStats(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[Column] = Nil,
      valueCol: Option[String] = None): DataFrame = {
    val ids = withSessionIds(df, keyCols, tsCol, gapSeconds, tieBreak)
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => sum(col(v).cast("decimal(30,2)")).cast("double")
        .as("total_value"))
    ids.groupBy((keyCols.map(col) :+ col("session_idx")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
