package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY §2.9); the engine's column-algebra operators — stratified
  * sampling, scoring columns, text stats, fingerprints — are stateless
  * and therefore run unchanged on streaming DataFrames (demonstrated in
  * `StreamingSpec`). This module adds the stateful pieces a streaming
  * deployment needs: watermarked windowed aggregation.
  *
  * Scale notes: windowed counts are partial-aggregated before the
  * state-store shuffle; the watermark bounds state size (late events
  * beyond it are dropped), so state is O(windows in flight × group
  * cardinality) regardless of stream length.
  */
object Streaming {

  /** Watermarked tumbling-window event aggregation — the streaming form
    * of the batch hourly-rollup query (q04).
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength).as("win"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("win.start").as("window_start"), col(typeCol),
        col("n"), col("total_value"))

  /** Stateless quality gate for streaming ingestion: keep rows passing
    * the predicate, tagging the rest (dead-letter routing splits on the
    * flag without re-evaluating the predicate).
    */
  def withQualityFlag(df: DataFrame, predicate: Column, flagCol: String = "quality_ok"): DataFrame =
    df.withColumn(flagCol, predicate)
}
