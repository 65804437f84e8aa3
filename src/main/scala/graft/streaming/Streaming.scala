package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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

  /** Streaming exact dedup — the streaming form of
    * [[graft.dedup.Dedup.exactDedup]]: first occurrence of each
    * (normalized) content fingerprint passes, later duplicates are
    * dropped. `dropDuplicatesWithinWatermark` keys the state store on
    * the 128-bit content hash only (not the full row), and the
    * watermark bounds state: a duplicate arriving later than the
    * watermark delay after its original may pass again — the standard
    * streaming-dedup tradeoff (exact dedup of an unbounded stream needs
    * unbounded state).
    */
  def streamingExactDedup(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 hour",
      normalizeText: Boolean = true): DataFrame = {
    val key =
      if (normalizeText) graft.text.TextStats.fingerprintMd5(col(textCol))
      else md5(col(textCol))
    df.withColumn("__content_key", key)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")
  }

  final case class VocabCount(value: String, count: Long)

  /** Streaming vocabulary: running value counts maintained with
    * `mapGroupsWithState` — the stateful form of
    * [[graft.vocab.Vocabulary.vocabCounts]] (SURVEY §2.9 notes batch
    * vocabulary needs exactly this to stream). Each micro-batch emits
    * the updated cumulative count per value; state is one long per
    * distinct value, partitioned by the state-store shuffle.
    */
  def streamingVocabCounts(values: Dataset[String]): Dataset[VocabCount] = {
    import values.sparkSession.implicits._
    values
      .filter((v: String) => v != null)
      .groupByKey(identity[String] _)
      .mapGroupsWithState[Long, VocabCount](GroupStateTimeout.NoTimeout) {
        (value: String, rows: Iterator[String], state: GroupState[Long]) =>
          val updated = state.getOption.getOrElse(0L) + rows.size
          state.update(updated)
          VocabCount(value, updated)
      }
  }

}
