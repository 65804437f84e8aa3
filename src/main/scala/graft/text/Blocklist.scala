package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MultiPatternCount

/** Blocklist / watchlist screening — filter or annotate a corpus
  * against a fixed term list (unsafe phrases, trademarked strings,
  * canary/eval-contamination markers). All entry points ride ONE
  * Aho-Corasick scan per document ([[MultiPatternCount]] — O(len +
  * matches) regardless of list size); the per-pattern `contains`
  * alternative is a corpus pass per term.
  *
  * Counts are occurrences at every start position (overlapping
  * included), exact char comparison — deterministic and replayed
  * position-by-position by q175's DuckDB oracle.
  */
object Blocklist {

  /** `df` plus `outCol`: `array<int>` of per-pattern occurrence counts
    * aligned with `patterns` order. Map-only, codegen'd, no shuffle.
    */
  def withPatternCounts(
      df: DataFrame, textCol: String, patterns: Seq[String],
      outCol: String = "pattern_hits"): DataFrame =
    df.withColumn(outCol,
      MultiPatternCount.multiPatternCount(col(textCol), patterns))

  /** Long-form hit table: one `(…idCol, pattern, n_hits)` row per
    * (document, pattern) with ≥1 hit — the audit/reporting shape
    * (`GROUP BY pattern` gives the corpus-wide blocklist report).
    * Map-only: posexplode of the counts array + a literal pattern
    * lookup; rows with zero hits never materialize.
    */
  def patternHits(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit): _*)
    withPatternCounts(df, textCol, patterns, outCol = "__hits")
      .select(col(idCol), posexplode(col("__hits")).as(Seq("__pos", "n_hits")))
      .filter(col("n_hits") > 0)
      .select(col(idCol),
        element_at(pats, col("__pos") + 1).as("pattern"),
        col("n_hits"))
  }

  /** Rows whose text contains NO blocklisted pattern — the filter form
    * (curation keeps the clean side). One scan, map-only.
    */
  def clean(df: DataFrame, textCol: String, patterns: Seq[String]): DataFrame =
    withPatternCounts(df, textCol, patterns, outCol = "__hits")
      .filter(aggregate(col("__hits"), lit(0),
        (acc, x) => acc + x) === 0)
      .drop("__hits")
}
