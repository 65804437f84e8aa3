package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus composition report ("dataset card" numbers): per-group and
  * grand-total document/token/character counts plus exact length
  * extremes, computed in ONE pass with `ROLLUP` — Spark expands the
  * grouping sets inside a single aggregate (one shuffle), instead of
  * the naive per-level union of aggregations that re-scans the corpus
  * once per level. At 100 TB that difference is the whole report: one
  * scan + one shuffle vs L scans.
  *
  * Every number is an exact integer (counts, sums, min/max), so the
  * report replays bit-for-bit as SQL `GROUP BY ROLLUP` (q90);
  * `is_total` disambiguates the grand-total row from a genuine NULL
  * group value (the standard `GROUPING()` trick).
  */
object CorpusReport {

  /** One row per `groupCol` value plus one grand-total row:
    * `(groupCol, is_total, n_docs, n_tokens, n_chars, min_tokens,
    * max_tokens)`. Token counts use [[TextStats.normalize]]'s
    * whitespace tokenization; empty documents count 0 tokens.
    */
  def report(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = when(length(trim(col(textCol))) === 0, lit(0L))
      .otherwise(size(split(TextStats.normalize(col(textCol)), " "))
        .cast("long"))
    df.select(col(groupCol), toks.as("__t"),
        length(col(textCol)).cast("long").as("__c"))
      .rollup(col(groupCol))
      .agg(
        // grouping() is only resolvable inside the rollup aggregate
        (grouping(col(groupCol)) === 1).as("is_total"),
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        sum(col("__c")).as("n_chars"),
        min(col("__t")).as("min_tokens"),
        max(col("__t")).as("max_tokens"))
      .select(col(groupCol), col("is_total"), col("n_docs"),
        col("n_tokens"), col("n_chars"), col("min_tokens"),
        col("max_tokens"))
  }
}
