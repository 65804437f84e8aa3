package graft.vocab

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary coverage / OOV-rate curves — the tokenizer-sizing
  * question ("what does a 32k vocab actually cover?") answered exactly,
  * at corpus scale.
  *
  * `coverage(k)` = fraction of all token occurrences covered by the
  * top-`k` tokens by frequency. The naive plan ranks every distinct
  * token with a global window — a single-partition sort over the whole
  * vocabulary. This operator never ranks tokens at all:
  *
  *   1. token → count (shuffle carries DISTINCT tokens — the
  *      Quantiles/vocab shape);
  *   2. count → frequency *class* `(c, n_c, mass = c·n_c)` (shuffle
  *      carries DISTINCT count values; since Σ_classes c ≤ N, there are
  *      at most O(√N) classes — a few thousand for a trillion tokens);
  *   3. one window over the tiny class table (ordered by `c` desc)
  *      gives each class its "tokens ranked above" prefix, and each
  *      requested size `k` gets its exact top-k mass by class
  *      arithmetic: classes fully above `k` contribute whole `mass`,
  *      the boundary class contributes `(k − before) · c` — exact
  *      because same-count tokens are interchangeable under any
  *      deterministic (count, token) ranking.
  *
  * All arithmetic is 64-bit integer; the two output ratios are each ONE
  * IEEE divide, so DuckDB replays the result bit-for-bit (oracle q102).
  */
object Coverage {

  /** Coverage report, one row per requested vocab size `k`:
    * `(k, tokens_used, covered_tokens, total_tokens, distinct_tokens,
    * coverage, oov_rate)`. `tokens_used = min(k, distinct)`.
    */
  def coverageReport(df: DataFrame, token: Column, sizes: Seq[Long]): DataFrame = {
    require(sizes.nonEmpty, "sizes must be non-empty")
    require(sizes.forall(_ > 0), s"sizes must be positive, got $sizes")
    val counts = df.select(token.as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val classes = counts.groupBy(col("__c"))
      .agg(count(lit(1)).as("__nc"))
      .withColumn("__mass", col("__c") * col("__nc"))
    // Tiny-table window: rows = distinct count VALUES (≤ O(√N)), not
    // tokens — the single partition is bounded by construction.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = classes
      .withColumn("__before", coalesce(sum(col("__nc")).over(w), lit(0L)))
    val perK = ranked
      .withColumn("k", explode(lit(sizes.toArray)))
      .withColumn("__covered_here",
        when(col("__before") + col("__nc") <= col("k"), col("__mass"))
          .when(col("__before") >= col("k"), lit(0L))
          .otherwise((col("k") - col("__before")) * col("__c")))
      .withColumn("__used_here",
        when(col("__before") + col("__nc") <= col("k"), col("__nc"))
          .when(col("__before") >= col("k"), lit(0L))
          .otherwise(col("k") - col("__before")))
    perK.groupBy(col("k"))
      .agg(
        sum(col("__used_here")).as("tokens_used"),
        sum(col("__covered_here")).as("covered_tokens"),
        sum(col("__mass")).as("total_tokens"),
        sum(col("__nc")).as("distinct_tokens"))
      .withColumn("coverage",
        col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("oov_rate",
        (col("total_tokens") - col("covered_tokens")).cast("double") /
          col("total_tokens").cast("double"))
  }
}
