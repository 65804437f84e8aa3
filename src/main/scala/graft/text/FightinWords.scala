package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Scalars
import graft.functions.ILog2Q20

/** "Fightin' Words" — per-token Dirichlet-smoothed log-odds between
  * two corpora (Monroe, Colaresi & Quinn 2008), the statistically
  * honest form of "what words distinguish corpus A from corpus B".
  * Raw frequency ratios over-weight rare words (a 3-vs-0 token looks
  * infinitely A-flavored); the symmetric Dirichlet prior (α per word)
  * shrinks exactly those, and the companion variance `1/(a+α) +
  * 1/(b+α)` tells the analyst how much to trust each delta. The
  * corpus-COMPARISON member of the text family: PMI (q110) finds
  * collocations within one corpus, KL/PSI (q79/q114) give one drift
  * number per distribution — this names the tokens responsible,
  * with uncertainty.
  *
  * Exactness: deltas are computed in Q20 fixed-point BASE-2 log units
  * via the native [[ILog2Q20]] expression —
  * `δ_w = L(a+α) − L(A+αV−a−α) − L(b+α) + L(B+αV−b−α)`,
  * `L(x) = ilog2_q20(x)` — pure integer multiply/shift/compare,
  * bit-identical in any engine (DuckDB replays L as the 20-round
  * recursive CTE, the q48/q49 protocol). The +1−1−1+1 coefficients
  * cancel ilog2Q20's Q20 normalization offsets, so counts enter L
  * UNSCALED — no 2²⁰ pre-multiplication, no fixed-point token
  * ceiling. Natural-log users divide by `log2 e` once downstream. The
  * variance estimate is ONE IEEE divide of exact integers:
  * `(a+b+2α) / ((a+α)·(b+α))`.
  *
  * Scale shape: one token explode feeding ONE map-side-combinable
  * aggregate (conditional sums — no second pass per corpus); the
  * result table is vocabulary-sized. Corpus totals attach via
  * [[Scalars.withScalars]] (constant-key broadcast hash join). The
  * log evaluates on the vocabulary table only — never at token scope.
  */
object FightinWords {

  /** Per-token comparison table:
    * `(token, n_a, n_b, delta_q20, var_est)`, `delta_q20` > 0 meaning
    * A-flavored. `inA` labels each ROW's corpus; both corpora must be
    * non-empty (raises otherwise — a one-sided "comparison" is a
    * frequency list wearing a costume).
    *
    * @param alpha symmetric Dirichlet prior per word (integer ≥ 1;
    *              1 = add-one, larger = stronger shrinkage).
    */
  def logOdds(
      df: DataFrame, textCol: String, inA: Column,
      alpha: Long = 1L): DataFrame = {
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    val toks = df
      .select(inA.as("__a"),
        explode(TextStats.tokens(
          regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
          .as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy(col("token"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("n_b"))
    val totals = counts.agg(
      sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__v"))

    // No ·2^20 pre-scale: ilog2Q20(x·2^20) = ilog2Q20(x) + 20·2^20
    // bit-exactly (see Unigram.fitScores), and delta's +1−1−1+1 log
    // coefficients cancel the offsets — identical delta_q20, no long
    // overflow for corpus-scale counts past 2^43.
    def L(x: Column) = ILog2Q20.ilog2Q20(x)
    val a = col("n_a") + alpha
    val b = col("n_b") + alpha
    val restA = col("__ta") + lit(alpha) * col("__v") - a
    val restB = col("__tb") + lit(alpha) * col("__v") - b
    Scalars.withScalars(counts, totals)
      .withColumn("__chk", when(col("__ta") === 0 || col("__tb") === 0,
        raise_error(lit("FightinWords.logOdds: one corpus is empty — " +
          "a one-sided comparison is meaningless")))
        .otherwise(lit(true)))
      .filter(col("__chk"))
      .select(col("token"), col("n_a"), col("n_b"),
        (L(a) - L(restA) - L(b) + L(restB)).as("delta_q20"),
        ((col("n_a") + col("n_b") + 2 * alpha).cast("double") /
          (a * b).cast("double")).as("var_est"))
  }
}
