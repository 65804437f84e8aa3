package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining — rank adjacent word pairs by pointwise
  * mutual information, the corpus-statistics complement to the
  * frequency-greedy BPE merge trainer ([[Phrases]]): BPE asks "what
  * pair is most COMMON", PMI asks "what pair is most ASSOCIATED"
  * (`new york` scores high even though both words are individually
  * frequent elsewhere; `of the` scores low even though it is the most
  * common bigram). The output list feeds tokenizer multi-word entries,
  * stopword-phrase filters, and domain-vocabulary reports.
  *
  * Convention (Church & Hanks): with unigram counts `c_x`, adjacent
  * bigram counts `c_xy`, and `N` = total token occurrences,
  *
  *   PMI(x, y) = log2( c_xy · N / (c_x · c_y) )
  *
  * computed as the EXACT Q20 integer
  * `L(c_xy) + L(N) − L(c_x) − L(c_y)` where `L(n) = ilog2Q20(n)`
  * is the [[graft.functions.ILog2Q20]] square-and-shift integer log
  * (the +1+1−1−1 coefficients cancel the Q20 normalization offsets,
  * so no 2²⁰ pre-scale — and no fixed-point count ceiling) —
  * each term individually floored, so the statistic is a deterministic
  * pure function of the counts, order-independent under any
  * partitioning, and bit-replayable in SQL (q110) with no IEEE
  * transcendentals anywhere (the [[Dsir]]/[[NgramLm]]/[[Drift]]
  * fixed-point contract).
  *
  * Scale shape: the corpus is tokenized ONCE (the token table is
  * materialized and feeds both the unigram and bigram aggregates —
  * the [[NgramLm.fit]] contract); both counts are map-side-combinable
  * aggregates whose shuffles carry DISTINCT tokens/pairs, never
  * documents; the `minCount` filter prunes the pair table BEFORE the
  * two unigram-count joins (hapax pairs dominate any real bigram
  * table); and the one driver collect is a single (N, V) scalar row,
  * needed up front to fail loudly on the 2⁴³-token fixed-point
  * ceiling before any work is wasted.
  */
object Collocations {

  private val Q20 = 1L << 20

  /** `(w1, w2, c_xy, c_x, c_y, pmi_q20)` for adjacent-token pairs with
    * `c_xy ≥ minCount`, over [[TextStats.normalize]]d whitespace
    * tokens. NULL texts contribute nothing. Callers order by
    * `pmi_q20` for the collocation report.
    *
    * @param materialize cache the token table across the unigram and
    *                    bigram branches (default). `false` stays fully
    *                    lazy/fault-tolerant at the cost of tokenizing
    *                    twice.
    */
  def pmi(
      df: DataFrame, textCol: String, minCount: Long = 5L,
      materialize: Boolean = true): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")

    val toks0 = df
      .select(filter(
        TextStats.tokens(TextStats.normalize(col(textCol))),
        t => t =!= "").as("__toks"))
      .filter(size(col("__toks")) > 0)
    val toks = if (materialize) toks0.localCheckpoint(true) else toks0

    val uni = toks
      .select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

    val pairs = toks
      .select(posexplode(col("__toks")).as(Seq("__i", "w1")), col("__toks"))
      .filter(col("__i") < size(col("__toks")) - 1)
      .select(col("w1"),
        element_at(col("__toks"), col("__i") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)

    // bounded collect: exactly ONE row — the token total, needed
    // driver-side: one bounded scalar for logN (and the emptiness gate)
    val n = uni.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    require(n > 0, "Collocations.pmi: empty corpus — PMI undefined")
    // No ·2^20 pre-scale on any log: ilog2Q20(x·2^20) = ilog2Q20(x) +
    // 20·2^20 bit-exactly (power-of-two mantissa shift — see
    // Unigram.fitScores), and PMI's +1+1−1−1 log coefficients cancel
    // the four offsets. Identical pmi_q20, and the old 2^43-token
    // fixed-point ceiling (count·2^20 overflow) disappears.
    val logN = graft.text.Dsir.ilog2Q20(n)

    def l(c: Column): Column = graft.functions.ILog2Q20.ilog2Q20(c)

    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        (l(col("c_xy")) + lit(logN) - l(col("c_x")) - l(col("c_y")))
          .as("pmi_q20"))
  }
}
