package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020 score with a KenLM model trained on a
  * clean target corpus; keep the low-perplexity documents). This is
  * the same distributional idea with an add-one-smoothed bigram model
  * and the engine's exactness discipline: every probability is an
  * exact Q20 fixed-point integer and its log2 runs the integer
  * square-and-shift algorithm ([[graft.functions.ILog2Q20]], native
  * codegen), so document scores are exact INTEGER sums — bit-identical
  * across engines and partitionings, DuckDB-replayable.
  *
  * Model: `p(v | u) = (c(u,v) + 1) / (c(u) + V)` over whitespace
  * tokens of normalized text, where `V` = distinct training tokens + 1
  * (the +1 keeps unseen-context rows, where `c(u) = 0`, a proper
  * distribution over V outcomes). A document's score is
  * `nll_q20 = Σ_bigrams −⌊2^20 log2 p⌋` with `n_bigrams` alongside —
  * callers threshold on the exact integers or divide once for a
  * per-token perplexity proxy.
  *
  * Scale shape — everything stays distributed, nothing collects:
  * unlike [[Dsir]]'s bounded B buckets, a bigram table is as large as
  * the training vocabulary square, so probabilities are computed by
  * JOINs: doc bigrams ⟕ bigram counts ⟕ unigram counts, then the
  * native log2 and one map-combinable integer sum per document. Both
  * count tables shuffle once at fit time; AQE broadcasts them when
  * they fit. Overflow contract: exact while `(c(u,v) + 1) · 2^20 <
  * 2^63` — counts to ~2^42 occurrences of one bigram.
  */
object NgramLm {

  /** Fitted model: (u, v, c) bigram counts, (u, c) unigram counts, and
    * the smoothing denominator term V (distinct training tokens + 1).
    */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame, v: Long)

  private def tokenArr(textCol: Column): Column =
    filter(TextStats.tokens(TextStats.normalize(textCol)), t => t =!= "")

  /** (idCols..., u, v) bigram occurrences from a token-array frame. */
  private def bigramsFromTokens(
      toks: DataFrame, idCols: Seq[String]): DataFrame =
    toks
      .select(idCols.map(col) :+ posexplode(col("__toks")).as(Seq("__i", "u"))
        :+ col("__toks"): _*)
      .filter(col("__i") < size(col("__toks")) - 1)
      .select(idCols.map(col) :+ col("u")
        :+ element_at(col("__toks"), col("__i") + 2).as("v"): _*)

  /** One row per (id, u, v) bigram occurrence. */
  def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramsFromTokens(
      df.select(col(idCol), tokenArr(col(textCol)).as("__toks")), Seq(idCol))

  /** Fit the add-one bigram model on a target corpus.
    *
    * The token table (the expensive tokenize pass over the target) is
    * persisted and feeds all three derivations — bigram counts,
    * unigram context counts, and the vocabulary size — so the corpus
    * is tokenized ONCE (previously three times). The returned model
    * tables are eagerly checkpointed: a model is a fitted ARTIFACT,
    * and lazy tables would silently re-run the whole fit on every
    * downstream [[score]] action.
    */
  def fit(target: DataFrame, textCol: String): BigramLm = {
    // no id column: the aggregates below group by token(s) only
    val toks = target
      .select(tokenArr(col(textCol)).as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bi = bigramsFromTokens(toks, Seq.empty)
      val bigrams = bi.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("__cuv"))
        .localCheckpoint(true)
      // unigram CONTEXT counts: occurrences as a bigram's left side, so
      // the model normalizes exactly (sum_v p(v|u) = 1)
      val unigrams = bi.groupBy(col("u")).agg(count(lit(1)).as("__cu"))
        .localCheckpoint(true)
      val v = toks
        .select(explode(col("__toks")).as("t"))
        .agg(countDistinct(col("t"))).head.getLong(0) + 1L
      BigramLm(bigrams, unigrams, v)
    } finally toks.unpersist()
  }

  /** (id, n_bigrams, nll_q20) per scored document — exact integer
    * negative log2-likelihood. Documents with fewer than two tokens
    * have no bigrams and are absent from the output (nothing to
    * score), mirroring the oracle replay.
    */
  def score(
      df: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame = {
    val bi = docBigrams(df, idCol, textCol)
    bi.join(lm.bigrams, Seq("u", "v"), "left")
      .join(lm.unigrams, Seq("u"), "left")
      .withColumn("__num",
        (coalesce(col("__cuv"), lit(0L)) + 1L) * lit(Dsir.Scale))
      .withColumn("__den", coalesce(col("__cu"), lit(0L)) + lit(lm.v))
      .withColumn("__l", graft.functions.ILog2Q20.ilog2Q20(
        expr("__num div __den")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(-col("__l")).as("nll_q20"))
  }
}
