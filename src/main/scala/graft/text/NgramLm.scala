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

  /** Fitted interpolated Kneser-Ney bigram model (Kneser & Ney 1995;
    * the Chen & Goodman 1998 interpolated form): bigram counts,
    * per-context totals and follower counts, per-word predecessor
    * (continuation) counts, the distinct-bigram total, and the
    * discount as an exact rational `dNum/dDen`.
    */
  final case class KneserNeyLm(
      bigrams: DataFrame, contexts: DataFrame, continuations: DataFrame,
      nBi: Long, dNum: Long, dDen: Long)

  /** Fit interpolated Kneser-Ney on a target corpus — the
    * substantially-better-calibrated sibling of add-one [[fit]] (the
    * standard n-gram smoothing; add-one systematically overweights
    * unseen mass on large vocabularies). Same single-tokenize-pass and
    * checkpointed-artifact discipline as [[fit]].
    *
    * Exactness: with discount `d = dNum/dDen`,
    * `P(v|u) = [max(c(u,v)·dDen − dNum, 0)·N + dNum·fol(u)·pre(v)]
    *           / (dDen·c(u)·N)`
    * where `fol(u)` = distinct followers of `u`, `pre(v)` = distinct
    * predecessors of `v`, `N` = distinct bigrams — the interpolated KN
    * formula over the common denominator, every term a 64-bit integer.
    * Contexts unseen in training back off to pure continuation
    * `pre(v)/N`. Fail-loud fixed-point ceilings (the
    * [[Collocations.pmi]] discipline) guard the Q20 scaling.
    */
  def fitKneserNey(
      target: DataFrame, textCol: String,
      dNum: Long = 3L, dDen: Long = 4L): KneserNeyLm = {
    require(dDen >= 1 && dNum >= 0 && dNum <= dDen,
      s"discount must be a fraction in [0, 1], got $dNum/$dDen")
    val toks = target
      .select(tokenArr(col(textCol)).as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bi = bigramsFromTokens(toks, Seq.empty)
      val bigrams = bi.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("__cuv"))
        .localCheckpoint(true)
      val contexts = bigrams.groupBy(col("u"))
        .agg(sum(col("__cuv")).as("__cu"), count(lit(1)).as("__fol"))
        .localCheckpoint(true)
      val continuations = bigrams.groupBy(col("v"))
        .agg(count(lit(1)).as("__pre"))
        .localCheckpoint(true)
      val nBi = bigrams.count()
      require(nBi > 0, "fitKneserNey: empty corpus — no bigrams to fit")
      // fixed-point ceilings: the Q20-scaled numerator and the common
      // denominator must fit a long for EVERY scored bigram — checked
      // once at fit time from three bounded 1-row aggregates
      val maxCuv = bigrams.agg(max(col("__cuv"))).head.getLong(0)
      val maxCu = contexts.agg(max(col("__cu"))).head.getLong(0)
      val maxFol = contexts.agg(max(col("__fol"))).head.getLong(0)
      val maxPre = continuations.agg(max(col("__pre"))).head.getLong(0)
      require(
        (BigInt(maxCuv) * dDen * nBi + BigInt(dNum) * maxFol * maxPre) *
          Dsir.Scale < BigInt(Long.MaxValue) &&
          BigInt(dDen) * maxCu * nBi < BigInt(Long.MaxValue),
        s"fitKneserNey: corpus too large for exact Q20 fixed point " +
          s"(maxCuv=$maxCuv, nBi=$nBi) — shard the fit or sample")
      KneserNeyLm(bigrams, contexts, continuations, nBi, dNum, dDen)
    } finally toks.unpersist()
  }

  /** (id, n_bigrams, nll_q20) per scored document under a
    * [[fitKneserNey]] model — exact integer negative log2-likelihood,
    * the same Q20 discipline as [[score]]. Bigrams whose context was
    * never seen back off to the continuation distribution; a (context,
    * word) both unseen floors at one Q20 ulp (the [[Dsir.ilog2Q20]]
    * clamp), mirroring the oracle replay.
    */
  def scoreKneserNey(
      df: DataFrame, idCol: String, textCol: String,
      lm: KneserNeyLm): DataFrame = {
    val bi = docBigrams(df, idCol, textCol)
    bi.join(lm.bigrams, Seq("u", "v"), "left")
      .join(lm.contexts, Seq("u"), "left")
      .join(lm.continuations, Seq("v"), "left")
      .withColumn("__num",
        when(col("__cu").isNull, coalesce(col("__pre"), lit(0L)))
          .otherwise(
            greatest(coalesce(col("__cuv"), lit(0L)) * lit(lm.dDen) -
              lit(lm.dNum), lit(0L)) * lit(lm.nBi) +
              lit(lm.dNum) * col("__fol") *
                coalesce(col("__pre"), lit(0L))))
      .withColumn("__den",
        when(col("__cu").isNull, lit(lm.nBi))
          .otherwise(lit(lm.dDen) * col("__cu") * lit(lm.nBi)))
      .withColumn("__l", graft.functions.ILog2Q20.ilog2Q20(
        expr(s"(__num * ${Dsir.Scale}L) div __den")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(-col("__l")).as("nll_q20"))
  }
}
