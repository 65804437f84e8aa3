package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ILog2Q20, MultiPatternCount, UnigramSegment}

/** Unigram-LM subword tokenization (the SentencePiece family) — the
  * third classic tokenizer next to the engine's BPE ([[Bpe]], learned
  * merge rules) and greedy longest-match ([[graft.functions.VocabTokenize]]):
  * score each vocabulary token by corpus frequency, then segment text
  * into the GLOBALLY best-scoring tokenization (Viterbi), not the one
  * a greedy left-to-right scan happens to commit to.
  *
  * Everything is exact integer arithmetic end to end: counts are
  * overlap-inclusive Aho-Corasick occurrences (ONE scan per document
  * for the whole candidate set), scores are Q20 fixed-point log2
  * relative frequencies via [[graft.functions.ILog2Q20]] (no IEEE
  * transcendentals — the [[Dsir]]/[[NgramLm]] discipline), and the
  * Viterbi DP maximizes an integer sum with a pinned tie rule — so
  * fitted scores AND segmentations are bit-replayable in any engine
  * (q198/q199).
  */
object Unigram {

  /** Corpus-frequency scores for `candidates`: `(token, count, score)`
    * where `count` is the corpus-wide overlap-inclusive occurrence
    * count and `score = ilog2_q20(count + 1) − ilog2_q20(total + |C|)`
    * — an add-one-smoothed Q20 log2 relative frequency (always < 0;
    * unseen candidates get the floor rather than −∞). One map-only
    * Aho-Corasick scan per document, one |C|-sized aggregate.
    */
  def fitScores(
      corpus: DataFrame, textCol: String,
      candidates: Seq[String]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate token")
    val spark = corpus.sparkSession
    import spark.implicits._
    val counts = corpus
      .select(posexplode(
        MultiPatternCount.multiPatternCount(col(textCol), candidates))
        .as(Seq("__pos", "__c")))
      .groupBy(col("__pos"))
      .agg(sum(col("__c").cast("long")).as("count"))
    val names = candidates.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("__pos", "token")
    val withNames = names.join(counts, Seq("__pos"), "left")
      .select(col("token"), coalesce(col("count"), lit(0L)).as("count"))
    val total = withNames.agg(
      coalesce(sum(col("count")), lit(0L)).as("__total"))
    // No ·2^20 pre-scale on either log: ilog2Q20 normalizes by
    // bit-length, so ilog2Q20(x·2^20) = ilog2Q20(x) + 20·2^20
    // BIT-EXACTLY (a power-of-two factor shifts the mantissa without
    // truncation) and the 20·2^20 terms cancel in the difference —
    // identical scores, and no long overflow for corpus counts
    // approaching 2^43 that (count+1)·2^20 would hit at 100 TB scale.
    graft.core.Scalars.withScalars(withNames, total)
      .select(col("token"), col("count"),
        (ILog2Q20.ilog2Q20(col("count") + 1L) -
          ILog2Q20.ilog2Q20(
            col("__total") + candidates.size.toLong)).as("score"))
  }

  /** Viterbi segmentation of `textCol` under an integer-scored vocab:
    * one row per token `(idCol, tok_id, start, len, token)` in text
    * order. Characters no vocab token covers fall back to one-char
    * tokens at `unkScore` (segmentation always exists). Map-only; the
    * DP is the native one-pass [[graft.functions.UnigramSegment]].
    */
  def segment(
      df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)], unkScore: Long): DataFrame =
    df.select(
        col(idCol), col(textCol),
        posexplode(UnigramSegment.unigramSegment(
          col(textCol), vocab, unkScore))
          .as(Seq("tok_id", "__s")))
      .select(
        col(idCol),
        col("tok_id").cast("long").as("tok_id"),
        col("__s.start").cast("long").as("start"),
        col("__s.len").cast("long").as("len"),
        substr(col(textCol), col("__s.start").cast("long") + 1L,
          col("__s.len").cast("long")).as("token"))

  /** Fit-then-segment convenience: scores from [[fitScores]] (collected
    * — |candidates|-sized, a bounded driver collect like the vocab
    * count tables), segmentation via [[segment]].
    */
  def fitAndSegment(
      corpus: DataFrame, df: DataFrame, idCol: String, textCol: String,
      candidates: Seq[String], unkScore: Long): DataFrame = {
    val fitted = fitScores(corpus, textCol, candidates)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
    segment(df, idCol, textCol, fitted, unkScore)
  }
}
