package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordPieceTokenize

/** WordPiece subword tokenization (the BERT family) — completes the
  * engine's tokenizer quartet: BPE ([[Bpe]], merge-rule replay),
  * unigram-LM ([[Unigram]], globally optimal Viterbi), flat greedy
  * longest-match ([[graft.functions.VocabTokenize]]) and now per-word
  * greedy longest-match with continuation-prefixed pieces and an
  * all-or-nothing unk rule ([[graft.functions.WordPieceTokenize]]).
  *
  * The scale idiom here is Heaps' law: a corpus' distinct-word table
  * grows ~√N while the corpus grows N, so segmenting DISTINCT words
  * and joining back counts costs the tokenizer itself only
  * vocabulary-sized work no matter how big the corpus is — the same
  * trick [[Bpe]] uses for merge learning.
  */
object WordPiece {

  /** Per-word piece table over the corpus' DISTINCT words:
    * `(word, n_instances, piece_id, piece)` — continuation pieces carry
    * `contPrefix`, words WordPiece cannot fully cover collapse to one
    * `unk` piece (never a partial list). Words split on whitespace.
    */
  def segmentDistinctWords(
      corpus: DataFrame, textCol: String, vocab: Seq[String],
      unk: String = "[UNK]", contPrefix: String = "##"): DataFrame = {
    val words = corpus
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_instances"))
    words.select(
        col("word"), col("n_instances"),
        posexplode(WordPieceTokenize.wordPieceTokenize(
          col("word"), vocab, unk, contPrefix))
          .as(Seq("piece_id", "piece")))
      .select(col("word"), col("n_instances"),
        col("piece_id").cast("long").as("piece_id"), col("piece"))
  }

  /** Per-document fertility audit: `(idCol, n_words, n_pieces, n_unk)`
    * — pieces-per-word is THE tokenizer-vs-corpus fit metric (a
    * fertility creep after a corpus shift means the vocabulary no
    * longer matches the data), and n_unk is the coverage hole count.
    * Map-only; one tokenizer pass per document.
    */
  def fertility(
      df: DataFrame, idCol: String, textCol: String, vocab: Seq[String],
      unk: String = "[UNK]", contPrefix: String = "##"): DataFrame =
    df.select(
        col(idCol),
        split(col(textCol), "\\s+").as("__w"),
        WordPieceTokenize.wordPieceTokenize(
          col(textCol), vocab, unk, contPrefix).as("__p"))
      .select(
        col(idCol),
        size(filter(col("__w"), w => length(w) > 0)).cast("long")
          .as("n_words"),
        size(col("__p")).cast("long").as("n_pieces"),
        (size(col("__p")) - size(array_remove(col("__p"), unk)))
          .cast("long").as("n_unk"))
}
