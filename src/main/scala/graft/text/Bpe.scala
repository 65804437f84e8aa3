package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a corpus — the "train a
  * tokenizer" step of an LLM data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * expressed Spark-first. North-star extension (SURVEY §2.11): the
  * reference ships vocabulary COUNTING (`tensorflow/tfrecords.py:
  * 153-168`) but nothing that learns a subword vocabulary.
  *
  * Scale shape: the corpus-sized work is ONE pass — the token
  * count that produces the word-frequency table ([[wordFrequencies]],
  * a single groupBy over the map-only token stream). Every learning
  * iteration after that runs on the VOCABULARY-sized table (≪ corpus;
  * Heaps' law puts it around √N tokens), so 100 TB of text costs the
  * same merge loop as 100 GB once the frequency table exists. Per
  * step: one distributed pair-count aggregation (explode of adjacent
  * symbol pairs, weighted by word frequency), a 1-row argmax collect
  * (count DESC, then pair lexicographic — fully deterministic), and a
  * literal `replace` over the symbol strings. The working table is
  * `localCheckpoint`ed each step to keep lineage flat across
  * iterations.
  *
  * Symbol representation: each word's current segmentation is a string
  * of space-TERMINATED symbols (`"cat"` → `"c a t "`). The separator
  * belongs to the symbol on its left, so the literal replace of
  * `"a b "` → `"ab "` is greedy-leftmost and handles back-to-back
  * merges exactly like sequential BPE (`"a a a a "` → `"aa aa "`),
  * with no regex (and no lookaround, which RE2-based engines — and
  * therefore the DuckDB oracle — could not replay). A space can never
  * occur INSIDE a symbol because words come from whitespace
  * tokenization, which makes the encoding collision-free by
  * construction.
  */
object Bpe {

  /** Corpus word-frequency table `(word, freq)` — the one
    * corpus-sized pass; everything else runs on its output.
    */
  def wordFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    InvertedIndex.tokenRows(docs, idCol, textCol)
      .groupBy(col("token").as("word"))
      .agg(count(lit(1)).as("freq"))

  /** One learned merge step. */
  final case class Merge(step: Int, left: String, right: String,
      merged: String, pairCount: Long)

  private def initRep(word: Column): Column =
    regexp_replace(word, "(.)", "$1 ")

  /** Adjacent symbol pairs of a space-terminated rep, weighted by
    * freq: `(l, r, freq)` rows. Words with fewer than two symbols
    * contribute nothing.
    */
  private def pairRows(reps: DataFrame): DataFrame = {
    val syms = filter(split(col("rep"), " "), x => x =!= "")
    reps
      .select(col("freq"), syms.as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("l"),
            element_at(col("s"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Learn `steps` merges from a `(word, freq)` table. Deterministic:
    * ties broken by (left, right) lexicographic order.
    */
  def learnMerges(words: DataFrame, steps: Int): Seq[Merge] = {
    var reps = words
      .select(col("word"), col("freq"), initRep(col("word")).as("rep"))
      .localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val best = pairRows(reps)
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(step, l, r, l + r, c)
        reps = reps
          .withColumn("rep", call_function("replace", col("rep"),
            lit(s"$l $r "), lit(s"$l$r ")))
          .localCheckpoint()
        step += 1
      }
    }
    out.result()
  }

  /** Apply an ordered merge list to a `(word, …)` table, producing the
    * final segmentation `(word, …, segments)` — symbols joined by a
    * single space (the BPE encode step for the learned vocabulary).
    */
  def applyMerges(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val rep = merges.foldLeft(initRep(col(wordCol))) { (acc, m) =>
      call_function("replace", acc,
        lit(m.left + " " + m.right + " "), lit(m.merged + " "))
    }
    words.withColumn("segments", rtrim(rep))
  }
}
