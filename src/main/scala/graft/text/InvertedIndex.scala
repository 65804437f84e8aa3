package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index over a document corpus, plus phrase search
  * through it — the IR-side companion to the dedup/similarity indexes
  * (mirrors `dedup/DedupIndex` and `sim/Similarity.writeIvfIndex` as a
  * build-once / query-many structure). North-star extension (SURVEY
  * §2.11); the reference has vocabulary extraction
  * (`tensorflow/tfrecords.py:153-168`) but no postings or position
  * data — this is the step from "token counts" to "searchable corpus".
  *
  * Scale shape, in 100 TB terms:
  *   - [[tokenRows]] is map-only (normalize → split → posexplode): one
  *     pipelined pass over the scan, no shuffle, text column pruned
  *     away immediately after the split.
  *   - [[postings]] does ONE shuffle, on `token`: an explicit
  *     `repartition(token)` whose `HashPartitioning(token)` satisfies
  *     both the `(token, doc)` group-by's clustered distribution and
  *     the per-token window that follows, so Catalyst inserts no
  *     further exchange. Per-token posting lists are capped at
  *     `maxDocs` (lowest doc ids — deterministic head) while `df`
  *     stays exact over ALL docs, so a stop-word's postings row stays
  *     bounded no matter how large the corpus grows; positions are
  *     stored per (token, doc) as a CSV string, never concatenated
  *     across documents.
  *   - [[phraseSearch]] does not touch the index: it filters the
  *     token stream to the phrase's terms FIRST (a selective,
  *     pushdown-friendly `isin`), then chains equi-joins on
  *     `(doc, pos + offset)` — each join key is unique-ish per doc, no
  *     position window, no cartesian anything. A k-term phrase costs
  *     k-1 hash joins over already-tiny filtered sides.
  */
object InvertedIndex {

  /** `(id, pos, token)` rows: 1-based token positions in the
    * whitespace-split normalized text. Map-only — no shuffle.
    */
  def tokenRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(
        filter(split(TextStats.normalize(col(textCol)), " "), t => t =!= ""))
        .as(Seq("pos0", "token")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("token"))

  /** Positional postings, one row per (token, doc): exact corpus-wide
    * document frequency `df`, per-doc term frequency `tf`, and the
    * sorted position list as CSV. Tokens below `minDf` are dropped;
    * each token keeps only its `maxDocs` lowest doc ids.
    */
  def postings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int = 1,
      maxDocs: Int = Int.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("token"))
    val wOrd = w.orderBy(col(idCol))
    tokenRows(docs, idCol, textCol)
      // one shuffle here; HashPartitioning(token) satisfies the
      // (token, id) group-by AND the token window below
      .repartition(col("token"))
      .groupBy(col("token"), col(idCol))
      .agg(
        count(lit(1)).as("tf"),
        concat_ws(",", transform(sort_array(collect_list(col("pos"))),
          p => p.cast("string"))).as("positions"))
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("df") >= minDf && col("rn") <= maxDocs)
      .drop("rn")
      .select(col("token"), col(idCol), col("df"), col("tf"), col("positions"))
  }

  /** Documents containing `phrase` as consecutive tokens:
    * `(id, n_matches, first_pos)`. Filters to the phrase's terms before
    * any join; k-1 equi-joins on `(id, pos + offset)`.
    */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = tokenRows(docs, idCol, textCol)
      .filter(col("token").isin(phrase.map(lit): _*))
    chainPhrase(toks, idCol, phrase)
  }

  /** [[phraseSearch]] served FROM a [[postings]] index instead of the
    * corpus — the query-many side of the build-once structure (the
    * postings must cover the phrase's terms uncapped: `minDf = 1`,
    * unlimited `maxDocs`, or a capped index silently misses documents
    * beyond each term's cap). Positions come from parsing the stored
    * CSV — the corpus text is never re-read or re-tokenized.
    * Result is pinned row-identical to the direct path (q148 runs
    * against q141's oracle verbatim).
    */
  def phraseSearchFromPostings(
      postings: DataFrame,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = postings
      .filter(col("token").isin(phrase.map(lit): _*))
      .select(col("token"), col(idCol),
        explode(transform(split(col("positions"), ","),
          p => p.cast("int"))).as("pos"))
    chainPhrase(toks, idCol, phrase)
  }

  /** Shared phrase matcher over `(token, id, pos)` rows already
    * filtered to the phrase's terms: k−1 equi-joins on
    * `(id, pos + offset)`, then per-doc match stats.
    */
  private def chainPhrase(
      toks: DataFrame, idCol: String, phrase: Seq[String]): DataFrame = {
    val first = toks.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos").as("start"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (term, i)) =>
        val next = toks.filter(col("token") === term)
          .select(col(idCol).as("m_id"), col("pos").as("m_pos"))
        acc.join(next,
          acc(idCol) === next("m_id") &&
            next("m_pos") === acc("start") + i)
          .select(acc(idCol), acc("start"))
    }
    matches.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
  }
}
