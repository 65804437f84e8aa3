package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 relevance scoring over a document corpus — the
  * workhorse of retrieval-based data curation (picking training
  * documents relevant to a target domain, the classic
  * "CCNet/importance-sampling" selection step) and of search-style
  * evaluation sets.
  *
  * Scale shape:
  *   - `postings` is ONE shuffle (groupBy doc,term over exploded
  *     tokens) and is the only corpus-sized aggregation; document
  *     length rides along via a window-free sum over the same grouping.
  *   - `docFrequencies` aggregates postings down to vocabulary size.
  *   - scoring a query filters postings to the query's terms FIRST
  *     (predicate pushes into the postings scan), so the join against
  *     per-term stats touches |query terms| keys — broadcastable by
  *     construction — and the per-doc sum shuffles only matching docs.
  *   - corpus scalars (N, average doc length) attach via a broadcast
  *     hash join of a 1-row aggregate on a constant key, never a driver
  *     collect — and never a nested-loop join, so the library-wide
  *     "no cartesian/BNLJ in any plan" guard holds with zero
  *     exceptions.
  *
  * Determinism: every score is built from integer tf/df/dl with
  * IEEE-correctly-rounded +,-,*,/ only, folded in sorted term order —
  * so results are bit-reproducible across engines when the same
  * expression shape is replayed (the q40 oracle does exactly that with
  * the rational idf; the log idf variants differ only in calling
  * `ln`, whose last-ulp behavior is library-specific).
  */
object Relevance {

  /** Whitespace tokens with empties dropped: `split("", " ")` yields
    * `[""]`, so without the filter an empty or space-padded document
    * would emit a posting for the empty-string term and count it toward
    * document length.
    */
  private def cleanTokens(text: Column): Column =
    filter(TextStats.tokens(text), t => t =!= "")

  /** Corpus scalars attach via [[graft.core.Scalars.withScalars]] — a
    * constant-key broadcast hash join, never a nested-loop operator.
    */
  private def withScalars(rows: DataFrame, scalars: DataFrame): DataFrame =
    graft.core.Scalars.withScalars(rows, scalars)

  /** One row per (doc, term): `tf` occurrences, `dl` document length in
    * tokens. Whitespace tokenization to match the rest of the text
    * stack; empty docs contribute no postings (and no `dl` mass — see
    * [[cleanTokens]]).
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(cleanTokens(col(textCol))).as("term"),
      size(cleanTokens(col(textCol))).as("dl"))
      .groupBy(col(idCol), col("term"))
      // dl is constant within the group; max() is the deterministic pick
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** (term, df): number of documents containing each term. Postings
    * carry one row per (doc, term), so a plain count per term is the
    * document frequency — and filtering postings by term beforehand
    * (as `bm25` does) never changes a surviving term's count.
    */
  def docFrequencies(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Classic smoothed log idf: `ln((N + 1) / (df + 1)) + 1`. */
  def logIdf(n: Column, df: Column): Column =
    log((n.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** BM25's idf: `ln(1 + (N - df + 0.5) / (df + 0.5))`. */
  def bm25Idf(n: Column, df: Column): Column =
    log(lit(1.0) + ((n - df).cast("double") + 0.5) / (df.cast("double") + 0.5))

  /** Log-free rational idf `(N - df + 0.5) / (df + 0.5)`: same ordering
    * as `bm25Idf` (x ↦ ln(1+x) is monotone), but built from
    * correctly-rounded arithmetic only — bit-reproducible across
    * engines, hence what the oracle replays.
    */
  def rationalIdf(n: Column, df: Column): Column =
    ((n - df).cast("double") + 0.5) / (df.cast("double") + 0.5)

  /** (id, term, tf, df, tf_idf) for every posting. `idf` defaults to
    * the smoothed log form; pass [[rationalIdf]] for cross-engine
    * bit-exactness.
    */
  def withTfIdf(
      df: DataFrame, idCol: String, textCol: String,
      idf: (Column, Column) => Column = logIdf,
      materialize: Boolean = false): DataFrame = {
    // the postings table (tokenize + explode over the corpus) feeds the
    // document-frequency aggregate AND the score join; materialize =
    // true persists it so tokenization runs once — but ALSO eagerly
    // checkpoints the (corpus-sized, one row per posting) RESULT,
    // pinning a full copy in executor storage with non-replayable
    // lineage. Unlike bm25/Dsir/Decontaminate, whose materialized
    // results are small, here that trade is a space wash and a
    // fault-tolerance downgrade — so the default stays LAZY (double
    // tokenize) and compute-once is opt-in for bounded corpora.
    val post0 = postings(df, idCol, textCol)
    val post =
      if (materialize) post0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else post0
    try {
      val freqs = docFrequencies(post)
      val n = df.agg(count(lit(1)).as("__n"))
      val result = withScalars(post.join(freqs, Seq("term")), n)
        .withColumn("tf_idf", col("tf").cast("double") *
          idf(col("__n"), col("df")))
        .select(col(idCol), col("term"), col("tf"), col("df"), col("tf_idf"))
      if (materialize) result.localCheckpoint(true) else result
    } finally if (materialize) post.unpersist()
  }

  /** BM25 scores of all documents matching `query` (docs sharing no
    * term score nothing and are absent). Output: (id, score), higher is
    * more relevant. Per-term contributions fold in sorted term order so
    * the floating-point sum is deterministic.
    *
    * `idf` defaults to the standard BM25 log form; the rational variant
    * preserves ranking while staying engine-portable.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idf: (Column, Column) => Column = bm25Idf,
      materialize: Boolean = true): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val terms = query.distinct
    // the query-filtered postings are SMALL but their derivation scans
    // and tokenizes the whole corpus; persisted so that happens once
    // (they feed the df aggregate and the score join). materialize =
    // false keeps the plan lazy (fault-tolerant, inspectable) at the
    // price of the double derivation.
    val post0 = postings(docs, idCol, textCol)
      .filter(col("term").isInCollection(terms))
    val post =
      if (materialize) post0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else post0
    try {
      val freqs = docFrequencies(post)
      val stats = docs.agg(count(lit(1)).as("__n"),
        sum(size(cleanTokens(col(textCol)))).as("__total_dl"))
      val termScore =
        idf(col("__n"), col("df")) *
          (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * col("dl") / (col("__total_dl").cast("double") / col("__n"))))
      val result = withScalars(post.join(freqs, Seq("term")), stats)
        .withColumn("__s", termScore)
        .groupBy(col(idCol))
        .agg(aggregate(
          sort_array(collect_list(struct(col("term"), col("__s")))),
          lit(0.0), (acc, x) => acc + x.getField("__s")).as("score"))
      // small: matching docs only; checkpointing frees the cache
      if (materialize) result.localCheckpoint(true) else result
    } finally if (materialize) post.unpersist()
  }
}
