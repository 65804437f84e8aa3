package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004) — rank a
  * corpus's vocabulary by running PageRank over the token
  * CO-OCCURRENCE graph: tokens that appear within a small window of
  * many well-connected tokens are the corpus's load-bearing terms.
  * The unsupervised keyword/keyphrase baseline — where TF-IDF/BM25
  * ([[Relevance]]) scores tokens per DOCUMENT against the corpus,
  * TextRank scores them by their position in the corpus's own
  * co-occurrence structure, and [[Collocations]]' PMI finds PAIRS
  * while TextRank ranks NODES.
  *
  * Composition, not a new engine: the graph is one windowed-pair
  * projection (below) and the ranking is exactly
  * [[graft.graph.PageRank.ranks]] — integer fixed-point, layout-
  * independent, SQL-replayable by unrolling rounds (q213).
  *
  * Scale shape: pairs come from `posexplode` + a j ∈ [1, window]
  * offset explode + ONE (doc, position) equi-join — never a non-equi
  * self-join (the [[graft.operators.RangeJoin]] binning discipline
  * with the window as the bin). The token graph is vocabulary², not
  * corpus-sized, bounded in practice by Heaps' law; PageRank's
  * per-round cost is |E of that graph|.
  */
object TextRank {

  /** The undirected co-occurrence edge set as directed pairs both
    * ways: `(src, dst)` distinct, for tokens within `window` positions
    * in the same document, over [[TextStats.normalize]]d whitespace
    * tokens. Self-pairs (a token co-occurring with itself) are kept —
    * repetition is real graph structure and PageRank handles
    * self-loops.
    */
  def cooccurrenceEdges(
      df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 16,
      s"window must be in [1, 16], got $window")
    val positioned = df
      .select(filter(
        TextStats.tokens(TextStats.normalize(col(textCol))),
        t => t =!= "").as("__toks"))
      .select(posexplode(col("__toks")).as(Seq("__i", "__w")),
        col("__toks"))
    val pairs = positioned
      .withColumn("__j", explode(sequence(lit(1), lit(window))))
      .filter(col("__i") + col("__j") < size(col("__toks")))
      .select(col("__w").as("src"),
        element_at(col("__toks"), col("__i") + col("__j") + 1).as("dst"))
    pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** `(token, rank_q)` — integer PageRank over the co-occurrence
    * graph, `iterations` rounds at `scale` units of initial mass
    * (see [[graft.graph.PageRank.ranks]]). Order by `rank_q desc` and
    * take the head for the keyword list.
    */
  def keywords(
      df: DataFrame, textCol: String, window: Int = 2,
      iterations: Int = 3, scale: Long = 1000000000L): DataFrame =
    graft.graph.PageRank
      .ranks(cooccurrenceEdges(df, textCol, window), "src", "dst",
        iterations, scale)
      .select(col("vertex").as("token"), col("rank").as("rank_q"))
}
