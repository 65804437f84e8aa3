package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval ranking metrics — MRR and NDCG@k in exact integer
  * fixed-point. Completes the RAG evaluation loop this engine's
  * retrieval side opened ([[graft.text.Relevance]] BM25,
  * [[graft.sim.Similarity]] ANN, [[Fusion]] RRF): given the ranked
  * candidates and a gold relevance table, "how good is the ranker"
  * as the two numbers retrieval papers report.
  *
  * Exactness: reciprocal rank is `⌊2²⁰/rank⌋`; NDCG's position
  * discounts `1/log2(i+1)` depend only on positions `1..k`, so they
  * are PRECOMPUTED driver-side with the repo's integer log
  * ([[graft.text.Dsir.ilog2Q20]] — the same 20-round square-and-shift
  * the q79/q114 oracles replay) and inlined as literal arrays:
  * `inv_i = ⌊2⁴⁰ / ilog2Q20((i+1)·2²⁰)⌋`, Q20 units. DCG sums the
  * discounts of relevant hits; IDCG looks up the prefix-sum of the
  * first `min(k, |relevant|)` discounts. Everything is an exact
  * integer except the single `dcg/idcg` divide (NULL when the query
  * has no relevant documents — undefined, not 0). SQL-replayable with
  * the same constants inlined as VALUES (q136).
  *
  * Scale shape: one rank-bounded filter, one broadcast-friendly
  * equi-join against the gold table, one map-side-combinable
  * per-query aggregate, and a |queries|-sized join for the relevant
  * counts. Position constants are literals — no log evaluates at row
  * scope.
  */
object RetrievalMetrics {

  /** Q20 inverse discount `⌊2⁴⁰ / ilog2Q20((i+1)·2²⁰)⌋` for 1-based
    * position `i`.
    */
  def invDiscountQ20(i: Int): Long = {
    require(i >= 1, s"positions are 1-based, got $i")
    (1L << 40) / graft.text.Dsir.ilog2Q20((i + 1).toLong << 20)
  }

  /** `(query, n_rel, first_rel_rank, mrr_q, dcg_q, idcg_q, ndcg)` per
    * query of `ranked` — `ranked` as `(queryCol, itemCol, rankCol)`
    * with 1-based ranks, `relevant` as `(queryCol, itemCol)` gold
    * pairs (duplicates collapse). Queries present in `ranked` but
    * with no gold row emit `n_rel = 0` and NULL metrics; `mrr_q = 0`
    * when no relevant item is ranked within k.
    */
  def mrrNdcg(
      ranked: DataFrame, relevant: DataFrame,
      queryCol: String, itemCol: String, rankCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val inv = (1 to k).map(invDiscountQ20)
    val invExpr = array(inv.map(lit): _*) // 1-based: element_at(i)
    val prefix = inv.scanLeft(0L)(_ + _).drop(1)
    val prefixExpr = array(prefix.map(lit): _*)

    val gold = relevant
      .select(col(queryCol).as("query"), col(itemCol).as("item"))
      .distinct()
    val nRel = gold.groupBy(col("query"))
      .agg(count(lit(1)).as("n_rel"))
    val r = when(col(rankCol).isNull || col(rankCol) < 1,
      raise_error(lit(s"mrrNdcg: NULL or non-positive $rankCol — " +
        "ranks are 1-based")))
      .otherwise(col(rankCol).cast("long"))
    val hits = ranked
      .select(col(queryCol).as("query"), col(itemCol).as("item"),
        r.as("rank"))
      .filter(col("rank") <= k)
      .join(gold.withColumn("rel", lit(true)), Seq("query", "item"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(false)))
    val perQuery = hits
      .groupBy(col("query"))
      .agg(
        min(when(col("rel"), col("rank"))).as("first_rel_rank"),
        sum(when(col("rel"),
          element_at(invExpr, col("rank").cast("int")))
          .otherwise(0L)).as("dcg_q"))
    perQuery
      .join(nRel, Seq("query"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("mrr_q",
        coalesce(expr(s"${1L << 20}L div first_rel_rank"), lit(0L)))
      .withColumn("idcg_q",
        when(col("n_rel") > 0,
          element_at(prefixExpr, least(col("n_rel"), lit(k.toLong))
            .cast("int"))))
      .withColumn("ndcg",
        when(col("idcg_q") > 0,
          col("dcg_q").cast("double") / col("idcg_q").cast("double")))
      .select(col("query"), col("n_rel"), col("first_rel_rank"),
        col("mrr_q"), col("dcg_q"), col("idcg_q"), col("ndcg"))
  }
}
