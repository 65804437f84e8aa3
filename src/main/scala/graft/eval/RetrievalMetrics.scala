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

  /** Rank-biased overlap (Webber et al. 2010) between two rankings of
    * the same queries, truncated at `depth`, with persistence p = 1/2
    * in Q20 fixed point: `rbo_q20 = Σ_{d=1..depth} ⌊overlap_d·2²⁰ /
    * (d·2^d)⌋` where `overlap_d = |top-d(A) ∩ top-d(B)|` (each term is
    * `(1−p)p^{d−1}·A_d` with A_d the agreement at depth d; p = 1/2
    * makes the geometric weights exact powers of two, so the whole
    * score is integer arithmetic — replayable anywhere).
    *
    * THE metric for "how much did ranking quality change": comparing
    * an ANN/quantized ranking against the exact one, or yesterday's
    * ranker against today's, top-weighted the way users read results.
    *
    * Inputs are `(queryCol, itemCol, rankCol)` with 1-based ranks;
    * rows ranked beyond `depth` are ignored. Output `(query, n_common,
    * rbo_q20)` for every query in either ranking — disjoint rankings
    * score 0, identical depth-`depth` rankings score
    * `Σ 2²⁰ div 2^d` (= 1 − 2^−depth in Q20).
    *
    * Scale shape: one equi-join on (query, item), one count per
    * (query, join-depth), a `depth`-row broadcast expansion
    * ([[graft.core.Scalars.withEach]] — no nested loops), two
    * map-side-combinable aggregates. Per-query work is O(depth²) on
    * count tables, never on corpus rows.
    */
  def rboQ20(
      a: DataFrame, b: DataFrame, queryCol: String, itemCol: String,
      rankCol: String, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 40,
      s"depth must be in [1, 40] (2^depth rides a long), got $depth")
    val aa = a.select(col(queryCol).as("query"), col(itemCol).as("__i"),
      col(rankCol).cast("long").as("__ra"))
      .filter(col("__ra") >= 1L && col("__ra") <= depth)
    val bb = b.select(col(queryCol).as("query"), col(itemCol).as("__i"),
      col(rankCol).cast("long").as("__rb"))
      .filter(col("__rb") >= 1L && col("__rb") <= depth)
    // an item is in both prefixes from depth max(ra, rb) onward
    val joined = aa.join(bb, Seq("query", "__i"))
      .select(col("query"), greatest(col("__ra"), col("__rb")).as("__m"))
    val perDepthCounts = joined
      .groupBy(col("query"), col("__m")).agg(count(lit(1)).as("__c"))
    val depths = a.sparkSession.range(1, depth + 1).toDF("__d")
    val scores = graft.core.Scalars.withEach(perDepthCounts, depths)
      .filter(col("__m") <= col("__d"))
      .groupBy(col("query"), col("__d"))
      .agg(sum(col("__c")).as("__ov"))
      .groupBy(col("query"))
      .agg(sum(expr(
        s"(__ov * ${1L << 20}L) div (__d * shiftleft(CAST(1 AS BIGINT), " +
          "CAST(__d AS INT)))")).as("rbo_q20"),
        max(when(col("__d") === depth.toLong, col("__ov")))
          .as("__nc_at_depth"))
    val allQueries = aa.select(col("query"))
      .unionAll(bb.select(col("query"))).distinct()
    allQueries.join(scores, Seq("query"), "left")
      .select(col("query"),
        coalesce(col("__nc_at_depth"), lit(0L)).as("n_common"),
        coalesce(col("rbo_q20"), lit(0L)).as("rbo_q20"))
  }
}
