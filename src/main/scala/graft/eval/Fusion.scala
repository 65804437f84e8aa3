package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack et al. 2009) — the standard
  * way a retrieval stack combines RANKED LISTS from incommensurable
  * scorers (BM25 scores live in [0, ~30], cosine in [−1, 1]; their raw
  * scores cannot be averaged, their RANKS can):
  * `rrf(q, d) = Σ_lists 1/(k₀ + rank_list(q, d))`, with `k₀ = 60` the
  * near-universal constant. This is the hybrid-search step of a RAG
  * data pipeline — lexical ([[graft.text.Relevance]] BM25) and
  * semantic ([[graft.sim.Similarity]] ANN top-k) candidates fused into
  * one list — and equally the multi-signal variant of corpus curation
  * ("rank by quality, by freshness, by authority — keep the fused
  * top-k").
  *
  * Exactness: contributions are integer fixed-point
  * `⌊2²⁰/(k₀ + rank)⌋` (the house Q20 convention, [[graft.text.Dsir]]
  * / [[graft.text.Drift]]), so fused scores are exact integer sums —
  * order-independent, mergeable, SQL-replayable (q121) — and ties in
  * the fused score are REAL ties, visible to the caller's
  * deterministic tie-break, not float-rounding accidents. With k₀ = 60
  * two Q20 contributions differ only past rank ≈ 4000; push `shift`
  * up for deeper lists (Q30 distinguishes to rank ~10⁵ at long-safe
  * magnitudes: 2³⁰ · lists · |corpus| stays far under 2⁶³).
  *
  * Scale shape: one `unionByName` over the candidate lists + ONE
  * map-side-combinable `groupBy(query, item).sum` — no joins, no
  * windows; the shuffle carries (query, item, partial-sum) rows
  * bounded by the candidate lists themselves, which upstream top-k
  * retrieval ([[graft.operators.GroupLimit]]'s map-side-capped
  * `WindowGroupLimit` shape) has already bounded to k per query per
  * list.
  */
object Fusion {

  /** Fuse ranked candidate lists into `(query, item, rrf_q, n_lists)`,
    * `rrf_q` in `2^shift` units, `n_lists` = how many lists proposed
    * the item (a useful agreement signal on its own). Each input needs
    * columns `(queryCol, itemCol, rankCol)` with 1-based ranks; rank
    * < 1 or NULL raises — a 0/NULL rank would silently dominate the
    * fusion.
    */
  def rrfFuse(
      lists: Seq[DataFrame], queryCol: String, itemCol: String,
      rankCol: String, k0: Int = 60, shift: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    require(shift >= 1 && shift <= 40, s"shift must be in [1, 40], got $shift")
    val unit = 1L << shift
    // `div` (integral), not `/` (IEEE): exact integer contributions
    // are the point — ties stay real ties
    val prepared = lists.map { df =>
      val r = when(col(rankCol).isNull || col(rankCol) < 1,
        raise_error(lit(s"rrfFuse: NULL or non-positive $rankCol — " +
          "ranks are 1-based; a bad rank would silently dominate")))
        .otherwise(col(rankCol).cast("long"))
      df.select(col(queryCol).as("query"), col(itemCol).as("item"),
        r.as("__r"))
        .withColumn("contrib", expr(s"${unit}L div (${k0}L + __r)"))
        .drop("__r")
    }
    prepared.reduce(_ unionByName _)
      .groupBy(col("query"), col("item"))
      .agg(sum(col("contrib")).as("rrf_q"),
        count(lit(1)).as("n_lists"))
  }
}
