package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Diversity-aware data SELECTION over embeddings — the step after
  * retrieval/clustering in a curation pipeline: not "which rows are
  * similar" (dedup's question) but "which small subset best covers the
  * space". Two classic greedy selectors, both deterministic and both
  * bounded-state per group so the shapes survive any corpus size:
  *
  *   - [[mmrDiversify]] — Maximal Marginal Relevance (Carbonell &
  *     Goldstein 1998): re-rank a per-query candidate list trading
  *     relevance against redundancy with what is already selected.
  *     The standard diversifier for retrieval-augmented training-data
  *     mining, where the top-k by cosine alone is near-duplicates of
  *     one strong match.
  *   - [[kCenterPerGroup]] — farthest-point (Gonzalez 1985) k-center
  *     representatives inside each bounded group (e.g. a cluster id
  *     from [[KMeans]] or a sign-LSH bucket): the greedy 2-approximation
  *     to the k-center cover, the usual coreset picker for "train on a
  *     representative subset of each cluster".
  *
  * Scale shape (both): one pass to form bounded candidate groups, one
  * shuffle keyed by query/group, then an in-memory greedy over ≤
  * `candidateK`/`maxGroupSize` rows per group — state is
  * O(groupSize · dim) per task, never corpus-proportional. The greedy
  * itself is quadratic in the GROUP size, which is the algorithm (MMR
  * and farthest-point are inherently pairwise over the candidate set);
  * keeping the group bounded is the caller's contract, enforced here.
  *
  * Determinism: all scores are IEEE doubles computed with the engine's
  * replayable sequential folds ([[Similarity.dot]] element order), ties
  * broken by ascending id with a STRICT `>` (first maximum wins) — so
  * an `ORDER BY score DESC, id` argmax in any engine reproduces the
  * selection exactly (q173/q174 replay both greedies in DuckDB).
  */
object Select {

  /** ANN-mined hard negatives for contrastive training — the
    * DPR/SimCSE curation recipe: a retriever trained on RANDOM
    * negatives learns nothing once it separates topics; the gradient
    * signal lives in near-misses. Per query, emit the `k`
    * most-similar corpus items that are NOT the query itself and NOT
    * a known positive: `(query_id, vec_id, score, rank)`.
    *
    * Two-stage semantics, pinned for replay (q220): fetch the
    * `fetchK` most-cosine-similar items FIRST (the bounded-heap
    * [[Similarity.bruteForceTopK]] pass — this is what an ANN index
    * serves), THEN exclude self/positives and keep the top `k` of
    * what remains. A query whose top-`fetchK` is crowded with
    * positives can yield fewer than `k` negatives — size `fetchK`
    * above `k` + the worst-case per-query positive count; the
    * truncation is part of the contract, not an error (mining from a
    * candidate list is what production retrieval does).
    *
    * Plan shape: [[Similarity.bruteForceTopK]]'s one corpus scan into
    * bounded two-stage heaps (Q·fetchK rows out), one anti-join
    * against the positives table, one map-side-capped
    * [[graft.operators.GroupLimit]] top-k. Nothing corpus-sized
    * shuffles.
    */
  def hardNegatives(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Array[Float])],
      positives: DataFrame, queryIdCol: String, posIdCol: String,
      k: Int, fetchK: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fetchK >= k,
      s"fetchK must be >= k (got fetchK=$fetchK, k=$k) — and should " +
        "exceed k + the worst-case per-query positive count")
    val cands = Similarity
      .bruteForceTopK(corpus, idCol, vecCol, queries, fetchK)
      .filter(col("query_id") =!= col("vec_id"))
    val pos = positives
      .select(col(queryIdCol).cast("long").as("__q"),
        col(posIdCol).cast("long").as("__p"))
      .distinct()
    val negs = cands.join(pos,
      cands("query_id") === col("__q") && cands("vec_id") === col("__p"),
      "left_anti")
    graft.operators.GroupLimit.topKPerGroup(
      negs, Seq("query_id"), Seq(col("score").desc, col("vec_id")), k,
      rankCol = "rank")
  }

  private[sim] final case class Cand(
      gid: Long, id: Long, rel: Double, vec: Seq[Float])
  private[sim] final case class Pick(
      gid: Long, sel_rank: Int, id: Long, rel: Double, score: Double)

  /** MMR re-ranking: for each (queryId, queryVec), fetch the
    * `candidateK` most-cosine-similar corpus rows (via
    * [[Similarity.bruteForceTopK]] — bounded two-stage heaps), then
    * greedily emit `selectK` of them maximizing
    * `lambda·rel(c) − (1−lambda)·max_{s∈selected} cos(c, s)`
    * (first pick has no selected set: score = `lambda·rel`).
    *
    * Output: `(query_id, sel_rank, vec_id, rel, mmr)` — `sel_rank`
    * 1-based selection order, `rel` the plain cosine relevance, `mmr`
    * the marginal score at selection time.
    *
    * Plan shape: candidate ids are a Q×candidateK set — broadcast back
    * onto the corpus scan to attach vectors (no corpus shuffle), then
    * one exchange on query_id into the per-group greedy.
    */
  def mmrDiversify(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Float])],
      candidateK: Int,
      selectK: Int,
      lambda: Double): DataFrame = {
    require(candidateK >= 1, s"candidateK must be >= 1, got $candidateK")
    mmrFromCandidates(
      corpus, idCol, vecCol,
      Similarity.bruteForceTopK(corpus, idCol, vecCol, queries, candidateK),
      selectK, lambda)
  }

  /** [[mmrDiversify]] over a CALLER-SUPPLIED candidate table
    * `(query_id, vec_id, score)` — the seam for serving-path candidate
    * generators: [[Similarity.ivfTopK]] from the partition-pruned
    * on-disk index (q178 — the 100 TB shape: ~nProbe/nCells of the
    * corpus scanned, then the bounded greedy), a quantized rerank, or
    * any retriever. The candidate set must be bounded per query (it is
    * by construction for every top-k generator); groups larger than
    * memory are the caller's bug, same contract as
    * [[kCenterPerGroup]]'s `maxGroupSize`.
    */
  def mmrFromCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      candidates: DataFrame,
      selectK: Int,
      lambda: Double): DataFrame = {
    require(selectK >= 1, s"selectK must be >= 1, got $selectK")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._

    val cand = candidates
    val withVec = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .join(broadcast(cand.select(
        col("query_id").as("gid"), col("vec_id").as("id"),
        col("score").as("rel"))), "id")
      .select(col("gid"), col("id"), col("rel"), col("vec"))
      .as[Cand]

    val oneMinus = 1.0 - lambda
    withVec
      .groupByKey(_.gid)
      .flatMapGroups { (gid, it) =>
        val cands = it.toArray.sortBy(_.id)
        greedy(cands, selectK) { (c, selected) =>
          if (selected.isEmpty) lambda * c.rel
          else {
            var maxSim = java.lang.Double.NEGATIVE_INFINITY
            selected.foreach { s =>
              val sim = Similarity.cosine(c.vec, s.vec)
              if (sim > maxSim) maxSim = sim
            }
            lambda * c.rel - oneMinus * maxSim
          }
        }
      }(Encoders.product[Pick])
      .toDF("query_id", "sel_rank", "vec_id", "rel", "mmr")
  }

  /** Greedy k-center (farthest-point) representatives per group: the
    * seed is the group's smallest id (`radius` 0.0 by convention);
    * each further pick maximizes the minimum squared-L2 distance to
    * the already-selected set (`radius` = that distance at pick time —
    * the classic monotone non-increasing coverage radius sequence).
    *
    * Output: `(grp, sel_rank, id, radius)`.
    *
    * `maxGroupSize` is the bounded-group contract: a group larger than
    * it fails fast rather than silently running an O(n²) greedy over
    * an unbounded cluster — at scale, feed this groups from a capped
    * sampler (e.g. [[graft.operators.Splits.stableSample]] per
    * cluster) or a clustering with bounded cells.
    */
  def kCenterPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      maxGroupSize: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxGroupSize >= k, s"maxGroupSize must be >= k, got $maxGroupSize")
    val spark = df.sparkSession
    import spark.implicits._

    df.select(
        col(groupCol).cast("long").as("gid"),
        col(idCol).cast("long").as("id"),
        lit(0.0).as("rel"),
        col(vecCol).as("vec"))
      .as[Cand]
      .groupByKey(_.gid)
      .flatMapGroups { (gid, it) =>
        val cands = it.toArray.sortBy(_.id)
        require(cands.length <= maxGroupSize,
          s"group $gid has ${cands.length} rows, above maxGroupSize " +
        s"$maxGroupSize — bound groups upstream (capped sample or cell split)")
        greedy(cands, k) { (c, selected) =>
          if (selected.isEmpty) {
            // seed: smallest id first — score by -id so the strict-max
            // scan picks it (radius reported as 0.0)
            -c.id.toDouble
          } else {
            var minD = java.lang.Double.POSITIVE_INFINITY
            selected.foreach { s =>
              val d = sqDist(c.vec, s.vec)
              if (d < minD) minD = d
            }
            minD
          }
        }.map(p => p.copy(score = if (p.sel_rank == 1) 0.0 else p.score))
      }(Encoders.product[Pick])
      .toDF("grp", "sel_rank", "id", "rel", "radius")
      .drop("rel")
  }

  /** Squared L2 with the same element order / double arithmetic as the
    * DuckDB replay (`(a[i]-b[i])²` summed left-to-right from 0.0).
    */
  private[sim] def sqDist(
      a: collection.Seq[Float], b: collection.Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Shared strict-first-maximum greedy: `score(candidate, selected)`
    * is evaluated for every unselected candidate (in ascending-id
    * order) each round; the first strict maximum is selected. Exactly
    * the `ORDER BY score DESC, id LIMIT 1` argmax, unrolled.
    */
  private def greedy(
      cands: Array[Cand], k: Int)(
      score: (Cand, collection.Seq[Cand]) => Double): Iterator[Pick] = {
    val n = cands.length
    val taken = new Array[Boolean](n)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
    val out = scala.collection.mutable.ArrayBuffer.empty[Pick]
    val rounds = math.min(k, n)
    var r = 0
    while (r < rounds) {
      var bestIdx = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = score(cands(i), selected)
          if (bestIdx < 0 || s > bestScore) { bestIdx = i; bestScore = s }
        }
        i += 1
      }
      taken(bestIdx) = true
      val c = cands(bestIdx)
      selected += c
      out += Pick(c.gid, r + 1, c.id, c.rel, bestScore)
      r += 1
    }
    out.iterator
  }
}
