package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings with k-means, then
  * find near-duplicate pairs ONLY within each cluster (cosine ≥ τ) and
  * keep one representative per duplicate group.
  *
  * Clustering bounds the otherwise-quadratic pair search: the paper
  * runs k ≈ √N clusters so each cluster's all-pairs stage touches
  * ~N/k ≈ √N vectors. At 100 TB the caller sizes `k` accordingly —
  * pair generation is a single hash equi-join on the cluster id, so
  * the shuffle moves each vector once and the quadratic work is
  * per-cluster and embarrassingly parallel across clusters.
  *
  * Determinism: the k-means is [[KMeans]]' quantized-integer Lloyd
  * (bit-identical under any partitioning), the cosine is
  * [[graft.functions.CosineFold]]'s sequential IEEE fold, and the
  * keep rule is "smallest id in the connected duplicate group" via
  * [[graft.dedup.Components]] — every stage replays exactly in SQL.
  *
  * Scale shape:
  *   - fit: `iters` bounded map-only assignment passes + one k×dim agg
  *     per pass (see [[KMeans.fit]]);
  *   - assignment for pairing: map-only (centroids travel as a k×dim
  *     literal), persisted once and reused by both join sides and the
  *     final keep join — three plan branches, one computation;
  *   - pair generation: one shuffle of (id, vec, cluster) on cluster;
  *     within-bucket all-pairs is the SemDeDup contract, bounded by
  *     cluster size (size `k` to the corpus);
  *   - keep resolution: [[graft.dedup.Components]]' per-round bounded
  *     label propagation (duplicate groups are tiny in practice —
  *     diameter-bounded by `maxIter`).
  */
object SemDeDup {

  /** (id, cluster, group, keep): cluster assignment after `iters`
    * deterministic Lloyd rounds, the canonical duplicate-group id
    * (smallest member id; a singleton's own id when nothing within its
    * cluster reaches `tau`), and the survivor flag (`id == group`).
    * Downstream keeps `filter(col("keep"))`.
    */
  def semDeDup(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tau: Double,
      quantBits: Int = 20,
      maxClusterSize: Option[Long] = None): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be in [-1, 1], got $tau")
    val cents = KMeans.fit(df, idCol, vecCol, k, iters, quantBits).toIndexedSeq

    // Map-only (id, vec, cluster) — no join back: the cluster id is a
    // projection over the scan. Persisted because three plan branches
    // (both pair-join sides and the final keep join) reuse it.
    val assigned = df
      .select(col(idCol), col(vecCol).as("__vec"),
        KMeans.argmin(KMeans.distances(col(vecCol), cents)).as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // optional fail-fast bound on the per-cluster quadratic stage: a
      // silent cap would change dedup semantics, so an undersized k
      // (e.g. k fixed while the corpus grew 100x) fails loudly instead
      // of planning an unbounded within-cluster pair join. The size
      // probe is one k-row aggregate over the persisted assignment.
      maxClusterSize.foreach { cap =>
        require(cap >= 1, s"maxClusterSize must be >= 1, got $cap")
        val big = assigned.groupBy(col("cluster")).count()
          .filter(col("count") > cap).collect() // bounded: <= k rows
        require(big.isEmpty,
          s"semDeDup: cluster(s) exceed maxClusterSize=$cap: " +
            big.map(r => s"cluster ${r.getInt(0)} has ${r.getLong(1)} rows")
              .mkString(", ") +
            " — increase k (SemDeDup sizes k to the corpus, ~sqrt(N)) or the cap")
      }
      val a = assigned.select(col(idCol).as("id_a"), col("__vec").as("__va"),
        col("cluster").as("__ca"))
      val b = assigned.select(col(idCol).as("id_b"), col("__vec").as("__vb"),
        col("cluster").as("__cb"))
      // Hash equi-join on the cluster id; id_a < id_b halves the pair
      // space and fixes the orientation the component step expects.
      val pairs = a.join(b, col("__ca") === col("__cb") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.CosineFold.cosineFold(col("__va"), col("__vb"))
            .as("cosine"))
        .filter(col("cosine") >= tau)

      val comp = graft.dedup.Components.connectedComponents(pairs, "id_a", "id_b")
      val out = assigned.join(comp, assigned(idCol) === comp("id"), "left")
        .select(assigned(idCol), col("cluster"),
          coalesce(col("component"), assigned(idCol)).as("group"))
        .withColumn("keep", col(idCol) === col("group"))
      // Materialize before unpersist: the caller's action must not
      // silently recompute the three branches against a cold cache.
      out.localCheckpoint(true)
    } finally assigned.unpersist()
  }
}
