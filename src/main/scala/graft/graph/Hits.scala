package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities — Kleinberg's (1999) two-score refinement
  * of link authority: an AUTHORITY is endorsed by good hubs, a HUB
  * points at good authorities. The pair matters for curation where
  * [[PageRank]]'s single score conflates them: link directories and
  * aggregator sites are high-hub/low-authority (good for DISCOVERY,
  * poor as content), reference pages are the reverse — filtering on
  * authority while crawling by hub is the classic split.
  *
  * Exactness: the textbook iteration normalizes by an L2 norm (IEEE
  * sqrt — not replayable). Here scores are integers in `scale` units
  * and each half-step renormalizes by the MAXIMUM:
  * `a'(v) = ⌊Σ_{u→v} h(u) · scale / max_w Σ⌋` (and symmetrically for
  * hubs) — every step an integer sum, one exact max, one integral
  * multiply-divide, so scores are bit-deterministic across layouts
  * and engines (q212 unrolls the rounds in SQL). Max-normalization
  * changes the scale, not the ORDER, of scores, and the principal-
  * eigenvector fixpoint is the same normalized direction.
  *
  * Overflow contract: after each half-step scores are ≤ `scale`, so
  * a vertex's incoming sum is ≤ `deg·scale` and the half-step's
  * `__sum · scale` product needs `maxDeg · scale² < 2⁶³` — the bound
  * the guard ENFORCES, with `maxDeg` the max in-/out-degree read from
  * the edge table (two bounded-scalar aggregates, BigInt-checked so
  * the guard itself cannot wrap). A graph failing it raises at build
  * with the lower `scale` to use; nothing silently wraps in non-ANSI
  * long arithmetic.
  *
  * Scale shape, per round: two half-steps, each ONE |E| equi-join +
  * map-combinable sum + a 1-row max collect (bounded driver scalar,
  * the [[graft.sim.KMeans]] contract) — the [[PageRank]] shuffle
  * profile doubled. Edge table checkpointed once; scores checkpointed
  * per half-step so lineage stays constant.
  */
object Hits {

  /** `(vertex, hub, authority)` after `iterations` full rounds.
    * Scores in `[0, scale]`, the per-phase max pinned AT `scale`.
    * NULL endpoints raise.
    */
  def scores(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000L,
      maxResidual: Option[Long] = None): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(scale >= 1L, s"need scale >= 1, got $scale")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"Hits.scores: NULL $c — drop explicitly, " +
        "a silent skip would re-route score mass")))
      .otherwise(col(c))
    val e = edges
      .select(guard(srcCol).as("src"), guard(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .localCheckpoint(true)
    val nVertices = vertices.count()
    require(nVertices > 0, "Hits.scores: edge set is empty")
    // the half-step computes __sum * scale with __sum <= maxDeg * scale,
    // so the real requirement is maxDeg * scale^2 < 2^63 (bounded
    // scalars; BigInt so this check cannot itself overflow). One
    // aggregate job, not two: max TOTAL degree (in+out per vertex)
    // upper-bounds both max in-degree and max out-degree — at most 2x
    // conservative, irrelevant against the 2^23-vertex-degree headroom
    // the default scale leaves, and it halves the guard's fixed job
    // cost (the round-12 two-job guard showed up as a ~0.8 s drift in
    // the isolated sf0.1 probe — BENCH_NOTES round 13).
    val maxDeg = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("__d"))
      .agg(max(col("__d"))).head.getLong(0)
    require(BigInt(maxDeg) * BigInt(scale) * BigInt(scale) < BigInt(Long.MaxValue),
      s"Hits.scores: maxDeg·scale² = $maxDeg · $scale² exceeds the " +
        "exact long range — lower scale for graphs this dense")

    // one half-step: out(v) = floor(sum_{edges into v} in(u) * scale / max)
    def halfStep(in: DataFrame, edgeFrom: String, edgeTo: String): DataFrame = {
      val sums = in
        .join(e, in("vertex") === e(edgeFrom))
        .select(col(edgeTo).as("vertex"), col("__s").as("__c"))
        .groupBy(col("vertex"))
        .agg(sum(col("__c")).as("__sum"))
      val mx = sums.agg(max(col("__sum"))).head.getLong(0) // 1-row scalar
      vertices
        .join(sums, Seq("vertex"), "left")
        .select(col("vertex"),
          expr(s"coalesce(__sum, 0L) * ${scale}L div ${mx}L").as("__s"))
        .localCheckpoint(false) // lazy: the next round's scalar probe materializes it
    }

    var hubs = vertices.withColumn("__s", lit(scale))
    var auth = vertices.withColumn("__s", lit(scale))
    var hubsPrev = hubs
    var authPrev = auth
    for (_ <- 1 to iterations) {
      authPrev = auth
      hubsPrev = hubs
      auth = halfStep(hubs, "src", "dst") // authority from in-link hubs
      hubs = halfStep(auth, "dst", "src") // hub from out-link authorities
    }
    // converged-or-raise (the k-core discipline): L1 drift of BOTH
    // score families over the final round, exact integers in scale
    // units — two bounded aggregates, only when the caller gates
    maxResidual.foreach { m =>
      PageRank.requireConverged("Hits.scores",
        PageRank.l1Residual(hubs, hubsPrev, "__s") +
          PageRank.l1Residual(auth, authPrev, "__s"), m)
    }
    hubs.withColumnRenamed("__s", "hub")
      .join(auth.withColumnRenamed("__s", "authority"), Seq("vertex"))
  }
}
