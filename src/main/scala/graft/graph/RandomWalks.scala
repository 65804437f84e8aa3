package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random walks — the corpus-generation step for graph
  * embeddings (DeepWalk, Perozzi et al. 2014; node2vec's p=q=1 case):
  * emit `walksPerNode` truncated walks of length `walkLen` from every
  * node, which a skip-gram trainer then consumes exactly like token
  * windows. The graph family's missing GENERATOR next to its analyzers
  * ([[PageRank]] ranks, [[Triangles]] counts,
  * [[graft.dedup.Components]] clusters).
  *
  * Determinism: the step from node `u` at step `t` of walk `w` started
  * at `s` picks neighbor index
  * `squaredHash("s#w#t"[:salt]) mod outdeg(u)` over the neighbors of
  * `u` ORDERED BY destination id — a pure function of (start, walk,
  * step, salt), so reruns, repartitions and other engines reproduce
  * the identical corpus (no RNG stream, the [[graft.operators.Splits]]
  * discipline; q208 replays whole walks in DuckDB by folding the same
  * Karp-Rabin hash). Distinct salts give independent walk sets.
  * Dangling nodes truncate the walk — steps simply stop, the standard
  * DeepWalk treatment.
  *
  * Scale shape: the frontier is (#nodes · walksPerNode) rows; each of
  * the `walkLen` steps is TWO hash equi-joins — frontier ⋈ the
  * node-sized out-degree table (compute the hash pick; dangling nodes
  * drop here, truncating the walk), then frontier ⋈ the
  * rank-annotated adjacency on `(src, nbr_rank)` — so the join output
  * is one row per surviving walk, NEVER a neighbor fan-out (a hub
  * with 10⁶ neighbors contributes 10⁶ adjacency rows to the build
  * side, not 10⁶ probe rows per walk). Neighbor ranks come from a
  * per-src window (partition bounded by the node's out-degree); the
  * adjacency is built once and checkpointed. No driver collects
  * anywhere.
  */
object RandomWalks {

  /** One row per visited step: `(start, walk, step, node)` with
    * `step = 0` at the start node and walks truncating at dangling
    * nodes. NULL endpoints raise.
    */
  def walks(
      edgesDf: DataFrame, srcCol: String, dstCol: String,
      walksPerNode: Int, walkLen: Int, salt: String = ""): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 1024,
      s"walksPerNode must be in [1, 1024], got $walksPerNode")
    require(walkLen >= 1 && walkLen <= 100,
      s"walkLen must be in [1, 100], got $walkLen")

    // cast first, then raise on the cast's null — a non-numeric id
    // would otherwise cast to NULL silently past a null-only guard
    def endpoint(c: String) =
      when(col(c).cast("long").isNull, raise_error(lit(
        s"RandomWalks.walks: NULL or non-integer $c — node ids must " +
          "be integers")))
        .otherwise(col(c).cast("long"))
    val edges = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
      .distinct()
    val bySrc = Window.partitionBy(col("src"))
    val ranked = edges
      .withColumn("nbr_rank",
        row_number().over(bySrc.orderBy(col("dst"))).cast("long") - 1L)
      .localCheckpoint(false) // read once per step below (lazy: materializes with the first step, no extra job barrier)
    val degrees = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "__dn")
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()

    val start = nodes
      .select(col("node").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walk"),
        col("node"))
      .localCheckpoint(true)
    var frontier = start
    val frames = scala.collection.mutable.ArrayBuffer(
      start.withColumn("step", lit(0L)))
    var t = 1
    while (t <= walkLen) {
      val stepKey = concat(col("start").cast("string"), lit("#"),
        col("walk").cast("string"), lit("#" + t))
      val picked = frontier
        .join(degrees, frontier("node") === degrees("__dn"))
        .select(col("start"), col("walk"), col("node"),
          pmod(graft.operators.Splits.squaredHash(stepKey, salt),
            col("deg")).as("__pick"))
      frontier = picked
        .join(ranked, picked("node") === ranked("src") &&
          picked("__pick") === ranked("nbr_rank"))
        .select(col("start"), col("walk"), col("dst").as("node"))
        .localCheckpoint(false) // constant-depth lineage across steps (lazy)
      frames += frontier.withColumn("step", lit(t.toLong))
      t += 1
    }
    frames.reduce(_ unionByName _)
      .select(col("start"), col("walk"), col("step"), col("node"))
  }

  /** node2vec-style SECOND-ORDER biased walks (Grover & Leskovec
    * 2016): the step from `cur` weighs each neighbor `x` by its
    * relation to the PREVIOUS node — `wReturn` when `x = prev` (the
    * 1/p return bias), `wIn` when `x` is also a neighbor of `prev`
    * (distance 1 — BFS-ish, community structure), `wOut` otherwise
    * (distance 2 — DFS-ish, structural roles). Integer weights stand
    * in for the paper's 1/p, 1, 1/q rationals (only ratios matter).
    *
    * Determinism: the pick at step `t` of walk `w` from `s` is the
    * neighbor whose cumulative-weight interval (neighbors in dst
    * order) contains `squaredHash("s#w#t"[:salt]) mod totalWeight` —
    * the [[walks]] rule lifted from uniform to weighted, still a pure
    * function of the walk coordinates (q222 unrolls the steps in
    * SQL). Step 1 has no `prev` and is the uniform first-order step.
    *
    * Scale shape: second-order walks are INHERENTLY degree-bound —
    * the step must classify every neighbor of `cur` against `prev`'s
    * adjacency. Per step: one frontier ⋈ adjacency fan-out
    * (Σ deg(cur) rows — what any node2vec implementation,
    * alias-table samplers included, must touch or precompute), one
    * LEFT join against the edge set for the distance-1 class, and a
    * per-walk window bounded by deg(cur). For degree-bounded graphs
    * this is |frontier|·avgDeg per step; for hub-heavy graphs set
    * `maxDegree` (below) or prefer [[walks]] (first-order).
    *
    * `maxDegree` caps the fan-out IN CODE, not prose: each node's
    * adjacency is truncated to its `maxDegree` LOWEST-id neighbors
    * (the deterministic cap discipline of the LSH bucket caps —
    * replayable, no sampling stream) and the walk then runs on that
    * capped graph: picks, candidate fan-outs AND the distance-1
    * classification all read the same truncated adjacency, so the
    * result is exactly node2vec on the capped graph (q226 replays
    * the cap in SQL). On a graph whose max out-degree is below the
    * cap the result is bit-identical to the uncapped walk (pinned in
    * RandomWalksSpec). The bias: a hub's high-id neighbors are never
    * visited THROUGH that hub — the price of bounding a 10⁷-degree
    * host's Σdeg(cur) term to maxDegree rows per visiting walk.
    * Note the cap is per-direction: an undirected graph fed as a
    * symmetric edge list may keep u→v and drop v→u.
    */
  /** Fail-loud hub ceiling for UNCAPPED second-order walks: with no
    * `maxDegree` set, a single 10⁷-degree hub silently turns every
    * step's Σ deg(cur) fan-out into a full-corpus join — the one
    * scale killer in this operator's plan. Rather than run it,
    * [[node2vecWalks]] measures the max out-degree (one bounded
    * aggregate over the ranked adjacency it builds anyway) and raises
    * past this limit unless the caller either sets `maxDegree`
    * (deterministic truncation, the production path) or passes
    * `allowUncapped = true` (the explicit eyes-open opt-out for
    * exact-walk comparisons like the q222 witness).
    */
  val DefaultHubDegreeLimit = 10000L

  def node2vecWalks(
      edgesDf: DataFrame, srcCol: String, dstCol: String,
      walksPerNode: Int, walkLen: Int,
      wReturn: Long, wIn: Long, wOut: Long,
      salt: String = "", maxDegree: Int = Int.MaxValue,
      allowUncapped: Boolean = false): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 1024,
      s"walksPerNode must be in [1, 1024], got $walksPerNode")
    require(walkLen >= 1 && walkLen <= 100,
      s"walkLen must be in [1, 100], got $walkLen")
    require(wReturn >= 0 && wIn >= 1 && wOut >= 0 &&
      wReturn + wIn + wOut >= 1,
      s"need wIn >= 1 and non-negative weights, got " +
        s"($wReturn, $wIn, $wOut)")
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")

    def endpoint(c: String) =
      when(col(c).cast("long").isNull, raise_error(lit(
        s"node2vecWalks: NULL or non-integer $c — node ids must " +
          "be integers")))
        .otherwise(col(c).cast("long"))
    val edgesAll = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val bySrc = Window.partitionBy(col("src"))
    // the degree cap rides the rank the picks need anyway: one window
    // pass ranks each node's neighbors by dst, the cap keeps the
    // lowest maxDegree of them, and EVERYTHING downstream (degrees,
    // picks, candidate fan-out, distance-1 classification) reads this
    // one capped adjacency — a cap ≥ max degree filters nothing
    val rankedAll = edgesAll
      .withColumn("nbr_rank",
        row_number().over(bySrc.orderBy(col("dst"))).cast("long") - 1L)
    val ranked =
      (if (maxDegree == Int.MaxValue) rankedAll
       else rankedAll.filter(col("nbr_rank") < maxDegree.toLong))
        .localCheckpoint(true)
    if (maxDegree == Int.MaxValue && !allowUncapped) {
      // hub guard: max out-degree = max neighbor rank + 1, read off
      // the already-checkpointed ranked adjacency (one bounded
      // aggregate, no extra shuffle shape). max() over an empty edge
      // set is NULL — an empty graph trivially passes (and walks
      // return empty as before the guard existed).
      val head = ranked.agg(max(col("nbr_rank"))).head
      val maxDeg = if (head.isNullAt(0)) 0L else head.getLong(0) + 1L
      require(maxDeg <= DefaultHubDegreeLimit,
        s"node2vecWalks: max out-degree $maxDeg exceeds the uncapped " +
          s"hub limit $DefaultHubDegreeLimit — every step fans out " +
          "Σ deg(cur) rows, so a hub this size owns the plan. Set " +
          "maxDegree (deterministic lowest-id truncation) or pass " +
          "allowUncapped = true to run it anyway")
    }
    val edges = ranked.select(col("src"), col("dst"))
    val degrees = ranked.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "__dn")
      .localCheckpoint(true)
    // walk starts cover ALL nodes of the input graph (a dst-only node
    // still emits its step-0 row; cap ≥ 1 keeps every src walkable)
    val nodes = edgesAll.select(col("src").as("node"))
      .union(edgesAll.select(col("dst").as("node")))
      .distinct()

    def stepHash(t: Int): Column =
      graft.operators.Splits.squaredHash(
        concat(col("start").cast("string"), lit("#"),
          col("walk").cast("string"), lit("#" + t)), salt)

    val start = nodes
      .select(col("node").as("start"),
        explode(sequence(lit(0L), lit(walksPerNode - 1L))).as("walk"),
        lit(null).cast("long").as("prev"),
        col("node"))
      .localCheckpoint(true)
    var frontier = start
    val frames = scala.collection.mutable.ArrayBuffer(
      start.select(col("start"), col("walk"), lit(0L).as("step"),
        col("node")))
    var t = 1
    while (t <= walkLen) {
      frontier =
        if (t == 1) {
          // first-order uniform step: the walks() rule
          val picked = frontier
            .join(degrees, frontier("node") === degrees("__dn"))
            .select(col("start"), col("walk"), col("node"),
              pmod(stepHash(t), col("deg")).as("__pick"))
          picked
            .join(ranked, picked("node") === ranked("src") &&
              picked("__pick") === ranked("nbr_rank"))
            .select(col("start"), col("walk"),
              picked("node").as("prev"), col("dst").as("node"))
            .localCheckpoint(false) // lazy: no per-step job barrier
        } else {
          // second-order step: classify cur's neighbors against prev
          val cand = frontier
            .join(ranked.select(col("src").as("__c"), col("dst").as("x")),
              frontier("node") === col("__c"))
            .select(col("start"), col("walk"), col("prev"),
              col("node"), col("x"))
          val prevAdj = edges
            .select(col("src").as("__p"), col("dst").as("__px"),
              lit(true).as("__near"))
          val weighted = cand
            .join(prevAdj, cand("prev") === col("__p") &&
              cand("x") === col("__px"), "left")
            .select(col("start"), col("walk"), col("node"), col("x"),
              when(col("x") === col("prev"), lit(wReturn))
                .when(coalesce(col("__near"), lit(false)), lit(wIn))
                .otherwise(lit(wOut)).as("__w"))
            .filter(col("__w") > 0L)
          val byWalk = Window.partitionBy(col("start"), col("walk"))
          val cumW = byWalk.orderBy(col("x"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          // __tot uses the SAME partition+order spec as __cum with a
          // whole-partition frame, so Catalyst evaluates both in ONE
          // Window operator (one sort per step instead of two); integer
          // weight sums are order-free, values identical
          val totW = byWalk.orderBy(col("x"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
          weighted
            .withColumn("__cum", sum(col("__w")).over(cumW))
            .withColumn("__tot", sum(col("__w")).over(totW))
            .withColumn("__r", pmod(stepHash(t), col("__tot")))
            .filter(col("__r") >= col("__cum") - col("__w") &&
              col("__r") < col("__cum"))
            .select(col("start"), col("walk"),
              col("node").as("prev"), col("x").as("node"))
            .localCheckpoint(false) // lazy: no per-step job barrier
        }
      frames += frontier.select(col("start"), col("walk"),
        lit(t.toLong).as("step"), col("node"))
      t += 1
    }
    frames.reduce(_ unionByName _)
      .select(col("start"), col("walk"), col("step"), col("node"))
  }
}
