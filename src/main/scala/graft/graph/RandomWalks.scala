package graft.graph

import org.apache.spark.sql.DataFrame
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

    def endpoint(c: String) =
      when(col(c).isNull, raise_error(lit(
        s"RandomWalks.walks: NULL $c — a NULL is not a node id")))
        .otherwise(col(c).cast("long"))
    val edges = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
      .distinct()
    val bySrc = Window.partitionBy(col("src"))
    val ranked = edges
      .withColumn("nbr_rank",
        row_number().over(bySrc.orderBy(col("dst"))).cast("long") - 1L)
      .localCheckpoint(true) // read once per step below
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
        .localCheckpoint(true) // constant-depth lineage across steps
      frames += frontier.withColumn("step", lit(t.toLong))
      t += 1
    }
    frames.reduce(_ unionByName _)
      .select(col("start"), col("walk"), col("step"), col("node"))
  }
}
