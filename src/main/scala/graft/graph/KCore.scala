package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983) — iteratively peel vertices of
  * degree < k until the remaining subgraph has minimum degree ≥ k.
  * The curation signal the degree alone misses: a vertex with 1000
  * one-off neighbors has high degree but no core membership, while a
  * boilerplate/template cluster (every page near-dup-linked to every
  * other) survives peeling at high k — k-core over the near-dup or
  * citation graph flags DENSE structure, complementing
  * [[Communities]]' partition and [[Triangles]]' local count.
  *
  * Determinism: peeling is confluent — the k-core is UNIQUE whatever
  * the removal order — so the only replay question is round count.
  * `rounds` is an upper bound: the peel STOPS EARLY when a round
  * removes nothing (the surviving edge count is unchanged — one cheap
  * count per round on the already-checkpointed edge set), and a
  * converged core is idempotent under extra rounds, so Spark and a
  * fixed-round oracle agree exactly (q219 unrolls 4 rounds). Graphs
  * whose peel does NOT converge within `rounds` layers return the
  * partially-peeled superset — identical on both sides, detectable
  * (some returned degree < k), and with
  * `failOnNonConverged = true` the call raises instead of returning
  * it (the fail-loud switch for users who treat the result as THE
  * core rather than a bounded peel).
  *
  * Scale shape, per round: one semi-join of the edge set against the
  * surviving vertex set per endpoint + one map-side-combinable degree
  * count + one count() on the freshly checkpointed edges (the
  * convergence probe — reads cached blocks, no recompute) — the
  * [[PageRank]] round profile; the edge set SHRINKS monotonically
  * ([[graft.dedup.Components]]' large-star argument). Edges
  * checkpointed per round so lineage stays constant.
  */
object KCore {

  /** `(vertex, degree)` for the vertices surviving `rounds` peels at
    * threshold `k`, with `degree` computed over the surviving
    * subgraph. Self-loops are dropped (a self-edge is not support).
    * NULL endpoints raise.
    */
  def kCore(
      edgesDf: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 10, failOnNonConverged: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    // cast first, then raise on the cast's null — a non-numeric id
    // would otherwise cast to NULL silently past a null-only guard
    def endpoint(c: String) =
      when(col(c).cast("long").isNull, raise_error(lit(
        s"kCore: NULL or non-integer $c — node ids must be integers")))
        .otherwise(col(c).cast("long"))
    val directed = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    var e = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // convergence = a round that removes no edge (count unchanged on
    // the checkpointed set — a cheap metadata-local count per round);
    // an empty edge set is trivially converged
    var prevEdges = e.count()
    var converged = prevEdges == 0L
    var round = 0
    while (round < rounds && !converged) {
      val survivors = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src").as("__sv"))
      e = e
        .join(survivors, e("src") === col("__sv"), "left_semi")
        .join(survivors.withColumnRenamed("__sv", "__sv2"),
          e("dst") === col("__sv2"), "left_semi")
        .localCheckpoint(false) // lazy: the convergence count materializes it
      val n = e.count()
      converged = n == prevEdges || n == 0L
      prevEdges = n
      round += 1
    }
    require(converged || !failOnNonConverged,
      s"kCore: peel did not converge within $rounds rounds " +
        s"($prevEdges directed edges still peeling) — raise rounds, " +
        "or call with failOnNonConverged = false to accept the " +
        "partially-peeled superset")
    e.groupBy(col("src").as("vertex"))
      .agg(count(lit(1)).as("degree"))
  }
}
