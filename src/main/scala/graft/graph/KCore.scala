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
  * `rounds` is fixed; a converged core is idempotent under extra
  * rounds, so Spark and the oracle agree exactly whether or not the
  * peel has converged by round `rounds` (q219 unrolls the same
  * count). One round per peeled "layer"; graphs needing more than
  * `rounds` layers return the partially-peeled superset — same on
  * both sides, and detectable (some returned degree < k).
  *
  * Scale shape, per round: one semi-join of the edge set against the
  * surviving vertex set per endpoint + one map-side-combinable degree
  * count — the [[PageRank]] round profile; the edge set SHRINKS
  * monotonically ([[graft.dedup.Components]]' large-star argument).
  * Edges checkpointed per round so lineage stays constant.
  */
object KCore {

  /** `(vertex, degree)` for the vertices surviving `rounds` peels at
    * threshold `k`, with `degree` computed over the surviving
    * subgraph. Self-loops are dropped (a self-edge is not support).
    * NULL endpoints raise.
    */
  def kCore(
      edgesDf: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    def endpoint(c: String) =
      when(col(c).isNull, raise_error(lit(
        s"kCore: NULL $c — a NULL is not a node id")))
        .otherwise(col(c).cast("long"))
    val directed = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    var e = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var round = 0
    while (round < rounds) {
      val survivors = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src").as("__sv"))
      e = e
        .join(survivors, e("src") === col("__sv"), "left_semi")
        .join(survivors.withColumnRenamed("__sv", "__sv2"),
          e("dst") === col("__sv2"), "left_semi")
        .localCheckpoint(true)
      round += 1
    }
    e.groupBy(col("src").as("vertex"))
      .agg(count(lit(1)).as("degree"))
  }
}
