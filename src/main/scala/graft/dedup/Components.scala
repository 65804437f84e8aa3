package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the step that turns
  * near-duplicate PAIRS (MinHash/SimHash/embedding LSH output) into
  * duplicate CLUSTERS, so a dedup run can keep exactly one canonical
  * document per cluster. Without it, pairwise dedup double-drops: from
  * the pairs (a,b), (b,c) a naive "drop the right side" removes b and c
  * even though keeping a requires dropping both only if all three are
  * mutually similar — the component (a,b,c) makes the keep-one contract
  * explicit.
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round every node takes the minimum label among itself
  * and its neighbors; at fixpoint each component is labeled by its
  * minimum member id, which doubles as the canonical representative.
  *
  * Scale shape (per round): one |E| equi-join (label lookup by
  * neighbor) and one |V|+|E| map-side-combinable min aggregate — the
  * same shuffle profile as GraphX's canonical CC. Rounds needed = graph
  * diameter; duplicate clusters are near-cliques (diameter ≤ 2-3 in
  * practice), so convergence is a handful of rounds even at 100 TB.
  * For adversarial long-chain graphs the alternating large-star/
  * small-star variant (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") converges in O(log n) rounds; the propagation
  * loop here keeps the simpler shape because dedup graphs are shallow.
  *
  * Iterative-plan hygiene: the symmetrized edge set is materialized
  * ONCE (`localCheckpoint(eager)`) — each round's join would otherwise
  * lazily re-scan the pair table, so a d-diameter graph re-reads it
  * ~d times — and each round's labels are checkpointed, truncating the
  * lineage that would otherwise double every round. Convergence is
  * decided INSIDE the update aggregate: the self row carries the
  * previous label through the groupBy, so "any label changed" is a
  * column of the checkpointed round result and the probe is a cheap
  * scan of already-materialized partitions, not a separate join-job.
  */
object Components {

  /** (id, component) for every node in `pairs`, where `component` is
    * the minimum node id of its connected component. Node ids must be
    * orderable and non-null; pairs are treated as undirected.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val sym = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    val idType = labels.schema("component").dataType
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = sym
        .join(labels, sym("v") === labels("id"))
        .select(sym("u").as("id"), col("component"),
          lit(null).cast(idType).as("old"))
      // exactly one row per id (the self row) carries the previous label
      // in `old`; min/max ignore nulls, so the same aggregate yields the
      // new label AND the old one — `changed` needs no second join.
      val next = labels
        .select(col("id"), col("component"), col("component").as("old"))
        .union(propagated)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"), max(col("old")).as("old"))
        .withColumn("changed", col("component") =!= col("old"))
        .localCheckpoint(true)
      // one deterministic single-job probe over the checkpointed result
      converged = !next
        .agg(coalesce(max(col("changed")), lit(false)).as("any"))
        .head.getBoolean(0)
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; " +
          "the pair graph has a longer path than expected — raise maxIter")
    labels
  }

  /** `df` reduced to one canonical row per duplicate cluster: a row
    * survives unless its id appears in a component under a smaller id.
    * Rows in no pair (singletons) always survive. One anti-join against
    * the (small — O(duplicate ids), not O(corpus)) non-canonical set.
    */
  def keepCanonical(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val dropped = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
    df.join(dropped, df(idCol) === dropped("id"), "left_anti")
  }
}
