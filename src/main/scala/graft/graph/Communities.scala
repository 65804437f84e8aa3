package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-propagation community detection (Raghavan et al. 2007) — the
  * DENSITY grouping beside [[graft.dedup.Components]]' connectivity
  * grouping: CC merges everything any path connects (right for
  * duplicate closure), LPA converges to locally-dense neighborhoods
  * (right for "which sources/domains form a topical cluster", where
  * one stray cross-link must NOT merge two communities).
  *
  * Determinism: textbook LPA breaks count ties randomly and updates
  * asynchronously — neither replays. This is the SYNCHRONOUS variant
  * with a pinned rule: every vertex starts labeled by its own id, and
  * each round adopts the smallest label among the most frequent labels
  * of its neighbors, the vertex's own current label voting once (the
  * standard self-vote damping — without it synchronous LPA oscillates
  * on bipartite structure). A fixed round count makes the output a
  * pure function of the edge set, replayed by unrolling rounds (q216).
  *
  * Scale shape, per round: labels (vertex-sized) equi-join edges, one
  * map-side-combinable (vertex, label) count, one max-struct argmax
  * aggregate per vertex — the [[PageRank]] shuffle profile with an
  * argmax in place of the sum. Labels checkpointed per round; no
  * driver data path.
  */
object Communities {

  /** `(vertex, label)` after `rounds` synchronous label-propagation
    * rounds over the UNDIRECTED closure of the edge list (each input
    * edge votes both ways). NULL endpoints raise.
    */
  def labelPropagation(
      edgesDf: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, maxChanged: Option[Long] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 50,
      s"rounds must be in [1, 50], got $rounds")
    // cast first, then raise on the cast's null — a non-numeric id
    // would otherwise cast to NULL silently past a null-only guard
    def endpoint(c: String) =
      when(col(c).cast("long").isNull, raise_error(lit(
        s"labelPropagation: NULL or non-integer $c — node ids must " +
          "be integers")))
        .otherwise(col(c).cast("long"))
    val directed = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
    val e = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val vertices = e.select(col("src").as("vertex")).distinct()
      .localCheckpoint(true)

    var labels = vertices.withColumn("label", col("vertex"))
    var labelsPrev = labels
    var round = 0
    while (round < rounds) {
      // neighbor votes + the self vote, then per-vertex argmax
      // (count desc, label asc) packed into one max-struct aggregate
      val votes = e
        .join(labels, e("src") === labels("vertex"))
        .select(col("dst").as("vertex"), col("label"))
        .unionByName(labels.select(col("vertex"), col("label")))
        .groupBy(col("vertex"), col("label"))
        .agg(count(lit(1)).as("__c"))
      labelsPrev = labels
      labels = votes
        .groupBy(col("vertex"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl")))
          .as("__best"))
        .select(col("vertex"), (-col("__best.__nl")).as("label"))
        .localCheckpoint(false) // lazy: the convergence probe materializes it
      round += 1
    }
    // converged-or-raise (the k-core discipline, label form): the
    // convergence signal for a label iteration is the COUNT of
    // vertices whose label moved in the final round — 0 means a
    // synchronous fixed point. One vertex-sized join + one aggregate,
    // only when the caller gates.
    maxChanged.foreach { m =>
      val changed = labels
        .join(labelsPrev.withColumnRenamed("label", "__pl"), "vertex")
        .filter(col("label") =!= col("__pl"))
        .count()
      require(changed <= m,
        s"labelPropagation: $changed vertices changed label in the " +
          s"final round (maxChanged $m) — labels have not settled; " +
          "raise rounds, or drop maxChanged to accept the " +
          "fixed-round labeling as-is")
    }
    labels
  }
}
