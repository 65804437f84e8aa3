package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

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
    *
    * Two physical paths, one contract:
    *   - **small graphs** (≤ `maxDriverEdges` symmetrized edges,
    *     counted for free off the already-materialized checkpoint):
    *     collect the edge list and run driver-side union-find — O(E
    *     α(E)) in one job instead of diameter × 2 jobs. Verified
    *     near-dup pair lists are tiny relative to the corpus (pairs
    *     are duplicates, not rows), so this is the common case and
    *     removes the per-round scheduling overhead that dominates CC
    *     wall-time on shallow graphs. The collect is bounded by the
    *     caller-set cap (default 1M edges ≈ tens of MB), the same
    *     bounded-driver-collect contract as the IVF centroid table.
    *   - **large graphs** (or exotic id types): the distributed
    *     min-label propagation loop below, unchanged.
    * Both produce identical labels (min member id per component);
    * ComponentsSpec pins path equivalence on random graphs.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, maxDriverEdges: Long = 1000000L): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val sym = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint(true)
    val idType = sym.schema("u").dataType
    val ordering: Option[Ordering[Any]] = idType match {
      case LongType => Some(Ordering.Long.on[Any](_.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.Int.on[Any](_.asInstanceOf[Int]))
      case StringType => Some(new Ordering[Any] {
        // Spark's min() on strings is UTF-8 BYTE order, which differs
        // from Java String (UTF-16) order for supplementary characters
        // — compare as UTF8String so both paths pick the same label
        def compare(a: Any, b: Any): Int =
          org.apache.spark.unsafe.types.UTF8String
            .fromString(a.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String
              .fromString(b.asInstanceOf[String]))
      })
      case _ => None
    }
    if (ordering.isDefined && maxDriverEdges > 0 &&
        sym.count() <= maxDriverEdges) {
      return driverUnionFind(sym, idType, ordering.get)
    }
    distributedComponents(sym, maxIter)
  }

  /** Driver-side union-find over a collected (bounded) edge list. */
  private def driverUnionFind(
      sym: DataFrame,
      idType: org.apache.spark.sql.types.DataType,
      ord: Ordering[Any]): DataFrame = {
    val spark = sym.sparkSession
    val edges = sym.collect() // bounded by maxDriverEdges, by contract
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { e =>
      val (u, v) = (e.get(0), e.get(1))
      if (!parent.containsKey(u)) parent.put(u, u)
      if (!parent.containsKey(v)) parent.put(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent.put(ru, rv)
    }
    // min member per root, then one row per node
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { node =>
      val r = find(node)
      val cur = minOf.get(r)
      if (cur == null || ord.lt(node, cur)) minOf.put(r, node)
    }
    val rows = new java.util.ArrayList[Row](parent.size())
    parent.keySet().forEach { node =>
      rows.add(Row(node, minOf.get(find(node))))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("component", idType, nullable = false))))
  }

  /** Distributed min-label propagation (see scale notes above). */
  private def distributedComponents(
      sym: DataFrame, maxIter: Int): DataFrame = {
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
        .localCheckpoint(false) // lazy: the convergence probe materializes it
      // one deterministic single-job probe over the checkpointed result
      converged = !next
        .agg(coalesce(max(col("changed")), lit(false)).as("any"))
        .head.getBoolean(0)
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    if (!converged)
      // Adversarial long-chain graph: propagation needs diameter rounds,
      // so past maxIter switch to the alternating large-star/small-star
      // algorithm (Kiveris et al.), which converges in O(log n) rounds
      // regardless of diameter. Same label contract (min member id).
      return largeStarSmallStar(sym)
    labels
  }

  /** Alternating large-star/small-star connected components
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round path for graphs whose diameter defeats plain
    * min-label propagation (long chains). Each round rewrites the edge
    * set: large-star connects every neighbor larger than a node to the
    * minimum of its neighborhood; small-star does the same for the
    * smaller neighbors. At the fixpoint the edges form stars rooted at
    * each component's minimum id, which is exactly the label contract
    * of the other two paths (ComponentsSpec pins equivalence).
    *
    * Per round: two groupBy-min aggregates and two equi-joins over the
    * current edge set (checkpointed — the edge set SHRINKS toward one
    * edge per non-root node, so rounds get cheaper), plus an exact
    * set-equality convergence probe (count precheck, then except) —
    * sound, and cheap once the count gate passes only near fixpoint.
    */
  private[dedup] def largeStarSmallStar(
      sym0: DataFrame, maxRounds: Int = 100): DataFrame = {
    var edges = sym0
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    // the convergence probe compares consecutive edge-set sizes; the
    // previous round's count is already known — carry it instead of
    // re-counting the checkpointed prior set every round (one job per
    // round saved, exact same decisions)
    var edgeCount = edges.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // large-star: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
      val symAll = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val lsMin = symAll.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = symAll.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b")) // m ≤ u < v: canonical
        .filter(col("a") =!= col("b"))
        .distinct()
      // small-star over larger→smaller links: m = min(N<(u) ∪ {u});
      // emit (v, m) for v ∈ N<(u) ∪ {u}, v ≠ m
      val dir = ls.select(col("b").as("u"), col("a").as("v"))
      val ssMin = dir.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val next = dir.join(ssMin, "u")
        .select(col("mn").as("a"), col("v").as("b"))
        .union(ssMin.select(col("mn").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
        .localCheckpoint(false) // lazy: the convergence count materializes it
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edges = next
      edgeCount = nextCount
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"largeStarSmallStar did not converge in $maxRounds rounds — " +
          "this exceeds the O(log n) bound for any feasible graph")
    // star fixpoint: component(node) = min(node, min neighbor)
    edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("component"))
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

  /** `df` reduced to the BEST row per duplicate cluster: like
    * [[keepCanonical]], but the survivor is the member with the
    * highest `scoreCol` (ties → smallest id) instead of the smallest
    * id — the curation-correct form: when near-duplicates collide,
    * keep the longest / highest-quality / most-recent variant, not an
    * arbitrary one. Rows in no pair survive unchanged.
    *
    * Output: `(component, <idCol>, <scoreCol>)` — one row per cluster
    * (singletons are their own cluster).
    *
    * Plan shape: the component join touches only paired ids (the
    * component table is O(duplicate ids)); the winner pick is a
    * rank-1 window on the cluster label, which the engine's
    * `Top1WindowToAggregate` rule (or Spark's own
    * `InferWindowGroupLimit`) executes as a bounded-heap / max_by
    * aggregate — no per-cluster sort materialization.
    */
  def keepBest(
      df: DataFrame, idCol: String, scoreCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = connectedComponents(pairs, aCol, bCol)
    val labeled = df
      .join(comp, df(idCol) === comp("id"), "left")
      .select(
        coalesce(col("component"), df(idCol)).as("component"),
        df(idCol), df(scoreCol))
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col(idCol))
    labeled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** `(size, n_clusters, n_docs)` histogram over a cluster-labeled
    * table — the dedup ops dashboard: how many duplicate clusters of
    * each size exist, and how much of the corpus they hold (singletons
    * at size 1; `Σ n_docs` = corpus size; `Σ (size−1)·n_clusters` =
    * rows a keep-canonical pass would remove — the dedup ratio read
    * straight off the report). Two map-side-combinable aggregates; the
    * first shuffle carries one row per cluster, the second one row per
    * DISTINCT size (a handful — cluster-size distributions are
    * heavy-tailed at the small end).
    */
  def sizeHistogram(labeled: DataFrame, labelCol: String): DataFrame =
    labeled
      .groupBy(col(labelCol)).agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("size")).as("n_docs"))
}
