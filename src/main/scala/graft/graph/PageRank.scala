package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — fixed-iteration PageRank in exact
  * integer fixed-point. The crawl-prioritization member of the graph
  * family: [[graft.dedup.Components]] answers "which documents are the
  * SAME" (undirected closure), this answers "which domains MATTER"
  * (directed endorsement) — the signal Common Crawl publishes as its
  * harmonic-centrality/PageRank host ranking and that corpus curation
  * uses to weight or gate sources before quality filtering ever reads
  * a byte (see Brin & Page 1998; the damped power-iteration form).
  *
  * Exactness: ranks are integers in `scale` units (default 10⁹ per
  * vertex). One iteration is
  * `r'(v) = ⌊15·scale/100⌋ + ⌊85·(Σ_{u→v} ⌊r(u)/outdeg(u)⌋)/100⌋`
  * — every step an integral div on exact integers, so the result is
  * deterministic under any partitioning/order (integer addition
  * commutes) and SQL-replayable by unrolling the fixed iteration
  * count (q120). Truncation loses < 1 unit per edge per round —
  * irrelevant at scale 10⁹ — and dangling mass (vertices with no
  * outlinks) is dropped, the standard simplification when ranking
  * hosts rather than computing a true stationary distribution.
  *
  * Overflow contract: total mass never exceeds `|V|·scale` (each
  * round's total is `≤ 0.15·|V|·scale + 0.85·`previous), and the
  * damping step multiplies an in-sum by 85 before dividing, so exact
  * long arithmetic needs `85·|V|·scale < 2⁶³`; the constructor
  * fail-louds past `|V|·scale ≤ 10¹⁷` using the vertex count it
  * already needs for initialization. At the default scale that admits
  * 10⁸ vertices — hosts, not pages; lower `scale` for page graphs.
  *
  * Scale shape (per round): one |E| equi-join (rank lookup by edge
  * source) + one map-side-combinable `groupBy(dst).sum` — the same
  * shuffle profile as [[graft.dedup.Components]]' label propagation.
  * The degree-annotated edge table is materialized ONCE
  * (`localCheckpoint`, the [[graft.dedup.Components]] hygiene — each
  * round's join would otherwise re-derive it from the raw edge table),
  * and each round's ranks are checkpointed so lineage stays constant
  * across iterations instead of doubling. Exactly one scalar (the
  * vertex count) is collected to the driver.
  */
object PageRank {

  /** `(vertex, rank)` after `iterations` damped rounds over the
    * DISTINCT directed edges of `(srcCol, dstCol)` — `rank` in
    * `scale` units, so `scale` ≙ 1.0 of initial per-vertex mass.
    * Self-loops are legal (a host linking itself endorses itself);
    * NULL endpoints raise — a silent drop would re-route mass.
    */
  /** Exact-integer L1 residual between two rank tables — the
    * convergence signal for the fixed-iteration power methods in this
    * family (the k-core converged-or-raise discipline, lifted to
    * value iteration): `Σ_v |a(v) − b(v)|` in scale units, one
    * vertex-sized join + one map-combinable aggregate, all exact
    * longs. A residual of 0 means the iteration hit its integer fixed
    * point; `tol·|V|` bounds the per-vertex average drift.
    */
  private[graph] def l1Residual(
      a: DataFrame, b: DataFrame, valueCol: String): BigInt = {
    // decimal(38,0) accumulation: per-vertex |Δ| reaches ~scale, so a
    // long sum wraps negative past ~2^63/scale vertices and the gate
    // would silently PASS an unconverged iteration — the exact failure
    // it exists to prevent (the Hits maxDeg·scale² BigInt lesson)
    val d = a.select(col("vertex"), col(valueCol).as("__a"))
      .join(b.select(col("vertex"), col(valueCol).as("__b")), "vertex")
      .agg(sum(abs(col("__a") - col("__b")).cast("decimal(38,0)")).as("__r"))
      .head.getDecimal(0)
    if (d == null) BigInt(0) else BigInt(d.toBigInteger)
  }

  private[graph] def requireConverged(
      what: String, residual: BigInt, maxResidual: Long): Unit =
    require(residual <= BigInt(maxResidual),
      s"$what: final-round L1 residual $residual exceeds " +
        s"maxResidual $maxResidual — the iteration has not settled; " +
        "raise iterations, or drop maxResidual to accept the " +
        "fixed-iteration result as-is")

  /** Pin the iteration-invariant edge table to a hash partitioning on
    * its join key BEFORE checkpointing: every round joins the rank
    * table against it on that key, so a co-partitioned build side
    * turns the per-round sort-merge join's TWO exchanges into one
    * (only the round's rank side moves — §2.4 sharing one exchange
    * across same-keyed operations). One pinned-width shuffle per CALL
    * buys |E|-shuffle-free rounds; pinned so AQE cannot coalesce the
    * captured partitioning away.
    */
  private def partitionedBy(df: DataFrame, key: String): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, col(key))

  /** Lazy in-loop checkpoints remove the per-iteration job barrier but
    * stack shuffle stages into one DAG; `iterations` has no upper bound
    * here (unlike Communities/RandomWalks), so an eager checkpoint
    * every K rounds bounds driver-side lineage/stage growth to a
    * constant window while keeping the barrier-free fast path for the
    * common small iteration counts.
    */
  private val EagerEvery = 30

  def ranks(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000000L,
      maxResidual: Option[Long] = None): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(scale >= 100L, s"need scale >= 100 (damping divides by 100), got $scale")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"PageRank.ranks: NULL $c — drop explicitly, " +
        "a silent skip would re-route rank mass")))
      .otherwise(col(c))
    val e = edges
      .select(guard(srcCol).as("src"), guard(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = partitionedBy(e.join(outdeg, "src"), "src")
      .localCheckpoint(true)
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .localCheckpoint(true)

    val nVertices = vertices.count()
    require(nVertices == 0 || scale <= 100000000000000000L / nVertices,
      s"PageRank.ranks: |V|·scale = ${nVertices} · ${scale} exceeds the exact " +
        "long range — lower scale for graphs this large")

    val base = lit(scale * 15L / 100L)
    var r = vertices.withColumn("rank", lit(scale))
    var rPrev = r
    for (i <- 1 to iterations) {
      // `div` (integral) rather than `/` (IEEE): ranks exceed 2⁵³ on
      // big graphs, where a double round-trip would silently round
      val inSum = r
        .join(edgesDeg, r("vertex") === edgesDeg("src"))
        .select(col("dst").as("vertex"),
          expr("rank div outdeg").as("contrib"))
        .groupBy(col("vertex"))
        .agg(sum(col("contrib")).as("in_sum"))
      rPrev = r
      r = vertices
        .join(inSum, Seq("vertex"), "left")
        .select(col("vertex"),
          (base + expr("coalesce(in_sum, 0L) * 85 div 100"))
            .as("rank"))
        // lazy: rides the next consumer's job; eager every EagerEvery
        // rounds to bound lineage (iterations is caller-unbounded)
        .localCheckpoint(i % EagerEvery == 0)
    }
    maxResidual.foreach(m => requireConverged("PageRank.ranks",
      l1Residual(r, rPrev, "rank"), m))
    r
  }

  /** Weighted PageRank: mass splits along out-edges PROPORTIONALLY to
    * integer edge weights instead of uniformly — the natural form when
    * the graph is an aggregated interaction table (a host linking
    * another 500 times vs once, co-purchase counts, citation
    * multiplicity). One round is
    * `r'(v) = base + ⌊85·(Σ_{u→v} ⌊r(u)·w(u,v) / W(u)⌋)/100⌋` with
    * `W(u) = Σ_w` — integral div only, same exactness and per-round
    * shuffle profile as [[ranks]] (which this generalizes: all-equal
    * weights give identical results). Duplicate (src, dst) rows SUM
    * their weights; NULL or non-positive weights raise.
    *
    * Overflow contract: the `r(u)·w` product needs
    * `|V|·scale·maxWeight < 2⁶³` — checked from two bounded scalars
    * (vertex count, max summed weight), fail-loud with the fix
    * (pre-scale weights down; ratios are all the iteration reads).
    */
  def weightedRanks(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iterations: Int = 5, scale: Long = 1000000000L,
      maxResidual: Option[Long] = None): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(scale >= 100L, s"need scale >= 100 (damping divides by 100), got $scale")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"PageRank.weightedRanks: NULL $c — drop explicitly, " +
        "a silent skip would re-route rank mass")))
      .otherwise(col(c))
    val w = when(col(weightCol).isNull || col(weightCol).cast("long") <= 0L,
      raise_error(lit(s"PageRank.weightedRanks: NULL or non-positive " +
        s"$weightCol — a zero-weight edge is no edge; drop explicitly")))
      .otherwise(col(weightCol).cast("long"))
    val e = edges
      .select(guard(srcCol).as("src"), guard(dstCol).as("dst"), w.as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val edgesW = partitionedBy(e.join(outW, "src"), "src")
      .localCheckpoint(true)
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .localCheckpoint(true)

    val nVertices = vertices.count()
    val maxW = edgesW.agg(max(col("w"))).head.getLong(0) // bounded scalar
    require(nVertices == 0 ||
      BigInt(nVertices) * scale * maxW < BigInt(Long.MaxValue),
      s"PageRank.weightedRanks: |V|·scale·maxWeight = " +
        s"$nVertices · $scale · $maxW exceeds the exact long range — " +
        "pre-scale weights down (only ratios matter) or lower scale")

    val base = lit(scale * 15L / 100L)
    var r = vertices.withColumn("rank", lit(scale))
    var rPrev = r
    for (i <- 1 to iterations) {
      val inSum = r
        .join(edgesW, r("vertex") === edgesW("src"))
        .select(col("dst").as("vertex"),
          expr("(rank * w) div wsum").as("contrib"))
        .groupBy(col("vertex"))
        .agg(sum(col("contrib")).as("in_sum"))
      rPrev = r
      r = vertices
        .join(inSum, Seq("vertex"), "left")
        .select(col("vertex"),
          (base + expr("coalesce(in_sum, 0L) * 85 div 100"))
            .as("rank"))
        // lazy + bounded, as in ranks
        .localCheckpoint(i % EagerEvery == 0)
    }
    maxResidual.foreach(m => requireConverged("PageRank.weightedRanks",
      l1Residual(r, rPrev, "rank"), m))
    r
  }

  /** Seeded (personalized) PageRank — TrustRank (Gyöngyi et al. 2004):
    * identical damped iteration, but initial mass AND the per-round
    * base grant go ONLY to the seed vertices, so rank measures
    * "endorsement reachable from the trusted set" rather than global
    * authority. The curation use: seed a hand-audited allowlist of
    * hosts, propagate trust through the link graph, and gate or
    * down-weight the zero-trust tail — the standard crawl-spam
    * counterpart to [[ranks]]' popularity prior. Same exactness
    * (integral div only), same per-round shuffle profile, same
    * overflow contract (total mass ≤ |seeds|·scale ≤ |V|·scale).
    *
    * Returns `(vertex, is_seed, rank)`. Seeds not present in the edge
    * set are ignored (they have no links to propagate through); NULL
    * seed ids raise like NULL endpoints.
    */
  def seededRanks(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iterations: Int = 5, scale: Long = 1000000000L,
      maxResidual: Option[Long] = None): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    require(scale >= 100L, s"need scale >= 100 (damping divides by 100), got $scale")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"PageRank.seededRanks: NULL $c — drop explicitly, " +
        "a silent skip would re-route rank mass")))
      .otherwise(col(c))
    val e = edges
      .select(guard(srcCol).as("src"), guard(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = partitionedBy(e.join(outdeg, "src"), "src")
      .localCheckpoint(true)
    val seedSet = seeds
      .select(guard(seedCol).as("vertex"))
      .distinct()
      .withColumn("__seed", lit(true))
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .join(seedSet, Seq("vertex"), "left")
      .select(col("vertex"),
        coalesce(col("__seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)

    val nVertices = vertices.count()
    require(nVertices == 0 || scale <= 100000000000000000L / nVertices,
      s"PageRank.seededRanks: |V|·scale = ${nVertices} · ${scale} exceeds " +
        "the exact long range — lower scale for graphs this large")

    val base = lit(scale * 15L / 100L)
    val seedOnly = (grant: org.apache.spark.sql.Column) =>
      when(col("is_seed"), grant).otherwise(lit(0L))
    var r = vertices.withColumn("rank", seedOnly(lit(scale)))
    var rPrev = r
    for (i <- 1 to iterations) {
      val inSum = r
        .join(edgesDeg, r("vertex") === edgesDeg("src"))
        .select(col("dst").as("vertex"),
          expr("rank div outdeg").as("contrib"))
        .groupBy(col("vertex"))
        .agg(sum(col("contrib")).as("in_sum"))
      rPrev = r
      r = vertices
        .join(inSum, Seq("vertex"), "left")
        .select(col("vertex"), col("is_seed"),
          (seedOnly(base) + expr("coalesce(in_sum, 0L) * 85 div 100"))
            .as("rank"))
        // lazy + bounded, as in ranks
        .localCheckpoint(i % EagerEvery == 0)
    }
    maxResidual.foreach(m => requireConverged("PageRank.seededRanks",
      l1Residual(r, rPrev, "rank"), m))
    r
  }
}
