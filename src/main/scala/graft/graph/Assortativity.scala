package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman 2002) — the Pearson correlation of
  * endpoint degrees over the edges of the undirected closure: positive
  * means hubs link hubs (social/citation structure), negative means
  * hubs link leaves (star/bipartite/spam structure). The one-number
  * shape diagnostic for a link or near-dup graph, read next to
  * [[Triangles]]' clustering and [[KCore]]'s density before trusting
  * graph-derived curation signals: a strongly disassortative "link
  * graph" is usually a crawl artifact (every page linking one
  * template), not endorsement structure.
  *
  * Exactness: the sufficient statistics — `n`, `Σx`, `Σx²`, `Σxy`
  * over directed edge copies (x = deg(src), y = deg(dst)) — are exact
  * integer sums, order-independent and SQL-replayable. The undirected
  * closure makes the (x, y) pair multiset SYMMETRIC, so Σx = Σy and
  * Σx² = Σy² exactly and Pearson's denominator `sqrt(varX)·sqrt(varY)`
  * collapses to the INTEGER `n·Σx² − (Σx)²`: the coefficient is one
  * exact integer ratio with a single correctly-rounded IEEE divide —
  * bit-identical in any engine (q221), no sqrt anywhere. Degenerate
  * graphs (all degrees equal — zero variance) yield NULL, not a
  * divide-by-zero.
  *
  * Overflow contract: `Σxy ≤ |E|·maxDeg²` and `n·Σxy < 2⁶³` must
  * hold — checked from two bounded scalars, fail-loud.
  *
  * Scale shape: one degree aggregate, two node-sized equi-joins to
  * tag edge endpoints, ONE map-side-combinable five-sum aggregate.
  */
object Assortativity {

  /** One row: `(n_edges, sum_x, sum_xx, sum_xy, r)` over the directed
    * copies of the undirected closure (so `n_edges` = 2·|undirected
    * edges|, and the x/y marginals coincide). NULL endpoints raise.
    */
  def degreeAssortativity(
      edgesDf: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // cast first, then raise on the cast's null — a non-numeric id
    // would otherwise cast to NULL silently past a null-only guard
    def endpoint(c: String) =
      when(col(c).cast("long").isNull, raise_error(lit(
        s"degreeAssortativity: NULL or non-integer $c — node ids " +
          "must be integers")))
        .otherwise(col(c).cast("long"))
    val directed = edgesDf
      .select(endpoint(srcCol).as("src"), endpoint(dstCol).as("dst"))
    val e = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))

    val nEdges = e.count() // bounded scalar, reused by the guard
    val maxDeg = deg.agg(max(col("deg"))).head.getLong(0)
    require(nEdges == 0 ||
      BigInt(nEdges) * nEdges * maxDeg * maxDeg < BigInt(Long.MaxValue),
      s"degreeAssortativity: n·Σxy bound |E|²·maxDeg² = " +
        s"$nEdges² · $maxDeg² exceeds the exact long range")

    val tagged = e
      .join(deg.select(col("src").as("__s"), col("deg").as("x")),
        col("src") === col("__s"))
      .join(deg.select(col("src").as("__d"), col("deg").as("y")),
        col("dst") === col("__d"))
      .select(col("x"), col("y"))
    tagged
      .agg(count(lit(1)).as("n_edges"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"))
      .withColumn("r", {
        val num = col("n_edges") * col("sum_xy") -
          col("sum_x") * col("sum_x")
        val den = col("n_edges") * col("sum_xx") -
          col("sum_x") * col("sum_x")
        when(den === 0L, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double"))
      })
  }
}
