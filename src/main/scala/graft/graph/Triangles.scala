package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — per-vertex closed-triple counts on
  * an undirected graph, the classic cohesion signal: link farms and
  * bot rings are triangle-dense (everybody links everybody), organic
  * link neighborhoods are sparse; per-node triangle counts (and the
  * clustering coefficients derived from them) are standard spam
  * features next to [[PageRank]]'s authority scores.
  *
  * Algorithm: the degree-ordered wedge join (Suri & Vassilvitskii's
  * MR-friendly form). Edges orient from the LOWER endpoint to the
  * higher in `(degree, id)` order; each vertex then only emits wedges
  * centered at itself from its out-neighbors, and an oriented wedge
  * `u→v, u→w` closes iff oriented edge `v→w` exists. Orientation is
  * the load-bearing trick: a degree-d hub's wedge count drops from
  * O(d²) to O(out-d²) where every vertex's OUT-degree is bounded by
  * O(√m) on any graph — total wedge work O(m^{3/2}) instead of the
  * Σd² blowup a naive self-join takes on power-law graphs (the
  * celebrity-vertex problem, which is precisely the skew this library
  * guards against elsewhere with caps and salts).
  *
  * Mechanics: self-join of the oriented edge list on the wedge center
  * + one semi-ish join against the oriented edges to close — all
  * equi-joins, no cartesian path. Exact counts (spam features must
  * not undercount dense rings); every aggregate map-side combinable.
  *
  * Input contract: `(srcCol, dstCol)` UNDIRECTED edges; duplicates
  * and self-loops are dropped here (a multi-edge would count the same
  * triangle multiple times).
  */
object Triangles {

  /** Per-vertex triangle participation: `(vertex, triangles)` —
    * vertices in no triangle included with 0 when `keepZero`.
    */
  def perVertex(
      edges: DataFrame, srcCol: String, dstCol: String,
      keepZero: Boolean = true): DataFrame = {
    // canonical undirected edge set: (lo, hi), dedup, no loops
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    // degrees over both endpoints (one explode-free union agg)
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

    // orient by (degree, id): lower (d, v) endpoint points at higher
    val da = deg.select(col("v").as("a"), col("d").as("da"))
    val dbb = deg.select(col("v").as("b"), col("d").as("db"))
    val oriented = und.join(da, "a").join(dbb, "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))

    // wedges centered at u: (v, w) out-neighbor pairs, v < w in the
    // orientation join's own order to emit each wedge once
    val o1 = oriented.select(col("u"), col("w").as("v"))
    val o2 = oriented.select(col("u"), col("w"))
    val wedges = o1.join(o2, "u")
      .filter(col("v") < col("w"))
      .select(col("u"), col("v"), col("w"))

    // a wedge closes iff (v, w) or (w, v) is an oriented edge; both
    // orders checked via the canonical undirected set
    val closing = und.select(col("a").as("v"), col("b").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))

    val perV = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("vertex"))
      .groupBy(col("vertex")).agg(count(lit(1)).as("triangles"))
    if (!keepZero) perV
    else deg.select(col("v").as("vertex"))
      .join(perV, Seq("vertex"), "left_outer")
      .select(col("vertex"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Total triangle count (each triangle once). */
  def total(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    perVertex(edges, srcCol, dstCol, keepZero = false)
      .agg((coalesce(sum(col("triangles")), lit(0L)) / 3)
        .cast("long").as("triangles"))
}
