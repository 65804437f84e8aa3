package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable
  * point-frequency estimation, completing the sketch family:
  * [[Hll]] answers "how many DISTINCT", [[FrequentItems]] answers
  * "which are the heaviest", [[SourceSketch]] answers "how SIMILAR are
  * groups", and this answers "how often does value v occur" for ANY v,
  * over a table whose size is fixed at `depth × width` cells however
  * large the corpus: est(v) = min_j cells[j][h_j(v)], an OVERestimate
  * (never under — every occurrence of v lands in all d of its cells;
  * collisions only add) within `ε·N` of truth with probability
  * `1 − δ` for `width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉`.
  *
  * The hash family is the engine-replayable KR + affine construction
  * shared with [[SourceSketch]] ([[graft.functions.KrHash]] byte fold,
  * [[graft.dedup.Dedup.hashParams]] (a, b) pairs over the 31-bit
  * Mersenne prime), so the CELL TABLE and every estimate replay in SQL
  * (q117) — the sketch is oracle-checkable, not just its consequences.
  *
  * Scale shape: building is one explode + map-only hash projection +
  * a map-side-combinable `groupBy(row, cell).sum` whose shuffle
  * carries at most `depth · width` rows per map partition regardless
  * of corpus size; sketches MERGE by cell-wise sum (associative,
  * commutative) across shards/days; estimation joins the query values
  * against the cell table on (row, cell) — broadcast-sized by
  * construction.
  */
object CountMin {

  private val MersennePrime = (1L << 31) - 1

  private def cellCols(
      v: Column, depth: Int, width: Int, seed: Long): Column = {
    val params = graft.dedup.Dedup.hashParams(depth, seed)
    val kr = graft.functions.KrHash.krHash(v)
    array(params.map { case (a, b) =>
      pmod(pmod(kr * lit(a) + lit(b), lit(MersennePrime)), lit(width.toLong))
    }: _*)
  }

  /** `(row, cell, c)` — the sketch table for a string value column
    * (one increment per ROW of `df`; pre-aggregate with a weight
    * column upstream if rows carry counts). NULL values raise — a
    * silent skip would undercount.
    */
  def sketch(
      df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth, width >= 1: $depth, $width")
    val v = when(col(valueCol).isNull,
      raise_error(lit(s"CountMin.sketch: NULL $valueCol — drop explicitly, " +
        "a silent skip would undercount")))
      .otherwise(col(valueCol))
    df.select(posexplode(cellCols(v, depth, width, seed)).as(Seq("row", "cell")))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Cell-wise sum of two sketch tables built with the SAME
    * (depth, width, seed) — the sketch of the concatenated corpora.
    */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("cell"))
      .agg(sum(col("c")).as("c"))

  /** Point estimates: one row per DISTINCT query value,
    * `est = min_j cells[j][h_j(v)]` (0 for values whose cells were
    * never touched). `queries` is expected to be bounded (a vocab, a
    * watchlist); the join against the `depth × width` cell table is
    * broadcast-sized by construction.
    */
  def estimate(
      sk: DataFrame, queries: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024, seed: Long = 42L): DataFrame = {
    val qcells = queries
      .select(col(valueCol).as("value")).distinct()
      .select(col("value"),
        posexplode(cellCols(col("value"), depth, width, seed))
          .as(Seq("row", "cell")))
    qcells
      .join(sk, Seq("row", "cell"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
