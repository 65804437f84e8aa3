package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Head-coverage cut — "which domains hold 95% of the corpus?": the
  * smallest set of groups, taken in descending mass order, whose
  * combined mass reaches a target fraction of the total. The analysis
  * behind every head/tail curation decision (hand-review the head,
  * policy-filter the tail; cap crawl budgets; pick the domains worth a
  * custom extractor). North-star extension (SURVEY §2.11).
  *
  * Semantics: groups are ranked by `(mass desc, group cols)` — the
  * trailing group columns make the order total, so equal-mass groups
  * cut deterministically. A group is in the head iff the cumulative
  * mass STRICTLY BEFORE it is below `ceil(pNum·total/pDen)`: the head
  * is minimal (its last group is the one that crosses the target) and
  * never empty for p > 0. All arithmetic is integer — `p` arrives as a
  * rational, the target as one ceiling division — so the cut is
  * bit-replayable with no float accumulation anywhere.
  *
  * Scale shape: domains in a web corpus number in the hundreds of
  * millions — the group table is NOT assumed driver-sized. One
  * map-side-combinable aggregate builds (group, mass); ranks come from
  * [[Enumerate.denseIds]] (range repartition, no global window); the
  * cumulative sum is the [[Packing]] two-level scan over rank buckets
  * (dense ranks make buckets exactly `bucketWidth` groups wide, the
  * driver cumsum is #buckets-bounded, the within-bucket window is
  * partitioned); the corpus total falls out
  * of the same driver cumsum for free (no extra pass, no scalar join).
  */
object Coverage {

  /** Per-group coverage table:
    * `(groupCols…, mass, rank, cum_mass, in_head)` — `rank` 0-based in
    * descending-mass order, `cum_mass` inclusive, `in_head` the minimal
    * head-set flag. Callers filter `in_head` for the cut or read the
    * whole table as the coverage report.
    *
    * @param massCol non-negative integral mass per row (tokens, chars,
    *                bytes, 1 for row counts); NULL or negative raises.
    * @param pNum/pDen target fraction as a rational, e.g. 95/100.
    */
  def headCoverage(
      df: DataFrame,
      groupCols: Seq[String],
      massCol: String,
      pNum: Long,
      pDen: Long,
      bucketWidth: Long = 1L << 16,
      maxBuckets: Long = 4000000L): DataFrame = {
    require(groupCols.nonEmpty, "headCoverage needs at least one group col")
    require(pNum >= 0 && pDen >= 1 && pNum <= pDen,
      s"p must be a fraction in [0,1], got $pNum/$pDen")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")

    val m = when(col(massCol).isNull || col(massCol).cast("long") < 0L,
      raise_error(lit(s"headCoverage: NULL or negative $massCol — drop " +
        "explicitly, a silent skip would shift every rank below it")))
      .otherwise(col(massCol).cast("long"))
    val masses = df.select(groupCols.map(col) :+ m.as("mass"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("mass")).as("mass"))

    // descending-mass total order via an ascending key: flip the sign
    // (denseIds orders by column names ascending); group cols break ties
    val ranked = Enumerate.denseIds(
      masses.withColumn("__negm", -col("mass")),
      "__negm" +: groupCols, idCol = "rank")
      .drop("__negm")
      // narrow (groups, mass, rank) read twice below: bucket totals +
      // the final windowed plan — materialize once
      .localCheckpoint(true)

    // two-level scan over rank buckets (ranks are dense: every bucket
    // holds exactly bucketWidth groups, so no sparsity guard beyond the
    // #buckets cap)
    val bucketed = ranked.withColumn("__b", expr(s"rank div ${bucketWidth}L"))
    val nBuckets = bucketed.agg(countDistinct(col("__b"))).head.getLong(0)
    require(nBuckets <= maxBuckets,
      s"headCoverage: $nBuckets rank buckets exceeds maxBuckets=" +
        s"$maxBuckets — widen bucketWidth (currently $bucketWidth)")
    val totals = bucketed.groupBy(col("__b")).agg(sum(col("mass")).as("__t"))
      .collect() // bounded: one row per bucket
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val grandTotal = acc
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__b2", "__off"))

    val w = Window.partitionBy(col("__b"))
      .orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val target = (pNum * grandTotal + pDen - 1) / pDen // ceil, integer
    bucketed
      .join(offsetDf, col("__b") === col("__b2"))
      .withColumn("cum_mass", col("__off") + sum(col("mass")).over(w))
      .withColumn("in_head", (col("cum_mass") - col("mass")) < target)
      .select(groupCols.map(col) ++
        Seq(col("mass"), col("rank"), col("cum_mass"), col("in_head")): _*)
  }

  /** Gini concentration of mass across groups — the ONE-NUMBER
    * companion to [[headCoverage]]'s cut table, the standard datasheet
    * summary ("how concentrated is this corpus across domains"): 0 =
    * perfectly even, → 1 = one group holds everything. Comparable
    * across corpora and releases the way a p-specific head cut is not.
    *
    * Exactness: with groups ranked 1..n by ascending mass (group cols
    * break ties; tied EQUAL masses contribute identically under any
    * tie order, so the statistic is tie-order-free),
    * `G = (2·Σ rank·mass − (n+1)·Σ mass) / (n·Σ mass)` — integer
    * numerator and denominator, ONE correctly-rounded IEEE divide
    * (q225 replays it as a window). Zero total mass yields NULL.
    *
    * Scale shape: the [[headCoverage]] discipline — one
    * map-side-combinable mass aggregate, ranks via
    * [[Enumerate.denseIds]] (no global window), one Σ rank·mass
    * aggregate; the overflow ceiling `2·n·total < 2⁶³` is checked from
    * ONE bounded scalar row before the ranked pass.
    *
    * Output: one row `(n_groups, total_mass, gini)`.
    */
  def giniConcentration(
      df: DataFrame, groupCols: Seq[String], massCol: String): DataFrame = {
    require(groupCols.nonEmpty, "giniConcentration needs group columns")
    val m = when(col(massCol).isNull || col(massCol).cast("long") < 0L,
      raise_error(lit(s"giniConcentration: NULL or negative $massCol — " +
        "drop explicitly, a silent skip would shift every rank")))
      .otherwise(col(massCol).cast("long"))
    val masses = df.select(groupCols.map(col) :+ m.as("mass"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("mass")).as("mass"))
      .localCheckpoint(true) // scalar guard + ranked pass both read it

    val sc = masses.agg(count(lit(1)).as("n"), sum(col("mass")).as("t"))
      .head // bounded: ONE row
    val (n, total) = (sc.getLong(0), sc.getLong(1))
    require(n > 0, "giniConcentration: input is empty")
    require(BigInt(2) * n * total < BigInt(Long.MaxValue),
      s"giniConcentration: 2·n·total = 2 · $n · $total exceeds the " +
        "exact long range — pre-scale masses (only ratios matter)")

    val ranked = Enumerate.denseIds(masses, "mass" +: groupCols, "__r0")
    ranked
      .agg(sum((col("__r0") + 1L) * col("mass")).as("__s"))
      .select(lit(n).as("n_groups"), lit(total).as("total_mass"),
        (if (total == 0L) lit(null).cast("double")
         else ((lit(2L) * col("__s") - lit(n + 1L) * lit(total))
           .cast("double") /
           (lit(n) * lit(total)).cast("double"))).as("gini"))
  }
}
