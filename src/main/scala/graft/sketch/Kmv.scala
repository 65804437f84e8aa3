package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Scalars
import graft.functions.KrHash
import graft.operators.GroupLimit

/** KMV (k-minimum-values) distinct sketches with SET ALGEBRA — the
  * sketch that answers "how similar are these two corpora" WITHOUT
  * joining them: keep the k smallest distinct hash values per group;
  * the k-th smallest estimates cardinality, and because every sketch
  * is a uniform bottom-k sample of the same hash permutation, the
  * union of two sketches' k smallest values is the sketch of the
  * union — so Jaccard / containment between groups read off a
  * k-row-per-pair table (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * At 100 TB the full pairwise token-overlap join between N corpora is
  * unrunnable; per-group sketches are one distinct + one bounded
  * top-k, after which ALL pairwise comparisons happen on k-sized
  * sketch tables.
  *
  * Everything is exact integer arithmetic on the replayable Karp-Rabin
  * hash ([[graft.functions.KrHash]], universe [0, 2^31−1)): estimates
  * are integer-division expressions, so sketches AND estimates
  * hash-match any engine that can fold the same polynomial (q203).
  */
object Kmv {

  /** Hash universe size (the KrHash prime). */
  val Modulus: Long = 2147483647L

  /** x⁵ mod Modulus — a POWER PERMUTATION of the hash universe.
    * KrHash alone is a rolling polynomial: similar short strings
    * ("tok1000"…"tok1999") land in a narrow band of the range, which
    * wrecks a bottom-k estimator (it reads cardinality off the k-th
    * ORDER STATISTIC, so it needs uniformity, not just collision
    * resistance). gcd(5, Modulus−1) = 1 makes x⁵ a bijection mod the
    * prime, and square-and-multiply keeps every intermediate < 2^62 —
    * exactly replayable in any 64-bit-integer engine.
    */
  def scramble(h: Column): Column = {
    val m = Modulus
    val x2 = pmod(h * h, lit(m))
    val x4 = pmod(x2 * x2, lit(m))
    pmod(x4 * h, lit(m))
  }

  /** KMV sketch rows `(groupCols…, h)` — the k smallest DISTINCT
    * scrambled Karp-Rabin hashes of `value` per group, h
    * ascending-unique per group. One distinct (map-side combined) +
    * one bounded top-k.
    *
    * The whole point of a sketch is to be consumed SEVERAL times
    * (estimates, every pairwise comparison), so by default the
    * #groups·k-row result is eagerly materialized (the "derive once"
    * contract) — without it each downstream reference re-runs the
    * corpus scan + distinct (q203 planned 5 full scans before this).
    * `materialize = false` keeps the lazy, fault-tolerant plan.
    */
  def sketch(
      df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int, materialize: Boolean = true): DataFrame = {
    require(k >= 2, s"k must be >= 2 (the estimator divides by h_(k)), got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val hashed = df
      .select(groupCols.map(col) :+
        scramble(KrHash.krHash(value)).as("h"): _*)
      .distinct()
    val sk = GroupLimit.topKPerGroup(hashed, groupCols, Seq(col("h")), k)
    if (materialize) sk.localCheckpoint(true) else sk
  }

  /** Distinct-count estimate per group from a [[sketch]] result:
    * EXACT when the sketch is not full (n < k — the sketch IS the
    * value set), else the unbiased KMV estimator
    * `(k−1)·Modulus div h_(k)` — integer arithmetic only.
    */
  def distinctEstimate(
      sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("__hk"))
      .select(groupCols.map(col) :+ col("n_sketch") :+
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(s"(${k - 1}L * ${Modulus}L) div __hk"))
          .as("distinct_est"): _*)

  /** Pairwise similarity estimates between every two groups of a
    * [[sketch]] result, from sketches alone: for each pair (ga < gb),
    * the k smallest values of the UNION of the two sketches form the
    * union's sketch; counting which of those appear in both / each
    * side gives `(ga, gb, k_used, n_common, n_a, n_b, jaccard_est)`
    * where `jaccard_est = n_common / k_used` (one double division —
    * everything else integers). When the union sketch is not full,
    * the counts (hence Jaccard) are EXACT.
    *
    * The pair table is built through the zero-key broadcast HASH join
    * ([[Scalars.withEach]]) — #groups² pairs, no nested-loop operator;
    * per-pair work is bounded by 2k sketch rows.
    */
  def pairwiseJaccard(
      sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val groups = sk.select(col(groupCol).cast("string").as("ga")).distinct()
    val pairs = Scalars
      .withEach(groups, groups.select(col("ga").as("gb")))
      .filter(col("ga") < col("gb"))
    val rows = sk.select(col(groupCol).cast("string").as("g"), col("h"))
    val aSide = pairs.join(rows, col("ga") === col("g"))
      .select(col("ga"), col("gb"), col("h"), lit(1L).as("in_a"),
        lit(0L).as("in_b"))
    val bSide = pairs.join(rows, col("gb") === col("g"))
      .select(col("ga"), col("gb"), col("h"), lit(0L).as("in_a"),
        lit(1L).as("in_b"))
    val merged = aSide.unionAll(bSide)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val unionK = GroupLimit
      .topKPerGroup(merged, Seq("ga", "gb"), Seq(col("h")), k)
    unionK.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_common"),
        sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        max(col("h")).as("union_hk"))
      .select(col("ga"), col("gb"), col("k_used"), col("n_common"),
        col("n_a"), col("n_b"),
        (col("n_common").cast("double") / col("k_used").cast("double"))
          .as("jaccard_est"),
        col("union_hk"))
  }

  /** Full pairwise SET ALGEBRA from sketches alone — the corpus-
    * versioning readout ("how many bigrams did v2 add / drop / share
    * vs v1") without ever joining the corpora: per pair (ga < gb),
    *
    *   - `union_est`  — the union sketch's own KMV estimate (EXACT
    *     integer when the union sketch is not full, else
    *     `(k−1)·Modulus div h_(k)`);
    *   - `inter_est`  — `n_common · union_est / k_used` (exact long
    *     product, ONE double divide — the standard KMV intersection
    *     estimator J·|A∪B|);
    *   - `diff_a_est` / `diff_b_est` — each side's own distinct
    *     estimate minus the intersection (one subtract each).
    *
    * When no sketch is full all four are EXACT set cardinalities.
    * Estimates are individually noisy, so a difference can come out
    * slightly negative — callers clamp if they need a hard floor
    * (clamping here would hide the estimator's variance).
    *
    * Scale shape: [[pairwiseJaccard]]'s bounded per-pair work plus two
    * joins against the #groups-sized [[distinctEstimate]] table.
    */
  def pairwiseSetAlgebra(
      sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val pj = pairwiseJaccard(sk, groupCol, k)
    val est = distinctEstimate(sk, Seq(groupCol), k)
    val ea = est.select(col(groupCol).cast("string").as("ga"),
      col("distinct_est").as("__ea"))
    val eb = est.select(col(groupCol).cast("string").as("gb"),
      col("distinct_est").as("__eb"))
    val unionEst = when(col("k_used") < k, col("k_used"))
      .otherwise(expr(s"(${k - 1}L * ${Modulus}L) div union_hk"))
    pj.join(ea, Seq("ga")).join(eb, Seq("gb"))
      .withColumn("union_est", unionEst)
      .withColumn("inter_est",
        (col("n_common") * col("union_est")).cast("double") /
          col("k_used").cast("double"))
      .select(col("ga"), col("gb"), col("k_used"), col("union_est"),
        col("inter_est"),
        (col("__ea").cast("double") - col("inter_est")).as("diff_a_est"),
        (col("__eb").cast("double") - col("inter_est")).as("diff_b_est"))
  }
}
