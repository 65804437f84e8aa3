package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KrHash.krHash

/** Differentially-private count release via the geometric mechanism
  * (Ghosh, Roughgarden & Sundararajan 2009) — the integer-valued
  * discrete analogue of the Laplace mechanism, and the third leg of
  * the privacy family: [[graft.text.Redact]] scrubs values,
  * [[Anonymize]] suppresses rare rows, this releases AGGREGATES with
  * a formal guarantee. A per-key count (sensitivity 1 under
  * add/remove-one-row adjacency) plus two-sided geometric noise
  * `X − Y` with `X, Y` iid `Geometric(1 − α)` is ε-differentially
  * private for `α = e^{−ε}`.
  *
  * The noise here is PSEUDO-random on purpose — drawn from the
  * replayable Karp-Rabin hash of `(key ‖ salt)`, with `α = 2^{−s}` so
  * ε = s·ln 2 ("log2 units"): a geometric draw with
  * `P(X ≥ m) = 2^{−s·m}` is exactly `floor(ctz(h) / s)` for a
  * uniform-bits `h` (ctz = trailing-zero count). That makes every
  * release bit-reproducible across engines (q184 replays noise and
  * all in DuckDB) and across re-runs — a release pipeline that emits
  * different numbers on retry is an operational non-starter. The cost
  * is that the guarantee holds against an adversary who does NOT know
  * the salt: treat the salt like a key, rotate per release. (`h` is
  * KR mod 2^31−1, not mod a power of two, so the trailing-zero law is
  * within 2^{−31} of geometric — negligible against the mechanism's
  * own α.)
  *
  * Scale shape: one map-side-combinable `groupBy(keys).count`, then
  * map-only noise arithmetic on the (key-domain-sized) count table —
  * all codegen built-ins (`bit_count`, bitwise and), no UDF, no extra
  * shuffle. Releasing EVERY key present is itself a leak vector
  * (which keys exist is data-dependent); the standard remedies —
  * a fixed public key list or a noisy threshold — compose as a join
  * or filter on the released table.
  */
object DpCounts {

  /** floor(ctz(h²)/s): Geometric(1 − 2^{−s}) from the SQUARED hash's
    * trailing zeros, capped at 31 (values are < 2^31; P(cap) ≈ 2^{−31}).
    * The squaring (q182's protocol) is load-bearing: KR is a linear
    * polynomial fold, so two same-length inputs hash to `h` and
    * `h + D` for a CONSTANT odd `D` — their raw low bits are perfectly
    * anti-correlated and the X−Y noise could never be 0. `h² mod p` is
    * nonlinear in `h`, which decorrelates the draws (the
    * P(noise=0)=1/3 law is pinned in DpCountsSpec).
    */
  private def geomDraw(h: Column, s: Int): Column = {
    val h2 = pmod(h * h, lit(2147483647L))
    val ctz = when(h2 === 0L, lit(31L))
      .otherwise(least(bit_count(h2.bitwiseAND(-h2) - 1).cast("long"), lit(31L)))
    floor(ctz / lit(s)).cast("long")
  }

  /** The a/b draw tags PREFIX the hash input: KR is a polynomial fold,
    * so inputs differing only in the LAST byte hash to `h` and `h+1` —
    * perfectly anti-correlated trailing zeros (X=0 ⟺ Y≥1, noise never
    * 0). A leading tag is multiplied through every subsequent step and
    * decorrelates the draws (DpCountsSpec pins the P(noise=0)=1/3 law).
    */
  private def noiseFor(keyStr: Column, salt: String, s: Int): Column = {
    val x = geomDraw(krHash(concat(lit(s"a:$salt:"), keyStr)), s)
    val y = geomDraw(krHash(concat(lit(s"b:$salt:"), keyStr)), s)
    x - y
  }

  /** Per-key-group audit table `(keys…, n, noise, noisy_n)` — what a
    * privacy review inspects. NOT for release: it carries the true
    * counts.
    */
  def audit(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String,
      epsilonLog2Units: Int): DataFrame = {
    require(keyCols.nonEmpty, "audit needs at least one key column")
    require(epsilonLog2Units >= 1,
      s"epsilonLog2Units must be >= 1, got $epsilonLog2Units")
    val keyStr = concat_ws(":", keyCols.map(c => col(c).cast("string")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", noiseFor(keyStr, salt, epsilonLog2Units))
      .withColumn("noisy_n", col("n") + col("noise"))
  }

  /** The release form: `(keys…, noisy_n)` with ε = epsilonLog2Units·ln 2
    * per count. `clampNonNegative` post-processes negatives to 0
    * (post-processing preserves the guarantee).
    */
  def noisyCounts(
      df: DataFrame,
      keyCols: Seq[String],
      salt: String,
      epsilonLog2Units: Int,
      clampNonNegative: Boolean = false): DataFrame = {
    val a = audit(df, keyCols, salt, epsilonLog2Units)
    val released =
      if (clampNonNegative) greatest(col("noisy_n"), lit(0L)).as("noisy_n")
      else col("noisy_n").as("noisy_n")
    a.select(keyCols.map(col) :+ released: _*)
  }
}
