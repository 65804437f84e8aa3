package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, Flajolet et al. 2007)
  * with *exact-integer* registers, for the 100 TB dashboard problem:
  * "distinct tokens / users / URLs per source, per day, per shard" where
  * an exact `COUNT(DISTINCT)` would shuffle every distinct value.
  *
  * The sketch table is at most `groups × m` rows (`m = 2^p` buckets per
  * group), each row `(group…, bucket, rho)` with `rho` = the max
  * leading-zero rank ever observed in that bucket. Two properties make
  * this the scale shape:
  *
  *   - **the shuffle carries buckets, not values**: `groupBy(group,
  *     bucket).agg(max(rho))` partial-aggregates map-side, so per
  *     partition at most `groups × m` rows move regardless of row count;
  *   - **sketches merge by `max`**, which is associative, commutative and
  *     idempotent — per-shard / per-day sketch tables union and
  *     re-`max` without touching the data again ([[merge]]), the same
  *     lifecycle as the IVF / dedup index appends. A year of daily
  *     sketches rolls up in `365 × groups × m` rows.
  *
  * Everything is deterministic and integer-exact, so DuckDB replays the
  * whole pipeline bit-for-bit (oracle q101): the 60-bit hash is the
  * md5-prefix hash shared with q69's SimHash oracle, `rho` comes from
  * binary string length (never a float log), and the register sum is the
  * scaled integer `S = Σ_b 2^(R − rho_b)` (`R = w + 1`, so `Σ 2^−rho =
  * S / 2^R` with no rounding). The only IEEE arithmetic is the final
  * estimate `α_m · m² · 2^R / S`, a fixed left-associated op chain both
  * engines evaluate identically.
  *
  * The raw estimator is biased below ~2.5·m distinct values; the
  * [[estimate]] output carries `v_zero` (untouched buckets) so callers
  * can apply linear counting (`m · ln(m/v)`) when `v_zero > 0` — kept
  * out of the operator because `ln` is not bit-replayable across
  * engines and the correction is a driver-side scalar decision.
  */
object Hll {

  /** Total hash width in bits: 15 hex chars of md5 = 60 bits, the same
    * `conv(substring(md5(x), 1, 15), 16, 10)` hash the SimHash and
    * edit-distance oracles replay in DuckDB as `('0x' || substr(md5(x),
    * 1, 15))::BIGINT`.
    */
  val HashBits = 60

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  /** 60-bit non-negative hash of a (string) column. */
  def hash60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Per-(group, bucket) max-rank sketch over `value` rows.
    *
    * `bucket` = top `p` hash bits; `rho` = 1 + leading zeros of the
    * remaining `w = 60 − p` bits (so `rho ∈ [1, w+1]`), computed as
    * `R − length(bin(rest))` — exact integer bit-length, no floating
    * log2 whose boundary rounding could mis-bucket a power of two.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], value: Column, p: Int): DataFrame = {
    checkP(p)
    val w = HashBits - p
    val r = w + 1
    val rest = hash60(value).bitwiseAND(lit((1L << w) - 1))
    val rho = when(rest === 0, lit(r))
      .otherwise(lit(r) - length(bin(rest)))
    df.select(
        (groupCols.map(col) :+
          shiftright(hash60(value), w).cast("int").as("bucket") :+
          rho.cast("int").as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge sketch tables (same `groupCols`, same `p`): union + re-max.
    * Because `max` is idempotent, merging a sketch with itself — or a
    * day's sketch into a running total, in any order — is safe.
    */
  def merge(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Collapse a sketch to one row per group:
    * `v_zero` untouched buckets, the exact scaled register sum
    * `s_scaled = Σ_b 2^(R − rho_b)` (untouched buckets contribute
    * `2^R`, i.e. `rho = 0`; max `m · 2^R ≤ 2^(61)` for p ≥ 4 — no
    * overflow), and the raw HLL estimate
    * `est = α_m · m · m · 2^R / s_scaled` with
    * `α_m = 0.7213 / (1 + 1.079 / m)` (the m ≥ 128 constant).
    */
  def estimate(sketchDf: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    checkP(p)
    val m = 1 << p
    val r = HashBits - p + 1
    val p2r = expr(s"shiftleft(CAST(1 AS BIGINT), $r)")
    val perGroup = sketchDf
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $r - rho)")).as("__sp"))
    val vZero = (lit(m) - col("__nb")).cast("long")
    val sScaled = col("__sp") + vZero * p2r
    // Fixed left-associated IEEE chain — DuckDB replays it verbatim
    // (literals CAST AS DOUBLE there; DuckDB decimals would differ).
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val est = alpha * lit(m.toDouble) * lit(m.toDouble) *
      lit((1L << r).toDouble) / sScaled.cast("double")
    perGroup.select(
      (groupCols.map(col) :+
        vZero.as("v_zero") :+
        sScaled.as("s_scaled") :+
        est.as("est_distinct")): _*)
  }

  /** One-shot convenience: sketch + estimate. */
  def distinctEstimate(
      df: DataFrame, groupCols: Seq[String], value: Column, p: Int): DataFrame =
    estimate(sketch(df, groupCols, value, p), groupCols, p)
}
