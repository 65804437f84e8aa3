package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick — categorical features → fixed-width sparse
  * indices without a vocabulary pass (Weinberger et al. 2009, the
  * standard featurizer of large-scale CTR models). Two surfaces:
  *
  *   - [[hashFeature]]: one categorical column → a stable bucket in
  *     `[0, dim)` no matter how many distinct values the column grows
  *     — new values at serve time need no vocab refresh, the property
  *     a [[graft.vocab.Vocabulary]] mapping cannot give;
  *   - [[hashCross]]: a CROSS of several columns → one bucket — the
  *     wide-model conjunction feature ("user segment × ad category")
  *     whose explicit vocabulary would be the product of the domains.
  *     Components are joined with the ASCII unit separator (0x1F)
  *     BEFORE hashing so `("ab","c")` and `("a","bc")` cross to
  *     different buckets; a NULL component hashes a reserved missing
  *     token rather than nulling the whole conjunction.
  *
  * The hash is [[Splits.squaredHash]] — Karp-Rabin fold squared mod
  * 2³¹−1 — NOT xxhash64: same determinism (pure function of value and
  * salt; stable across runs, retries, partitionings), but replayable
  * in any engine with 64-bit integers, which keeps hashed features
  * oracle-checkable end to end (the [[Splits]] cross-engine contract).
  * Distinct salts give independent feature spaces (multiple hash
  * functions for collision diagnostics).
  *
  * Collisions are the accepted trade (dim trades memory for collision
  * rate). [[hashSign]] provides Weinberger's ±1 signed hashing for
  * unbiased collision cancellation, read off quotient bits so it is
  * independent of the bucket for dim ≪ 2³¹.
  *
  * Scale shape: map-only codegen'd column expressions — no shuffle, no
  * vocabulary state, no driver path. Downstream sparse assembly is
  * [[graft.records.RaggedToCoo]]'s job; this operator only mints
  * indices.
  */
object FeatureHash {

  /** ASCII unit separator joining cross components unambiguously (a
    * plain "_" would alias `a_b × c` with `a × b_c`).
    */
  val Sep = ""

  /** Sentinel hashed for NULL components — distinct from the empty
    * string and from any natural value (contains 0x1F).
    */
  val NullToken = "missing"

  private def component(c: Column): Column =
    coalesce(c.cast("string"), lit(NullToken))

  /** Bucket id in `[0, dim)` for one categorical column. */
  def hashFeature(c: Column, dim: Int, salt: String = ""): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    Splits.squaredHash(component(c), salt) % dim
  }

  /** Bucket id in `[0, dim)` for the conjunction of `cols`. */
  def hashCross(cols: Seq[Column], dim: Int, salt: String = ""): Column = {
    require(cols.nonEmpty, "hashCross needs at least one column")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    Splits.squaredHash(concat_ws(Sep, cols.map(component): _*), salt) % dim
  }

  /** ±1 sign from bit 30 (the top bit) of the same squared hash —
    * disjoint from the bucket bits for any `dim` ≤ 2³⁰, so sign and
    * bucket are independent (Weinberger's signed hashing trick).
    * Replay: `(h² mod p) // 2³⁰ % 2`.
    */
  def hashSign(c: Column, salt: String = ""): Column =
    when(shiftright(Splits.squaredHash(component(c), salt), 30) % 2 === 0,
      lit(1)).otherwise(lit(-1))

  /** Convenience: append `outCol` = hashed bucket of `inCol`. */
  def withHashedFeature(
      df: DataFrame, inCol: String, outCol: String, dim: Int,
      salt: String = ""): DataFrame =
    df.withColumn(outCol, hashFeature(col(inCol), dim, salt))

  /** Convenience: append `outCol` = hashed cross of `inCols`. */
  def withHashedCross(
      df: DataFrame, inCols: Seq[String], outCol: String, dim: Int,
      salt: String = ""): DataFrame =
    df.withColumn(outCol, hashCross(inCols.map(col), dim, salt))
}
