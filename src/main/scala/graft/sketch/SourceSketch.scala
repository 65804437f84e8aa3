package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextStats

/** Per-group mergeable MinHash sketch + group-level similarity matrix —
  * "how similar are my SOURCES to each other", at sketch cost.
  *
  * A 100 TB curation pipeline wants a corpus-composition diagnostic
  * before mixing: if two crawl sources are near-identical (mirrors,
  * re-crawls, syndication networks), their temperature weights
  * double-count the same text. Document-level near-dup (q14/q50) answers
  * "which PAIRS of documents collide"; this operator answers the
  * corpus-level question "what fraction of source A's vocabulary is
  * shared with source B" without ever joining documents against
  * documents: each group collapses to a `numHashes`-component MinHash
  * signature (an element-wise MIN — associative, commutative, mergeable
  * across partitions, batches, and days), and the similarity matrix is
  * computed over the `groups × numHashes` signature table, whose size is
  * independent of corpus size.
  *
  * Estimator: with `h_i(x) = (a_i·kr(x) + b_i) mod p` over the 31-bit
  * Mersenne prime (the [[graft.dedup.Dedup.hashParams]] affine family,
  * but over the Karp-Rabin byte fold [[graft.functions.KrHash]] rather
  * than xxhash64 — KR is engine-replayable, so the SIGNATURES themselves
  * are oracle-checkable, not just a downstream condition),
  * `P[min_A h_i = min_B h_i] = J(A, B)` and the match fraction across
  * components is the standard MinHash Jaccard estimate with standard
  * error `≈ 1/√numHashes`.
  *
  * Scale shape: one distinct-(group, token) aggregate (shuffle carries
  * distinct tokens, never documents), a map-only `numHashes`-wide hash
  * projection, and a map-side-combinable grouped MIN whose output is
  * `|groups| · numHashes` rows. The pairwise stage is quadratic in
  * |groups| BY DESIGN — that is the sketch's point: |groups|² · numHashes
  * is engine-trivial for any realistic source count, while the exact
  * |corpus|² comparison it replaces is not. Signatures persist/union
  * across ingest batches (element-wise min of two signature tables =
  * signature of the union), so the daily incremental cost is
  * batch-sized.
  */
object SourceSketch {

  private val MersennePrime = (1L << 31) - 1

  /** `(group, i, sig)` — component `i` of each group's MinHash
    * signature: `min` over the group's distinct normalized tokens of
    * `(a_i·kr(token) + b_i) mod p`. Groups whose documents yield no
    * tokens (all-NULL/empty text) emit no rows — fail-visible, and
    * exactly what the merge semantics require (min over an empty set is
    * the identity, i.e. absence).
    */
  def signatures(
      df: DataFrame, groupCol: String, textCol: String,
      numHashes: Int = 32, seed: Long = 42L): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val params = graft.dedup.Dedup.hashParams(numHashes, seed)
    val toks = df
      .select(col(groupCol).as("group"),
        explode(split(TextStats.normalize(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val kr = graft.functions.KrHash.krHash(col("token"))
    // numHashes is compile-time small: a literal column per component
    // keeps everything inside whole-stage codegen (no interpreted HOF),
    // and posexplode feeds the grouped MIN with (group, i, v) rows.
    val hashArr = array(params.map { case (a, b) =>
      pmod(kr * lit(a) + lit(b), lit(MersennePrime))
    }: _*)
    toks
      .select(col("group"), posexplode(hashArr).as(Seq("i", "v")))
      .groupBy(col("group"), col("i"))
      .agg(min(col("v")).as("sig"))
  }

  /** Merge two signature tables (element-wise min): the signature of
    * the union corpus. This is the incremental-ingest path — yesterday's
    * signatures + today's batch signatures, no re-scan of yesterday.
    */
  def mergeSignatures(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"), col("i"))
      .agg(min(col("sig")).as("sig"))

  /** Pairwise group similarity matrix from a signature table:
    * `(group_a, group_b, matches, est_jaccard)` for every unordered
    * pair (group_a < group_b), `est_jaccard = matches / numHashes`
    * (exactly one IEEE divide). Pairs where either group is absent from
    * the signature table simply don't appear.
    */
  def similarityFromSignatures(sigs: DataFrame, numHashes: Int): DataFrame = {
    val a = sigs.select(col("group").as("group_a"), col("i"), col("sig").as("sig_a"))
    val b = sigs.select(col("group").as("group_b"), col("i"), col("sig").as("sig_b"))
    a.join(b, Seq("i"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L)).as("matches"))
      .select(col("group_a"), col("group_b"), col("matches"),
        (col("matches").cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** End-to-end: corpus → source similarity matrix. */
  def similarityMatrix(
      df: DataFrame, groupCol: String, textCol: String,
      numHashes: Int = 32, seed: Long = 42L): DataFrame =
    similarityFromSignatures(
      signatures(df, groupCol, textCol, numHashes, seed), numHashes)
}
