package graft.dedup

/** LSH parameter PLANNER — turns a target Jaccard threshold into the
  * (bands, rowsPerBand) choice the MinHash pipeline needs, instead of
  * leaving it a caller-tuned magic number (the reference pipelines and
  * [[Dedup.nearDuplicates]]/[[DedupIndex.Params]] all take `bands`
  * raw; this computes the right one, the way datasketch's
  * `_optimal_param` does for its MinHashLSH).
  *
  * Theory (Leskovec, Rajaraman & Ullman, "Mining of Massive
  * Datasets" ch. 3): banding `n = b·r` MinHashes makes a pair with
  * true Jaccard `s` a candidate with probability
  * `p(s) = 1 − (1 − s^r)^b` — an S-curve stepping near `(1/b)^(1/r)`.
  * A good `(b, r)` for threshold `t` minimizes
  * `∫₀ᵗ p(s) ds` (false-positive mass: dissimilar pairs nominated)
  * `+ ∫ₜ¹ (1 − p(s)) ds` (false-negative mass: near-dups missed).
  *
  * Determinism contract (what makes this oracle-checkable rather than
  * a heuristic): both integrals are 100-interval midpoint sums, every
  * power is a LINEAR multiplication fold (never `pow`, whose libm
  * differs across engines), each midpoint term quantizes to
  * `⌊err · 2^30⌋` longs, and the per-candidate total is an exact
  * integer sum — bit-replayable in SQL with the same fold (q250).
  * The pick is the divisor pair minimizing the quantized total, ties
  * to MORE bands (cheaper verify beats cheaper banding: more bands →
  * fewer hashes per band → more candidates → the exact-Jaccard verify
  * absorbs them, while a missed near-dup is unrecoverable).
  *
  * Scale note: this runs on the DRIVER in O(divisors(n) · 100) — the
  * planning step before any corpus pass. The payoff at 100 TB is in
  * the plan it feeds: a mis-banded LSH either floods the bucket join
  * with false candidates (verify cost) or silently misses near-dups
  * (no cost signal at all — the worse failure).
  *
  * Relation to this package's defaults: [[DedupIndex.Params]] ships
  * `bands = 16` for 64 hashes, MORE bands than this planner's
  * balanced pick at typical thresholds (e.g. (4, 16) at t = 0.8) —
  * deliberately recall-heavy, because the pipeline's exact-Jaccard
  * verify + hot-bucket caps absorb false positives at bounded cost
  * while a missed near-dup has no recovery path (q14/q23 pin the
  * recall-heavy setting against the exhaustive closure). Use the
  * planner when candidate volume, not recall, is the binding
  * constraint.
  */
object LshPlan {

  /** `x^k` as a linear multiplication fold — k−1 sequential IEEE
    * multiplies, the engine-replayable power (k ≥ 1).
    */
  private[dedup] def powFold(x: Double, k: Int): Double = {
    var acc = x
    var i = 1
    while (i < k) { acc *= x; i += 1 }
    acc
  }

  final case class Candidate(
      bands: Int, rowsPerBand: Int,
      fpQ: Long, fnQ: Long) {
    def totalQ: Long = fpQ + fnQ
  }

  /** All divisor pairs `(b, r)` of `numHashes` with their quantized
    * false-positive / false-negative error masses for `threshold`.
    */
  def candidates(numHashes: Int, threshold: Double): Seq[Candidate] = {
    require(numHashes >= 1 && numHashes <= 100000,
      s"numHashes must be in [1, 100000], got $numHashes")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    val scale = (1L << 30).toDouble
    for {
      b <- 1 to numHashes
      if numHashes % b == 0
    } yield {
      val r = numHashes / b
      // 100-interval midpoint rule on [0, 1]; midpoints below the
      // threshold accumulate candidate probability (false positives),
      // the rest accumulate miss probability (false negatives)
      var fp = 0L
      var fn = 0L
      var k = 0
      while (k < 100) {
        val s = (2 * k + 1).toDouble / 200.0
        val p = 1.0 - powFold(1.0 - powFold(s, r), b)
        if (s < threshold) fp += math.floor(p * scale / 100.0).toLong
        else fn += math.floor((1.0 - p) * scale / 100.0).toLong
        k += 1
      }
      Candidate(b, r, fp, fn)
    }
  }

  /** The planned `(bands, rowsPerBand)`: minimal quantized total
    * error, ties to more bands.
    */
  def plan(numHashes: Int, threshold: Double): (Int, Int) = {
    val best = candidates(numHashes, threshold)
      .minBy(c => (c.totalQ, -c.bands))
    (best.bands, best.rowsPerBand)
  }

  /** Per-pair MISS probability at the threshold itself —
    * `(1 − t^r)^b`, the chance a true near-dup with Jaccard exactly
    * `t` is never nominated by any band. Linear multiplication folds
    * only (engine-replayable, like everything here).
    */
  def missAtThreshold(bands: Int, rowsPerBand: Int, threshold: Double): Double =
    powFold(1.0 - powFold(threshold, rowsPerBand), bands)

  /** The RECALL-BOUNDED plan — the selection rule a dedup pipeline
    * with an exact-Jaccard verify actually wants, and the one
    * [[Dedup.nearDuplicatesPlanned]] / [[DedupIndex.Params.planned]]
    * wire in. [[plan]] minimizes symmetric FP+FN mass, which is right
    * when both error kinds cost the same; in this package they do
    * NOT: a false positive is one wasted verify-join row (bounded,
    * visible cost), a false negative is a near-duplicate that
    * silently survives dedup — unrecoverable and unobservable. So:
    * among divisor pairs whose miss probability AT the threshold
    * ([[missAtThreshold]]) is ≤ `maxMiss`, pick the one with minimal
    * quantized false-positive mass (fewest wasted candidates), ties
    * to more bands. `b = numHashes, r = 1` always satisfies any
    * sensible bound (miss `(1−t)^n`), so an eligible pair exists for
    * every `t > 0`; the fallback (max recall = minimal miss, ties to
    * more bands) is kept for degenerate bounds.
    *
    * At (64, 0.9) this derives exactly the (16, 4) the pipelines
    * hand-tuned — q254 runs the planned path against q14's exhaustive
    * closure oracle, so a planner regression that loosened recall
    * fails the driver compare, not just a spec.
    */
  def planRecallBounded(
      numHashes: Int, threshold: Double,
      maxMiss: Double = 1e-6): (Int, Int) = {
    val cands = candidates(numHashes, threshold)
    val eligible = cands.filter(c =>
      missAtThreshold(c.bands, c.rowsPerBand, threshold) <= maxMiss)
    val best =
      if (eligible.nonEmpty) eligible.minBy(c => (c.fpQ, -c.bands))
      else cands.minBy(c =>
        (missAtThreshold(c.bands, c.rowsPerBand, threshold), -c.bands))
    (best.bands, best.rowsPerBand)
  }

  // ---- sign-LSH (cosine / random-hyperplane) family ----------------
  //
  // The same S-curve machinery applied to the embedding paths
  // (graft.sim.Similarity.embeddingNearDuplicates and friends): a
  // random hyperplane splits a pair with cosine similarity `s` onto
  // the same side with probability 1 − acos(s)/π (Charikar, STOC
  // 2002), so banding `n = b·r` sign bits gives candidate probability
  // 1 − (1 − pBit^r)^b with pBit = 1 − acos(s)/π — the MinHash
  // integral with one extra map. Two contract differences:
  //
  //   - the similarity domain is [−1, 1], so the error integrals run
  //     over 100 midpoints of THAT interval (anti-correlated pairs
  //     carry real false-positive mass at small r and must be priced);
  //   - pBit needs `acos`, a libm call the two engines may round a
  //     final ulp apart — so pBit is QUANTIZED to ⌊pBit · 2^20⌋ / 2^20
  //     before any fold. Every downstream operation is then IEEE
  //     arithmetic on exactly-representable dyadic rationals, and an
  //     engine mismatch requires acos to land within one ulp of a
  //     2^-20 boundary (~1e-10 per evaluation — documented residual
  //     risk, vs certain drift had `pow`/raw-acos flowed through).
  //
  // Calibration note: sign-LSH S-curves are far shallower than
  // MinHash's (pBit(0.95) ≈ 0.90, not 0.95), so per-pair miss AT the
  // threshold cannot reach 1e-6 without degenerate 1-bit bands;
  // `maxMiss` defaults to 1e-3 here and callers state what they can
  // tolerate. Same units, same selection rule, honest about the
  // family's physics.

  /** pBit(s) = 1 − acos(s)/π, quantized to 2^-20 (engine-replayable:
    * `floor((1 - acos(s) / pi()) * 1048576) / 1048576` in SQL).
    */
  private[dedup] def pBitQ20(s: Double): Double =
    math.floor((1.0 - math.acos(s) / math.Pi) * 1048576.0) / 1048576.0

  /** All divisor pairs `(b, r)` of `numBits` with quantized FP/FN
    * error masses for a COSINE threshold in (−1, 1) — [[candidates]]
    * with the sign-bit collision map and [−1, 1] midpoints.
    */
  def cosineCandidates(numBits: Int, threshold: Double): Seq[Candidate] = {
    require(numBits >= 1 && numBits <= 100000,
      s"numBits must be in [1, 100000], got $numBits")
    require(threshold > -1.0 && threshold < 1.0,
      s"cosine threshold must be in (-1, 1), got $threshold")
    val scale = (1L << 30).toDouble
    for {
      b <- 1 to numBits
      if numBits % b == 0
    } yield {
      val r = numBits / b
      var fp = 0L
      var fn = 0L
      var k = 0
      while (k < 100) {
        // midpoints of [−1, 1]: s_k = (2k + 1)/100 − 1
        val s = (2 * k + 1).toDouble / 100.0 - 1.0
        val p = 1.0 - powFold(1.0 - powFold(pBitQ20(s), r), b)
        if (s < threshold) fp += math.floor(p * scale / 100.0).toLong
        else fn += math.floor((1.0 - p) * scale / 100.0).toLong
        k += 1
      }
      Candidate(b, r, fp, fn)
    }
  }

  /** Per-pair miss probability at the cosine threshold itself:
    * `(1 − pBit(t)^r)^b` on the quantized pBit.
    */
  def missAtThresholdCosine(
      bands: Int, bitsPerBand: Int, threshold: Double): Double =
    powFold(1.0 - powFold(pBitQ20(threshold), bitsPerBand), bands)

  /** The recall-bounded sign-LSH plan `(bands, bitsPerBand)` for a
    * cosine threshold — [[planRecallBounded]]'s selection rule
    * (minimal quantized FP mass among pairs with miss ≤ `maxMiss` at
    * the threshold, ties to more bands; max-recall fallback) with the
    * cosine collision map. Consumed by
    * [[graft.sim.Similarity.embeddingNearDuplicatesPlanned]] /
    * `embeddingDedupAgainstPlanned`, which hand the pair to the
    * existing tuned pipelines as (bands, bits).
    */
  def planRecallBoundedCosine(
      numBits: Int, threshold: Double,
      maxMiss: Double = 1e-3): (Int, Int) = {
    val cands = cosineCandidates(numBits, threshold)
    val eligible = cands.filter(c =>
      missAtThresholdCosine(c.bands, c.rowsPerBand, threshold) <= maxMiss)
    val best =
      if (eligible.nonEmpty) eligible.minBy(c => (c.fpQ, -c.bands))
      else cands.minBy(c =>
        (missAtThresholdCosine(c.bands, c.rowsPerBand, threshold), -c.bands))
    (best.bands, best.rowsPerBand)
  }
}
