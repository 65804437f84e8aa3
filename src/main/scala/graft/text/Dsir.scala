package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — hashed n-gram importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every raw-corpus document by how
  * much more likely its hashed n-gram bag is under a target corpus's
  * bucket distribution than under the raw corpus's own, then keep the
  * top-k. The standard recipe for "select web data that looks like
  * Wikipedia/books" curation.
  *
  * Published form: features are word 1..2-grams hashed into `buckets`
  * buckets; bucket probabilities are Laplace-smoothed occurrence
  * frequencies; a document's log-importance weight is
  * `Σ_b c_b · (log p_target[b] − log p_raw[b])`.
  *
  * The engine's twist — NO FLOATING POINT ANYWHERE: `log` of a
  * smoothed ratio is the one transcendental in the pipeline, and
  * IEEE `log` is not guaranteed correctly rounded, so two engines can
  * disagree in the last ulp and flip a ranking. Instead each bucket's
  * ratio is an exact integer `s = ⌊2^20 · (n_t+1)(N_r+B) /
  * ((n_r+1)(N_t+B))⌋` and its log2 is computed by the classic integer
  * square-and-shift algorithm in Q20 fixed point (20 squarings, only
  * integer multiply/shift/compare — bit-identical in any engine;
  * DuckDB replays it as a recursive CTE). Document scores are then
  * INTEGER sums of per-occurrence bucket scores: exact,
  * order-independent, hash-reproducible. log2 instead of ln is a
  * constant positive factor — rankings are unchanged.
  *
  * Scale shape: one map-only explode+hash per corpus; two B-row
  * aggregates (map-side combinable; B is a few thousand — the bucket
  * table collects to the driver under the same bounded-collect
  * contract as IVF centroids and k-means sums); scoring is one
  * broadcast join of the B-row table against the raw corpus's gram
  * rows plus a map-combinable integer sum per document. Nothing
  * corpus-quadratic; the only corpus-sized shuffle is the per-document
  * sum keyed by id.
  *
  * Overflow contract: exact while `(max_b n_t[b] + 1) · (N_r + B) ·
  * 2^20 < 2^63` (checked, fail-fast). For corpora beyond ~2^21 total
  * occurrences per side, pre-scale both sides' counts by the same
  * power of two before fitting — ratios, and therefore scores, are
  * unchanged.
  */
object Dsir {

  /** Q20 fixed point: 2^20. */
  val Scale: Long = 1L << 20

  /** One row per n-gram OCCURRENCE (n = 1..maxN over whitespace tokens
    * of the normalized text, empty tokens dropped), bucketed by the
    * cross-engine-replayable [[graft.functions.KrHash]] mod `buckets`:
    * (id, bucket).
    */
  def hashedGrams(
      df: DataFrame, idCol: String, textCol: String,
      maxN: Int, buckets: Int): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = filter(
      TextStats.tokens(TextStats.normalize(col(textCol))), t => t =!= "")
    val grams = TextStats.bindOnce(toks) { ts =>
      concat((1 to maxN).map(n => Repetition.ngrams(ts, n)): _*)
    }
    df.select(col(idCol), explode(grams).as("__gram"))
      .select(col(idCol),
        pmod(graft.functions.KrHash.krHash(col("__gram")), lit(buckets.toLong))
          .cast("int").as("bucket"))
  }

  /** ⌊2^20 · log2(s / 2^20)⌋ for a positive Q20 fixed-point integer
    * `s`, via 20 square-and-shift rounds — pure integer arithmetic,
    * bit-identical to the oracle's recursive-CTE replay.
    */
  def ilog2Q20(sRaw: Long): Long = {
    val s = math.max(sRaw, 1L) // clamp: ratios below 2^-20 floor to it
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(s)
    var m = if (bl >= 21) s >> (bl - 21) else s << (21 - bl)
    var frac = 0L
    var i = 0
    while (i < 20) {
      m = (m * m) >> 20
      frac <<= 1
      if (m >= (1L << 21)) { m >>= 1; frac |= 1L }
      i += 1
    }
    // S = m0 · 2^(bl-21) with m0 ∈ [2^20, 2^21), so
    // log2(S / 2^20) = (bl - 21) + (log2(m0) - 20) = (bl - 21) + frac/2^20
    (bl - 21L) * Scale + frac
  }

  /** Bounded bucket-count collect: at most `buckets` rows. */
  private def bucketCounts(grams: DataFrame): (Map[Int, Long], Long) = {
    val rows = grams
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (rows, rows.valuesIterator.sum)
  }

  /** The Q20 score table from precomputed side counts. */
  private def scoreTable(
      tc: Map[Int, Long], nt: Long, rc: Map[Int, Long], nr: Long,
      buckets: Int): Seq[(Int, Long)] = {
    val b = buckets.toLong
    val maxNt = if (tc.isEmpty) 0L else tc.valuesIterator.max
    require((maxNt + 1) <= Long.MaxValue / (nr + b) / Scale,
      s"bucket counts too large for exact Q20 arithmetic " +
        s"(max target bucket $maxNt, raw total $nr); " +
        "pre-scale both sides' corpora or reduce them by the same factor")
    (0 until buckets).map { i =>
      val s = (tc.getOrElse(i, 0L) + 1L) * (nr + b) * Scale /
        ((rc.getOrElse(i, 0L) + 1L) * (nt + b))
      i -> ilog2Q20(s)
    }
  }

  /** The B-row bucket score table: `(bucket, l)` with
    * `l = ilog2Q20(⌊2^20 (n_t+1)(N_r+B) / ((n_r+1)(N_t+B))⌋)` — the
    * Q20 integer log2 of the smoothed target/raw probability ratio.
    * Driver-side over two bounded B-row collects.
    */
  def bucketScores(
      target: DataFrame, raw: DataFrame,
      idCol: String, textCol: String,
      maxN: Int, buckets: Int): Seq[(Int, Long)] = {
    val (tc, nt) = bucketCounts(hashedGrams(target, idCol, textCol, maxN, buckets))
    val (rc, nr) = bucketCounts(hashedGrams(raw, idCol, textCol, maxN, buckets))
    scoreTable(tc, nt, rc, nr, buckets)
  }

  /** (id, score) for every raw document with at least one n-gram:
    * the exact integer sum of its occurrences' bucket scores. Higher
    * means more target-like.
    *
    * The RAW side's hashed-gram table (tokenize + n-gram + hash over
    * the big corpus) feeds both the bucket-count collect and the score
    * join — persisted so the derivation runs once, and the narrow
    * (id, score) result is checkpointed so the cache releases before
    * returning (the shared materialize contract; the target side is
    * derived once regardless).
    */
  def importanceScores(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame,
      maxN: Int = 2, buckets: Int = 4096): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val rawGrams = hashedGrams(raw, idCol, textCol, maxN, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (tc, nt) = bucketCounts(
        hashedGrams(target, idCol, textCol, maxN, buckets))
      val (rc, nr) = bucketCounts(rawGrams)
      val table = scoreTable(tc, nt, rc, nr, buckets).toDF("bucket", "__l")
      rawGrams
        .join(broadcast(table), Seq("bucket"))
        .groupBy(col(idCol))
        .agg(sum(col("__l")).as("score"))
        .localCheckpoint(true)
    } finally rawGrams.unpersist()
  }

  /** The `k` most target-like raw documents, ties toward the smaller
    * id — the deterministic top-k variant of DSIR's resampling step
    * (the paper's Gumbel-noise variant needs `log(-log(u))`, which is
    * exactly the cross-engine transcendental this module exists to
    * avoid; callers wanting diversity can salt the tie-break).
    */
  def selectTopK(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, k: Int,
      maxN: Int = 2, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    importanceScores(raw, idCol, textCol, target, maxN, buckets)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
