package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test splitting — the standard
  * curation-pipeline step that must be STABLE across reruns, engines
  * and data layouts: a row's split may depend only on its key (and an
  * explicit salt), never on partitioning, row order, or a seeded RNG
  * stream (Spark's `rand(seed)` is partition-dependent and therefore
  * not reproducible across repartitions).
  *
  * The assignment hashes `key[:salt]` with [[graft.functions.KrHash]]
  * (Karp-Rabin fold mod 2^31−1 — chosen over xxhash64/crc32 because
  * any engine with a list fold can replay it; see KrHash's doc), takes
  * `hash mod buckets`, and maps cumulative-weight bucket ranges to
  * split names. Changing the salt re-rolls the whole assignment
  * (standard trick for fresh holdouts); adding a split or refining
  * weights moves only the rows whose buckets change hands.
  *
  * Scale shape: map-only — one codegen'd projection over the scan, no
  * shuffle, no driver state. The split column is a plain string column
  * usable directly as a partition column for a split-partitioned sink.
  */
object Splits {

  /** `df` plus `outCol`: the split name for each row.
    *
    * @param splits  (name, weight) in declaration order; weights must
    *                sum to 1 (±1e-9). Bucket thresholds are
    *                `round(cumWeight · buckets)`, so with the default
    *                10 000 buckets weights are honored to 0.01%.
    * @param salt    appended to the key as `key + ":" + salt` when
    *                non-empty — distinct salts give independent splits.
    */
  def withSplit(
      df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: String = "", buckets: Int = 10000,
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0.0), s"negative split weight in $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names in $splits")
    require(buckets >= splits.size, s"need buckets >= ${splits.size}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split weights must sum to 1, got $total")

    val bucket = bucketOf(col(keyCol), salt, buckets)
    // cumulative thresholds; the last is forced to `buckets` so the
    // union of ranges covers every bucket despite rounding
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cum.init.map(w => math.round(w * buckets)) :+ buckets.toLong
    val assignment = splits.map(_._1).zip(thresholds)
      .foldLeft(Option.empty[Column]) { case (acc, (name, t)) =>
        Some(acc match {
          case None => when(bucket < t, name)
          case Some(c) => c.when(bucket < t, name)
        })
      }.get.otherwise(splits.last._1) // unreachable: last t = buckets
    df.withColumn(outCol, assignment)
  }

  /** `(kr_hash(key[:salt])² mod p) mod buckets` — the replayable bucket
    * id in `[0, buckets)`. Exposed for callers that want raw buckets
    * (e.g. percentage subsampling: `bucketOf(...) < 100` is a stable 1%).
    *
    * The squaring is load-bearing: a Karp-Rabin hash is LINEAR in the
    * message, so two salts differing in the trailing byte shift every
    * key's hash by the same constant — `h mod buckets` would move
    * (almost) no key across splits when the salt changes. Squaring mod
    * p makes the inter-salt difference key-dependent (`2h+Δ` instead of
    * `Δ`), giving independent assignments, and stays a one-liner in any
    * engine with 64-bit integers (h < 2^31 so h² < 2^62 never
    * overflows). SplitsSpec pins the independence property.
    */
  def bucketOf(key: Column, salt: String, buckets: Int): Column = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    squaredHash(key, salt) % buckets
  }

  /** `kr_hash(key[:salt])² mod p` — the salt-mixed 31-bit value both
    * [[bucketOf]] and [[FeatureHash]] reduce; exposed private[graft] so
    * every replayable-hash consumer shares one definition.
    */
  private[graft] def squaredHash(key: Column, salt: String): Column = {
    val keyed =
      if (salt.isEmpty) key.cast("string")
      else concat(key.cast("string"), lit(":" + salt))
    val h = graft.functions.KrHash.krHash(keyed)
    (h * h) % KrPrime
  }

  private val KrPrime = (1L << 31) - 1

  /** Stable fractional sample: keeps `fraction` of rows by key bucket —
    * unlike `df.sample`, membership is a pure function of (key, salt),
    * so reruns, retries and different partitionings select the SAME
    * rows, and samples with different salts are independent. The
    * standard tool for reproducible eval subsets and A/B corpus
    * slices. Map-only.
    */
  def stableSample(
      df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "", buckets: Int = 1000000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    df.filter(bucketOf(col(keyCol), salt, buckets) <
      math.round(fraction * buckets))
  }

  /** EXACT-count split: per stratum, split `i` receives exactly
    * `⌊n·cumW_i/W⌋ − ⌊n·cumW_{i−1}/W⌋` rows (`n` = stratum size, `W` =
    * Σ weights) — unlike [[withSplit]], whose per-bucket assignment
    * only honors fractions in expectation (a 500-doc domain can hand
    * its "10%" eval split 9.2% of rows). The standard use is exact
    * eval/holdout sizing per domain, where an undersized eval set
    * quietly widens confidence intervals.
    *
    * Rows are ranked inside each stratum by (salted [[bucketOf]] hash,
    * id) — a pure function of (id, salt), so reruns, retries, and any
    * repartitioning assign every row the SAME split, and distinct
    * salts give independent assignments (the [[withSplit]] contract).
    * Cumulative-floor thresholds mean the union of ranges covers every
    * row and adding weight to one split moves only boundary rows.
    * All-integer weights ⇒ thresholds are exact and engine-replayable
    * as `row_number() OVER (PARTITION BY stratum ORDER BY bucket, id)
    * ≤ n·cumW_i // W` (q82).
    *
    * Ids must be integral, non-NULL (raises — a silent drop would bias
    * the split) and unique within a stratum (duplicate ids would
    * multiply rows through the restore join). NULL strata form their
    * own group, consistent with window partitioning.
    *
    * Scale shape: the ranking window sorts a PROJECTED (stratum, id,
    * bucket) table — document text never rides the sort shuffle — then
    * one equi-join on the unique id restores full rows (the
    * [[Sampling.sampleExactK]] join-back shape). The per-stratum sort
    * is inherent: exact counts need a total order, which is why
    * [[withSplit]] (map-only) stays the right tool when expectation-
    * level fractions suffice.
    */
  def splitExactCounts(
      df: DataFrame, stratumCol: String, idCol: String,
      splits: Seq[(String, Long)], salt: String = "",
      outCol: String = "split", ordBuckets: Int = 1 << 20): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0L), s"split weights must be > 0: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names in $splits")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val w = splits.map(_._2).sum
    require(splits.forall(_._2 <= Long.MaxValue / splits.size),
      s"split weights overflow: $splits")
    val guardedId =
      when(col(idCol).isNull,
        raise_error(lit(s"splitExactCounts: NULL $idCol — ids must be non-NULL")))
        .otherwise(col(idCol).cast("long"))
    val spec = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
    val ranked = df
      .select(col(stratumCol), guardedId.as("__id"),
        bucketOf(col(idCol), salt, ordBuckets).as("__bk"))
      .withColumn("__rn",
        row_number().over(spec.orderBy(col("__bk"), col("__id"))))
      .withColumn("__n", count(lit(1)).over(spec))
      // n ≤ Long.Max/W proves n·cumW never overflows the threshold
      // arithmetic below — fail loud, not silently misassign
      .withColumn("__n",
        when(col("__n") > Long.MaxValue / w,
          raise_error(concat(
            lit(s"splitExactCounts: stratum size exceeds the exact-" +
              s"threshold ceiling of ${Long.MaxValue / w} for total " +
              s"weight $w, got "), col("__n").cast("string"))))
          .otherwise(col("__n")))
    val cum = splits.map(_._2).scanLeft(0L)(_ + _).tail
    val assignment = splits.map(_._1).zip(cum)
      .foldLeft(Option.empty[Column]) { case (acc, (name, cw)) =>
        val cond = col("__rn") <= expr(s"(__n * ${cw}L) div ${w}L")
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }.get
    val picked = ranked.select(
      col(stratumCol).as("__ss"), col("__id").as("__sel_id"),
      assignment.as(outCol))
    df.join(picked,
        col(stratumCol) <=> col("__ss") &&
          col(idCol).cast("long") === col("__sel_id"))
      .select((df.columns.map(col).toIndexedSeq :+ col(outCol)): _*)
  }

  /** Temporal train/test split with an EMBARGO gap — the time-series
    * leakage guard [[withSplit]]'s hash split cannot give (a model
    * evaluated on events interleaved with its training window reads
    * the future through autocorrelation; the purged-split recipe from
    * financial ML, de Prado 2018 ch. 7): rows strictly before
    * `cutoff − embargo` are `train`, rows at/after `cutoff` are
    * `test`, and the `embargo` rows in between are labeled — not
    * silently dropped — so the caller decides their fate visibly and
    * audits the gap's size. Pure per-row function of the timestamp:
    * map-only, deterministic, layout-independent. NULL timestamps
    * raise (an unplaceable row in a leakage control is a data bug).
    *
    * `cutoffTs` and `embargoSeconds` are interpreted in epoch seconds
    * of the timestamp column's instant.
    */
  def withTemporalEmbargo(
      df: DataFrame, tsCol: String, cutoffTs: java.time.Instant,
      embargoSeconds: Long, outCol: String = "split"): DataFrame = {
    require(embargoSeconds >= 0,
      s"embargo must be >= 0 seconds, got $embargoSeconds")
    require(!df.columns.contains(outCol),
      s"column $outCol already exists on the input")
    val cut = cutoffTs.getEpochSecond
    // Cast FIRST, raise on the null RESULT: unix_timestamp returns
    // NULL both for a NULL input and for an unparseable string, and
    // either is an unplaceable row in a leakage control — letting it
    // fall through both when-branches would silently label it
    // "embargo" (same cast-to-null-escapes-guard class fixed in
    // KCore/Communities/GreedyCoverage).
    val parsed = unix_timestamp(col(tsCol))
    val ts = when(parsed.isNull, raise_error(lit(
      s"withTemporalEmbargo: NULL or unparseable $tsCol — an " +
        "unplaceable row in a leakage control is a data bug; drop " +
        "or fix explicitly")))
      .otherwise(parsed)
    df.withColumn(outCol,
      when(ts < cut - embargoSeconds, "train")
        .when(ts >= cut, "test")
        .otherwise("embargo"))
  }
}
