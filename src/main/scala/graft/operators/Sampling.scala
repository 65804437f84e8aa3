package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified weighted sampling.
  *
  * Re-expresses the reference's sampling operators
  * (`ml_hadoop_experiment/tensorflow/sampling.py:10-98`) as pure Catalyst
  * column algebra: one pipelined Filter + Project over the input scan, no
  * shuffle, no UDF. At 100 TB this runs as a single map-only pass with the
  * sampling predicate eligible for whole-stage codegen; when the positive
  * predicate references only scan columns Catalyst pushes the residual
  * filter into the parquet reader.
  *
  * Semantics (locked by the reference's test matrix,
  * `tests/tensorflow/test_sampling.py:11-111`):
  *   - entropy source: non-deterministic `rand()` or deterministic
  *     `hash(cols)` mapped affinely from [-2^31, 2^31) to [0, 1);
  *   - effective rates: `gp = global * positive`, `gn = global * negative`;
  *   - trivial predicates constant-folded up front (ratio <= 0 -> false,
  *     >= 1 -> true) so Catalyst prunes the filter node entirely;
  *   - a row with a NULL class predicate counts as negative;
  *   - kept rows are reweighted *relatively*: `weight *= max(gp,gn)/gp` for
  *     positives else `max(gp,gn)/gn`; a missing weight column is created
  *     at 1.0.
  */
object Sampling {

  /** Mirrors `ml_hadoop_experiment/tensorflow/constant.py:1`. */
  val WeightColumnName = "weight"

  /** Non-deterministic Bernoulli entropy column (reference `sampling.py:10-11`). */
  def addRandomSamplingCol(df: DataFrame): (String, DataFrame) =
    ("sampling_rand", df.withColumn("sampling_rand", rand()))

  /** Deterministic entropy: Murmur3 `hash` of the given columns is uniform on
    * the full Int range; `0.5 + h / 2^32` maps it to [0, 1). Rows equal on
    * the entropy columns sample together (reference `sampling.py:15-23`).
    */
  def addDeterministicSamplingCol(df: DataFrame, columnsForSample: Seq[String]): (String, DataFrame) = {
    val h = hash(columnsForSample.map(df(_)): _*)
    ("sampling_hash",
      df.withColumn("sampling_hash", lit(0.5) + h.cast("double") / lit(math.pow(2, 32))))
  }

  /** Trivial-predicate simplification (reference `sampling.py:27-34`):
    * ratio <= 0 -> false, ratio >= 1 -> true, else `col < ratio`.
    */
  def filterForSamplingRatio(samplingCol: Column, ratio: Double): Column =
    if (ratio <= 0.0) lit(false)
    else if (ratio >= 1.0) lit(true)
    else samplingCol < ratio

  /** Single-pass stratified sampler (reference `sampling.py:37-98`).
    *
    * @param samplingColOverride name of a pre-existing uniform-[0,1) column
    *        to use as the entropy source instead of rand()/hash(). Mirrors
    *        the reference tests' injection of `sampling_hash` and keeps the
    *        operator oracle-testable with engine-independent entropy.
    */
  def sampleWithPredicate(
      df: DataFrame,
      globalSampling: Double,
      positiveSampling: Double,
      negativeSampling: Double,
      positivePredicate: Column,
      columnsForSample: Seq[String] = Nil,
      samplingColOverride: Option[String] = None): DataFrame = {

    val (samplingCol, withEntropy) = samplingColOverride match {
      case Some(c) => (c, df)
      case None if columnsForSample.isEmpty => addRandomSamplingCol(df)
      case None => addDeterministicSamplingCol(df, columnsForSample)
    }

    val globalPos = globalSampling * positiveSampling
    val globalNeg = globalSampling * negativeSampling
    val maxSampling = math.max(globalPos, globalNeg)

    val posFilter = filterForSamplingRatio(withEntropy(samplingCol), globalPos)
    val negFilter = filterForSamplingRatio(withEntropy(samplingCol), globalNeg)

    // NULL predicate (e.g. null label) counts as negative — same guard as
    // the reference's prediction path (`sampling.py:76-78`).
    val posPred = positivePredicate && positivePredicate.isNotNull
    val filtered = withEntropy.filter((posPred && posFilter) || (!posPred && negFilter))

    val weightCol =
      if (filtered.columns.contains(WeightColumnName)) filtered(WeightColumnName)
      else lit(1.0)

    filtered.withColumn(
      WeightColumnName,
      when(positivePredicate, weightCol * maxSampling / globalPos)
        .otherwise(weightCol * maxSampling / globalNeg))
  }

  /** EXACT-size uniform sample without replacement, per stratum:
    * exactly `min(k, |stratum|)` rows from each stratum — the "give me
    * precisely 10k eval docs per language" contract that rate-based
    * samplers ([[sampleWithPredicate]], [[Splits.stableSample]]) only
    * hit in expectation. Selection keeps the k smallest rows in the
    * salted Karp-Rabin hash order of their id (ties broken by id), so
    * the sample is a deterministic pure function of (ids, k, salt):
    * reruns, retries and repartitionings select the SAME rows, distinct
    * salts draw independent samples, and any engine can replay the
    * selection as `row_number() OVER (PARTITION BY stratum ORDER BY
    * bucket, id) <= k` (q75).
    *
    * Scale shape — why this is not a `row_number` window: a window
    * shuffles EVERY row to its stratum's partition and sorts the full
    * stratum (the whole corpus moves, and one giant stratum = one giant
    * sort). Here the per-stratum k-smallest runs as a bounded-heap
    * AGGREGATE ([[graft.sim.TopKAggregator]], O(k) state): the partial
    * aggregate truncates to k per stratum per input partition BEFORE
    * the shuffle, so the shuffle carries at most k · |strata| ·
    * #partitions (id, bucket) pairs — never rows, never text. One
    * equi-join on the unique id brings the winners' full rows back
    * (the selected-id table is ≤ k·|strata| rows; AQE broadcasts it
    * when small).
    *
    * Ids must be integral and non-NULL (a NULL id raises — a silent
    * drop would bias the sample).
    */
  def sampleExactK(
      df: DataFrame, stratumCol: String, idCol: String, k: Int,
      salt: String = "", ordBuckets: Int = 1 << 20): DataFrame = {
    require(k > 0, s"k must be >= 1, got $k")
    val topK = graft.sim.TopKAggregator.udafFor(k)
    val guardedId =
      when(col(idCol).isNull,
        raise_error(lit(s"sampleExactK: NULL $idCol — ids must be non-NULL")))
        .otherwise(col(idCol).cast("long"))
    // negated bucket: TopKAggregator keeps (score DESC, id ASC), so
    // -bucket makes it "k smallest buckets, ties to the smaller id" —
    // exactly ORDER BY bucket, id. Buckets < 2^20 are exact in double.
    val keyed = df.select(
      col(stratumCol),
      guardedId.as("__id"),
      negate(Splits.bucketOf(col(idCol), salt, ordBuckets).cast("double"))
        .as("__score"))
    val picked = keyed
      .groupBy(col(stratumCol))
      .agg(topK(col("__id"), col("__score")).as("__top"))
      .select(col(stratumCol).as("__ss"), explode(col("__top")).as("__t"))
      .select(col("__ss"), col("__t").getField("id").as("__sel_id"))
    df.join(picked,
        col(stratumCol) <=> col("__ss") &&
          col(idCol).cast("long") === col("__sel_id"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Best-k selection per stratum: the `min(k, |stratum|)` HIGHEST-
    * scoring rows from each stratum (ties to the smaller id) — the
    * "keep the 10k highest-quality documents per domain" curation
    * step, [[sampleExactK]]'s score-ordered sibling (that one ranks by
    * a hash, this one by a caller-supplied quality/relevance score).
    * Same engine shape: a bounded-heap partial+final aggregate
    * ([[graft.sim.TopKAggregator]]) so each input partition forwards
    * at most k (id, score) pairs per stratum — never a full-stratum
    * window sort — then one equi-join on the unique id restores the
    * winners' rows. Deterministic (score, id) total order ⇒ replayable
    * as `row_number() OVER (PARTITION BY stratum ORDER BY score DESC,
    * id) <= k` (q77).
    *
    * NULL and NaN scores raise: NULL has no rank, and NaN would
    * silently outrank every real score (IEEE total order puts it on
    * top) — either way a quietly biased selection.
    */
  /** Deterministic systematic PPS (probability-proportional-to-size)
    * sampling with an exact multiplicity column — "pick ~k documents
    * per domain, preferring the longer / higher-quality ones, the same
    * ones on every rerun". Classic use: weighted corpus subsampling
    * (weight = token count or a quality score quantized to an integer)
    * and deterministic importance RESAMPLING (the multiplicity column
    * says how many copies a heavy row earns).
    *
    * Semantics (all-integer, engine-replayable — q84): within each
    * stratum, rows are ordered by (salted [[Splits.bucketOf]] hash,
    * id); with `c_i` the cumulative weight and `W` the stratum total,
    * row i receives `n_picks = ⌊c_i·k/W⌋ − ⌊c_{i−1}·k/W⌋` — the count
    * of the k systematic pick-points `{⌈W/k⌉-spaced positions}` falling
    * in its weight interval. Exactly k picks are distributed per
    * stratum (Σ n_picks = k); rows with `n_picks = 0` are dropped, a
    * row with weight > W/k can absorb several picks (the certainty
    * units of PPS theory). Selection probability is exactly
    * proportional to weight for weights ≤ W/k, and the whole
    * assignment is a pure function of (ids, weights, salt) —
    * layout-independent, rerun-stable, replayable as two window
    * functions.
    *
    * Weights must be non-NULL, ≥ 0 and integral (raise otherwise);
    * zero-weight rows are never picked but do not perturb others. Ids
    * integral, non-NULL, unique per stratum (the join-back contract of
    * [[sampleExactK]]). NULL strata form their own group.
    *
    * Scale shape: the cumulative-weight window runs over a PROJECTED
    * (stratum, id, weight, bucket) table — row payloads never ride the
    * sort shuffle — then one equi-join on the unique id restores the
    * picked rows. The per-stratum sort is inherent to systematic
    * sampling's total order.
    */
  def samplePps(
      df: DataFrame, stratumCol: String, idCol: String, weightCol: String,
      k: Int, salt: String = "", outCol: String = "n_picks",
      ordBuckets: Int = 1 << 20): DataFrame = {
    require(k > 0, s"k must be >= 1, got $k")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val guardedId =
      when(col(idCol).isNull,
        raise_error(lit(s"samplePps: NULL $idCol — ids must be non-NULL")))
        .otherwise(col(idCol).cast("long"))
    val w = col(weightCol).cast("long")
    val guardedW =
      when(w.isNull || w < 0L,
        raise_error(concat(
          lit(s"samplePps: $weightCol must be a non-negative integer, got "),
          coalesce(col(weightCol).cast("string"), lit("NULL")))))
        .otherwise(w)
    val spec = Window.partitionBy(col(stratumCol))
    val ordered = spec.orderBy(col("__bk"), col("__id"))
    val ranked = df
      .select(col(stratumCol), guardedId.as("__id"), guardedW.as("__w"),
        Splits.bucketOf(col(idCol), salt, ordBuckets).as("__bk"))
      .withColumn("__c", sum(col("__w")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(spec))
      // W ≤ Long.Max/k proves c·k never overflows the pick arithmetic;
      // W ≥ 1 rules out the all-zero stratum (no pick-points exist)
      .withColumn("__tot",
        when(col("__tot") > Long.MaxValue / k,
          raise_error(concat(
            lit(s"samplePps: stratum weight exceeds the exact-pick " +
              s"ceiling of ${Long.MaxValue / k} for k=$k, got "),
            col("__tot").cast("string"))))
          .when(col("__tot") < 1L,
            raise_error(lit("samplePps: stratum total weight is 0 — " +
              "no pick-points exist; filter empty strata first")))
          .otherwise(col("__tot")))
      .withColumn(outCol,
        expr(s"(__c * ${k}L) div __tot") -
          expr(s"((__c - __w) * ${k}L) div __tot"))
      .filter(col(outCol) >= 1L)
    val picked = ranked.select(
      col(stratumCol).as("__ss"), col("__id").as("__sel_id"), col(outCol))
    df.join(picked,
        col(stratumCol) <=> col("__ss") &&
          col(idCol).cast("long") === col("__sel_id"))
      .select((df.columns.map(col).toIndexedSeq :+ col(outCol)): _*)
  }

  def topKByScore(
      df: DataFrame, stratumCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be >= 1, got $k")
    val topK = graft.sim.TopKAggregator.udafFor(k)
    val guardedId =
      when(col(idCol).isNull,
        raise_error(lit(s"topKByScore: NULL $idCol — ids must be non-NULL")))
        .otherwise(col(idCol).cast("long"))
    val score = col(scoreCol).cast("double")
    val guardedScore =
      when(score.isNull || isnan(score),
        raise_error(concat(
          lit(s"topKByScore: NULL or NaN $scoreCol for $idCol="),
          col(idCol).cast("string"))))
        .otherwise(score)
    val picked = df
      .select(col(stratumCol), guardedId.as("__id"), guardedScore.as("__score"))
      .groupBy(col(stratumCol))
      .agg(topK(col("__id"), col("__score")).as("__top"))
      .select(col(stratumCol).as("__ss"), explode(col("__top")).as("__t"))
      .select(col("__ss"), col("__t").getField("id").as("__sel_id"))
    df.join(picked,
        col(stratumCol) <=> col("__ss") &&
          col(idCol).cast("long") === col("__sel_id"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
