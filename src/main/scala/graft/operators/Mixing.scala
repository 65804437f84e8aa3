package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Scalars
import graft.eval.BootstrapEval

/** Temperature-based corpus mixing — the multilingual-LM recipe
  * (XLM/mBERT style) for rebalancing a skewed corpus: strata (languages,
  * sources, domains) are resampled toward the share `p^alpha / Σ p^alpha`
  * so dominant strata shrink and rare strata keep (nearly) everything.
  *
  * Mechanics: with empirical shares `p_s = n_s / N`, the target share is
  * `q_s ∝ p_s^alpha`; pure downsampling realizes it with per-stratum
  * keep rate `r_s = (q_s/p_s) / max_t (q_t/p_t)` — the rarest stratum
  * gets rate 1 and everything else scales down proportionally. Rows are
  * kept when a per-row deterministic uniform draw falls under their
  * stratum's rate, so the result is reproducible row-for-row, not just
  * in expectation.
  *
  * Scale shape: one map-side-combinable count aggregate over strata
  * (|strata| rows), a 1-row max aggregate, a broadcast join of the tiny
  * rate table back onto the corpus, and a map-only filter. No
  * corpus-sized shuffle anywhere.
  *
  * Cross-engine determinism: the draw is [[BootstrapEval.portableUniform]]
  * (affine-mod integer arithmetic) and every rate is built from IEEE
  * correctly-rounded ops — divides and, for `alpha = 0.5` (the common
  * LM temperature), `sqrt`, which IEEE 754 requires to be correctly
  * rounded. Other alphas go through `pow`, whose last-ulp behavior is
  * library-specific — fine in production, excluded from the oracle.
  * North-star extension per SURVEY §2.11 (not in the reference).
  */
object Mixing {

  /** Per-stratum mixing table: `(stratum, n, share, rate)` where `rate`
    * is the keep probability realizing temperature-`alpha` resampling by
    * pure downsampling (max rate = 1, attained by the rarest stratum).
    */
  def temperatureRates(
      df: DataFrame, stratumCol: String, alpha: Double): DataFrame =
    ratesFrom(
      df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n")),
      stratumCol, "n", alpha)

  /** Shared share/ratio/rate pipeline over a per-stratum mass table —
    * one implementation so the IEEE-ordering discipline (single
    * divides; `sqrt` fast path for alpha = 0.5, the one power IEEE 754
    * requires correctly rounded) cannot diverge between the count and
    * weighted variants. Fails loudly on a non-positive or NULL stratum
    * mass: share 0 would make the ratio NULL and silently drop the
    * whole stratum downstream.
    */
  private def ratesFrom(
      mass: DataFrame, stratumCol: String, massCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1] (got $alpha); alpha=1 is a no-op identity mix")
    val guarded = mass.withColumn(massCol,
      when(col(massCol).isNull || col(massCol) <= 0L,
        raise_error(concat(
          lit(s"temperature mix: non-positive total $massCol for stratum "),
          // coalesce: a NULL stratum would null out concat and raise
          // an empty message exactly when the diagnostic matters most
          coalesce(col(stratumCol).cast("string"), lit("NULL")))))
        .otherwise(col(massCol)))
    val total = guarded.agg(sum(col(massCol)).as("__N"))
    def weight(p: Column): Column =
      if (alpha == 0.5) sqrt(p) else pow(p, lit(alpha))
    val withShare = Scalars.withScalars(guarded, total)
      .withColumn("share",
        col(massCol).cast("double") / col("__N").cast("double"))
      .withColumn("__ratio", weight(col("share")) / col("share"))
    val maxRatio = withShare.agg(max(col("__ratio")).as("__max_ratio"))
    Scalars.withScalars(withShare, maxRatio)
      .withColumn("rate", col("__ratio") / col("__max_ratio"))
      .select(col(stratumCol), col(massCol), col("share"), col("rate"))
  }

  /** `df` downsampled to the temperature-`alpha` mix over `stratumCol`.
    * A row survives when `portableUniform(seed)(keyCol) < rate(stratum)`.
    *
    * `keyCol` must be a nonnegative, stable row key (see
    * [[BootstrapEval.portableUniform]]'s precondition — Spark `pmod` vs
    * sign-preserving SQL `%` diverge on negative keys).
    */
  def mixByTemperature(
      df: DataFrame, stratumCol: String, keyCol: String,
      alpha: Double = 0.5, seed: Long = 41L): DataFrame = {
    val rates = temperatureRates(df, stratumCol, alpha)
      .select(col(stratumCol), col("rate"))
    mixWithRates(df, stratumCol, keyCol, rates, seed)
  }

  /** [[temperatureRates]] with strata weighted by an integral column
    * (token counts, byte sizes) instead of row counts — LM mixes are
    * specified over TOKEN budgets, and a source of few huge documents
    * must count as its token mass, not its document count. Weight sums
    * accumulate as exact integers (order-independent, engine-portable);
    * each share costs one IEEE divide, like the unweighted form.
    */
  def temperatureRatesWeighted(
      df: DataFrame, stratumCol: String, weightCol: String,
      alpha: Double): DataFrame =
    ratesFrom(
      df.groupBy(col(stratumCol)).agg(sum(col(weightCol).cast("long")).as("w")),
      stratumCol, "w", alpha)

  /** Token-budget-weighted [[mixByTemperature]]: keep rates derived
    * from per-stratum weight sums. The per-row draw is unchanged —
    * each document still survives independently, so the realized mix
    * approaches the target in token mass.
    */
  def mixByTemperatureWeighted(
      df: DataFrame, stratumCol: String, keyCol: String, weightCol: String,
      alpha: Double = 0.5, seed: Long = 41L): DataFrame = {
    val rates = temperatureRatesWeighted(df, stratumCol, weightCol, alpha)
      .select(col(stratumCol), col("rate"))
    mixWithRates(df, stratumCol, keyCol, rates, seed)
  }

  /** NULL-SAFE join on the stratum: `groupBy` treats NULL as a stratum
    * and [[ratesFrom]] computes a rate row for it, so the join back must
    * match it too — a plain equi-join would silently DROP every
    * NULL-stratum row (NULL keys never equal-match), contradicting the
    * module's fail-loudly contract. With `<=>` the NULL stratum is mixed
    * at its own computed rate, exactly like any other stratum.
    */
  private def mixWithRates(
      df: DataFrame, stratumCol: String, keyCol: String,
      rates: DataFrame, seed: Long): DataFrame = {
    val draw = BootstrapEval.portableUniform(seed)(col(keyCol), lit(0L))
    val rateSide = rates.select(
      col(stratumCol).as("__mix_stratum"), col("rate"))
    df.join(broadcast(rateSide), col(stratumCol) <=> col("__mix_stratum"))
      .filter(draw < col("rate"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-stratum TOKEN-BUDGET selection — the budget-mix recipe (Pile/
    * DoReMi style): each stratum contributes documents, in a stable
    * layout-independent hash order, until its token budget fills. A
    * document is kept iff its stratum's running token total up to AND
    * INCLUDING it stays within the stratum's budget — so the result
    * overshoots a budget by at most zero documents (the first document
    * that would cross the line is excluded, as is everything after it
    * in hash order). Deterministic pure function of (ids, token counts,
    * budgets, salt): reruns, retries, and repartitions select the SAME
    * documents, and distinct salts draw independent selections
    * ([[Splits.bucketOf]]'s independence contract).
    *
    * Scale shape — the same two-level prefix scan as
    * [[Packing.packSequences]], never a one-partition-per-stratum
    * global window: per-(stratum, coarse-bucket) token totals (a
    * map-side-combinable aggregate, ≤ strata × `ordBuckets/bucketWidth`
    * rows, guarded by `maxBuckets` BEFORE the driver collect), a
    * driver-side exclusive prefix per stratum, a broadcast join of the
    * tiny offset table, and a window bounded to one coarse bucket.
    * Budgets travel as a (stratum, budget) DataFrame; a stratum without
    * a budget row fails loudly (a silent drop would hide a config gap),
    * and a NULL stratum matches its budget row null-safely, as in
    * [[mixWithRates]].
    *
    * Output: the input columns plus `cum_tokens` (the running inclusive
    * total that admitted the row — the audit trail for "why is this
    * document in the mix").
    */
  def sampleToTokenBudget(
      df: DataFrame, stratumCol: String, idCol: String, tokenCol: String,
      budgets: DataFrame, salt: String = "",
      ordBuckets: Int = 1 << 20, bucketWidth: Long = 1L << 12,
      maxBuckets: Long = 4000000L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val spark = df.sparkSession
    import spark.implicits._

    val rows = df
      .withColumn("__n",
        when(col(tokenCol).isNull || col(tokenCol).cast("long") < 0L,
          raise_error(concat(
            lit(s"sampleToTokenBudget: null or negative $tokenCol for $idCol="),
            col(idCol).cast("string"))))
          .otherwise(col(tokenCol).cast("long")))
      .withColumn("__ord", graft.operators.Splits.bucketOf(
        col(idCol), salt, ordBuckets))
      .withColumn("__b", expr(s"__ord div ${bucketWidth}L"))
      .localCheckpoint(true)

    val nBuckets = rows.agg(
      countDistinct(col(stratumCol), col("__b"))).head.getLong(0)
    require(nBuckets <= maxBuckets,
      s"sampleToTokenBudget: $nBuckets (stratum, bucket) groups exceeds " +
        s"maxBuckets=$maxBuckets — widen bucketWidth (currently " +
        s"$bucketWidth) or reduce ordBuckets")

    // tiny agg -> driver exclusive prefix per stratum (bounded above)
    val totals = rows.groupBy(col(stratumCol).as("__s"), col("__b"))
      .agg(sum(col("__n")).as("__t"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (s, bs) =>
      var acc = 0L
      bs.sortBy(_._2).map { case (_, b, t) => val o = acc; acc += t; (s, b, o) }
    }
    val stratumType = df.schema(stratumCol).dataType
    val offsetDf = broadcast(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          offsets.map { case (s, b, o) =>
            org.apache.spark.sql.Row(s, b, o) }).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__s2", stratumType),
        org.apache.spark.sql.types.StructField("__b2",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false)))))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__b"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budgetSide = budgets.select(
      col(stratumCol).as("__bs"), col("budget").cast("long").as("__budget"))
    rows
      .join(offsetDf,
        col(stratumCol) <=> col("__s2") && col("__b") === col("__b2"))
      .withColumn("cum_tokens", col("__off") + sum(col("__n")).over(w))
      .join(broadcast(budgetSide), col(stratumCol) <=> col("__bs"), "left")
      .withColumn("__budget",
        when(col("__budget").isNull,
          raise_error(concat(
            lit(s"sampleToTokenBudget: no budget row for $stratumCol="),
            coalesce(col(stratumCol).cast("string"), lit("NULL")))))
          .otherwise(col("__budget")))
      .filter(col("cum_tokens") <= col("__budget"))
      .select((df.columns.map(col) :+ col("cum_tokens")).toIndexedSeq: _*)
  }

  /** SIZE-PRESERVING temperature rates for resampling WITH repeats —
    * the DoReMi/Pile domain-reweighting form that [[mixByTemperature]]
    * (pure downsampling, max rate 1) cannot express: rare strata get
    * `rate > 1` and are UPSAMPLED by document repetition, dominant
    * strata get `rate < 1`, and the expected output row count equals
    * the input row count (`Σ_s n_s·rate_s = N` exactly, up to IEEE
    * rounding): `rate_s = (q_s/p_s)` with `q_s ∝ p_s^alpha` normalized
    * to `Σ q_s = 1`.
    *
    * Cross-engine determinism: the normalizer `Σ_t p_t^alpha` is a sum
    * of doubles over strata, which is ORDER-DEPENDENT in IEEE
    * arithmetic — a distributed aggregate would make the rates depend
    * on partitioning. It is therefore computed as a SEQUENTIAL
    * left-fold over strata in the UTF-8 order of their string form,
    * from a driver-side collect of the per-stratum count table
    * (bounded: one row per stratum — the vocab-counts contract), and
    * replays in SQL as an ordered `list_reduce` (q74). `alpha = 0.5`
    * stays on IEEE-correctly-rounded `sqrt`; other alphas go through
    * `pow` (fine in production, excluded from the oracle — same rule
    * as [[ratesFrom]]).
    */
  def temperatureRepeatRates(
      df: DataFrame, stratumCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1] (got $alpha); alpha=1 is a no-op identity mix")
    val spark = df.sparkSession
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect() // bounded: one row per stratum
      .map(r => (r.get(0), r.getLong(1)))
      // UTF-8 order of the stratum's string form, NULL first — the
      // documented, engine-replayable fold order (ORDER BY stratum)
      .sortBy { case (s, _) => Option(s).map(_.toString) }(
        Ordering.Option(Ordering.String))
    val total = counts.map(_._2).sum.toDouble
    def weight(p: Double): Double =
      if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha)
    val den = counts.foldLeft(0.0) { case (a, (_, n)) =>
      a + weight(n / total)
    }
    val stratumType = df.schema(stratumCol).dataType
    val rows = counts.map { case (s, n) =>
      val share = n / total
      // same op order as the SQL replay: (weight/share) first, then /den
      org.apache.spark.sql.Row(s, n, (weight(share) / share) / den)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toIndexedSeq).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(stratumCol, stratumType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rate",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Resample `df` WITH repeats to caller-supplied per-stratum rates
    * (`rate >= 0`, may exceed 1): every row emits `floor(rate)` copies
    * plus one more iff its deterministic uniform draw falls under the
    * fractional part — so a stratum at rate 2.3 repeats every document
    * twice and a reproducible 30% of them a third time. Output rows
    * carry a 0-based `copy` index (downstream packing/training can
    * distinguish repetitions); rows of a rate-0 stratum vanish.
    *
    * Fail-loud guards: a stratum without a rate row, a NULL/negative
    * rate, and `rate > maxRate` all raise — `maxRate` bounds row
    * amplification (a near-empty stratum under [[temperatureRepeatRates]]
    * gets `rate ≈ share^(alpha-1)`, which grows without bound as the
    * stratum shrinks; silently exploding the corpus is never the right
    * default at 100 TB).
    *
    * Scale shape: broadcast join of the tiny rate table + a map-only
    * `explode(sequence)` — no corpus shuffle; NULL strata match their
    * rate row null-safely ([[mixWithRates]] contract).
    */
  def upsampleWithRates(
      df: DataFrame, stratumCol: String, keyCol: String,
      rates: DataFrame, seed: Long = 41L,
      maxRate: Double = 100.0): DataFrame = {
    require(maxRate > 0.0, s"maxRate must be positive, got $maxRate")
    val rateSide = rates.select(
      col(stratumCol).as("__up_stratum"), col("rate").as("__rate"))
    val draw = BootstrapEval.portableUniform(seed)(col(keyCol), lit(0L))
    val guardedRate =
      when(col("__rate").isNull || col("__rate") < 0.0,
        raise_error(concat(
          lit(s"upsampleWithRates: null or negative rate for $stratumCol="),
          coalesce(col(stratumCol).cast("string"), lit("NULL")))))
        .when(col("__rate") > maxRate,
          raise_error(concat(
            lit(s"upsampleWithRates: rate exceeds maxRate=$maxRate for "),
            lit(s"$stratumCol="),
            coalesce(col(stratumCol).cast("string"), lit("NULL")),
            lit(" — raise maxRate only if the row amplification is intended"))))
        .otherwise(col("__rate"))
    // left join + raise on a missing rate row: a stratum absent from
    // the rate table is a config gap, not a silent drop
    val checked = df
      .join(broadcast(rateSide), col(stratumCol) <=> col("__up_stratum"), "left")
      .withColumn("__rate",
        when(col("__rate").isNull && col("__up_stratum").isNull,
          raise_error(concat(
            lit(s"upsampleWithRates: no rate row for $stratumCol="),
            coalesce(col(stratumCol).cast("string"), lit("NULL")))))
          .otherwise(guardedRate))
    val copies = floor(col("__rate"))
    val frac = col("__rate") - copies.cast("double")
    val n = copies.cast("long") +
      when(draw < frac, 1L).otherwise(0L)
    checked
      .withColumn("copy", explode(
        when(n > 0L, sequence(lit(0L), n - 1L))))
      .select((df.columns.map(col) :+ col("copy")).toIndexedSeq: _*)
  }

  /** [[temperatureRepeatRates]] + [[upsampleWithRates]]: size-preserving
    * temperature remix with repeats, deterministic row-for-row.
    */
  def mixByTemperatureWithRepeats(
      df: DataFrame, stratumCol: String, keyCol: String,
      alpha: Double = 0.5, seed: Long = 41L,
      maxRate: Double = 100.0): DataFrame =
    upsampleWithRates(df, stratumCol, keyCol,
      temperatureRepeatRates(df, stratumCol, alpha).select(
        col(stratumCol), col("rate")),
      seed, maxRate)

  /** Rejection-sample DOWN to a target bucket distribution — the
    * "make the corpus look like the reference mix" curation step
    * (match a production length/language/domain histogram, rebalance a
    * scraped dump to a published data recipe): among all
    * downsampling-only schemes hitting the target proportions, this
    * keeps the MAXIMUM number of rows. The reference bucket — the
    * argmin of n_b/t_b, i.e. the one already scarcest relative to its
    * target share — keeps everything (rate 1), and every other bucket
    * keeps rate (t_b/t_ref)·(n_ref/n_b) < 1, so expected kept counts
    * are proportional to the target exactly.
    *
    * Determinism: membership is [[graft.eval.BootstrapEval
    * .portableUniform]] of (key, seed) against the bucket's rate — a
    * pure row function (the [[mixByTemperature]] draw), replayed in
    * SQL by q234. The reference-bucket selection compares the IEEE
    * ratio n_b/t_b (one divide — the same op in any engine), ties to
    * the smallest bucket value. Buckets absent from `target` are
    * DROPPED (rate 0 — a mix recipe is a whitelist); target buckets
    * absent from the data raise (no rows cannot be upsampled to a
    * share; use [[upsampleWithRates]] if repeats are acceptable).
    *
    * Scale shape: one map-side-combinable count by bucket, one 1-row
    * argmin aggregate, then a broadcast join of the #buckets-sized
    * rate table and a map-only filter. Nothing corpus-sized shuffles.
    */
  def matchDistribution(
      df: DataFrame, bucketCol: String, keyCol: String,
      target: Seq[(String, Long)], seed: Long = 41L): DataFrame = {
    require(target.nonEmpty, "matchDistribution: empty target")
    require(target.forall(_._2 >= 1L),
      s"matchDistribution: target shares must be >= 1, got $target")
    require(target.map(_._1).distinct.size == target.size,
      s"matchDistribution: duplicate target buckets in $target")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = target.toDF("__mb", "__t")
    val counts = df.groupBy(col(bucketCol).cast("string").as("__cb"))
      .agg(count(lit(1)).as("__n"))
    val missing = tgt
      .join(counts, col("__mb") === col("__cb"), "left_anti")
      .select(col("__mb")).collect() // bounded: <= |target|
    require(missing.isEmpty,
      "matchDistribution: target buckets absent from the data " +
        s"(cannot downsample to a share of nothing): " +
        missing.map(_.getString(0)).mkString(", "))
    val withT = counts.join(broadcast(tgt), col("__cb") === col("__mb"))
    // reference bucket = argmin n_b/t_b (IEEE ratio for SELECTION only,
    // tie to smallest bucket value); its (n, t) anchor every rate
    val ref = withT
      .agg(min(struct(
        (col("__n").cast("double") / col("__t").cast("double")).as("__r"),
        col("__cb").as("__rb"),
        col("__n").as("__rn"), col("__t").as("__rt"))).as("__ref"))
      .select(col("__ref.__rn").as("__refn"),
        col("__ref.__rt").as("__reft"))
    val rates = graft.core.Scalars.withScalars(withT, ref)
      .select(col("__cb"),
        ((col("__t").cast("double") / col("__reft").cast("double")) *
          (col("__refn").cast("double") / col("__n").cast("double")))
          .as("__rate"))
    val draw = graft.eval.BootstrapEval
      .portableUniform(seed)(col(keyCol), lit(0L))
    df.join(broadcast(rates),
        col(bucketCol).cast("string") === col("__cb"))
      .filter(draw < col("__rate"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
