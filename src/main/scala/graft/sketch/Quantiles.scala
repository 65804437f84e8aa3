package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a histogram — the curation
  * pipeline's threshold-picking step ("drop the bottom decile of
  * quality scores per language", "p99 document length per source").
  *
  * Spark's own exact `percentile` aggregate buffers every value of a
  * group in one aggregation buffer — a driver-of-executor-memory bomb
  * at 100 TB — and `percentile_approx` is (a) approximate and (b) not
  * replayable in another engine. This operator computes EXACT discrete
  * quantiles with a shape that scales: one `(group, value)` histogram
  * aggregate (map-side combinable — the shuffle carries distinct
  * values, not rows), a per-group cumulative-count window over the
  * histogram (partitions bounded by the group's distinct-value count),
  * and a threshold pick.
  *
  * The contract that makes it exact AND bounded: the value column must
  * have bounded distinct cardinality per group — naturally true for
  * lengths, counts and quantized scores (quality signals are typically
  * bucketed to 2–3 decimals before thresholding; quantize first for
  * continuous scores). The histogram is the summary; unlike a KLL/GK
  * sketch it is lossless, so the answer is the true quantile, not a
  * rank-error bound.
  *
  * Definition (discrete, lower): `Q(q)` = the smallest value whose
  * cumulative count reaches `ceil(q · n)` — always an element of the
  * data, never interpolated, and identical in any engine (the one
  * `q · n` product is IEEE double in both).
  */
object Quantiles {

  /** One row per (group, q): `(groupCols…, q, value)`.
    *
    * @param qs quantile fractions, each in (0, 1].
    */
  def grouped(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile fraction")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    require(qs.distinct.size == qs.size, s"duplicate fractions in $qs")
    // the output schema is (groupCols…, q, value) — a group column with
    // either reserved name would collide ambiguously in the result
    require(!groupCols.contains("q") && !groupCols.contains("value"),
      "group columns may not be named 'q' or 'value' (output columns)")

    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    // alias the value away from user names ('q', 'value', a group name)
    // and drop NULL values: a NULL is not a datum, and counting it
    // would shift every quantile's rank threshold
    val base = base0
      .filter(col(valueCol).isNotNull)
      .select((keys.map(col) :+ col(valueCol).as("__v")): _*)

    val hist = base
      .groupBy((keys :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))

    val byGroup = Window.partitionBy(keys.map(col): _*)
    val cumW = byGroup.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(byGroup))

    val out = withCum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .groupBy((keys.map(col) :+ col("q")): _*)
      .agg(min(when(col("__cum") >= ceil(col("q") * col("__n")),
        col("__v"))).as("value"))
    if (groupCols.nonEmpty) out else out.drop("__all")
  }

  /** One row per (group, q): `(groupCols…, q, value)` with ranks by
    * WEIGHT mass instead of row count — `Q(q)` = the smallest value
    * whose cumulative weight reaches `ceil(q · W)`. The token-weighted
    * form of [[grouped]]: "the median document BY TOKENS" (half the
    * corpus TOKENS sit in docs this long or shorter) is the capacity-
    * planning number, and it differs from the row-median whenever
    * length and count disagree — which is always, in a web corpus.
    * Integer weights only (token/char/byte counts are integers;
    * fractional mass would reopen the IEEE-accumulation hole the
    * histogram design closes); NULL/negative weights raise,
    * zero-weight rows carry no mass and cannot be selected.
    *
    * Same scale shape as [[grouped]]: the shuffle carries distinct
    * values (with summed weights), never rows.
    */
  def groupedWeighted(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile fraction")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    require(qs.distinct.size == qs.size, s"duplicate fractions in $qs")
    require(!groupCols.contains("q") && !groupCols.contains("value"),
      "group columns may not be named 'q' or 'value' (output columns)")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    val w = when(col(weightCol).isNull || col(weightCol) < 0L,
      raise_error(lit(s"groupedWeighted: NULL or negative $weightCol — " +
        "drop explicitly, a silent skip would shift every rank")))
      .otherwise(col(weightCol).cast("long"))
    val base = base0
      .filter(col(valueCol).isNotNull)
      .select((keys.map(col) :+ col(valueCol).as("__v") :+ w.as("__w")): _*)
    val hist = base
      .groupBy((keys :+ "__v").map(col): _*)
      .agg(sum(col("__w")).as("__c"))
      .filter(col("__c") > 0L)
    val byGroup = Window.partitionBy(keys.map(col): _*)
    val cumW = byGroup.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(byGroup))
    val out = withCum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .groupBy((keys.map(col) :+ col("q")): _*)
      .agg(min(when(col("__cum") >= ceil(col("q") * col("__n")),
        col("__v"))).as("value"))
    if (groupCols.nonEmpty) out else out.drop("__all")
  }

  /** Per-group robust center and scale: `(groupCols…, median, mad)` —
    * the discrete-lower median of [[grouped]] and the median absolute
    * deviation around it, both exact data elements. The robust
    * complement of [[Moments.flagOutliers]]'s σ gate: outliers
    * INFLATE σ and mask themselves (one 10⁶-length document can push
    * 3σ past every other anomaly), while the median and MAD ignore
    * half the tail by construction — the curation-grade gate is
    * `|v − median| > k·mad`, every quantity an integer when the
    * value column is (so the q133 flags replay bit-exactly with no
    * epsilon anywhere).
    *
    * Two [[grouped]] passes (values, then absolute deviations) + two
    * |groups|-sized join-backs — the shuffle never carries rows, only
    * distinct values.
    */
  def medianMad(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "medianMad needs group columns")
    val med = grouped(df, groupCols, valueCol, Seq(0.5))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__g$i")
      } :+ col("value").as("median")): _*)
    val medCond = (other: DataFrame) => groupCols.zipWithIndex
      .map { case (c, i) => other(c) === med(s"__g$i") }.reduce(_ && _)
    val withDev = df.join(med, medCond(df))
      .withColumn("__dev", abs(col(valueCol) - col("median")))
    val mad = grouped(withDev, groupCols, "__dev", Seq(0.5))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__m$i")
      } :+ col("value").as("mad")): _*)
    med.join(mad,
        groupCols.indices.map(i => med(s"__g$i") === mad(s"__m$i"))
          .reduce(_ && _))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(s"__g$i").as(c)
      } :+ col("median") :+ col("mad")): _*)
  }

  /** Append `pctCol` = the row's per-group `percent_rank` of
    * `valueCol` — rank-based score normalization across groups whose
    * raw score scales are incomparable (the per-dump/per-source
    * thresholding trick: "keep every source's top 40%" needs each
    * source's scores on a COMMON [0, 1] scale first; a global
    * threshold on raw scores silently over-prunes whole sources).
    *
    * Same value ⇒ same percentile (ties share the rank of their first
    * position — the SQL `percent_rank` definition `(rank − 1)/(n − 1)`
    * with no tie-break, exactly `cum_before/(n − 1)`: an integer ratio
    * with ONE IEEE divide, so q125 replays it against the engine's
    * own `PERCENT_RANK()` window). Single-row groups get 0.0, the SQL
    * convention. NULL values raise — a NULL is not a rank.
    *
    * Scale shape — the reason this exists instead of
    * `percent_rank().over(Window.partitionBy(group))`: the built-in
    * window sorts EVERY ROW of a group in one task (a 100 TB source
    * in one partition), while this computes ranks on the
    * [[grouped]]-style `(group, value)` histogram — the window
    * partition is bounded by the group's DISTINCT-value count (the
    * histogram contract above) — and restores per-row percentiles
    * with one `(group, value)` equi-join.
    */
  def withGroupPercentile(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pctCol: String = "pct"): DataFrame = {
    require(groupCols.nonEmpty, "withGroupPercentile needs group columns")
    require(!df.columns.contains(pctCol),
      s"column $pctCol already exists on the input")
    val v = when(col(valueCol).isNull,
      raise_error(lit(s"withGroupPercentile: NULL $valueCol — drop " +
        "explicitly, a NULL is not a rank")))
      .otherwise(col(valueCol))
    val hist = df
      .select((groupCols.map(col) :+ v.as("__v")): _*)
      .groupBy((groupCols :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumBefore = byGroup.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // rename the histogram's key columns before joining back: ranks
    // derives from df, and same-name keys trip the ambiguous-self-join
    // detector
    val ranks = hist
      .withColumn("__before", coalesce(sum(col("__c")).over(cumBefore), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(byGroup))
      .withColumn(pctCol,
        when(col("__n") === 1L, lit(0.0))
          .otherwise(col("__before").cast("double") /
            (col("__n") - 1L).cast("double")))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__g$i")
      } :+ col("__v") :+ col(pctCol)): _*)
    // null-safe group keys: groupBy RETAINS null keys as a group, so a
    // NULL-group row must match its own histogram — a plain === would
    // silently DROP every NULL-group row through this inner join (the
    // Isotonic.applyCalibration lesson)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => df(c) <=> ranks(s"__g$i") }
      .reduce(_ && _) && df(valueCol) === ranks("__v")
    df.join(ranks, cond)
      .select(df.columns.map(df(_)) :+ ranks(pctCol): _*)
  }

  /** `df` plus `outCol`: per-group QUANTILE NORMALIZATION onto the
    * pooled distribution — the scorer-harmonization step when
    * different groups were scored by different models/versions and
    * raw values are not comparable ("v2's 0.8 means something
    * different from v1's 0.8"): each value maps to the pooled value
    * at the SAME within-group percentile, so downstream thresholds
    * and mixes read one common scale. Output values are ELEMENTS of
    * the pooled data (never interpolated), so the map is exact and
    * engine-replayable.
    *
    * Pinned rule: a value with `before` strictly-smaller in-group
    * rows out of `n` maps to the pooled `ceil(before·N/(n−1))`-th
    * smallest value (floored at rank 1); a singleton group maps to
    * the pooled median rank `ceil(N/2)` — all exact integer
    * arithmetic (q244 replays it), with a fail-loud `before·N`
    * overflow ceiling from two bounded scalars. NULL values raise;
    * NULL group keys are their own group.
    *
    * Scale shape: group histograms with per-group windows (the
    * [[grouped]] contract), the pooled prefix via [[graft.operators
    * .Enumerate]] dense ids + the two-level bucket scan (the
    * headCoverage discipline — NO global window), and the rank
    * lookup as a [[graft.operators.RangeJoin]] point-in-interval
    * hash join over disjoint pooled rank intervals. Everything past
    * the first aggregate is distinct-value-sized.
    */
  def quantileNormalize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      outCol: String = "normalized",
      bucketWidth: Long = 1L << 16,
      maxBuckets: Long = 4000000L): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize needs group columns")
    require(!df.columns.contains(outCol),
      s"column $outCol already exists on the input")
    val v = when(col(valueCol).isNull,
      raise_error(lit(s"quantileNormalize: NULL $valueCol — drop " +
        "explicitly, a NULL has no rank")))
      .otherwise(col(valueCol))
    val base = df
      .select((groupCols.map(col) :+ v.as("__v")): _*)

    // group histograms: exclusive prefix + group size per distinct value
    val gHist = base
      .groupBy((groupCols :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumBefore = byGroup.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gRanks = gHist
      .withColumn("__before",
        coalesce(sum(col("__c")).over(cumBefore), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(byGroup))

    // pooled histogram + exclusive prefix WITHOUT a global window:
    // dense value order via zipWithIndex, bucket totals collected
    // (bounded), exclusive offsets broadcast back, window within bucket
    val pHist = base.groupBy(col("__v").as("__pv"))
      .agg(count(lit(1)).as("__pc"))
    val ranked = graft.operators.Enumerate
      .denseIds(pHist, Seq("__pv"), idCol = "__pr")
      .localCheckpoint(true) // read twice: bucket totals + the plan below
    val bucketed = ranked.withColumn("__pb", expr(s"__pr div ${bucketWidth}L"))
    val nBuckets = bucketed.agg(countDistinct(col("__pb"))).head.getLong(0)
    require(nBuckets <= maxBuckets,
      s"quantileNormalize: $nBuckets pooled-value buckets exceeds " +
        s"maxBuckets=$maxBuckets — widen bucketWidth ($bucketWidth)")
    val totals = bucketed.groupBy(col("__pb"))
      .agg(sum(col("__pc")).as("__t"))
      .collect() // bounded: one row per bucket
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val nPool = acc
    require(nPool > 0, "quantileNormalize: input is empty")
    // the target rank computes before·nPool + (n−2): fail loud past long
    require(BigInt(nPool) * nPool < BigInt(Long.MaxValue),
      s"quantileNormalize: $nPool rows exceeds the exact-rank ceiling " +
        "(before·N must fit a long) — normalize per partition")
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__pb2", "__off"))
    val wb = Window.partitionBy(col("__pb")).orderBy(col("__pr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intervals = bucketed
      .join(offsetDf, col("__pb") === col("__pb2"))
      .withColumn("__pcum", col("__off") + sum(col("__pc")).over(wb))
      .select(col("__pv"), (col("__pcum") - col("__pc") + 1L).as("__plo"),
        col("__pcum").as("__phi"))

    // target pooled rank per (group, value): exact integer ceiling,
    // singleton groups pinned to the pooled median rank
    val points = gRanks.withColumn("__r",
      when(col("__n") === 1L, lit((nPool + 1L) / 2L))
        .otherwise(greatest(lit(1L), expr(
          s"(__before * ${nPool}L + (__n - 2L)) div (__n - 1L)"))))
      .select((groupCols.map(col) :+ col("__v") :+ col("__r")): _*)
    val looked = graft.operators.RangeJoin.pointIntervalJoin(
      points, "__r", intervals, "__plo", "__phi",
      binWidth = math.max(1L, nPool / 64L))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__qg$i")
      } :+ col("__v") :+ col("__pv")): _*)

    // null-safe group keys back onto the rows (the applyCalibration
    // discipline: a NULL group is its own group, never dropped)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => df(c) <=> looked(s"__qg$i") }
      .reduce(_ && _) && df(valueCol) === looked("__v")
    df.join(looked, cond)
      .select(df.columns.map(df(_)) :+ looked("__pv").as(outCol): _*)
  }

  /** `df` plus `outCol`: per-group WINSORIZED values — clipped to the
    * group's exact discrete [pLo, pHi] quantiles (the [[grouped]]
    * thresholds, which are ELEMENTS of the data). The standard
    * heavy-tail taming step before per-group normalization or
    * z-scoring: one pathological 500 MB document otherwise owns its
    * group's scale. Clipping to exact in-data quantiles (never an
    * interpolated midpoint) keeps the result engine-replayable.
    *
    * NULL values pass through as NULL (a NULL is not a datum —
    * [[grouped]] excludes them from the histogram too); NULL group
    * keys are their own group and join null-safely. Scale shape: the
    * [[grouped]] histogram contract (shuffle carries distinct values,
    * never rows) + one join of the #groups-sized threshold table back
    * onto the rows.
    */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double, pHi: Double, outCol: String = "winsorized"): DataFrame = {
    require(groupCols.nonEmpty, "winsorize needs group columns")
    require(pLo > 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains(outCol),
      s"column $outCol already exists on the input")
    val th = grouped(df, groupCols, valueCol, Seq(pLo, pHi))
      .groupBy(groupCols.map(col): _*)
      .agg(min(when(col("q") === pLo, col("value"))).as("__lo"),
        min(when(col("q") === pHi, col("value"))).as("__hi"))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__wg$i")
      } :+ col("__lo") :+ col("__hi")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => df(c) <=> th(s"__wg$i") }
      .reduce(_ && _)
    df.join(th, cond, "left")
      .select(df.columns.map(df(_)) :+
        when(df(valueCol).isNull, lit(null))
          .otherwise(least(greatest(df(valueCol), col("__lo")), col("__hi")))
          .as(outCol): _*)
  }
}
