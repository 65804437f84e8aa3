package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking metrics over prediction tables. The [[BootstrapEval.Metric]]
  * surface covers metrics expressible as one aggregate over (pred,
  * label, weight); ROC-AUC is not one of those — it needs the rank
  * structure of the scores — so it lives here with the histogram shape
  * [[graft.sketch.Quantiles]] established: the shuffle carries DISTINCT
  * scores, never rows.
  *
  * Definition (exact, tie-aware Mann–Whitney): with per-distinct-score
  * positive/negative counts `p_s, n_s` and `N_s` = negatives strictly
  * below score `s`,
  *
  *   AUC = Σ_s p_s · (2·N_s + n_s) / (2 · nPos · nNeg)
  *
  * — the probability a random positive outranks a random negative,
  * ties counted half. The numerator is ALL-INTEGER and the divide
  * happens once, so the value is bit-identical in any engine (q71
  * replays it in DuckDB).
  *
  * Scale shape: one map-side-combinable (group, score) histogram
  * aggregate, a cumulative window over distinct scores (partition size
  * bounded by score cardinality per group — quantize first for
  * continuous scores, as with Quantiles), and one tiny per-group
  * aggregate. Degenerate groups (no positives or no negatives) have no
  * defined AUC and are emitted with NULL rather than silently dropped.
  */
object Ranking {

  /** Shared (group, distinct score) histogram with 0/1-guarded labels:
    * `(keys…, __s, __p, __n)` — the one aggregate both metrics build
    * on; NULL or non-0/1 labels raise (a silent coercion would corrupt
    * the metric).
    */
  private def scoreHistogram(
      df: DataFrame, predCol: String, labelCol: String,
      keys: Seq[String], metric: String): DataFrame = {
    val base0 =
      if (keys != Seq("__all")) df else df.withColumn("__all", lit(0))
    val lab = col(labelCol).cast("long")
    val base = base0.select(
      (keys.map(col) :+ col(predCol).as("__s") :+
        when(lab.isNull || (lab =!= 0L && lab =!= 1L),
          raise_error(concat(
            lit(s"$metric: $labelCol must be 0/1, got "),
            coalesce(col(labelCol).cast("string"), lit("NULL")))))
          .otherwise(lab).as("__y")): _*)
    base
      .groupBy((keys.map(col) :+ col("__s")): _*)
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__n"))
  }

  /** One row per group: `(groupCols…, auc, n_pos, n_neg)`. Labels must
    * be 0/1 (NULL or other values raise — a silent coercion would
    * corrupt the metric).
    */
  def rocAuc(
      df: DataFrame, predCol: String, labelCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(!groupCols.exists(Seq("auc", "n_pos", "n_neg").contains),
      "group columns may not be named 'auc', 'n_pos' or 'n_neg'")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val hist = scoreHistogram(df, predCol, labelCol, keys, "rocAuc")

    // negatives strictly below each distinct score: exclusive cumsum
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val contrib = hist
      .withColumn("__cumn", sum(col("__n")).over(w) - col("__n"))
      .withColumn("__num",
        col("__p") * (lit(2L) * col("__cumn") + col("__n")))

    contrib
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__num")).as("__num"),
        sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"))
      .select((groupCols.map(col) :+
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("__num").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc") :+
        col("n_pos") :+ col("n_neg")): _*)
  }

  /** Operating-point sweep: one row per (group, distinct score),
    * classifying positive iff `score >= threshold` — the table behind
    * a precision/recall curve and threshold selection for quality
    * filters ("keep documents the classifier scores above t").
    *
    * `(groupCols…, threshold, tp, fp, fn, precision, recall, f1)`.
    * `tp`/`fp` are DESCENDING cumulative sums over the score
    * histogram, `fn = n_pos − tp`; all three are exact integers, and
    * each ratio is ONE final IEEE divide of integer operands —
    * bit-identical in any engine (q76 replays the whole table).
    * `recall` is NULL when the group has no positives (undefined, not
    * silently 0); `precision`'s denominator `tp+fp ≥ 1` at every
    * distinct-score row, so it is always defined.
    *
    * Scale shape: identical to [[rocAuc]] — one map-side-combinable
    * histogram aggregate (the shuffle carries DISTINCT scores, never
    * examples), then windows over per-group score cardinality
    * (quantize continuous scores first, as with Quantiles).
    */
  def prCurve(
      df: DataFrame, predCol: String, labelCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val reserved =
      Seq("threshold", "tp", "fp", "fn", "precision", "recall", "f1")
    require(!groupCols.exists(reserved.contains),
      s"group columns may not be named any of ${reserved.mkString(", ")}")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val hist = scoreHistogram(df, predCol, labelCol, keys, "prCurve")

    val wDesc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)

    hist
      .withColumn("tp", sum(col("__p")).over(wDesc))
      .withColumn("fp", sum(col("__n")).over(wDesc))
      .withColumn("__npos", sum(col("__p")).over(wAll))
      .withColumn("fn", col("__npos") - col("tp"))
      .select((groupCols.map(col) :+
        col("__s").as("threshold") :+
        col("tp") :+ col("fp") :+ col("fn") :+
        (col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double")).as("precision") :+
        when(col("__npos") > 0L,
          col("tp").cast("double") / col("__npos").cast("double"))
          .as("recall") :+
        ((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .as("f1")): _*)
  }

  /** Cohen's kappa between two binary labelings — chance-corrected
    * agreement for "does the cheap classifier agree with the expensive
    * one / the human labels" checks on curation filters.
    *
    * One row per group: `(groupCols…, kappa, n)`. With confusion
    * counts `n11,n10,n01,n00` (first index = `aCol`, second = `bCol`)
    * the textbook `κ = (p_o − p_e)/(1 − p_e)` reduces to the
    * INTEGER-rational form
    *
    *   κ = (N·(n11+n00) − [(n11+n10)(n11+n01) + (n01+n00)(n10+n00)])
    *       / (N² − [·])
    *
    * so the whole computation is exact 64-bit integer arithmetic with
    * ONE final IEEE divide — bit-identical in any engine (q78). When
    * chance agreement is 1 (both labelings constant) κ is undefined
    * and emitted NULL, not silently 0. Labels must be 0/1 (the
    * [[rocAuc]] guard).
    *
    * Scale shape: one map-side-combinable aggregate (4 conditional
    * sums per group); nothing else moves.
    */
  def cohensKappa(
      df: DataFrame, aCol: String, bCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(!groupCols.exists(Seq("kappa", "n").contains),
      "group columns may not be named 'kappa' or 'n'")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    def guarded(c: String): Column = {
      val l = col(c).cast("long")
      when(l.isNull || (l =!= 0L && l =!= 1L),
        raise_error(concat(
          lit(s"cohensKappa: $c must be 0/1, got "),
          coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(l)
    }
    val counted = base0
      .select((keys.map(col) :+ guarded(aCol).as("__a") :+
        guarded(bCol).as("__b")): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__a") * col("__b")).as("__n11"),
        sum(col("__a") * (lit(1L) - col("__b"))).as("__n10"),
        sum((lit(1L) - col("__a")) * col("__b")).as("__n01"),
        sum((lit(1L) - col("__a")) * (lit(1L) - col("__b"))).as("__n00"))
    // n² must stay inside 64 bits for the exact-integer form: 3·10⁹
    // rows per group is the documented ceiling (9·10¹⁸ < 2⁶³−1). A
    // bigger group raises rather than silently overflowing — and a
    // 0/1 agreement statistic over >3B examples has long since
    // converged; sample first.
    val nRaw = col("__n11") + col("__n10") + col("__n01") + col("__n00")
    val n = when(nRaw > 3000000000L,
      raise_error(concat(
        lit("cohensKappa: group size "), nRaw.cast("string"),
        lit(" exceeds the exact-integer ceiling of 3e9 rows — sample first"))))
      .otherwise(nRaw)
    val chance =
      (col("__n11") + col("__n10")) * (col("__n11") + col("__n01")) +
        (col("__n01") + col("__n00")) * (col("__n10") + col("__n00"))
    counted.select((groupCols.map(col) :+
      when(n * n =!= chance,
        (n * (col("__n11") + col("__n00")) - chance).cast("double") /
          (n * n - chance).cast("double")).as("kappa") :+
      n.as("n")): _*)
  }

  /** Reliability (calibration) table over QUANTIZED predictions: one
    * row per (group, bin) with the bin's example count, empirical
    * positive rate, and mean predicted probability — "is the quality
    * classifier's 0.9 really a 0.9" before its threshold gates a
    * corpus.
    *
    * Predictions arrive as integers `predQ ∈ [0, scale]` (probability
    * = predQ/scale) — the quantize-first contract this eval family
    * already uses for continuous scores ([[prCurve]], Quantiles): a
    * mean of raw doubles is IEEE-order-dependent under distributed
    * aggregation, while the integer sum is exact, order-independent,
    * and engine-replayable. `mean_pred = Σ predQ / (n·scale)` and
    * `frac_pos = n_pos / n` are each ONE final IEEE divide (q80);
    * `gap = frac_pos − mean_pred` is one deterministic subtract.
    *
    * Bins are `⌊predQ·bins/scale⌋` clamped to `bins−1` (so predQ =
    * scale lands in the top bin). Out-of-range or NULL predictions
    * raise. Scale shape: one map-side-combinable aggregate over
    * (group, bin) — at most `bins` rows per group move.
    */
  def calibrationTable(
      df: DataFrame, predQCol: String, scale: Long, labelCol: String,
      bins: Int = 10, groupCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("bin", "n", "n_pos", "mean_pred", "frac_pos", "gap")
    require(!groupCols.exists(reserved.contains),
      s"group columns may not be named any of ${reserved.mkString(", ")}")
    binnedQuantized(df, predQCol, scale, labelCol, bins, groupCols,
      "calibrationTable")
      .select((groupCols.map(col) :+ col("__bin").as("bin") :+
        col("n") :+ col("n_pos") :+
        (col("__sumq").cast("double") /
          (col("n") * lit(scale)).cast("double")).as("mean_pred") :+
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos")): _*)
      .withColumn("gap", col("frac_pos") - col("mean_pred"))
  }

  /** One row per group with the standard calibration summary scalars,
    * all derived from the same (group, bin) integer table as
    * [[calibrationTable]]:
    *
    *   - `ece`   — expected calibration error, `Σ_b (n_b/N)·|gap_b|`.
    *     The weighted rational telescopes: `(n_b/N)·|frac_pos_b −
    *     mean_pred_b| = |scale·n_pos_b − Σq_b| / (N·scale)`, so the
    *     numerator is an EXACT integer sum over bins and the divide
    *     happens once.
    *   - `mce`   — maximum calibration error, `max_b |gap_b|`; each
    *     bin's `|gap|` is one exact divide, and max is
    *     order-independent.
    *   - `brier` — mean squared error of the probability,
    *     `Σ(q_i − scale·y_i)² / (N·scale²)`: integer numerator
    *     accumulated per (group, bin) in the shared aggregate, one
    *     final divide.
    *
    * Same guards and scale shape as [[calibrationTable]]; the
    * post-aggregation ceiling tightens to `N ≤ Long.Max/scale²` (each
    * squared term is ≤ scale², so that bound proves the Brier sum
    * never wrapped).
    */
  def calibrationSummary(
      df: DataFrame, predQCol: String, scale: Long, labelCol: String,
      bins: Int = 10, groupCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("n", "ece", "mce", "brier")
    require(!groupCols.exists(reserved.contains),
      s"group columns may not be named any of ${reserved.mkString(", ")}")
    require(scale <= 3037000499L, // floor(sqrt(Long.Max)): scale² must fit
      s"scale² must fit a long, got $scale")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val gapNum = abs(lit(scale) * col("n_pos") - col("__sumq"))
    binnedQuantized(df, predQCol, scale, labelCol, bins, groupCols,
      "calibrationSummary")
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(gapNum).as("__eceNum"),
        max(gapNum.cast("double") /
          (col("n") * lit(scale)).cast("double")).as("mce"),
        sum(col("__sumsq")).as("__brierNum"))
      // N ≤ Long.Max/scale² proves both Σ|scale·n_pos − Σq| ≤ N·scale
      // and Σ(q − scale·y)² ≤ N·scale² never wrapped (post-aggregation
      // check, same contract as the per-bin ceiling)
      .withColumn("n",
        when(col("n") > Long.MaxValue / scale / scale,
          raise_error(concat(
            lit(s"calibrationSummary: group row count exceeds the " +
              s"exact-sum ceiling of ${Long.MaxValue / scale / scale} " +
              s"for scale=$scale — sample first, got "),
            col("n").cast("string"))))
          .otherwise(col("n")))
      .select((groupCols.map(col) :+ col("n") :+
        (col("__eceNum").cast("double") /
          (col("n") * lit(scale)).cast("double")).as("ece") :+
        col("mce") :+
        (col("__brierNum").cast("double") /
          (col("n") * lit(scale * scale)).cast("double")).as("brier")): _*)
  }

  /** Shared (group, bin) exact-integer aggregate behind
    * [[calibrationTable]] and [[calibrationSummary]]: guards inputs,
    * bins `⌊predQ·bins/scale⌋` clamped to `bins−1`, and returns
    * `(keys…, __bin, n, n_pos, __sumq, __sumsq)` where `__sumsq` is
    * `Σ(q − scale·y)²` (the Brier numerator). The per-bin ceiling
    * `n ≤ Long.Max/scale` proves Σq never wrapped — valid
    * POST-aggregation, so a too-big bin raises instead of silently
    * overflowing.
    */
  /** Exact two-sample Kolmogorov–Smirnov statistic per group — "did
    * this batch's length/score/quality distribution shift against the
    * reference corpus", the distribution-shape companion to the
    * token-level KL report ([[graft.text.Drift]]): KL sees vocabulary
    * drift, KS sees numeric-marginal drift (document lengths, quality
    * scores, model confidences) and is threshold-free.
    *
    * With per-distinct-value counts and cumulative sums `cumA_v, cumB_v`
    * over the SHARED value axis,
    *
    *   D = max_v |cumA_v / n_a − cumB_v / n_b|
    *
    * computed exactly as `d_num = max_v |cumA_v·n_b − cumB_v·n_a|` in
    * 64-bit integers with ONE final divide `ks = d_num / (n_a·n_b)` —
    * bit-identical in any engine (q109 replays it). `at_value` is the
    * SMALLEST value attaining the max — where the CDFs diverge most,
    * which is what a drift investigation looks at first.
    *
    * Scale shape: one map-side-combinable (group, value) histogram
    * aggregate over the tagged union (the shuffle carries DISTINCT
    * values, never rows — quantize continuous values first, as with
    * [[graft.sketch.Quantiles]]), then cumulative + whole-partition
    * windows sharing ONE exchange/sort, then a tiny per-group
    * aggregate. Groups empty on either side emit NULL statistics
    * (undefined, not silently 0); NULL values raise (they would
    * silently drop mass); `n_a·n_b` overflow raises rather than wraps
    * (ceiling ≈ 3e9 rows per group per side, same class as
    * [[cohensKappa]]).
    */
  def ksStatistic(
      a: DataFrame, b: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("n_a", "n_b", "d_num", "ks", "at_value")
    require(!groupCols.exists(reserved.contains),
      s"group columns may not be named any of ${reserved.mkString(", ")}")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    def side(df: DataFrame, flag: Int): DataFrame = {
      val base = if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
      val v = col(valueCol)
      base.select((keys.map(col) :+
        when(v.isNull, raise_error(lit(
          s"ksStatistic: NULL $valueCol — drop or impute explicitly, " +
            "a silent skip would shift the CDF")))
          .otherwise(v).as("__v") :+
        lit(flag).as("__side")): _*)
    }
    val hist = side(a, 0).unionByName(side(b, 1))
      .groupBy((keys.map(col) :+ col("__v")): _*)
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))

    // both windows share one partitioning → one exchange + one sort
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val guarded = hist
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__nb",
        when(col("__na") > 0L && col("__nb") > lit(Long.MaxValue) / col("__na"),
          raise_error(concat(lit("ksStatistic: n_a·n_b exceeds 64-bit "),
            lit("exact range — quantize or sample first (n_a="),
            col("__na").cast("string"), lit(", n_b="),
            col("__nb").cast("string"), lit(")"))))
          .otherwise(col("__nb")))
      .withColumn("__d",
        abs(sum(col("__ca")).over(wCum) * col("__nb") -
          sum(col("__cb")).over(wCum) * col("__na")))

    guarded
      .groupBy(keys.map(col): _*)
      .agg(
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        // min over (−d, v): largest d, then SMALLEST value attaining it
        min(struct((-col("__d")).as("nd"), col("__v").as("v"))).as("__m"))
      .select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
        when(col("n_a") > 0L && col("n_b") > 0L, -col("__m.nd"))
          .as("d_num") :+
        when(col("n_a") > 0L && col("n_b") > 0L,
          (-col("__m.nd")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("ks") :+
        when(col("n_a") > 0L && col("n_b") > 0L, col("__m.v"))
          .as("at_value")): _*)
  }

  private def binnedQuantized(
      df: DataFrame, predQCol: String, scale: Long, labelCol: String,
      bins: Int, groupCols: Seq[String], metric: String): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(scale < Long.MaxValue / bins,
      s"bins·scale must fit a long, got $bins × $scale")
    val keys = if (groupCols.nonEmpty) groupCols else Seq("__all")
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    val q = col(predQCol).cast("long")
    val guardedQ =
      when(q.isNull || q < 0L || q > scale,
        raise_error(concat(
          lit(s"$metric: $predQCol must be an integer in [0, $scale], got "),
          coalesce(col(predQCol).cast("string"), lit("NULL")))))
        .otherwise(q)
    val lab = col(labelCol).cast("long")
    val guardedLab =
      when(lab.isNull || (lab =!= 0L && lab =!= 1L),
        raise_error(concat(
          lit(s"$metric: $labelCol must be 0/1, got "),
          coalesce(col(labelCol).cast("string"), lit("NULL")))))
        .otherwise(lab)
    base0
      .select((keys.map(col) :+ guardedQ.as("__q") :+ guardedLab.as("__y")): _*)
      .withColumn("__bin",
        least(expr(s"(__q * ${bins}L) div ${scale}L"), lit(bins - 1L)))
      .withColumn("__d", col("__q") - lit(scale) * col("__y"))
      .groupBy((keys.map(col) :+ col("__bin")): _*)
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__q")).as("__sumq"),
        sum(col("__d") * col("__d")).as("__sumsq"))
      .withColumn("n",
        when(col("n") > Long.MaxValue / scale,
          raise_error(concat(
            lit(s"$metric: bin row count exceeds the exact-sum " +
              s"ceiling of ${Long.MaxValue / scale} for scale=$scale — " +
              "sample first, got "), col("n").cast("string"))))
          .otherwise(col("n")))
  }
}
