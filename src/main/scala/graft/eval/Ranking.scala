package graft.eval

import org.apache.spark.sql.DataFrame
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
}
