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
    val base0 =
      if (groupCols.nonEmpty) df else df.withColumn("__all", lit(0))
    val lab = col(labelCol).cast("long")
    val base = base0.select(
      (keys.map(col) :+ col(predCol).as("__s") :+
        when(lab.isNull || (lab =!= 0L && lab =!= 1L),
          raise_error(concat(
            lit(s"rocAuc: $labelCol must be 0/1, got "),
            coalesce(col(labelCol).cast("string"), lit("NULL")))))
          .otherwise(lab).as("__y")): _*)

    val hist = base
      .groupBy((keys.map(col) :+ col("__s")): _*)
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__n"))

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
}
