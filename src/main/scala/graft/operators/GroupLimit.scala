package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group row capping — the "at most k documents per domain /
  * language / user" primitive every training-data pipeline needs to
  * stop hot groups from dominating a corpus.
  *
  * Shape: `row_number` over (group, order) filtered to `<= k`. That is
  * deliberately the one window form Spark's `InferWindowGroupLimit`
  * rewrites into a `WindowGroupLimit` physical node, which keeps a
  * bounded k-row heap *per group on the map side before the shuffle* —
  * so a group with 100M rows ships only k rows per input partition
  * instead of 100M rows to one reducer. The filter must compare a
  * `row_number`/`rank`/`dense_rank` against a literal for the rewrite
  * to fire; a plan test pins the `WindowGroupLimit` node.
  *
  * Beyond-reference §2.11 surface (the reference's samplers are
  * row-wise; corpus balancing needs group-wise caps).
  */
object GroupLimit {

  /** Keep the first `k` rows of each group in `orderCols` order.
    * `orderCols` must totally order rows within a group (end with a
    * unique tie-break column) or the selection is nondeterministic
    * under retries — same contract as any distributed top-k.
    *
    * `rankCol`: when non-empty, the 1-based position survives in the
    * output under that name.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    val rn = if (rankCol.nonEmpty) rankCol else "__rn"
    val ranked = df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
    if (rankCol.nonEmpty) ranked else ranked.drop(rn)
  }

  /** Deterministic pseudo-random sample of `k` rows per group: rows are
    * ranked by `xxhash64(seed, idCol)` — stable across runs, retries and
    * cluster layouts, unlike `rand()`-based sampling (R1 vs R2 in the
    * reference's sampling split: entropy when you want it, a hash when
    * you must reproduce — `samplers.py:21-33`). `idCol` must be unique
    * per row or duplicates collide on the same rank key.
    */
  def deterministicSamplePerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      seed: Long = 42L): DataFrame =
    topKPerGroup(df, groupCols,
      Seq(xxhash64(lit(seed), col(idCol)).asc, col(idCol).asc), k)
}
