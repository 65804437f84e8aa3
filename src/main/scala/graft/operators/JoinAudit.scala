package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight audit for a planned join — answers, BEFORE the shuffle is
  * paid, the three questions that decide whether a 100 TB join is safe:
  * how many rows will come out (a fan-out join can emit orders of
  * magnitude more than either input), which keys are hot (one skewed
  * key stalls the whole stage on a single task — the trigger for
  * [[Skew.saltedJoin]]), and how well the key sets actually overlap
  * (a near-empty intersection usually means a wrong key column, caught
  * here for the cost of two count aggregates instead of a wasted run).
  *
  * Everything is computed on the per-key COUNT tables — distinct-keys-
  * sized, never a row-level shuffle of either input — joined once:
  * exact output cardinality is Σ over matched keys of
  * `left_rows · right_rows` (inner-join semantics; NULL keys never
  * match, and are tallied separately as data-quality signal).
  *
  * [[summary]] is the one-row gate; [[hotKeys]] names the top-k keys by
  * output contribution — the exact salting / broadcast-filter targets —
  * through a global bounded top-k (TakeOrdered: each partition forwards
  * at most k candidate keys, no full sort).
  */
object JoinAudit {

  /** Per-key count tables joined full-outer: the common core. */
  private def keyCounts(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val cl = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("left_rows"))
    val cr = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("right_rows"))
    cl.join(cr, Seq("key"), "full_outer")
  }

  /** One row: `left_rows, right_rows, left_null_keys, right_null_keys,
    * left_keys, right_keys, matched_keys, left_only_keys,
    * right_only_keys, out_rows, max_key_out` — the inner-join forecast.
    */
  def summary(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val kc = keyCounts(left, right, leftKey, rightKey)
    val nulls = graft.core.Scalars.withScalars(
      left.agg(
        coalesce(sum(when(col(leftKey).isNull, 1L).otherwise(0L)), lit(0L))
          .as("left_null_keys")),
      right.agg(
        coalesce(sum(when(col(rightKey).isNull, 1L).otherwise(0L)), lit(0L))
          .as("right_null_keys")))
    val agg = kc.agg(
      coalesce(sum(col("left_rows")), lit(0L)).as("left_rows"),
      coalesce(sum(col("right_rows")), lit(0L)).as("right_rows"),
      count(col("left_rows")).as("left_keys"),
      count(col("right_rows")).as("right_keys"),
      coalesce(sum(when(
        col("left_rows").isNotNull && col("right_rows").isNotNull, 1L)
        .otherwise(0L)), lit(0L)).as("matched_keys"),
      coalesce(sum(when(col("right_rows").isNull, 1L).otherwise(0L)), lit(0L))
        .as("left_only_keys"),
      coalesce(sum(when(col("left_rows").isNull, 1L).otherwise(0L)), lit(0L))
        .as("right_only_keys"),
      coalesce(sum(col("left_rows") * col("right_rows")), lit(0L))
        .as("out_rows"),
      coalesce(max(col("left_rows") * col("right_rows")), lit(0L))
        .as("max_key_out"))
    graft.core.Scalars.withScalars(agg, nulls)
      .select("left_rows", "right_rows", "left_null_keys",
        "right_null_keys", "left_keys", "right_keys", "matched_keys",
        "left_only_keys", "right_only_keys", "out_rows", "max_key_out")
  }

  /** Top-`k` matched keys by output contribution `(key, left_rows,
    * right_rows, out_rows)`, ties to the smaller key — the rows to feed
    * a salting list or a "handle these keys separately" branch.
    */
  def hotKeys(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    keyCounts(left, right, leftKey, rightKey)
      .filter(col("left_rows").isNotNull && col("right_rows").isNotNull)
      .select(col("key"), col("left_rows"), col("right_rows"),
        (col("left_rows") * col("right_rows")).as("out_rows"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(k)
  }
}
