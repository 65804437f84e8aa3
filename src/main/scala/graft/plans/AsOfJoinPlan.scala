package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ExpressionBridge

/** The custom whole-operator path (SURVEY §7 preference rung (c)):
  * as-of join as a first-class `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, planned through `experimental.extraStrategies`.
  *
  * The physical operator is a streaming sort-merge: it *declares* its
  * needs — both children hash-clustered on the join keys and sorted by
  * (keys, ts) — and `EnsureRequirements` inserts the exchanges/sorts,
  * so AQE, codegen'd children, and reuse all keep working around it.
  * Per partition it advances one right cursor per left row, retaining
  * only the latest right row per key: O(1) state, no buffering of
  * either side, versus the composed window form which materializes and
  * sorts |L|+|R| rows per key group. Semantics are pinned by an
  * equivalence test against [[graft.operators.AsOf.joinAsOf]] and the
  * same DuckDB ASOF JOIN oracle (q20).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsOrdering =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType))
      // bind against the *nullable* output attributes: unmatched rows are
      // a null-filled GenericInternalRow, and non-nullable bindings would
      // read primitive zeros instead of nulls
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // sorted-iterator rows reuse buffers; copy right rows on retention
      val rIter = rIter0.map(_.copy()).buffered
      var candidate: InternalRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l).copy()
        val lTsRow = lTsProj(l).copy()
        // consume right rows that are still at-or-before this left row
        var advancing = true
        while (advancing && rIter.hasNext) {
          val r = rIter.head
          val cmp = keyOrdering.compare(rKeyProj(r), lKey)
          if (cmp < 0 || (cmp == 0 && tsOrdering.compare(rTsProj(r), lTsRow) <= 0)) {
            val consumed = rIter.next()
            candidate =
              if (keyOrdering.compare(rKeyProj(consumed), lKey) == 0) consumed
              else null
          } else advancing = false
        }
        // a candidate retained for an earlier key is stale
        if (candidate != null && keyOrdering.compare(rKeyProj(candidate), lKey) != 0)
          candidate = null
        resultProj(joined(l, if (candidate == null) nullRight else candidate))
      }
    }
  }
}

object AsOfJoinPlan {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ExpressionBridge.addStrategy(spark, AsOfJoinStrategy)

  /** As-of left join through the custom operator; same output shape as
    * [[graft.operators.AsOf.joinAsOf]]: left columns, right payload
    * columns, `<tsCol>_right`.
    */
  def joinAsOfExec(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = ExpressionBridge.analyzedPlan(left)
    // Re-alias every right column: aliasing mints fresh exprIds, so the
    // two sides never share attribute ids even when both derive from the
    // same base relation (self-join lineage). Without this,
    // DeduplicateRelations re-aliases the right *child* but cannot remap
    // this custom node's right-side key expressions — they would then
    // resolve against the left side and column pruning would drop the
    // right join keys.
    val rPlan = ExpressionBridge.analyzedPlan(
      right.select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*))
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val logical = AsOfJoin(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, tsCol), attr(rPlan, tsCol))
    val joined = ExpressionBridge.dataFrame(spark, logical)
    // disambiguate duplicate names: project by attribute reference
    val rightPayload = rPlan.output.filterNot(a => keys.contains(a.name) || a.name == tsCol)
    val cols =
      lPlan.output.map(a => ExpressionBridge.column(a)) ++
        rightPayload.map(a => ExpressionBridge.column(a).as(a.name)) :+
        ExpressionBridge.column(attr(rPlan, tsCol)).as(s"${tsCol}_right")
    joined.select(cols: _*)
  }
}
