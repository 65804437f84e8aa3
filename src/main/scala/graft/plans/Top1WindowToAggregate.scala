package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Rewrites the "top-1 per group" window idiom
  *
  * {{{ filter(row_number().over(partitionBy(K).orderBy(o)) === 1) }}}
  *
  * into a `min_by`/`max_by` hash aggregate on K: the window form
  * shuffles every row AND sorts each partition before discarding all
  * but one row per group, while the aggregate form map-side-combines
  * duplicates before the exchange and never sorts — the shape
  * [[graft.dedup.Dedup.exactDedup]] uses directly, generalized here to
  * any user query written with the window idiom. (Spark's own
  * InferWindowGroupLimit only limits rows per group inside the sort; it
  * keeps the Window operator and its sort.)
  *
  * Fires only when the rewrite is semantics-preserving:
  *   - exactly one window expression, and it is `row_number()`;
  *   - the filter condition is exactly `rn = 1`;
  *   - one ordering key, deterministic and non-nullable (nullable keys
  *     sort NULLS FIRST under the window but are ignored by min_by);
  *   - non-empty partition spec (a global top-1 is a cheap sorted limit
  *     already).
  *
  * Tie-breaking note: when the ordering key is not unique within a
  * group, both forms return an unspecified member of the tied set
  * (row_number over a non-total order is nondeterministic in Spark), so
  * the rewrite stays within the contract.
  *
  * The row_number column survives as a literal 1 with the original
  * expression id — downstream projections that reference or drop it
  * resolve unchanged.
  */
object Top1WindowToAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(we: WindowExpression, _)),
          partitionSpec, Seq(order), windowChild, _))
        if we.windowFunction.isInstanceOf[RowNumber] &&
          isEqOne(cond, alias.toAttribute) &&
          partitionSpec.nonEmpty && partitionSpec.forall(_.deterministic) &&
          order.child.deterministic && !order.child.nullable =>
      // Spark's InferWindowGroupLimit may already have slipped a
      // WindowGroupLimit under the Window; peel it, or its per-group
      // sort+limit would survive as dead weight below the aggregate
      val child = windowChild match {
        case WindowGroupLimit(ps, os, _: RowNumber, 1, c)
            if ps == partitionSpec && os == Seq(order) => c
        case c => c
      }
      val value = CreateStruct(child.output)
      val aggFn = order.direction match {
        case Ascending => MinBy(value, order.child)
        case Descending => MaxBy(value, order.child)
      }
      val top = Alias(aggFn.toAggregateExpression(), "__top1")()
      val agg = Aggregate(partitionSpec, Seq(top), child)
      val topRef = top.toAttribute
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(topRef, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      val rnOut = Alias(Literal(1, IntegerType), alias.name)(exprId = alias.exprId)
      Project(restored :+ rnOut, agg)
  }

  private def isEqOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }
}
