package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard size cap enforced *inside* the aggregation
  * buffer: accumulation stops at `cap + 1` elements and [[eval]] returns
  * null for any group that exceeded `cap`.
  *
  * Exists for LSH bucket materialization (MinHash / SimHash / hyperplane
  * near-dup candidate generation): a `collect_list` + `filter(size <= cap)`
  * pipeline only applies the guard *after* the full list is built, so one
  * pathological bucket (boilerplate headers, empty documents, near-zero
  * vectors) with tens of millions of members becomes a multi-GB single
  * aggregation buffer — an executor OOM — before the filter ever runs.
  * This aggregate bounds every buffer at `cap + 1` elements regardless of
  * group size: the memory guard holds at 100 TB, not just at test scale.
  *
  * Why `cap + 1` and not `cap`: retaining one extra element is what lets
  * [[eval]] distinguish "exactly cap members" (keep) from "more than cap
  * members" (drop — return null). Merge respects the same bound, so
  * partial aggregation (map-side combine through ObjectHashAggregateExec)
  * keeps the invariant end-to-end.
  *
  * Null inputs are skipped (collect_list semantics). Element order is
  * accumulation order — nondeterministic across runs, exactly like
  * `collect_list`; downstream consumers must not depend on it (the dedup
  * pipelines explode to pairs and `distinct`, which is order-insensitive).
  */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length <= cap) {
      val v = child.eval(input)
      // copy: unsafe-backed values (UTF8String, UnsafeRow, array slices)
      // are views into transient row buffers
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(
      a: mutable.ArrayBuffer[Any], b: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < b.length && a.length <= cap) { a += b(i); i += 1 }
    a
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    if (buffer.length > cap) null else new GenericArrayData(buffer.toArray)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buffer = new mutable.ArrayBuffer[Any](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      buffer += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buffer
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
  override def prettyName: String = "capped_collect_list"
}

object CappedCollectList {
  /** Aggregate column: list of `child` values, or null when the group
    * exceeds `cap` members. Buffer memory is bounded at `cap + 1`
    * elements per group.
    */
  def cappedCollectList(child: Column, cap: Int): Column =
    ExpressionBridge.column(
      CappedCollectList(ExpressionBridge.expression(child), cap)
        .toAggregateExpression())
}
