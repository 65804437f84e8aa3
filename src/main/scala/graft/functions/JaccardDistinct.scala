package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Native Jaccard similarity of two array columns (string, long, or int
  * elements): |A ∩ B| / |A ∪ B| over distinct elements, with the
  * empty-∪-empty convention of 1.0 (two empty sets are identical).
  *
  * Exists because the composed form —
  * `size(array_intersect(a,b)) / size(array_union(a,b))` plus an
  * `array_union`-based empty guard — evaluates three interpreted
  * collection expressions per row, each building its own hash structure
  * over both arrays. This is the verification inner loop of MinHash-LSH
  * dedup (millions of candidate pairs at scale), so one fused pass
  * matters: build one hash set over A, stream B through it once.
  * Counts equal the builtins' distinct-semantics counts and the final
  * value is the same single IEEE divide, so results are bit-identical
  * to the composed form (equivalence pinned in DedupSpec).
  *
  * Null slots count as one distinct element (the builtins' semantics —
  * `array_union([1, NULL], [2])` has three members); a null ARRAY
  * yields null.
  */
case class JaccardDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == r && supported(l) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_distinct requires two arrays of string/bigint/int elements, got $l and $r")
    }

  @transient private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  private def elem(arr: ArrayData, i: Int): AnyRef =
    if (arr.isNullAt(i)) JaccardDistinct.nullSentinel()
    else elemType match {
      case StringType => arr.getUTF8String(i)
      case LongType => java.lang.Long.valueOf(arr.getLong(i))
      case IntegerType => java.lang.Integer.valueOf(arr.getInt(i))
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[AnyRef](math.max(arrA.numElements() * 2, 8))
    var i = 0
    while (i < arrA.numElements()) {
      setA.add(elem(arrA, i))
      i += 1
    }
    val seenB = new java.util.HashSet[AnyRef](math.max(arrB.numElements() * 2, 8))
    var inter = 0
    var onlyB = 0
    var j = 0
    while (j < arrB.numElements()) {
      val v = elem(arrB, j)
      if (seenB.add(v)) {
        if (setA.contains(v)) inter += 1 else onlyB += 1
      }
      j += 1
    }
    val union = setA.size() + onlyB
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // boxed accessor per element type; null slots map to the shared
      // sentinel so NULL counts as one distinct element, matching
      // array_intersect/array_union semantics
      val sentinel = "graft.functions.JaccardDistinct.nullSentinel()"
      def get(arr: String, idx: String): String = {
        val v = elemType match {
          case StringType => s"$arr.getUTF8String($idx)"
          case LongType => s"java.lang.Long.valueOf($arr.getLong($idx))"
          case IntegerType => s"java.lang.Integer.valueOf($arr.getInt($idx))"
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        s"($arr.isNullAt($idx) ? (Object) $sentinel : (Object) $v)"
      }
      val setA = ctx.freshName("setA")
      val seenB = ctx.freshName("seenB")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val inter = ctx.freshName("inter")
      val onlyB = ctx.freshName("onlyB")
      val union = ctx.freshName("union")
      s"""
         |java.util.HashSet $setA = new java.util.HashSet(Math.max($a.numElements() * 2, 8));
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $setA.add(${get(a, i)});
         |}
         |java.util.HashSet $seenB = new java.util.HashSet(Math.max($b.numElements() * 2, 8));
         |int $inter = 0;
         |int $onlyB = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  Object $v = ${get(b, j)};
         |  if ($seenB.add($v)) {
         |    if ($setA.contains($v)) $inter++; else $onlyB++;
         |  }
         |}
         |int $union = $setA.size() + $onlyB;
         |${ev.value} = $union == 0 ? 1.0d : (double) $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardDistinct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_distinct"
}

object JaccardDistinct {
  /** Distinct marker for null array slots — the builtins treat NULL as
    * one distinct set element. Reached from generated code through the
    * companion's static forwarder.
    */
  private val NullSentinelObj = new Object
  def nullSentinel(): AnyRef = NullSentinelObj

  def jaccardDistinct(a: Column, b: Column): Column =
    ExpressionBridge.column(
      JaccardDistinct(ExpressionBridge.expression(a), ExpressionBridge.expression(b)))
}
