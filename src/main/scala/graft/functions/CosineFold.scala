package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity of two `array<double>` columns with the
  * engine's cross-engine fold contract: sequential left-to-right double
  * folds for the dot product and both norms, then
  * `dot / (sqrt(na) * sqrt(nb))` — operation-for-operation the same
  * IEEE arithmetic as the composed
  * [[graft.sim.Similarity.cosineColumns]] (`aggregate`/`zip_with`/
  * `transform` lambdas) and as DuckDB's
  * `list_reduce(list_transform(...))` oracle replay, so results are
  * bit-identical across all three (equivalence pinned in
  * SimilaritySpec).
  *
  * Exists because the composed form runs three interpreted
  * higher-order-function folds per row — the inner loop of the exact
  * cosine-pair verification, quadratic in candidate count. Edge
  * semantics mirror the composed form exactly: zero norms divide to
  * NaN/Infinity (callers' threshold filters drop them), mismatched
  * lengths and null elements yield null (zip_with pads with null and
  * null poisons the fold).
  */
case class CosineFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_fold requires two array<double> inputs, got $l and $r")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = arrA.getDouble(i)
      val y = arrB.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0d;
         |  double $na = 0.0d;
         |  double $nb = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineFold =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_fold"
}

object CosineFold {
  /** Casts both sides to `array<double>` like the composed form. */
  def cosineFold(a: Column, b: Column): Column =
    ExpressionBridge.column(CosineFold(
      ExpressionBridge.expression(a.cast("array<double>")),
      ExpressionBridge.expression(b.cast("array<double>"))))
}
