package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Q20 fixed-point integer binary logarithm —
  * `⌊2^20 · log2(s / 2^20)⌋` of a positive long via 20
  * square-and-shift rounds ([[graft.text.Dsir.ilog2Q20]] as a native
  * codegen scalar).
  *
  * Exists for DISTRIBUTED exact-log scoring over corpus-sized tables
  * (n-gram language-model probabilities in [[graft.text.NgramLm]],
  * where the (bigram → count) table is as big as the training corpus's
  * vocabulary square and can never collect to the driver the way
  * DSIR's bounded bucket table does). Pure integer multiply/shift/
  * compare — bit-identical in any engine; DuckDB replays it as a
  * 20-round recursive CTE. Inputs ≤ 0 clamp to 1 (one Q20 ulp above
  * zero), matching the scalar form.
  */
case class ILog2Q20(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ilog2_q20 requires a bigint input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    graft.text.Dsir.ilog2Q20(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.Dsir.ilog2Q20($c);")

  override protected def withNewChildInternal(newChild: Expression): ILog2Q20 =
    copy(child = newChild)

  override def prettyName: String = "ilog2_q20"
}

object ILog2Q20 {
  def ilog2Q20(s: Column): Column =
    ExpressionBridge.column(ILog2Q20(ExpressionBridge.expression(s)))
}
