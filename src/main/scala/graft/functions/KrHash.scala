package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial hash of a string's UTF-8 bytes —
  * `h = fold(h·257 + byte) mod (2^31 − 1)`, the same base/modulus as
  * [[WinnowingFingerprints]] — as a standalone scalar.
  *
  * Exists for CROSS-ENGINE REPLAYABLE bucketing
  * ([[graft.text.Dsir]]'s hashed n-gram features): unlike xxhash64 or
  * crc32, this fold is expressible in any engine with a list fold
  * (DuckDB: `list_reduce(list_transform(range(...), ord(substr(...))),
  * (a, b) -> (a*257 + b) % 2147483647)` — byte ≡ code point for ASCII
  * inputs, so oracle queries filter to ASCII like q30/q45).
  * Deterministic, null-safe, non-cryptographic.
  */
case class KrHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kr_hash requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    KrHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = KrHash.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.hash($c.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): KrHash =
    copy(child = newChild)

  override def prettyName: String = "kr_hash"
}

object KrHash {

  private val Base = 257L
  private val Prime = (1L << 31) - 1

  /** Static tight-loop core (also called from generated code). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xFF)) % Prime
      i += 1
    }
    h
  }

  def krHash(text: Column): Column =
    ExpressionBridge.column(KrHash(ExpressionBridge.expression(text)))
}
