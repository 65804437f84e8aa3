package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen expression — the canonicalization step that MUST run before
  * any content fingerprinting of real-world text: "é" arrives both as
  * the precomposed U+00E9 and as "e"+U+0301 (combining acute), and
  * every byte-keyed operator downstream — exact dedup's md5 key, the
  * Karp-Rabin/winnowing fingerprints, MinHash shingles — treats those
  * as different documents unless the corpus is normalized first.
  * Map-only, zero shuffle; JDK `java.text.Normalizer` (no external
  * deps), already-NFC fast path via `isNormalized` (true for ASCII and
  * the vast majority of real text, skipping the allocation entirely).
  *
  * Spark has no built-in for this (SPARK-whitespace/lower cover case,
  * not composition); DuckDB replays it exactly via `nfc_normalize`
  * (q97), making the operator cross-engine checkable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static core (also called from generated code). The
    * `isNormalized` probe is O(n) with no allocation and answers true
    * for ASCII, so the common case returns the input UTF8String
    * untouched.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    ExpressionBridge.column(NfcNormalize(ExpressionBridge.expression(text)))
}
