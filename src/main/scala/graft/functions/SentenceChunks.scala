package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sentence-boundary-aware chunk spans — the RAG/embedding prep step
  * [[graft.text.Chunking]]'s fixed-stride form cannot give: chunks
  * never split mid-sentence, so no embedding ever sees half a claim.
  * One O(len) pass per document emitting `(start, len)` spans; the
  * caller slices text with `substring` (chunk content never rides the
  * expression output twice).
  *
  * Boundary rule (exact, engine-replayable — no regex dialects): a
  * sentence ends after a `.`, `!` or `?` whose next character is a
  * space (or end of text) — a punctuation RUN therefore ends at its
  * last character, and abbreviation dots inside words (`e.g.x`) do not
  * split. The trailing unterminated fragment is a sentence. A
  * sentence's leading spaces are skipped when it OPENS a chunk;
  * all-space sentences are dropped.
  *
  * Packing rule: greedy — a chunk absorbs consecutive sentences while
  * its span stays ≤ `maxChars`; a single sentence longer than
  * `maxChars` forms its own oversized chunk (never split — the
  * operator's contract), surfaced by `len > maxChars` rather than
  * silently truncated.
  *
  * Positions are 0-based UTF-16 units (identical to character offsets
  * for ASCII/BMP text; normalize upstream for supplementary planes —
  * the same contract as the engine's other offset emitters).
  *
  * Scale shape: map-only, whole-stage codegen via a static core,
  * output is #chunks spans per document — corpus-size-independent
  * per-row cost.
  */
case class SentenceChunks(child: Expression, maxChars: Int)
    extends UnaryExpression {

  require(maxChars >= 1, s"maxChars must be >= 1, got $maxChars")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sentence_chunks requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SentenceChunks.spans(input.asInstanceOf[UTF8String].toString, maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = SentenceChunks.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.spans($c.toString(), $maxChars);"
    })

  override protected def withNewChildInternal(newChild: Expression): SentenceChunks =
    copy(child = newChild)

  override def prettyName: String = "sentence_chunks"
}

object SentenceChunks {

  /** Static tight-loop core (also called from generated code). */
  def spans(text: String, maxChars: Int): ArrayData = {
    val n = text.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    def emit(start: Int, end: Int): Unit =
      out += new GenericInternalRow(
        Array[Any](start, end - start))
    var curStart = -1 // open chunk's start, or -1
    var prevEnd = -1  // open chunk's current end (last absorbed sentence)
    var sStart = 0    // current sentence start (may include leading spaces)
    var p = 0
    while (p < n) {
      val c = text.charAt(p)
      val isEnd = (c == '.' || c == '!' || c == '?') &&
        (p + 1 == n || text.charAt(p + 1) == ' ')
      if (isEnd || p + 1 == n) {
        val sEnd = p + 1
        // skip the sentence's leading spaces; all-space sentences drop
        var eff = sStart
        while (eff < sEnd && text.charAt(eff) == ' ') eff += 1
        if (eff < sEnd) {
          if (curStart < 0) { curStart = eff; prevEnd = sEnd }
          else if (sEnd - curStart > maxChars) {
            emit(curStart, prevEnd)
            curStart = eff; prevEnd = sEnd
          } else prevEnd = sEnd
        }
        sStart = sEnd
      }
      p += 1
    }
    if (curStart >= 0) emit(curStart, prevEnd)
    new GenericArrayData(out.toArray)
  }

  def sentenceChunks(text: Column, maxChars: Int): Column =
    ExpressionBridge.column(SentenceChunks(
      ExpressionBridge.expression(text), maxChars))
}
