package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization (the SentencePiece serving path): segment
  * text into the vocabulary tokenization that MAXIMIZES the sum of
  * per-token scores — Viterbi over token lattice positions. This is
  * the third classic subword family next to the engine's BPE
  * ([[graft.text.Bpe]], merge-rule driven) and longest-match
  * ([[VocabTokenize]], greedy): unigram picks the GLOBALLY best
  * segmentation, so a high-scoring long token wins even when greedy
  * munch would have committed to a shorter prefix.
  *
  * Scores are caller-supplied integers (e.g. Q20 fixed-point log
  * frequencies from [[ILog2Q20]]-style exact math — the engine's
  * standard trick for replayable "floats"); characters not covered by
  * any token fall back to a single-character `unkScore`, so every text
  * has a segmentation (SentencePiece's character-coverage property).
  *
  * Determinism: the DP is exact integer arithmetic; ties (equal best
  * total at a position) resolve to the candidate with the SMALLEST
  * start — i.e. the longest last token — making the tokenization a
  * pure function of (text, vocab, scores), replayed in SQL as a
  * recursive best-score walk with the same tie rule (q198).
  *
  * Scale shape: map-only, one O(len · maxTokenLen) pass per document
  * (hash probe per candidate length), whole-stage codegen via a
  * static core; the vocabulary rides the closure once per executor.
  * Output is `(start, len)` spans — the caller slices text once.
  */
case class UnigramSegment(
    child: Expression, vocab: IndexedSeq[(String, Long)], unkScore: Long)
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocabulary must not be empty")
  require(vocab.forall(_._1.nonEmpty), "vocabulary tokens must be non-empty")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "duplicate vocabulary tokens")

  // java.lang.Long values: a primitive-Long map would silently unbox a
  // missing key's null to 0 — an absent token must be null, not score 0
  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, s) => m.put(t, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxLen: Int = vocab.iterator.map(_._1.length).max

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.segment(
      input.asInstanceOf[UTF8String].toString, scores, maxLen, unkScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = UnigramSegment.getClass.getName.stripSuffix("$")
      val mapRef = ctx.addReferenceObj("unigramScores", scores,
        "java.util.HashMap")
      s"${ev.value} = $cls.segment($c.toString(), $mapRef, $maxLen, ${unkScore}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {

  /** Static tight-loop core (also called from generated code). */
  def segment(
      text: String, scores: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkScore: Long): ArrayData = {
    val n = text.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Long](n + 1)
    val from = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      // unk fallback: one character from j-1 (the largest start, so any
      // real token that TIES it wins the smallest-start rule below)
      var b = best(j - 1) + unkScore
      var f = j - 1
      var len = math.min(maxLen, j)
      // lengths descending = starts ascending: on ties keep the FIRST
      // (smallest start / longest token)
      while (len >= 1) {
        val i = j - len
        val s = scores.get(text.substring(i, j))
        if (s != null) {
          val cand = best(i) + s.longValue()
          if (cand > b || (cand == b && i < f)) { b = cand; f = i }
        }
        len -= 1
      }
      best(j) = b
      from(j) = f
      j += 1
    }
    // backtrack into spans
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var p = n
    while (p > 0) {
      val i = from(p)
      out += new GenericInternalRow(Array[Any](i, p - i))
      p = i
    }
    val arr = out.reverse.toArray
    new GenericArrayData(arr)
  }

  def unigramSegment(
      text: Column, vocab: Seq[(String, Long)], unkScore: Long): Column =
    ExpressionBridge.column(UnigramSegment(
      ExpressionBridge.expression(text), vocab.toIndexedSeq, unkScore))
}
