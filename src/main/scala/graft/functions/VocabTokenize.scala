package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary tokenizer — greedy maximal munch: at each position emit
  * the LONGEST vocabulary entry that matches, else one `unk` token and
  * advance a single character. This is the WordPiece/longest-match
  * family of subword tokenization (vocab entries may span spaces, so
  * frequent multi-word units tokenize as one symbol), as a native
  * codegen expression: token counting against a real vocabulary is a
  * per-document quality/cost signal no whitespace split can give.
  *
  * Determinism: maximal munch has no ties (lengths are distinct), so
  * the tokenization is a pure function of (text, vocab) — replayable
  * in any engine with substring matching; the q56 oracle replays it in
  * DuckDB as a recursive longest-prefix scan. Matching is by exact
  * character comparison (no case folding — normalize upstream).
  *
  * Scale shape: map-only, one projection over the scan; the vocabulary
  * rides the closure as a reference object (hash set + max entry
  * length), so each position costs at most `maxLen` hash probes —
  * O(len · maxLen) per document, independent of corpus size.
  */
case class VocabTokenize(
    child: Expression, vocab: IndexedSeq[String], unk: String)
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocabulary must not be empty")
  require(vocab.forall(_.nonEmpty), "vocabulary entries must be non-empty")
  require(vocab.distinct.size == vocab.size, "duplicate vocabulary entries")

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int = vocab.iterator.map(_.length).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_tokenize requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VocabTokenize.tokenize(
      input.asInstanceOf[UTF8String].toString, set, maxLen, unk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = VocabTokenize.getClass.getName.stripSuffix("$")
      val setRef = ctx.addReferenceObj("vocabSet", set, "java.util.HashSet")
      val unkRef = ctx.addReferenceObj("unkTok", unk, "java.lang.String")
      s"${ev.value} = $cls.tokenize($c.toString(), $setRef, $maxLen, $unkRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): VocabTokenize =
    copy(child = newChild)

  override def prettyName: String = "vocab_tokenize"
}

object VocabTokenize {

  /** Static tight-loop core (also called from generated code). */
  def tokenize(
      text: String, vocab: java.util.HashSet[String], maxLen: Int,
      unk: String): ArrayData = {
    val n = text.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n / 4 + 1)
    var p = 0
    while (p < n) {
      var len = math.min(maxLen, n - p)
      var matched = -1
      while (len >= 1 && matched < 0) {
        if (vocab.contains(text.substring(p, p + len))) matched = len
        len -= 1
      }
      if (matched > 0) {
        out += UTF8String.fromString(text.substring(p, p + matched))
        p += matched
      } else {
        out += UTF8String.fromString(unk)
        // advance one CODE POINT: a supplementary character is one
        // unmatched character, not two (surrogate halves are never
        // valid match positions anyway)
        p += Character.charCount(text.codePointAt(p))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def vocabTokenize(
      text: Column, vocab: Seq[String], unk: String = "<unk>"): Column =
    ExpressionBridge.column(VocabTokenize(
      ExpressionBridge.expression(text), vocab.toIndexedSeq, unk))
}
