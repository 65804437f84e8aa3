package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (the BERT serving path) — the fourth classic
  * subword family beside BPE ([[graft.text.Bpe]], merge-rule replay),
  * unigram-LM ([[UnigramSegment]], globally optimal Viterbi) and flat
  * greedy longest-match ([[VocabTokenize]], no word boundaries):
  * WordPiece is PER-WORD greedy longest-match where non-initial pieces
  * are looked up under a continuation prefix (`##`), and a word that
  * cannot be fully covered collapses to ONE `unk` token — never a
  * partial piece list (the all-or-nothing rule is what distinguishes
  * it from plain maximal munch, and what makes its unk statistics a
  * vocabulary-coverage signal).
  *
  * Determinism: greedy longest-match has no ties (candidate lengths at
  * a position are distinct), so the piece sequence is a pure function
  * of (text, vocab) — replayable in any engine with substring matching
  * (the q200 oracle replays it in DuckDB as a recursive longest-prefix
  * scan over DISTINCT words, then joins back to word instances: the
  * Heaps'-law trick — segmentation cost scales with vocabulary, not
  * corpus).
  *
  * Scale shape: map-only, one projection over the scan, whole-stage
  * codegen via a static core; the vocabulary rides the closure as two
  * hash sets (word-initial pieces and continuation pieces, stored
  * stripped of the prefix) probed at most `maxLen` times per position
  * — O(len · maxLen) per document, independent of corpus size.
  */
case class WordPieceTokenize(
    child: Expression, vocab: IndexedSeq[String], unk: String,
    contPrefix: String)
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocabulary must not be empty")
  require(contPrefix.nonEmpty, "continuation prefix must not be empty")
  require(vocab.forall(_.nonEmpty), "vocabulary entries must be non-empty")
  require(vocab.forall(e => e.length > contPrefix.length ||
    !e.startsWith(contPrefix)),
    "a bare continuation prefix is not a valid vocabulary entry")
  require(vocab.distinct.size == vocab.size, "duplicate vocabulary entries")

  @transient private lazy val initSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(e => if (!e.startsWith(contPrefix)) s.add(e))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(e =>
      if (e.startsWith(contPrefix)) s.add(e.substring(contPrefix.length)))
    s
  }
  @transient private lazy val maxInit: Int =
    vocab.filter(!_.startsWith(contPrefix))
      .foldLeft(0)((m, e) => math.max(m, e.length))
  @transient private lazy val maxCont: Int =
    vocab.filter(_.startsWith(contPrefix))
      .foldLeft(0)((m, e) => math.max(m, e.length - contPrefix.length))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokenize requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordPieceTokenize.tokenize(
      input.asInstanceOf[UTF8String].toString, initSet, contSet,
      maxInit, maxCont, unk, contPrefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WordPieceTokenize.getClass.getName.stripSuffix("$")
      val initRef = ctx.addReferenceObj("wpInit", initSet, "java.util.HashSet")
      val contRef = ctx.addReferenceObj("wpCont", contSet, "java.util.HashSet")
      val unkRef = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
      val preRef = ctx.addReferenceObj("wpPre", contPrefix, "java.lang.String")
      s"${ev.value} = $cls.tokenize($c.toString(), $initRef, $contRef, " +
        s"$maxInit, $maxCont, $unkRef, $preRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenize =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_tokenize"
}

object WordPieceTokenize {

  /** Static tight-loop core (also called from generated code). */
  def tokenize(
      text: String, init: java.util.HashSet[String],
      cont: java.util.HashSet[String], maxInit: Int, maxCont: Int,
      unk: String, contPrefix: String): ArrayData = {
    val n = text.length
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n / 4 + 1)
    val pieces = new scala.collection.mutable.ArrayBuffer[UTF8String](8)
    var i = 0
    while (i < n) {
      if (Character.isWhitespace(text.charAt(i))) i += 1
      else {
        var e = i + 1
        while (e < n && !Character.isWhitespace(text.charAt(e))) e += 1
        // greedy longest-match within [i, e); all-or-nothing
        pieces.clear()
        var p = i
        var ok = true
        while (ok && p < e) {
          val atStart = p == i
          val set = if (atStart) init else cont
          var len = math.min(if (atStart) maxInit else maxCont, e - p)
          var matched = -1
          while (len >= 1 && matched < 0) {
            if (set.contains(text.substring(p, p + len))) matched = len
            len -= 1
          }
          if (matched < 0) ok = false
          else {
            val piece = text.substring(p, p + matched)
            pieces += UTF8String.fromString(
              if (atStart) piece else contPrefix + piece)
            p += matched
          }
        }
        if (ok) out ++= pieces else out += UTF8String.fromString(unk)
        i = e
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def wordPieceTokenize(
      text: Column, vocab: Seq[String], unk: String = "[UNK]",
      contPrefix: String = "##"): Column =
    ExpressionBridge.column(WordPieceTokenize(
      ExpressionBridge.expression(text), vocab.toIndexedSeq, unk, contPrefix))
}
