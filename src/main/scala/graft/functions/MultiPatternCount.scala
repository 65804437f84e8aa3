package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via an Aho-Corasick automaton —
  * the blocklist/watchlist primitive of corpus curation: count, for
  * every pattern in a fixed list, its occurrences (at EVERY start
  * position, overlapping included) in one O(len + matches) scan per
  * document, independent of the number of patterns. The per-pattern
  * alternative is |patterns| scans per document — at 100 TB with a
  * thousand-entry blocklist that is the difference between one corpus
  * pass and a thousand.
  *
  * Returns `array<int>` of counts aligned with the constructor's
  * pattern order. Matching is exact by Java `char` (UTF-16 code unit)
  * comparison — no case folding, no normalization (normalize upstream
  * with [[NfcNormalize]]/`lower` if wanted); counts are therefore a
  * pure function of (text, patterns) and replayable in any engine
  * with substring equality (q175 replays position-by-position in
  * DuckDB over the ASCII documents corpus).
  *
  * The automaton (goto/fail/output structure, Aho & Corasick 1975) is
  * built once on the driver per expression instance and rides the
  * closure / generated-code references like [[VocabTokenize]]'s vocab
  * set — per-row work never rebuilds it. Scale shape: map-only, one
  * codegen'd projection over the scan, no shuffle, no UDF.
  */
case class MultiPatternCount(child: Expression, patterns: IndexedSeq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "patterns must not be empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")
  require(patterns.distinct.size == patterns.size, "duplicate patterns")

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_count requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    automaton.countAll(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj(
        "acAutomaton", automaton, classOf[AhoCorasick].getName)
      s"${ev.value} = $acRef.countAll($c.toString());"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCount = copy(child = newChild)

  override def prettyName: String = "multi_pattern_count"
}

object MultiPatternCount {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ExpressionBridge

  def multiPatternCount(text: Column, patterns: Seq[String]): Column =
    ExpressionBridge.column(MultiPatternCount(
      ExpressionBridge.expression(text), patterns.toIndexedSeq))
}

/** Classic Aho-Corasick: trie + BFS failure links + output links.
  * Node arrays are flat ints; transitions are a per-node sorted char
  * array binary-searched at match time (documents are arbitrary
  * unicode — a dense 64k fan-out per node would be wasteful, and
  * blocklist tries are sparse). Serializable so it can ride the task
  * closure and codegen reference objects.
  */
final class AhoCorasick(patterns: IndexedSeq[String]) extends Serializable {

  require(patterns.nonEmpty, "patterns must not be empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  import scala.collection.mutable

  // --- trie build (driver-side, once per expression instance; the
  // --- builders are transient — only the flat arrays ship) ---
  @transient private val childMaps =
    mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
  // pattern indices terminating at each node
  @transient private val terminal =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { ch =>
      node = childMaps(node).getOrElseUpdate(ch, {
        childMaps += mutable.TreeMap.empty[Char, Int]
        terminal += mutable.ArrayBuffer.empty[Int]
        childMaps.length - 1
      })
    }
    terminal(node) += pi
  }

  private val nNodes = childMaps.length
  // flat transition tables: per node, sorted chars + target nodes
  private val transChars: Array[Array[Char]] =
    childMaps.map(_.keysIterator.toArray).toArray
  private val transNext: Array[Array[Int]] =
    childMaps.map(_.valuesIterator.toArray).toArray

  // --- failure + output links (BFS) ---
  private val fail = new Array[Int](nNodes)
  // `outLink(n)` = nearest proper-suffix node that terminates ≥1
  // pattern (0 = none) — match emission follows this chain, so total
  // emission work is O(matches), not O(depth) per position.
  private val outLink = new Array[Int](nNodes)
  // flattened terminal pattern ids per node
  private val termIds: Array[Array[Int]] = terminal.map(_.toArray).toArray

  locally {
    val queue = mutable.Queue.empty[Int]
    var i = 0
    while (i < transChars(0).length) { queue += transNext(0)(i); i += 1 }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      val cs = transChars(u)
      val ns = transNext(u)
      var j = 0
      while (j < cs.length) {
        val v = ns(j)
        // depth-1 nodes fail to root; deeper: goto from fail(u) —
        // fail(u) is strictly shallower than u, so the result is
        // strictly shallower than v (never v itself)
        fail(v) = if (u == 0) 0 else goTo(fail(u), cs(j))
        outLink(v) =
          if (termIds(fail(v)).nonEmpty) fail(v) else outLink(fail(v))
        queue += v
        j += 1
      }
    }
  }

  /** goto-with-failure: next state from `node` on `ch`. */
  private def goTo(node: Int, ch: Char): Int = {
    var n = node
    while (true) {
      val idx = java.util.Arrays.binarySearch(transChars(n), ch)
      if (idx >= 0) return transNext(n)(idx)
      if (n == 0) return 0
      n = fail(n)
    }
    0 // unreachable
  }

  /** One left-to-right scan; counts every match of every pattern
    * (overlapping included). Called from interpreted eval AND
    * generated code.
    */
  def countAll(text: String): ArrayData = {
    val counts = new Array[Int](patterns.length)
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      node = goTo(node, text.charAt(i))
      // emit matches ending here
      var t = if (termIds(node).nonEmpty) node else outLink(node)
      while (t != 0) {
        val ids = termIds(t)
        var j = 0
        while (j < ids.length) { counts(ids(j)) += 1; j += 1 }
        t = outLink(t)
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
