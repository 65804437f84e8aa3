package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram repetition statistics for the Gopher-style
  * quality signals in [[graft.text.Repetition]]:
  * `struct(total, distinct, top_count, top_chars)` where
  *
  *   - `total`    = number of word n-grams (tokens − n + 1, 0 if short),
  *   - `distinct` = distinct n-grams,
  *   - `top_count`= occurrences of the most frequent n-gram, ties broken
  *     toward the byte-lexicographically GREATEST gram (the same order
  *     as a Spark struct-max over `(count, gram)` and DuckDB
  *     `ORDER BY c DESC, gram DESC` — UTF-8 byte order and code-point
  *     order agree),
  *   - `top_chars`= `length()` (code points) of that winning gram.
  *
  * Semantics are exactly the composed higher-order-function form
  * (`split(text, " ")` keeping empty tokens, grams joined with a single
  * space): splitting on every single space and re-joining consecutive
  * token slices with single spaces reconstructs the original character
  * run, so each gram is just a byte SPAN over the input — no per-gram
  * string materialization. Counting uses an open-addressing hash table
  * over spans (hash match verified by byte equality, so collisions
  * cannot corrupt counts).
  *
  * Exists because the composed form is O(grams × distinct) interpreted
  * comparisons per document (Spark never codegens lambda functions);
  * this expression is a single O(len) codegen pass. Equivalence against
  * the HOF form is pinned in RepetitionSpec.
  */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = NgramRepetition.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_repetition requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NgramRepetition.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.stats($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)

  override def prettyName: String = "ngram_repetition"
}

object NgramRepetition {

  val schema: StructType = StructType(Seq(
    StructField("total", IntegerType, nullable = false),
    StructField("distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("top_chars", IntegerType, nullable = false)))

  /** Static tight-loop core (also called from generated code). */
  def stats(text: UTF8String, n: Int): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    // `split(text, " ")` boundaries: every 0x20 byte (0x20 never occurs
    // inside a multi-byte UTF-8 sequence), empty tokens kept.
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val tokens = spaces + 1
    val total = tokens - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0, 0, 0, 0))
    // starts(j) = byte offset of token j; gram g (tokens g..g+n-1 joined
    // by " ") spans bytes [starts(g), starts(g+n) - 1).
    val starts = new Array[Int](tokens + 1)
    var tok = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    starts(tokens) = len + 1

    // open addressing: table holds a representative gram index per slot
    var cap = 4
    while (cap < total * 2) cap <<= 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val counts = new Array[Int](total)
    val hashes = new Array[Long](total)
    var distinct = 0
    var g = 0
    while (g < total) {
      val s = starts(g)
      val e = starts(g + n) - 1
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var j = s
      while (j < e) { h = (h ^ (bytes(j) & 0xFF)) * 1099511628211L; j += 1 }
      hashes(g) = h
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      var placed = false
      while (!placed) {
        val o = table(idx)
        if (o == -1) {
          table(idx) = g; counts(g) = 1; distinct += 1; placed = true
        } else if (hashes(o) == h &&
            spanEquals(bytes, starts(o), starts(o + n) - 1, s, e)) {
          counts(o) += 1; placed = true
        } else idx = (idx + 1) & (cap - 1)
      }
      g += 1
    }

    // winner: max count, ties toward the byte-lexicographically greatest
    var best = -1
    g = 0
    while (g < total) {
      if (counts(g) > 0 && (best == -1 || counts(g) > counts(best) ||
          (counts(g) == counts(best) && spanCompare(bytes,
            starts(g), starts(g + n) - 1, starts(best), starts(best + n) - 1) > 0)))
        best = g
      g += 1
    }
    // code points in the winning span = non-continuation UTF-8 bytes
    var chars = 0
    i = starts(best)
    val be = starts(best + n) - 1
    while (i < be) { if ((bytes(i) & 0xC0) != 0x80) chars += 1; i += 1 }
    new GenericInternalRow(Array[Any](total, distinct, counts(best), chars))
  }

  private def spanEquals(
      b: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = s1
    var j = s2
    while (i < e1) {
      if (b(i) != b(j)) return false
      i += 1; j += 1
    }
    true
  }

  /** Unsigned-byte lexicographic compare of two spans (UTF8String /
    * UTF-8 binary order; prefix sorts before its extension).
    */
  private def spanCompare(
      b: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Int = {
    var i = s1
    var j = s2
    while (i < e1 && j < e2) {
      val c = (b(i) & 0xFF) - (b(j) & 0xFF)
      if (c != 0) return c
      i += 1; j += 1
    }
    (e1 - s1) - (e2 - s2)
  }

  def ngramRepetition(text: Column, n: Int): Column =
    ExpressionBridge.column(
      NgramRepetition(ExpressionBridge.expression(text), n))
}
