package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): Karp-Rabin rolling hashes of every
  * `k`-byte gram, then the minimum hash of each `window`-wide sliding
  * window (rightmost on ties), deduplicated by selection position.
  *
  * Guarantee: any byte-substring match of length ≥ `window + k - 1`
  * between two documents contributes at least one shared fingerprint,
  * and no match shorter than `k` does — the selection is position-local,
  * so unlike MinHash-of-shingles the fingerprint count scales with
  * document length (good for containment/plagiarism-style detection,
  * not just whole-document similarity). The fingerprint arrays feed the
  * same set machinery as shingle sets (Jaccard verify, LSH banding).
  *
  * Operates on the UTF-8 bytes of the input string. Hashing is
  * `h = (h·B + byte) mod P` with B = 257 and the 31-bit Mersenne prime P
  * (products stay far below 2^63). Pure function of the payload —
  * deterministic across retries and engines.
  */
case class WinnowingFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnowing_fingerprints requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowingFingerprints.winnow(input.asInstanceOf[UTF8String].getBytes, k, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WinnowingFingerprints.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.winnow($c.getBytes(), $k, $window));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnowing_fingerprints"
}

/** [[WinnowingFingerprints]] variant that keeps each selected
  * fingerprint's byte position, encoded as `(hash << 32) | pos` —
  * the anchor [[graft.dedup.SubstringDedup]] needs to verify exact
  * substring equality at the matched offsets. Same selection, same
  * order, same tie rule as the hash-only form.
  */
case class WinnowingFingerprintKeys(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnowing_fingerprint_keys requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowingFingerprints.winnowKeys(input.asInstanceOf[UTF8String].getBytes, k, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WinnowingFingerprints.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.winnowKeys($c.getBytes(), $k, $window));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprintKeys =
    copy(child = newChild)

  override def prettyName: String = "winnowing_fingerprint_keys"
}

object WinnowingFingerprints {

  private val Base = 257L
  private val Prime = (1L << 31) - 1

  /** Static tight-loop core (also called from generated code). */
  def winnow(bytes: Array[Byte], k: Int, window: Int): Array[Long] = {
    val keys = winnowKeys(bytes, k, window)
    val out = new Array[Long](keys.length)
    var i = 0
    while (i < keys.length) { out(i) = keys(i) >>> 32; i += 1 }
    out
  }

  /** Selected fingerprints WITH their byte positions, each encoded as
    * `(hash << 32) | pos` (hash < 2^31 and Spark strings are < 2 GiB,
    * so both halves fit). Selection order — identical to [[winnow]]
    * with positions attached. Feeds [[graft.dedup.SubstringDedup]],
    * where the position anchors the exact-substring verification.
    */
  def winnowKeys(bytes: Array[Byte], k: Int, window: Int): Array[Long] = {
    val n = bytes.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    // rolling Karp-Rabin hashes of all k-grams
    val hs = new Array[Long](n)
    var pow = 1L // B^(k-1) mod P
    var i = 1
    while (i < k) { pow = pow * Base % Prime; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xFF)) % Prime; i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = ((h + Prime * 256 - (bytes(i - 1) & 0xFF) * pow % Prime) % Prime * Base +
        (bytes(i + k - 1) & 0xFF)) % Prime
      hs(i) = h
      i += 1
    }
    if (n <= window) {
      // document shorter than one window: its single minimum (rightmost
      // on ties, matching the windowed branch's tie rule)
      var minIdx = 0
      var j = 1
      while (j < n) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      return Array((hs(minIdx) << 32) | minIdx.toLong)
    }
    // sliding-window minima, rightmost on ties, deduped by position
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / window + 1)
    var lastPos = -1
    var start = 0
    while (start + window <= n) {
      var minIdx = start
      var j = start + 1
      while (j < start + window) {
        if (hs(j) <= hs(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPos) {
        out += (hs(minIdx) << 32) | minIdx.toLong
        lastPos = minIdx
      }
      start += 1
    }
    out.toArray
  }

  def winnowingFingerprints(text: Column, k: Int = 5, window: Int = 4): Column =
    ExpressionBridge.column(
      WinnowingFingerprints(ExpressionBridge.expression(text), k, window))

  def winnowingFingerprintKeys(text: Column, k: Int = 5, window: Int = 4): Column =
    ExpressionBridge.column(
      WinnowingFingerprintKeys(ExpressionBridge.expression(text), k, window))
}
