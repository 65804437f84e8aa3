package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared-L2 distances from an `array<double>` vector to `k` fixed
  * centroids, as a k-element `array<double>` in centroid order — the
  * assignment hot loop of [[graft.sim.KMeans]], natively.
  *
  * Arithmetic contract: per centroid, a sequential dimension-order fold
  * of `acc + (x - c) * (x - c)` seeded at 0.0 — operation-for-operation
  * the IEEE arithmetic of the composed
  * `aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)), 0.0, _ + _)`
  * form and of the SQL replay, so distances (and the downstream argmin
  * cluster assignment and the q44 oracle hash) are bit-identical
  * (equivalence pinned in KMeansSpec).
  *
  * Exists because the composed form runs k interpreted
  * higher-order-function folds per row per Lloyd iteration — Spark
  * never codegens lambda functions, so each of the k×dim element
  * evaluations walks the interpreted expression tree. This expression
  * is one flat k×dim loop over the row's vector with the centroid
  * matrix held as a single flattened `double[]` reference object.
  *
  * Edge semantics are STRICTER than the composed form but agree
  * downstream: a null element or a vector whose length differs from
  * the centroid dimension yields a null RESULT, where the composed
  * form yields an array of k nulls — `array_min`/`array_position` over
  * either produce a null cluster and distance, so `argmin` callers
  * cannot tell them apart.
  */
case class L2DistancesFold(
    child: Expression, cents: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "need at least one centroid")
  require(cents.forall(_.length == cents.head.length),
    "all centroids must share one dimension")

  private val k = cents.length
  private val dim = cents.head.length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      var j = 0
      while (j < dim) { out(c * dim + j) = cents(c)(j); j += 1 }
      c += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_distances requires an array<double> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    L2DistancesFold.distances(input.asInstanceOf[ArrayData], flat, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = L2DistancesFold.getClass.getName.stripSuffix("$")
      val flatRef = ctx.addReferenceObj("centsFlat", flat, "double[]")
      s"""
         |${ev.value} = $cls.distances($c, $flatRef, $k, $dim);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2DistancesFold =
    copy(child = newChild)

  override def prettyName: String = "l2_distances"
}

object L2DistancesFold {

  /** Static tight-loop core (also called from generated code); null on
    * dimension mismatch or null elements.
    */
  def distances(vec: ArrayData, flat: Array[Double], k: Int, dim: Int): ArrayData = {
    if (vec.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = vec.getDouble(i) - flat(off + i)
        acc += d * d
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Casts the vector to `array<double>` like the composed form. */
  def l2Distances(vec: Column, cents: Seq[Array[Double]]): Column =
    ExpressionBridge.column(L2DistancesFold(
      ExpressionBridge.expression(vec.cast("array<double>")),
      cents.iterator.map(_.toIndexedSeq).toIndexedSeq))
}
