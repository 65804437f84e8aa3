package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature fold: given an `array<bigint>` of base
  * shingle hashes (already reduced mod the 31-bit Mersenne prime), emit
  * the `numHashes`-wide signature `min_i((a_i·h + b_i) mod p)`.
  *
  * Exists because Spark's higher-order functions (`aggregate`,
  * `zip_with`, `transform`) are interpreted — no codegen — so the
  * composed fold in [[graft.dedup.Dedup.minhashSignature]] pays
  * per-element lambda interpretation across shingles × numHashes. This
  * expression runs the same arithmetic as two tight loops inside
  * whole-stage codegen and produces bit-identical signatures (the (a, b)
  * parameters come from the same [[graft.dedup.Dedup.hashParams]]
  * derivation — equivalence pinned in DedupSpec).
  */
case class MinHashFold(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val MersennePrime = (1L << 31) - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_fold requires array<bigint>, got $other")
  }

  @transient private lazy val paramA: Array[Long] =
    graft.dedup.Dedup.hashParams(numHashes, seed).map(_._1).toArray
  @transient private lazy val paramB: Array[Long] =
    graft.dedup.Dedup.hashParams(numHashes, seed).map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(MersennePrime)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = java.lang.Math.floorMod(h * paramA(j) + paramB(j), MersennePrime)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", paramA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", paramB, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${MersennePrime}L);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = java.lang.Math.floorMod($h * $aRef[$j] + $bRef[$j], ${MersennePrime}L);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashFold =
    copy(child = newChild)
}

object MinHashFold {
  def minhashFold(baseHashes: Column, numHashes: Int, seed: Long = 42L): Column =
    ExpressionBridge.column(
      MinHashFold(ExpressionBridge.expression(baseHashes), numHashes, seed))
}
