package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter join pruning: shrink the fact side of a join
  * to probable key matches *before* it shuffles.
  *
  * At 100 TB the shuffle of the fact table dominates a selective join;
  * a Bloom filter built from the (much smaller) dim side's keys lets the
  * fact scan discard non-matching rows at the map side, so shuffle
  * volume tracks the match rate instead of the table size. The result
  * stays exact: Bloom filters have no false negatives, and the false
  * positives that survive pruning are removed by the real join that
  * follows.
  *
  * Built on the same codegen'd expressions Spark's own
  * `InjectRuntimeFilter` uses (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — no UDF in the per-row path): the dim keys
  * aggregate distributedly into one bloom binary (partial buffers merge
  * by OR), only those `numBits/8` bytes reach the driver, and the probe
  * folds into the fact scan's filter as a literal. Unlike the automatic
  * rule — which only fires inside one query when its cost heuristics
  * agree — the explicit form survives checkpoints, feeds multi-query
  * pipelines, and lets the caller size the filter.
  */
object BloomPrune {

  private val MaxNumBits = 1L << 27 // 16 MB of filter, Spark's own default cap

  /** Bits for a target false-positive probability: m = -n·ln p / (ln 2)². */
  def numBitsFor(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bits = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    math.min(math.max(bits, 64L), MaxNumBits)
  }

  /** Aggregate `dim`'s key into a serialized Bloom filter (one binary
    * value — bounded by `numBits/8` bytes regardless of dim size).
    */
  def keyBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val agg = ExpressionBridge.column(
      new BloomFilterAggregate(
        ExpressionBridge.expression(xxhash64(col(dimKey))),
        ExpressionBridge.expression(lit(expectedItems)),
        ExpressionBridge.expression(lit(numBitsFor(expectedItems, fpp))))
        .toAggregateExpression())
    dim.select(agg.as("bloom")).head.getAs[Array[Byte]]("bloom")
  }

  /** Filter `fact` to rows whose `factKey` is probably in `bloom`.
    * Null keys hash to the constant seed value, so they survive only by
    * chance collision — harmless either way, since the inner join that
    * follows never matches null keys. Every non-null true match is kept
    * (no false negatives: equal values hash equally on both sides).
    */
  def probableMatches(fact: DataFrame, factKey: String,
      bloom: Array[Byte]): DataFrame =
    fact.filter(ExpressionBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ExpressionBridge.expression(xxhash64(col(factKey))))))

  /** Inner equi-join with the fact side Bloom-pruned before the
    * shuffle. Exact — identical to `fact.join(dim, fact(factKey) ===
    * dim(dimKey))` — because the join removes bloom false positives.
    * Inner only: pruning the preserved side of an outer join would drop
    * rows the join must keep.
    *
    * `expectedItems` sizes the filter; passing a large overestimate
    * only costs filter bytes (capped at 16 MB), while an underestimate
    * inflates the false-positive rate and with it the pruned size —
    * never correctness.
    */
  def prunedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = probableMatches(fact, factKey,
      keyBloom(dim, dimKey, expectedItems, fpp))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
