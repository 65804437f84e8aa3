package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) is the first line of defense at
  * runtime; these operators are the explicit form for planner-visible
  * hot keys — a handful of users generating a large share of events, a
  * null/default key, a viral document.
  *
  * - [[saltedJoin]]: the large side gets a random salt in [0, buckets);
  *   the small side is exploded across all salt values, so each hot
  *   join key spreads over `buckets` reducers. Semantics identical to
  *   the unsalted equi-join (verified in the spec); cost is a
  *   buckets-fold replication of the small side — use only when the
  *   small side is small and the key histogram is skewed.
  * - [[saltedAggregate]]: two-phase aggregation for algebraic
  *   aggregates — partial groupBy on (keys, salt), final groupBy on
  *   keys. Spark's hash aggregate already does map-side partial
  *   aggregation, so this only helps when the *post-shuffle* per-key
  *   state is the bottleneck (e.g. huge collect-style aggregations);
  *   provided for that case and as the documented pattern.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, spreading each key over
    * `buckets` shuffle partitions.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val saltedBig = big.withColumn("__salt", floor(rand(42L) * buckets).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] with DETERMINISTIC salts: the big side's salt is
    * `pmod(xxhash64(entropyCol), nSalts)` instead of `rand()`. Same
    * correctness argument (every big row meets exactly the one small
    * replica carrying its salt, so salted ≡ plain join row-for-row —
    * the q131 oracle pins exactly that), but the salt is a pure
    * function of the row: task RETRIES re-derive the same salt
    * (`rand()` re-rolls per attempt — harmless for the join result,
    * but it reshuffles partition contents under retry, which
    * non-idempotent downstream sinks observe), and runs are
    * bit-reproducible end to end. `entropyCol` — a row id / event id;
    * low cardinality degrades balance, never correctness. Inner-only:
    * outer variants would need per-salt-miss reconciliation upstream.
    */
  def saltedJoinDeterministic(
      big: DataFrame, small: DataFrame, keyCol: String,
      entropyCol: String, nSalts: Int = 16): DataFrame = {
    require(nSalts >= 1, s"need nSalts >= 1, got $nSalts")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(entropyCol)), lit(nSalts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation: `aggs` must be algebraic (sum/count/min/max
    * compose; avg must be decomposed by the caller into sum+count).
    * Phase 1 groups by (keys, salt) — derived from `saltSource`, e.g. a
    * high-cardinality column or `rand()` — phase 2 re-aggregates the
    * partials by keys.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int,
      aggs: Seq[(String, Column => Column)],
      valueCols: Seq[String]): DataFrame = {
    require(aggs.size == valueCols.size)
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val partialCols = aggs.zip(valueCols).map { case ((name, fn), c) =>
      fn(col(c)).as(s"__p_$name")
    }
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (name, fn) =>
      fn(col(s"__p_$name")).as(name)
    }
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }
}
