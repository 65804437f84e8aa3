package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota sampling: draw rows so the RESULT matches a caller-declared
  * target composition, not the corpus's natural one — "rebalance the
  * training mix to 50% en / 30% de / 20% code" as one operator. The
  * natural-proportion siblings keep what the data already is
  * ([[Sampling.sampleExactK]]: k per stratum; [[Mixing]]: temperature-
  * flattened rates); this one drives the output toward an explicit
  * target, the last step of every curation recipe that publishes a
  * datasheet ("composition: X% of stratum S").
  *
  * Allocation is exact-integer largest-remainder apportionment
  * (Hamilton's method): `requested_i = floor(totalN·w_i / W)` plus one
  * extra for the `totalN - Σ floor` strata with the largest remainders
  * (ties to the lexicographically smaller stratum), so `Σ requested =
  * totalN` exactly — no float shares that round to totalN±1. The math
  * is a pure function of (targets, totalN): it runs driver-side over
  * the caller's target list and is replayable in any engine with
  * integer `//` and `%` (q188's oracle re-derives it in SQL).
  *
  * `allocated_i = min(requested_i, available_i)`: a stratum shorter
  * than its quota yields everything it has, and the shortfall is
  * REPORTED ([[allocationReport]]) rather than silently redistributed —
  * moving a shortfall into other strata would change the published
  * composition, exactly what the caller asked this operator to pin.
  *
  * Row selection within a stratum is the engine's standard replayable
  * rank: order by `(squaredHash(id, salt) mod 2^20, id)` ([[Splits]]'s
  * salt-mixed Karp-Rabin bucket — rerun/retry/partitioning-independent,
  * salt-independent across salts), keep the first `allocated_i`.
  *
  * Scale shape: one strata-sized count aggregate, then selection via
  * [[graft.sim.TopKAggregator]] bounded heaps — each input partition
  * forwards at most `kMax = max requested` (id, score) pairs per
  * stratum, never a full-stratum window sort — then per-stratum rank
  * over the exploded heap output (≤ strata·kMax rows) trims varying
  * quotas, and one equi-join on the unique id restores the winners'
  * rows. The only windows run on strata-sized tables.
  */
object Quota {

  /** `(stratum, requested)` for every target stratum: exact
    * largest-remainder apportionment of `totalN` over `targets`
    * weights. Pure integer function of the arguments, Σ = totalN.
    */
  def apportion(targets: Seq[(String, Long)], totalN: Long): Seq[(String, Long)] = {
    require(targets.nonEmpty, "quota targets must be non-empty")
    require(totalN >= 0, s"totalN must be >= 0, got $totalN")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate stratum in quota targets")
    targets.foreach { case (name, w) =>
      require(w > 0, s"target weight for '$name' must be > 0, got $w")
      require(totalN <= Long.MaxValue / w,
        s"totalN * weight overflows for '$name'")
    }
    val w = targets.map(_._2).sum
    val base = targets.map { case (name, wi) =>
      (name, totalN * wi / w, totalN * wi % w)
    }
    val extra = totalN - base.map(_._2).sum
    val bonus = base.sortBy { case (name, _, rem) => (-rem, name) }
      .take(extra.toInt).map(_._1).toSet
    base.map { case (name, b, _) =>
      (name, b + (if (bonus.contains(name)) 1L else 0L))
    }
  }

  /** Audit table: `(stratum, available, requested, allocated)` per
    * target stratum — `allocated = min(requested, available)`, so
    * `requested - allocated` is the shortfall the caller must resolve
    * (lower totalN, reweight, or source more data). Strata present in
    * the data but absent from `targets` do not appear (they contribute
    * nothing); target strata absent from the data appear with
    * available = 0. Strata-sized output.
    */
  def allocationReport(
      df: DataFrame, strataCol: String,
      targets: Seq[(String, Long)], totalN: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val req = apportion(targets, totalN).toDF("stratum", "requested")
    val avail = df.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("available"))
    req.join(avail, Seq("stratum"), "left")
      .select(col("stratum"),
        coalesce(col("available"), lit(0L)).as("available"),
        col("requested"),
        least(col("requested"),
          coalesce(col("available"), lit(0L))).as("allocated"))
  }

  /** The sample itself: original rows of `df`, exactly `allocated_i`
    * from each target stratum, membership a pure function of
    * (id, salt, targets, totalN). `idCol` must be non-NULL, castable
    * to long, and unique per row (it is the join-back key).
    */
  def quotaSample(
      df: DataFrame, strataCol: String, idCol: String,
      targets: Seq[(String, Long)], totalN: Long,
      salt: String = "", ordBuckets: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val requested = apportion(targets, totalN)
    val kMax = requested.map(_._2).max
    if (kMax == 0) return df.filter(lit(false))
    require(kMax <= Int.MaxValue,
      s"per-stratum quota $kMax exceeds Int.MaxValue")
    val reqDf = requested.toDF("__stratum", "__req")
    val guardedId =
      when(col(idCol).isNull,
        raise_error(lit(s"quotaSample: NULL $idCol — ids must be non-NULL")))
        .otherwise(col(idCol).cast("long"))
    // Only target strata enter the heap aggregate; everything else is
    // dropped at the scan (broadcast semi-join on the tiny target list).
    val inTarget = df
      .join(broadcast(reqDf.select(col("__stratum"))),
        col(strataCol) === col("__stratum"), "left_semi")
    val topK = graft.sim.TopKAggregator.udafFor(kMax.toInt)
    // negated bucket: heap keeps (score DESC, id ASC) = ORDER BY bucket, id.
    val keyed = inTarget.select(
      col(strataCol),
      guardedId.as("__id"),
      negate(Splits.bucketOf(col(idCol), salt, ordBuckets).cast("double"))
        .as("__score"))
    val tops = keyed.groupBy(col(strataCol))
      .agg(topK(col("__id"), col("__score")).as("__top"))
      .select(col(strataCol).as("__ss"), explode(col("__top")).as("__t"))
      .select(col("__ss"), col("__t").getField("id").as("__sel_id"),
        col("__t").getField("score").as("__sel_score"))
    // Varying per-stratum quota: rank the ≤ strata·kMax heap survivors
    // (small by construction) and keep rank ≤ allocated.
    val ranked = tops.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__ss"))
        .orderBy(col("__sel_score").desc, col("__sel_id"))))
    val picked = ranked
      .join(broadcast(reqDf), col("__ss") === col("__stratum"))
      .filter(col("__rn") <= col("__req"))
      .select(col("__ss"), col("__sel_id"))
    df.join(picked,
        col(strataCol) === col("__ss") &&
          col(idCol).cast("long") === col("__sel_id"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
