package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy maximum-coverage selection — "pick the k documents that
  * jointly cover the most distinct features" (topics, vocabulary,
  * n-gram buckets, APIs…): the diversity-selection step for
  * fine-tuning and eval sets. [[Coverage.headCoverage]] asks which
  * GROUPS hold the corpus mass; this picks the ITEM SET with maximal
  * joint feature coverage, and [[graft.sim.KCenter]]'s geometric
  * spread needs an embedding where this wants only a (doc, feature)
  * incidence table. The classic greedy carries the (1 − 1/e)
  * approximation guarantee (Nemhauser et al. 1978) — the standard
  * choice because exact max-coverage is NP-hard.
  *
  * Determinism: each round picks the unselected document covering the
  * most still-uncovered features, ties to the SMALLEST id — a pure
  * function of the incidence table, replayed in SQL by unrolling the
  * rounds (q211). A round with no remaining gain emits nothing and
  * ends the selection (an exhausted feature space yields < k picks,
  * visibly).
  *
  * Scale shape, per round: one anti-join of the incidence table
  * against the picked document's feature set (feature-bounded, never
  * row-bounded), one map-side-combinable count by doc, and a 1-row
  * argmax collect — the [[graft.text.Phrases]] iterative contract
  * (bounded rounds × 1-row driver traffic). `k` is capped because
  * each round is a distributed pass: this is a "pick dozens"
  * operator, not a bulk sampler (use [[Sampling.topKByScore]] there).
  */
object GreedyCoverage {

  /** One row per selection round: `(round, idCol, gain,
    * covered_total)` — `gain` = newly covered features,
    * `covered_total` = running distinct-feature coverage. NULL ids or
    * features raise.
    */
  def greedySelect(
      pairs: DataFrame, idCol: String, featureCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    val spark = pairs.sparkSession
    import spark.implicits._

    // cast FIRST, then raise on the cast's null: a non-numeric id or
    // feature (string topics, uuids…) casts to NULL in non-ANSI Spark
    // and a null-checked-then-cast guard would silently admit it — the
    // NULL then never matches the anti-join and every round reports
    // bogus gain
    def guard(c: String) = when(col(c).cast("long").isNull,
      raise_error(lit(s"greedySelect: NULL or non-integer $c — ids and " +
        "features must be integers; map strings to ids upstream")))
      .otherwise(col(c).cast("long"))
    val incidence = pairs
      .select(guard(idCol).as("__id"), guard(featureCol).as("__f"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var remaining = incidence
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    var covered = 0L
    var round = 1
    var done = false
    while (round <= k && !done) {
      // argmax(count, tie -> min id) as ONE aggregate row: max over
      // struct(count, -id) packs the tie rule into the ordering
      val top = remaining
        .groupBy(col("__id")).agg(count(lit(1)).as("__c"))
        .agg(max(struct(col("__c"), (-col("__id")).as("__nid")))
          .as("__best"))
        .select(col("__best.__c"), (-col("__best.__nid")).as("__id"))
        .collect() // bounded: one row per round (Phrases contract)
      if (top.isEmpty || top.head.isNullAt(0)) done = true
      else {
        val gain = top.head.getLong(0)
        val id = top.head.getLong(1)
        covered += gain
        picks += ((round.toLong, id, gain, covered))
        val pickedFeatures = remaining.filter(col("__id") === id)
          .select(col("__f").as("__pf"))
        remaining = remaining
          .filter(col("__id") =!= id)
          .join(pickedFeatures, col("__f") === col("__pf"), "left_anti")
          .localCheckpoint(true) // constant-depth lineage across rounds
        round += 1
      }
    }
    incidence.unpersist()
    picks.toSeq.toDF("round", idCol, "gain", "covered_total")
  }
}
