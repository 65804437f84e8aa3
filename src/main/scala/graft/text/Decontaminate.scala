package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test decontamination: find evaluation documents whose content
  * leaks into the training corpus, via shared word n-grams — the
  * standard published recipe (GPT-3 appendix C, PaLM §7; typically
  * 8-13-grams). A benchmark answer that appears verbatim in training
  * data invalidates the benchmark, so this runs as a first-class step
  * of every serious training-data pipeline.
  *
  * Scale shape (the whole point at 100 TB):
  *   - each side explodes to its DISTINCT n-grams (`explode` after
  *     `array_distinct`, so a gram repeated inside one document costs
  *     one row, not one per occurrence);
  *   - grams whose train-side document frequency exceeds
  *     `maxTrainDocFreq` are dropped BEFORE the join — a boilerplate
  *     gram present in millions of training docs would otherwise become
  *     a hot join key whose pair output is |train docs| × |test docs|,
  *     the same degenerate-bucket blowup the LSH dedup operators cap.
  *     With long n-grams (8+) discriminative grams are rare by
  *     construction, so the cap removes noise, not signal; the drop is
  *     part of the operator's contract and is replayed by the oracle.
  *   - one equi-join on the gram string (test side is usually small →
  *     broadcastable; Catalyst/AQE decide), then a count per pair.
  *
  * Join keys stay raw gram strings: hashing them (xxhash64) would
  * shrink shuffle bytes but make a collision silently fabricate an
  * overlap — wrong tool for a correctness-critical audit. Callers who
  * accept the risk can pre-hash the text column upstream.
  */
object Decontaminate {

  /** One row per (id, distinct word n-gram). */
  def docNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(
        Repetition.ngrams(TextStats.tokens(col(textCol)), n))).as("gram"))

  /** (train_id, test_id, shared_ngrams) for every train/test pair
    * sharing at least one n-gram that is rarer than `maxTrainDocFreq`
    * on the train side. `shared_ngrams` counts DISTINCT shared grams.
    */
  def overlapPairs(
      train: DataFrame, trainId: String,
      test: DataFrame, testId: String,
      textCol: String,
      n: Int,
      maxTrainDocFreq: Long = 10000L,
      materialize: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maxTrainDocFreq >= 1,
      s"maxTrainDocFreq must be >= 1, got $maxTrainDocFreq")
    // The train-side gram table (tokenize + n-grams + distinct +
    // explode over the FULL training corpus — the dominant map work)
    // feeds two plan branches: the df aggregate and the join. With
    // materialize = true it is persisted so the corpus is tokenized
    // once and the (small — real contamination is rare) pair result is
    // checkpointed so the cache releases before returning; with
    // materialize = false everything stays lazy and fault-tolerant at
    // the price of the double derivation (same contract as
    // Dedup.nearDuplicatesAgainst).
    val tr0 = docNgrams(train, trainId, textCol, n)
      .withColumnRenamed(trainId, "train_id")
    val tr =
      if (materialize) tr0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tr0
    try {
      val te = docNgrams(test, testId, textCol, n)
        .withColumnRenamed(testId, "test_id")
      // Document frequency of each gram on the train side; grams above
      // the cap never reach the join. Distinct-per-doc rows make count(*)
      // the document frequency. The window form would shuffle the same
      // data twice; a self-join on the tiny (gram, df) aggregate is the
      // cheaper shape and AQE can broadcast it.
      val rare = tr.groupBy("gram").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxTrainDocFreq)
        .select("gram")
      val result = tr.join(rare, Seq("gram"))
        .join(te, Seq("gram"))
        .groupBy("train_id", "test_id")
        .agg(count(lit(1)).as("shared_ngrams"))
      if (materialize) result.localCheckpoint(true) else result
    } finally if (materialize) tr.unpersist()
  }

  /** Test ids contaminated under the policy "shares >= minShared
    * (capped) n-grams with ANY training document" — a left-semi shape
    * for the common minShared=1 case, the pair aggregate otherwise.
    */
  def contaminatedIds(
      train: DataFrame, trainId: String,
      test: DataFrame, testId: String,
      textCol: String,
      n: Int,
      minShared: Long = 1L,
      maxTrainDocFreq: Long = 10000L,
      materialize: Boolean = true): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    if (minShared == 1L) {
      // tr feeds the df aggregate AND the semi-join build side — same
      // persist-once contract as overlapPairs
      val tr0 = docNgrams(train, trainId, textCol, n)
      val tr =
        if (materialize) tr0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else tr0
      try {
        val rare = tr.groupBy("gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxTrainDocFreq)
          .select("gram")
        val trainGrams = tr.join(rare, Seq("gram")).select("gram").distinct()
        val result = docNgrams(test, testId, textCol, n)
          .join(trainGrams, Seq("gram"), "left_semi")
          .select(col(testId).as("test_id")).distinct()
        if (materialize) result.localCheckpoint(true) else result
      } finally if (materialize) tr.unpersist()
    } else {
      overlapPairs(train, trainId, test, testId, textCol, n, maxTrainDocFreq,
        materialize)
        .filter(col("shared_ngrams") >= minShared)
        .select("test_id").distinct()
    }
  }

  /** The training corpus with every document sharing a (train-rare)
    * n-gram with the eval set REMOVED — decontaminating the TRAIN side,
    * the production direction: GPT-3 appendix C removes training
    * documents, not benchmark items, so published benchmark numbers
    * stay comparable.
    *
    * Scale shape — built on the size asymmetry: eval sets are MBs,
    * training corpora are TBs. The eval side's distinct grams
    * aggregate into ONE Bloom filter ([[graft.operators.BloomPrune]] —
    * bounded bytes however many grams), and the train-side gram table
    * (the corpus-dominating explode) probes it MAP-SIDE, so only
    * probable hits — true contamination plus an fpp-sized sliver —
    * ever reach a shuffle. The exact semi-join that follows removes
    * Bloom false positives, and Bloom filters have no false negatives,
    * so the result is EXACTLY the no-bloom semi-join; the filter only
    * cuts shuffle volume. The train-doc-frequency cap (boilerplate
    * grams carry no leak signal; see [[overlapPairs]]) is computed on
    * the pruned table — identical counts for any gram that can matter,
    * since every occurrence of a bloom-member gram passes the probe.
    */
  def dropContaminatedTrain(
      train: DataFrame, trainId: String,
      test: DataFrame, testId: String,
      textCol: String, n: Int,
      maxTrainDocFreq: Long = 10000L,
      fpp: Double = 0.03): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val te = docNgrams(test, testId, textCol, n)
      .select("gram").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded: the distinct grams of the (small) eval side
      val nEvalGrams = math.max(te.count(), 1L)
      val bloom = graft.operators.BloomPrune.keyBloom(
        te, "gram", nEvalGrams, fpp)
      val hits = graft.operators.BloomPrune.probableMatches(
        docNgrams(train, trainId, textCol, n), "gram", bloom)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rare = hits.groupBy("gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxTrainDocFreq)
          .select("gram")
        // contaminated ids are rare (real leakage is the exception) —
        // checkpoint them so both caches release before returning
        val contaminated = hits.join(rare, Seq("gram"))
          .join(te, Seq("gram"), "left_semi")
          .select(col(trainId)).distinct()
          .localCheckpoint(true)
        train.join(contaminated, Seq(trainId), "left_anti")
      } finally hits.unpersist()
    } finally te.unpersist()
  }
}
