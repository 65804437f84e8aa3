package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style phrase mining over word tokens: `rounds` iterations of
  * "count adjacent pairs, promote the most frequent pair to a single
  * multi-word unit everywhere" — the word-level form of BPE merge
  * training (and word2vec-style collocation mining). The learned
  * units ("new york", "machine learning") feed
  * [[graft.functions.VocabTokenize]]'s multi-word vocabulary entries.
  *
  * Restricted BY CONTRACT to DISTINCT-sided pairs (u ≠ v): a
  * self-pair's occurrences can chain ([u,u,u] — does the middle token
  * join left or right?), which forces sequential leftmost scanning.
  * With u ≠ v adjacent matches can never overlap (a match's right
  * token differs from its left, so it cannot start another match), so
  * the merge is decidable PER POSITION from its two neighbors — a
  * map-only array transform with no sequential state, identical in
  * any engine with indexed list lambdas. Self-pairs are simply never
  * candidates (real collocations are distinct words anyway).
  *
  * Scale shape per round: one map-combinable pair-count aggregate, a
  * 1-row argmax collect (bounded — the same per-round driver
  * round-trip as [[graft.sim.KMeans.fit]]), and a map-only merge
  * transform. Ties break by (count desc, then lexicographic (u, v)),
  * so training is deterministic and replays exactly.
  */
object Phrases {

  /** (u, v, cnt) for every adjacent DISTINCT token pair. */
  def adjacentPairCounts(tokens: DataFrame, tokCol: String): DataFrame =
    tokens
      .select(posexplode(col(tokCol)).as(Seq("__i", "u")), col(tokCol))
      .filter(col("__i") < size(col(tokCol)) - 1)
      .select(col("u"), element_at(col(tokCol), col("__i") + 2).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cnt"))

  /** Merge every adjacent (u, v) occurrence in a token array into the
    * single token "u v". Per-position neighbor test (see object doc:
    * u ≠ v makes matches non-overlapping, so no sequential state).
    */
  def applyMerge(toks: Column, u: String, v: String): Column =
    TextStats.bindOnce(toks) { ts =>
      // get() is 0-based and null-safe out of bounds — element_at
      // would throw under ANSI for index 0 / past-the-end probes
      // (Spark's && does not short-circuit)
      filter(
        transform(ts, (t, i) => when(
          t === u && get(ts, i + 1) === v,
          concat_ws(" ", lit(u), lit(v))
        ).when(
          get(ts, i - 1) === u && t === v,
          lit(null)
        ).otherwise(t)),
        t => t.isNotNull)
    }

  /** Learned merges after `rounds` iterations: (left, right, count) in
    * training order, alongside the transformed corpus
    * (id, tokens after all merges). Rounds stop early when no distinct
    * pair remains.
    */
  def minePhrases(
      df: DataFrame, idCol: String, textCol: String,
      rounds: Int): (Seq[(String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cur = df.select(col(idCol),
      TextStats.tokens(TextStats.normalize(col(textCol))).as("__toks"))
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    // each round's input feeds the pair count AND the merge transform.
    // Round 1's input is the lazy tokenization, so it is persisted;
    // every later round's input is already an eager localCheckpoint
    // (materialized once), so re-persisting it would just build a
    // second in-memory copy of the token corpus.
    var materialized = false
    for (_ <- 0 until rounds if !done) {
      val snap =
        if (materialized) cur
        else cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // one bounded 1-row collect per round (KMeans.fit contract)
        val top = adjacentPairCounts(snap, "__toks")
          .orderBy(col("cnt").desc, col("u"), col("v"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (u, v, c) =
            (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
          merges += ((u, v, c))
          cur = snap
            .select(col(idCol), applyMerge(col("__toks"), u, v).as("__toks"))
            .localCheckpoint(true) // materialize before releasing snap
        }
      } finally if (!materialized) { snap.unpersist(); materialized = true }
    }
    (merges.result(), cur.withColumnRenamed("__toks", "tokens"))
  }
}
