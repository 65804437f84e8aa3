package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clipped n-gram overlap (the BLEU modified-precision core, Papineni
  * et al. 2002) between a candidate and a reference token sequence —
  * in a curation pipeline, the "how much did this stage rewrite the
  * text" divergence report (original vs redacted / boilerplate-stripped
  * / span-corrupted), and on model output the summarization-overlap
  * metric.
  *
  * For each n: `clipped = Σ_g min(count_cand(g), count_ref(g))`,
  * `precision = clipped / Σ_g count_cand(g)` — counting each candidate
  * n-gram at most as often as the reference contains it, so repeating
  * a reference phrase k× does not inflate the score. All counts are
  * exact 64-bit integers; the per-row precision is ONE IEEE divide
  * (NULL when the candidate has no n-grams) — bit-replayable (q107).
  * The brevity penalty is deliberately NOT folded in: `exp(1 − r/c)`
  * is not bit-replayable across engines; callers have `cand_ngrams` /
  * `ref_ngrams` to apply it driver-side.
  *
  * Plan shape: one explode per side unioned with a side flag, ONE
  * aggregation keyed on (id, n-gram) with map-side partial counts,
  * then a row-per-id rollup — the shuffle carries distinct
  * (id, n-gram) rows, never full text, and no joins at all.
  */
object Overlap {

  /** Contiguous n-grams of a token array as space-joined strings
    * (empty array when the document is shorter than `n`).
    */
  def ngrams(tokens: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-id clipped n-gram precision for each n in `ns`:
    * `(id…, n, clipped, cand_ngrams, ref_ngrams, clip_precision)`.
    * Rows whose candidate AND reference are both shorter than `n`
    * produce no output for that `n`.
    */
  def ngramPrecision(
      df: DataFrame,
      idCols: Seq[String],
      candTokens: Column,
      refTokens: Column,
      ns: Seq[Int],
      materialize: Boolean = true): DataFrame = {
    require(idCols.nonEmpty, "ngramPrecision needs at least one id column")
    require(ns.nonEmpty, "ngramPrecision needs at least one n")
    // the token columns are typically DERIVED (the redaction/stripping
    // pipeline whose rewrite is being measured) and every n re-scans
    // them twice (candidate + reference explode) — materialize = true
    // persists the projected token table so the upstream pipeline runs
    // ONCE for all ns; false stays lazy/fault-tolerant (the
    // Decontaminate/Relevance materialize contract)
    val projected0 = df.select(
      (idCols.map(col) :+ candTokens.as("__cand") :+
        refTokens.as("__ref")): _*)
    val projected =
      if (materialize && ns.size > 1) projected0.localCheckpoint(true)
      else projected0
    val perN = ns.map { n =>
      val grams = projected.select(
        (idCols.map(col) :+ ngrams(col("__cand"), n).as("__cg") :+
          ngrams(col("__ref"), n).as("__rg")): _*)
      val both = grams
        .select((idCols.map(col) :+ explode(col("__cg")).as("__g") :+
          lit(1L).as("__c") :+ lit(0L).as("__r")): _*)
        .unionByName(grams
          .select((idCols.map(col) :+ explode(col("__rg")).as("__g") :+
            lit(0L).as("__c") :+ lit(1L).as("__r")): _*))
      both
        .groupBy((idCols.map(col) :+ col("__g")): _*)
        .agg(sum(col("__c")).as("__cc"), sum(col("__r")).as("__rc"))
        .groupBy(idCols.map(col): _*)
        .agg(
          sum(least(col("__cc"), col("__rc"))).as("clipped"),
          sum(col("__cc")).as("cand_ngrams"),
          sum(col("__rc")).as("ref_ngrams"))
        .withColumn("n", lit(n))
    }
    perN.reduce(_ unionByName _)
      .withColumn("clip_precision",
        when(col("cand_ngrams") > 0,
          col("clipped").cast("double") / col("cand_ngrams").cast("double")))
      .select((idCols.map(col) :+ col("n") :+ col("clipped") :+
        col("cand_ngrams") :+ col("ref_ngrams") :+ col("clip_precision")): _*)
  }
}
