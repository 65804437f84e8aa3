package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline funnel report: per-stage document and token survival for an
  * ORDERED sequence of filter stages — the ops dashboard of a curation
  * run ("we started with 100 TB, the language filter took 40%, dedup
  * took 25% of what was left…"). [[QualityFilter]] answers "which rules
  * does each document violate"; the funnel answers the sequential
  * question "how much data reaches, and dies at, each stage", where a
  * document dropped by stage 2 is never seen by stage 5 — drop
  * attribution follows pipeline order, exactly like the staged
  * production run it previews.
  *
  * Scale shape: ONE map-only projection computes each row's
  * first-failing stage index, then one map-side-combinable aggregate
  * reduces the corpus to ≤ nStages+1 rows (index, docs, tokens).
  * Everything after — the stage-name join, cumulative in/out windows,
  * corpus totals — runs on that stage-sized table (the single-partition
  * window is bounded by nStages, never by data volume; totals attach
  * via [[graft.core.Scalars]]' constant-key broadcast hash join, so no
  * nested-loop operator appears).
  *
  * Stage predicates follow the [[QualityFilter]] NULL convention: a
  * predicate that evaluates NULL counts as NOT failed (coalesce to
  * false — "could not evaluate" is not evidence of a violation). The
  * token weight must be non-NULL and ≥ 0, and raises otherwise — a
  * silently skipped NULL weight would understate token columns, and
  * curation decisions are made on exactly these numbers.
  */
object Funnel {

  /** One row per stage, in pipeline order: `(stage_idx, stage,
    * docs_in, docs_dropped, docs_out, tokens_in, tokens_dropped,
    * tokens_out)`. `docs_in` of stage 0 is the corpus size;
    * `docs_out` of the last stage is the surviving corpus. All counts
    * are exact longs, so the whole table replays bit-exactly (q83).
    */
  def funnelReport(
      df: DataFrame, stages: Seq[QualityFilter.Rule],
      tokensCol: Column): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.map(_.name).distinct.size == stages.size,
      s"duplicate stage names in ${stages.map(_.name)}")
    val tok = tokensCol.cast("long")
    val guardedTok =
      when(tok.isNull || tok < 0L,
        raise_error(concat(
          lit("funnelReport: token weight must be a non-negative " +
            "integer, got "),
          coalesce(tok.cast("string"), lit("NULL")))))
        .otherwise(tok)
    // first failing stage, in declaration order; nStages = survived
    val firstFail = stages.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (r, i)) =>
        val cond = coalesce(r.fails, lit(false))
        Some(acc.fold(when(cond, lit(i.toLong)))(_.when(cond, lit(i.toLong))))
      }.get.otherwise(lit(stages.length.toLong))
    val dropped = df
      .select(firstFail.as("__ff"), guardedTok.as("__tok"))
      .groupBy(col("__ff"))
      .agg(count(lit(1)).as("__nd"), sum(col("__tok")).as("__nt"))
    val totals = dropped.agg(
      coalesce(sum(col("__nd")), lit(0L)).as("__totd"),
      coalesce(sum(col("__nt")), lit(0L)).as("__tott"))
    val spark = df.sparkSession
    import spark.implicits._
    val stageNames = stages.zipWithIndex
      .map { case (r, i) => (i.toLong, r.name) }
      .toDF("stage_idx", "stage")
    val perStage = stageNames
      .join(dropped, col("stage_idx") === col("__ff"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("__nd"), lit(0L)).as("docs_dropped"),
        coalesce(col("__nt"), lit(0L)).as("tokens_dropped"))
    // cumulative drops BEFORE each stage; window spans ≤ nStages rows
    val before = Window.orderBy(col("stage_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.core.Scalars.withScalars(perStage, totals)
      .withColumn("__cd",
        coalesce(sum(col("docs_dropped")).over(before), lit(0L)))
      .withColumn("__ct",
        coalesce(sum(col("tokens_dropped")).over(before), lit(0L)))
      .select(col("stage_idx"), col("stage"),
        (col("__totd") - col("__cd")).as("docs_in"),
        col("docs_dropped"),
        (col("__totd") - col("__cd") - col("docs_dropped")).as("docs_out"),
        (col("__tott") - col("__ct")).as("tokens_in"),
        col("tokens_dropped"),
        (col("__tott") - col("__ct") - col("tokens_dropped"))
          .as("tokens_out"))
  }
}
