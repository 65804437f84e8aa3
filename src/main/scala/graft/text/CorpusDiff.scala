package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-over-snapshot corpus diff — the per-ingest monitoring table
  * answering "what changed since the last run" BEFORE a retrain is
  * launched: per group (source/domain/language), document and token
  * deltas between two corpus snapshots, with groups present in only
  * one side reported explicitly (a vanished source is the classic
  * silent upstream failure; a brand-new one is the classic
  * contamination vector). Complements [[Drift.tokenKlContributions]]
  * (distribution shift) with volume shift.
  *
  * Scale shape: each snapshot collapses to a ≤|groups|-row aggregate
  * FIRST (map-side combinable), then a full-outer equi-join on the
  * group key joins two tiny tables — the corpora never meet in a
  * shuffle. All-integer output; deltas are `new − old` with absent
  * sides counted 0.
  */
object CorpusDiff {

  /** One row per group in either snapshot:
    * `(group, docs_old, docs_new, docs_delta, tokens_old, tokens_new,
    * tokens_delta, status)` with status ∈ added | removed | changed |
    * unchanged.
    */
  def diff(
      oldDf: DataFrame, newDf: DataFrame,
      groupCol: String, textCol: String): DataFrame = {
    def stats(df: DataFrame, suffix: String): DataFrame = {
      val toks = when(length(trim(col(textCol))) === 0, lit(0L))
        .otherwise(size(split(TextStats.normalize(col(textCol)), " "))
          .cast("long"))
      df.select(col(groupCol).as("g"), toks.as("__t"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as(s"docs_$suffix"),
          sum(col("__t")).as(s"tokens_$suffix"))
    }
    val o = stats(oldDf, "old")
    val n = stats(newDf, "new")
    o.withColumnRenamed("g", "__go")
      .join(n.withColumnRenamed("g", "__gn"),
        col("__go") === col("__gn"), "full_outer")
      .select(
        coalesce(col("__go"), col("__gn")).as(groupCol),
        coalesce(col("docs_old"), lit(0L)).as("docs_old"),
        coalesce(col("docs_new"), lit(0L)).as("docs_new"),
        (coalesce(col("docs_new"), lit(0L)) -
          coalesce(col("docs_old"), lit(0L))).as("docs_delta"),
        coalesce(col("tokens_old"), lit(0L)).as("tokens_old"),
        coalesce(col("tokens_new"), lit(0L)).as("tokens_new"),
        (coalesce(col("tokens_new"), lit(0L)) -
          coalesce(col("tokens_old"), lit(0L))).as("tokens_delta"),
        when(col("docs_old").isNull, lit("added"))
          .when(col("docs_new").isNull, lit("removed"))
          .when(col("docs_old") === col("docs_new") &&
            col("tokens_old") === col("tokens_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
