package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention and ordered funnels over an event stream — the
  * product-analytics pair every event table eventually gets asked
  * for, expressed in the engine's exact-integer house style.
  *
  * [[retention]]: users bucketed by their FIRST activity period
  * (the cohort), then distinct-user counts per (cohort, period
  * offset) — the retention triangle. Periods are integral divisions
  * of the event time by a caller-owned period length (caller-owned
  * for the q114 reason: an operator deriving its own bucketing moves
  * the goalposts between runs).
  *
  * [[orderedFunnel]]: how many users performed stage 1, then stage 2
  * STRICTLY AFTER their first stage 1, then stage 3 strictly after
  * that first qualifying stage 2 — the ORDERED conversion count
  * (an unordered `COUNT(DISTINCT user) FILTER (stage = s)` overstates
  * conversion whenever users purchase before viewing, which bot
  * traffic does constantly). First-qualifying-timestamp semantics:
  * each stage anchors at the user's MINIMUM event time that is
  * strictly later than the previous stage's anchor — deterministic,
  * exact, SQL-replayable (q138).
  *
  * Scale shape: retention is two map-side-combinable aggregates
  * keyed on user then cohort; the funnel is one aggregate per stage
  * (each keyed on user — Catalyst reuses the hash partitioning
  * across the chained joins) with anchors riding |users|-sized
  * tables, never a per-user collect or window sort.
  */
object Cohorts {

  /** `(cohort, offset, n_users)` — distinct users active in period
    * `cohort + offset` whose first activity fell in `cohort`.
    * `periodCol` must be an integral period index (e.g.
    * `epoch_us div week`); NULLs raise.
    */
  def retention(
      df: DataFrame, userCol: String, periodCol: String): DataFrame = {
    val p = when(col(periodCol).isNull,
      raise_error(lit(s"retention: NULL $periodCol — drop explicitly, " +
        "a silent skip would re-cohort the user")))
      .otherwise(col(periodCol).cast("long"))
    val ev = df.select(col(userCol).as("user"), p.as("period")).distinct()
    val cohorts = ev.groupBy(col("user"))
      .agg(min(col("period")).as("cohort"))
    ev.join(cohorts, "user")
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** One row per funnel stage: `(stage_idx, stage, n_users)` — users
    * whose first qualifying time for the stage exists (strictly after
    * the previous stage's). `stages` are values of `stageCol` in
    * funnel order; `timeCol` is any totally-ordered numeric/time.
    */
  def orderedFunnel(
      df: DataFrame, userCol: String, stageCol: String, timeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "orderedFunnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stages in $stages")
    val ev = df.select(col(userCol).as("user"), col(stageCol).as("stage"),
      col(timeCol).as("t"))
    // anchors(i): per-user first time of stages(i) after anchors(i-1);
    // each stage's anchor table is checkpointed once — it feeds both
    // its own count action and the next stage's join
    var anchors = ev.filter(col("stage") === stages.head)
      .groupBy(col("user")).agg(min(col("t")).as("anchor"))
      .localCheckpoint(true)
    val counts = Seq.newBuilder[(Int, String, Long)]
    counts += ((0, stages.head, anchors.count()))
    for (i <- 1 until stages.size) {
      anchors = ev.filter(col("stage") === stages(i))
        .join(anchors, "user")
        .filter(col("t") > col("anchor"))
        .groupBy(col("user")).agg(min(col("t")).as("anchor"))
        .localCheckpoint(true)
      counts += ((i, stages(i), anchors.count()))
    }
    val s = df.sparkSession
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      counts.result().map { case (i, st, n) =>
        org.apache.spark.sql.Row(i, st, n)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stage_idx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("stage",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_users",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
