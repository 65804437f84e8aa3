package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned sketch store — the deployment shape that makes the
  * sketch family OPERATIONAL: a daily job writes each day's per-group
  * [[Moments]] power sums as one parquet partition; any date-range
  * question ("value distribution per event type, last 30 days") is
  * then answered by reading ONLY those partitions and merging — the
  * corpus is never rescanned. The same write-once/serve-many contract
  * as the dedup index (q62) and the postings index (q148), applied to
  * statistics: ingest cost is one aggregate per day, query cost is
  * `days × |groups|` sketch rows.
  *
  * Idempotent re-runs: [[writeDay]] uses DYNAMIC partition overwrite —
  * re-running a day (backfill, late data, crashed job retried by the
  * scheduler) replaces exactly that day's partition and nothing else,
  * so the daily job needs no external dedup ledger. [[writeDaily]]
  * bootstraps the store from history in one pass.
  *
  * Scale shape: the write is ONE map-side-combinable aggregate keyed
  * (day, group); the read is a parquet scan whose day filter is a
  * PARTITION filter (pruned before any file opens — pinned in
  * SketchStoreSpec) followed by a `days × |groups|`-row merge. Day
  * derivation is `unix_micros div 86_400_000_000` (the q114/q130
  * integral-division goalpost: caller-visible, engine-replayable).
  */
object SketchStore {

  private val DayUs = 86400000000L

  private def daily(
      df: DataFrame, tsCol: String, groupCol: String, valueCol: String,
      decimals: Int): DataFrame = {
    val withG = df
      .withColumn("__day", expr(s"unix_micros($tsCol) div ${DayUs}L"))
      .withColumn("__g",
        struct(col("__day").as("day"), col(groupCol).as("grp")))
    Moments.sketch(withG, "__g", valueCol, decimals)
      .select(col("group.day").as("day"), col("group.grp").as("grp"),
        col("n"), col("q_absmax"), col("s1"), col("s2"), col("s3"),
        col("s4"))
  }

  /** Bootstrap: sketch EVERY day present in `df` and (over)write the
    * store — one aggregate pass over history.
    */
  def writeDaily(
      df: DataFrame, tsCol: String, groupCol: String, valueCol: String,
      path: String, decimals: Int = 0): Unit =
    daily(df, tsCol, groupCol, valueCol, decimals)
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** The daily job: sketch `df` (one day's ingest — enforced: rows
    * outside `day` raise, a misrouted batch would silently corrupt a
    * neighbor partition) and replace exactly that day's partition.
    */
  def writeDay(
      df: DataFrame, tsCol: String, groupCol: String, valueCol: String,
      path: String, day: Long, decimals: Int = 0): Unit = {
    val spark = df.sparkSession
    val guarded = df.withColumn(tsCol,
      when(expr(s"unix_micros($tsCol) div ${DayUs}L") =!= day,
        raise_error(concat(lit(s"SketchStore.writeDay: row outside day "),
          lit(day.toString), lit(" — route batches by day upstream"))))
        .otherwise(col(tsCol)))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try daily(guarded, tsCol, groupCol, valueCol, decimals)
      .write.partitionBy("day").mode("overwrite").parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Merged per-group sketch over `[fromDay, toDay]` — reads only
    * those partitions (day is a partition column, so the filter prunes
    * directories, not rows) and sums the mergeable form. Output has
    * [[Moments.sketch]]'s shape, ready for [[Moments.finish]].
    */
  def readRange(
      spark: SparkSession, path: String, fromDay: Long, toDay: Long): DataFrame = {
    require(fromDay <= toDay, s"empty range [$fromDay, $toDay]")
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
      .groupBy(col("grp").as("group"))
      .agg(sum(col("n")).as("n"),
        max(col("q_absmax")).as("q_absmax"),
        sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
        sum(col("s3")).as("s3"), sum(col("s4")).as("s4"))
  }

  // ---- HLL distinct-count variant --------------------------------------
  //
  // Same day-partition layout, [[Hll]] registers as the stored form:
  // registers merge by MAX (associative, commutative, IDEMPOTENT), so a
  // day re-written with overlapping data cannot even double-count.
  // "Distinct users per source over any date range" then reads
  // `days × groups × 2^p` register rows and never the events.

  /** Bootstrap the distinct-count store: per-day HLL registers for
    * `value` within each (day, `groupCol`).
    */
  def writeDailyDistinct(
      df: DataFrame, tsCol: String, groupCol: String, value:
      org.apache.spark.sql.Column, path: String, p: Int = 12): Unit = {
    val withDay = df
      .withColumn("__day", expr(s"unix_micros($tsCol) div ${DayUs}L"))
    Hll.sketch(withDay, Seq("__day", groupCol), value, p)
      .withColumnRenamed("__day", "day")
      .withColumnRenamed(groupCol, "grp")
      .write.partitionBy("day").mode("overwrite").parquet(path)
  }

  /** Merged per-group registers over `[fromDay, toDay]` (partition
    * pruned), ready for [[Hll.estimate]] keyed by `grp`.
    */
  def readRangeDistinct(
      spark: SparkSession, path: String, fromDay: Long, toDay: Long): DataFrame = {
    require(fromDay <= toDay, s"empty range [$fromDay, $toDay]")
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }
}
