package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout for repeat joins — the "pay the shuffle
  * once, at write time" technique. A fact table that joins the same
  * dimension key every day (orders ⋈ customer, events ⋈ user, examples
  * ⋈ document) re-shuffles BOTH sides on every run under the default
  * layout; written bucketed on the join key with the same bucket count
  * on both sides, Spark's scan reports the hash-partitioning to the
  * planner and the sort-merge join runs with NO Exchange on either
  * side — at 100 TB that deleted shuffle IS the query cost.
  *
  * Also bought by the same layout:
  *   - bucket pruning: an equality filter on the bucket key scans
  *     1/nBuckets of the files (`SelectedBucketsCount` in the scan);
  *   - `sortBy` within buckets feeds merge-join and min/max skipping.
  *
  * Spark only tracks bucketing through the catalog (a bare
  * `parquet(path)` write cannot carry it), so tables register in the
  * session catalog with an explicit external `path` — the in-memory
  * catalog works; no Hive needed. `BucketingSpec` machine-checks the
  * no-Exchange plan, the bucket-pruned scan, and result equality with
  * the plain join; the q106 oracle replays the join result itself.
  *
  * Caveats encoded here rather than left to the caller: both sides
  * MUST have identical bucket counts (different counts re-shuffle the
  * smaller side), and the join keys must be exactly the bucket keys.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table at `path`,
    * (re)registering `table` in the session catalog.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Equi-join two same-bucketed catalog tables on `keys` (the bucket
    * keys of both). With equal bucket counts the planner proves
    * co-partitioning from the catalog metadata and plans no Exchange.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
