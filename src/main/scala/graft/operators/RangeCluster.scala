package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-clustered rewrite — the lakehouse `CLUSTER BY` / `OPTIMIZE`
  * maintenance pass: rewrite a table as `nShards` balanced shards whose
  * KEY RANGES ARE GLOBALLY DISJOINT (shard i's largest key < shard
  * i+1's smallest), so every shard's parquet min/max footer prunes
  * range scans across the WHOLE table. [[Sharding]] deliberately
  * scatters keys (stable reader assignment); this deliberately
  * CLUSTERS them (scan pruning) — the [[ZOrder]]/[[ZoneMap]] family's
  * missing rewrite step: q196 measures how much a clustered layout
  * would prune, this operator produces that layout.
  *
  * Why not `repartitionByRange` + write: Spark's range partitioner
  * draws SAMPLED boundaries — nondeterministic across runs, skewed
  * under heavy ties, and not replayable in another engine. Here the
  * boundary rule is exact and closed-form: a row with key `v` lands in
  * shard `⌊nShards · cntLess(v) / N⌋` where `cntLess(v)` = rows with
  * key strictly below `v` and `N` = total rows. Equal keys share
  * `cntLess` — ties NEVER straddle a shard boundary (the property
  * sampled boundaries can't promise) — shards are monotone in the key,
  * dense in `[0, nShards)`, and balanced to within the largest tie
  * block. All integer arithmetic: the plan is a pure function of the
  * data, layout-independent, and replays in SQL as one window cumsum
  * over the key histogram (q206).
  *
  * Scale shape: `cntLess` is a prefix sum over the DISTINCT-key
  * histogram (the [[graft.sketch.Quantiles]] shuffle contract — the
  * exchange carries distinct keys, never rows), computed with the
  * [[Packing]] two-level scan: per-bucket totals (#buckets-bounded
  * driver cumsum, fail-loud cap) + per-bucket windows — no
  * single-partition global window at any step. The rewrite itself is
  * one exchange keyed by shard + a per-shard sort, identical in cost
  * to [[Sharding.writeSortedShards]].
  */
object RangeCluster {

  /** The clustering plan: one row per DISTINCT key —
    * `(keyCol, n_rows, shard)` with the exact-balanced range shard
    * described above. Integer keys (counts, lengths, ids, z-values —
    * cast yours first); NULL keys raise.
    *
    * @param bucketWidth key span per scan bucket ([[Packing]] sizing:
    *                    dense keys ⇒ ~bucketWidth distinct keys per
    *                    bucket window).
    * @param maxBuckets  fail-loud cap on the #buckets driver cumsum
    *                    (the [[Packing.packSequences]] contract).
    */
  def rangeShardPlan(
      df: DataFrame, keyCol: String, nShards: Int,
      bucketWidth: Long = 1L << 16, maxBuckets: Long = 4000000L): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val hist = df
      .select(when(col(keyCol).isNull, raise_error(lit(
        s"rangeShardPlan: NULL $keyCol — a NULL has no position in the " +
          "key order; drop or impute explicitly")))
        .otherwise(col(keyCol).cast("long")).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      // materialize once: the min/bucket-total scalars below and the
      // final windowed plan all read this distinct-key projection
      .localCheckpoint(true)

    // shift keys non-negative so truncating `div` = floor division
    // (negative keys would bucket non-monotonically); one bounded
    // 1-row scalar
    val minKey = hist.agg(min(col("__v"))).head.getLong(0)
    val bucketed = hist.withColumn("__b",
      expr(s"(__v - ${minKey}L) div ${bucketWidth}L"))

    val nBuckets = bucketed.agg(countDistinct(col("__b"))).head.getLong(0)
    require(nBuckets <= maxBuckets,
      s"rangeShardPlan: $nBuckets occupied buckets exceeds maxBuckets=" +
        s"$maxBuckets — widen bucketWidth (currently $bucketWidth)")

    val totals = bucketed.groupBy(col("__b")).agg(sum(col("__c")).as("__t"))
      .collect() // bounded: one row per bucket, nBuckets <= maxBuckets
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val n = acc
    require(n > 0, "rangeShardPlan: input is empty")
    require(BigInt(nShards) * n < BigInt(Long.MaxValue),
      s"rangeShardPlan: nShards=$nShards * N=$n overflows the exact " +
        "shard arithmetic")

    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__b2", "__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(offsetDf, col("__b") === col("__b2"))
      .withColumn("__less",
        col("__off") + sum(col("__c")).over(w) - col("__c"))
      .select(col("__v").as(keyCol), col("__c").as("n_rows"),
        expr(s"(${nShards}L * __less) div ${n}L").as("shard"))
  }

  /** Execute the plan over `df`: rows move once (hash exchange on the
    * shard id), sort by key within each shard, and land as
    * `outDir/shard=N/` parquet — one file per shard, globally
    * range-disjoint. Returns the receipt `(shard, n_rows, min_key,
    * max_key)` computed from the PLAN (shard-count-sized), so a
    * read-back mismatch means the write lost rows.
    */
  def clusterByRange(
      df: DataFrame, keyCol: String, nShards: Int, outDir: String,
      bucketWidth: Long = 1L << 16, maxBuckets: Long = 4000000L): DataFrame = {
    val plan = rangeShardPlan(df, keyCol, nShards, bucketWidth, maxBuckets)
      .withColumnRenamed(keyCol, "__pk")
      .localCheckpoint(true) // the join below and the receipt both read it
    df.join(plan.select(col("__pk"), col("shard")),
        df(keyCol) === col("__pk"))
      .drop("__pk")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    plan.groupBy(col("shard"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("__pk")).as("min_key"),
        max(col("__pk")).as("max_key"))
  }
}
