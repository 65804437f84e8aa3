package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sharded materialization — the final step of a curation
  * pipeline: the corpus written as `nShards` stable shards with a
  * manifest (row count, key range, order-independent content checksum
  * per shard) so a training job can (a) assign shards to readers
  * without listing files, (b) verify a transfer without re-reading the
  * corpus, and (c) reproduce the exact layout from the keys alone.
  *
  * Shard assignment is `Splits.bucketOf(key, salt, nShards)` — a pure
  * function of (key, salt), independent of partitioning, row order and
  * cluster size, and replayable in any engine with 64-bit integers
  * (the [[Splits]] contract). The checksum is the SUM of the per-key
  * squared Karp-Rabin hashes mod 2³¹−1: addition commutes, so the
  * checksum is identical however the shard's rows were ordered or
  * partitioned when it was computed — a content fingerprint, not a
  * layout fingerprint. (Sum-of-hashes is weaker than an order-aware
  * digest against adversarial tampering, but transfer verification
  * guards against corruption, not adversaries.)
  *
  * Scale shape: the manifest is one map-side-combinable aggregate over
  * a projected (shard, key, hash) table — document text never rides
  * the shuffle — and the write is `repartition(shard)` +
  * `sortWithinPartitions(key)` + parquet `partitionBy(shard)`: one
  * exchange keyed by shard, within-shard key order for free range
  * metadata (parquet min/max row-group stats → key-range scan pruning
  * on the read side).
  */
object Sharding {

  /** Stable shard id in `[0, nShards)` for `key` (see [[Splits.bucketOf]]). */
  def shardOf(key: Column, nShards: Int, salt: String = ""): Column =
    Splits.bucketOf(key, salt, nShards).cast("int")

  /** `df` plus a `shard` column. */
  def withShard(
      df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard", shardOf(col(keyCol), nShards, salt))
  }

  /** One row per non-empty shard: `(shard, n_rows, min_key, max_key,
    * key_checksum)` with the order-independent checksum described
    * above. Exactly the aggregate a writer emits next to the data and
    * a reader re-computes to verify it.
    */
  def shardManifest(
      df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val p = lit((1L << 31) - 1)
    val h = graft.functions.KrHash.krHash(col(keyCol).cast("string"))
    withShard(df, keyCol, nShards, salt)
      .select(col("shard"), col(keyCol).as("__k"),
        ((h * h) % p).as("__h"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__k")).as("min_key"),
        max(col("__k")).as("max_key"),
        sum(col("__h")).as("key_checksum"))
  }

  /** Write `df` as `path/shard=N/…` parquet, rows sorted by `keyCol`
    * within each shard: one exchange on the shard id, then a
    * per-partition sort — no global sort. Returns the manifest
    * (computed from the input projection, not by re-reading the sink).
    */
  def writeSortedShards(
      df: DataFrame, keyCol: String, nShards: Int, path: String,
      salt: String = ""): DataFrame = {
    val sharded = withShard(df, keyCol, nShards, salt)
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shardManifest(df, keyCol, nShards, salt)
  }

  /** Maximum shard count [[rendezvousShard]] supports — scores are
    * packed as `score · 4096 + (4095 − shard)` in a 64-bit long
    * (score < 2³¹ ⇒ packed < 2⁴³), so the argmax is a single
    * `array_max` with ties going to the SMALLEST shard id.
    */
  val MaxRendezvousShards = 4096

  /** Rendezvous (highest-random-weight) shard id in `[0, nShards)`:
    * `argmax_s hash(key ⊕ s)` instead of `hash(key) mod nShards`.
    * The property mod-sharding lacks: when `nShards` grows to
    * `nShards+1`, a key either keeps its shard or moves to the NEW
    * shard — expected movement is `1/(nShards+1)` of the corpus,
    * versus ≈`(nShards−1)/nShards` (nearly everything) under mod.
    * That is the difference between an incremental re-shard touching
    * one new shard's worth of data and a full corpus rewrite when a
    * 100 TB sharded store needs more shards. (Weighted rendezvous and
    * consistent-hash rings solve the same problem; plain HRW is the
    * simplest replayable form.)
    *
    * Per-shard scores reuse [[Splits.squaredHash]] over
    * `key + "#" + s` — the engine's cross-engine-replayable hash (the
    * q176 oracle replays the whole argmax in DuckDB) — and the salt
    * contract matches [[Splits]]: distinct salts give independent
    * placements. Map-only, O(nShards) per row: the right tool for
    * shard counts in the tens-to-hundreds (reader/writer fan-out),
    * not for million-bucket hashing (use [[shardOf]] there, where
    * minimal movement matters less than constant-time assignment).
    */
  def rendezvousShard(key: Column, nShards: Int, salt: String = ""): Column = {
    require(nShards >= 1 && nShards <= MaxRendezvousShards,
      s"nShards must be in [1, $MaxRendezvousShards], got $nShards")
    val packed = (0 until nShards).map { s =>
      Splits.squaredHash(concat(key.cast("string"), lit("#" + s)), salt) *
        MaxRendezvousShards + lit(MaxRendezvousShards - 1 - s)
    }
    (lit(MaxRendezvousShards - 1) -
      array_max(array(packed: _*)) % MaxRendezvousShards).cast("int")
  }

  /** `df` plus a rendezvous `shard` column. */
  def withRendezvousShard(
      df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame =
    df.withColumn("shard", rendezvousShard(col(keyCol), nShards, salt))

  /** Capacity-weighted rendezvous shard: shard `s` competes with
    * `weights(s)` VIRTUAL nodes (`key + "#" + s + ":" + v`), so its
    * expected key share is `weights(s) / Σweights` — heterogeneous
    * shard capacity (a reader with 2× the disks takes 2× the keys)
    * with the same minimal-movement story PER WEIGHT STEP: raising one
    * shard's weight by 1 only PULLS keys into that shard (the new
    * virtual node either wins a key or changes nothing), and removing
    * a virtual node only redistributes that node's keys. Map-only,
    * O(Σweights) per row; same replayable packed-argmax as
    * [[rendezvousShard]].
    */
  def rendezvousShardWeighted(
      key: Column, weights: Seq[Int], salt: String = ""): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_ >= 1), s"weights must be >= 1, got $weights")
    require(weights.sum <= MaxRendezvousShards,
      s"sum of weights must be <= $MaxRendezvousShards, got ${weights.sum}")
    require(weights.length <= MaxRendezvousShards,
      s"need at most $MaxRendezvousShards shards, got ${weights.length}")
    val packed = for {
      s <- weights.indices
      v <- 0 until weights(s)
    } yield
      Splits.squaredHash(
        concat(key.cast("string"), lit("#" + s + ":" + v)), salt) *
        MaxRendezvousShards + lit(MaxRendezvousShards - 1 - s)
    (lit(MaxRendezvousShards - 1) -
      array_max(array(packed: _*)) % MaxRendezvousShards).cast("int")
  }
}
