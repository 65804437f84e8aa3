package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import sqlImplicits._

  private def df(n: Long) = (0L until n).map(i => (i, s"doc $i"))
    .toDF("id", "text")

  test("shard assignment is stable under repartitioning and row order") {
    val base = Sharding.withShard(df(500L), "id", 16)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val shuffled = Sharding.withShard(
      df(500L).repartition(7, col("text")).orderBy(desc("id")), "id", 16)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    shuffled shouldBe base
    base.values.foreach { s => s should (be >= 0 and be < 16) }
  }

  test("manifest counts, ranges and checksum partition the corpus") {
    val m = Sharding.shardManifest(df(500L), "id", 8).collect()
    m.map(_.getAs[Long]("n_rows")).sum shouldBe 500L
    // every shard non-empty at this size, ranges within the key domain
    m.length shouldBe 8
    m.foreach { r =>
      r.getAs[Long]("min_key") should be <= r.getAs[Long]("max_key")
      r.getAs[Long]("key_checksum") should be > 0L
    }
  }

  test("different salts give different assignments; same salt agrees") {
    val a = Sharding.withShard(df(300L), "id", 16, salt = "s1")
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sharding.withShard(df(300L), "id", 16, salt = "s2")
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val same = a.count { case (k, v) => b(k) == v }
    // independent assignments agree ~1/16 of the time; 50% is the alarm
    same.toDouble / a.size should be < 0.5
  }

  test("writeSortedShards lands sorted parquet per shard and returns the manifest") {
    val dir = Files.createTempDirectory("shards").toString
    val manifest = Sharding.writeSortedShards(df(400L), "id", 4, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    val back = spark.read.parquet(dir)
    back.count() shouldBe 400L
    // within every file rows are key-sorted (the parquet row-group
    // min/max stats contract); check per file via input_file_name
    val files = back
      .select(col("id"), input_file_name().as("f"))
      .collect().groupBy(_.getString(1))
    files.foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(0)).toSeq
      ids shouldBe ids.sorted
    }
    // re-computing the manifest from the sink reproduces it exactly
    val recomputed = Sharding.shardManifest(
      back.select("id", "text"), "id", 4).collect()
      .map(r => r.getInt(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    recomputed shouldBe manifest
  }

  test("rendezvous: growing nShards only moves keys to the NEW shard") {
    val n = 2000L
    def assign(s: Int) = Sharding.withRendezvousShard(df(n), "id", s)
      .select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (4 to 8).foreach { s =>
      val before = assign(s)
      val after = assign(s + 1)
      val moved = before.keys.filter(k => before(k) != after(k)).toSeq
      // the HRW invariant: every moved key lands on the new shard
      moved.foreach { k => after(k) shouldBe s }
      // expected movement 1/(s+1); allow a generous band around it
      val frac = moved.size.toDouble / n
      frac should be > 0.3 / (s + 1)
      frac should be < 3.0 / (s + 1)
    }
    // contrast: mod-sharding moves (nearly) everything on the same step
    val mb = Sharding.withShard(df(n), "id", 8)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ma = Sharding.withShard(df(n), "id", 9)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val modMoved = mb.keys.count(k => mb(k) != ma(k)).toDouble / n
    modMoved should be > 0.5
  }

  test("rendezvous assignment is stable, in-range and salt-dependent") {
    val base = Sharding.withRendezvousShard(df(400L), "id", 10)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rerun = Sharding.withRendezvousShard(
      df(400L).repartition(5, col("text")).orderBy(desc("id")), "id", 10)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rerun shouldBe base
    base.values.foreach { s => s should (be >= 0 and be < 10) }
    // all shards populated at 400 keys / 10 shards
    base.values.toSet.size shouldBe 10
    val salted = Sharding.withRendezvousShard(df(400L), "id", 10, salt = "v2")
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val same = base.count { case (k, v) => salted(k) == v }
    same.toDouble / base.size should be < 0.5
  }

  test("weighted rendezvous: shares track weights; weight bumps only PULL") {
    val n = 3000L
    def assign(ws: Seq[Int]) = df(n)
      .withColumn("shard",
        Sharding.rendezvousShardWeighted(col("id"), ws))
      .select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ws = Seq(1, 2, 3, 2)
    val a = assign(ws)
    val total = ws.sum.toDouble
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    ws.indices.foreach { s =>
      val share = counts.getOrElse(s, 0).toDouble / n
      val want = ws(s) / total
      share should be (want +- 0.35 * want) // ±35% band at n=3000
    }
    // bump shard 1's weight: every moved key moves TO shard 1
    val b = assign(Seq(1, 3, 3, 2))
    val moved = a.keys.filter(k => a(k) != b(k)).toSeq
    moved should not be empty
    moved.foreach { k => b(k) shouldBe 1 }
    // uniform weights degenerate to the unweighted assignment's
    // distribution properties (not the same hash inputs, so only
    // sanity-check the range)
    assign(Seq(1, 1, 1)).values.foreach { s => s should (be >= 0 and be < 3) }
  }
}
