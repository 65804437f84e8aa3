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
}
