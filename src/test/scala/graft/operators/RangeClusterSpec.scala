package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeClusterSpec extends SparkSpec {
  import sqlImplicits._

  private def plan(keys: Seq[Long], nShards: Int) =
    RangeCluster.rangeShardPlan(keys.toDF("k"), "k", nShards)
      .collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("shard"))))
      .toMap

  test("closed-form shard: floor(nShards * cntLess / N)") {
    // keys 1,1,2,3,3,3,7,9 (N=8), nShards=4:
    // cntLess: 1->0, 2->2, 3->3, 7->6, 9->7
    // shard  : 1->0, 2->1, 3->1, 7->3, 9->3
    plan(Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L, 9L), 4) shouldBe Map(
      1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((3L, 1L)),
      7L -> ((1L, 3L)), 9L -> ((1L, 3L)))
  }

  test("ties never straddle a boundary; shards are monotone in the key") {
    val keys = Seq.fill(40)(5L) ++ (0L until 60L)
    val got = plan(keys, 8).toSeq.sortBy(_._1)
    // every distinct key maps to ONE shard by construction; monotone:
    got.map(_._2._2) shouldBe got.map(_._2._2).sorted
    // the 41-row tie block on key 5 sits wholly in one shard
    got.toMap.apply(5L)._1 shouldBe 41L
  }

  test("layout-independent: repartitioned input gives the identical plan") {
    val keys = (0 until 500).map(i => (i * 37 % 91).toLong)
    val a = plan(keys, 7)
    val b = RangeCluster.rangeShardPlan(
      keys.toDF("k").repartition(13), "k", 7)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    a shouldBe b
  }

  test("negative keys bucket correctly (min-shift before div)") {
    val got = plan(Seq(-100L, -50L, 0L, 50L, 100L), 5)
    got.toSeq.sortBy(_._1).map(_._2._2) shouldBe Seq(0L, 1L, 2L, 3L, 4L)
  }

  test("NULL keys raise") {
    val df = Seq(Some(1L), None).toDF("k")
    intercept[Exception] {
      RangeCluster.rangeShardPlan(df, "k", 2).collect()
    }.getMessage should include("NULL k")
  }

  test("clusterByRange: one sorted file per shard, disjoint ranges, rows kept") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_rangecluster_").toString
    val df = (0 until 1000)
      .map(i => ((i * 131) % 257L, i.toLong)).toDF("k", "payload")
    val receipt = RangeCluster.clusterByRange(df, "k", 4, s"$out/c")
      .collect()
      .map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("min_key"),
          r.getAs[Long]("max_key"))))
      .toMap

    // read-back: rows preserved, shard stats match the receipt
    val back = spark.read.parquet(s"$out/c")
    back.count() shouldBe 1000L
    val backStats = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
        max(col("k")).as("mx"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    backStats shouldBe receipt

    // globally disjoint ranges in shard order
    val ordered = receipt.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, _, hiA), (_, loB, _)) => hiA should be < loB
      case _ =>
    }

    // one parquet file per shard dir, sorted by key within the file
    for (s <- receipt.keys) {
      val dir = new java.io.File(s"$out/c/shard=$s")
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      parts.length shouldBe 1
      val ks = spark.read.parquet(parts.head.getPath)
        .select(col("k")).collect().map(_.getLong(0)).toSeq
      ks shouldBe ks.sorted
    }
  }
}
