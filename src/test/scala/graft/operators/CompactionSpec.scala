package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import sqlImplicits._

  private def manifest = Seq(
    ("day1/f0", 40L), ("day1/f1", 40L), ("day1/f2", 40L),
    ("day2/f0", 90L), ("day2/f1", 10L),
    ("day3/f0", 0L),  // empty file
    ("day3/f1", 250L) // oversized file
  ).toDF("path", "bytes")

  test("ordered cumulative packing: group = floor(prefix / target)") {
    val plan = Compaction.planCompaction(manifest, "path", "bytes", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // prefix:      0       40      80       120      210      220  220
    plan shouldBe Map(
      "day1/f0" -> 0L, "day1/f1" -> 0L, "day1/f2" -> 0L,
      "day2/f0" -> 1L, "day2/f1" -> 2L,
      "day3/f0" -> -1L, // delete-only
      "day3/f1" -> 2L)
  }

  test("group stats roll up files and bytes per rewrite unit") {
    val plan = Compaction.planCompaction(manifest, "path", "bytes", 100L)
    val stats = Compaction.groupStats(plan, "bytes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    stats(0L) shouldBe ((3L, 120L))
    stats(1L) shouldBe ((1L, 90L))
    stats(2L) shouldBe ((2L, 260L))
    stats(-1L) shouldBe ((1L, 0L))
  }

  test("plan is layout-independent and replays as a window cumsum") {
    val big = (0 until 500)
      .map(i => (f"f$i%03d", (i % 7) * 13L)).toDF("path", "bytes")
    val a = Compaction.planCompaction(big, "path", "bytes", 64L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = Compaction.planCompaction(big.repartition(13), "path", "bytes", 64L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    a shouldBe b
    // window-cumsum replay (the oracle form)
    val replay = big.filter(col("bytes") > 0)
      .withColumn("pre",
        coalesce(sum(col("bytes")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("path"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .collect().map(r => r.getString(0) -> r.getLong(2) / 64L).toMap
    big.collect().foreach { r =>
      val (p, n) = (r.getString(0), r.getLong(1))
      if (n == 0L) a(p) shouldBe -1L else a(p) shouldBe replay(p)
    }
  }

  test("compactParquet rewrites groups to one file each, preserving rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val src = s"$base/in"
    // 6 small files: one per block, written individually so file
    // boundaries are exactly the blocks
    val data = (0L until 60L).map(i => (i, s"payload$i")).toDF("id", "payload")
    (0 until 6).foreach { b =>
      data.filter(col("id") >= b * 10 && col("id") < (b + 1) * 10)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/block$b")
    }
    val manifest = Compaction.parquetManifest(spark, src)
    manifest.count() shouldBe 6L
    // replayable synthetic sizes: 100 bytes per block file
    val sized = manifest.withColumn("bytes", lit(100L))
    val plan = Compaction.planCompaction(sized, "path", "bytes", 250L)
    // groups: prefix 0,100,...,500 → 0,0,0,1,1,2
    val out = s"$base/out"
    val receipt = Compaction.compactParquet(plan, "path", out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    receipt shouldBe Map(0L -> ((3L, 30L)), 1L -> ((2L, 20L)), 2L -> ((1L, 10L)))
    // one physical file per group
    val outManifest = Compaction.parquetManifest(spark, out).collect()
      .map(_.getString(0))
    outManifest.length shouldBe 3
    // content preserved exactly
    val back = spark.read.parquet(out)
    back.count() shouldBe 60L
    back.select("id", "payload").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet shouldBe data.collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("delete-only group is never read or rewritten") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact0_").toString
    val src = s"$base/in"
    Seq((1L, "a")).toDF("id", "p").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/f0")
    Seq((2L, "b")).toDF("id", "p").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/f1")
    val manifest = Compaction.parquetManifest(spark, src)
      .withColumn("bytes",
        // match the directory component, not a bare substring — part
        // file names carry random hex UUIDs that can contain "f0"
        when(col("path").contains("/f0/"), 0L).otherwise(10L))
    val plan = Compaction.planCompaction(manifest, "path", "bytes", 100L)
    val receipt = Compaction.compactParquet(plan, "path", s"$base/out")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    receipt shouldBe Map(0L -> 1L) // only f1's row; f0 is the delete list
    spark.read.parquet(s"$base/out").count() shouldBe 1L
  }

  test("null or negative bytes raise") {
    val bad = Seq(("f0", Some(10L)), ("f1", None)).toDF("path", "bytes")
    val ex = intercept[Exception] {
      Compaction.planCompaction(bad, "path", "bytes", 100L).collect()
    }
    ex.getMessage should include("planCompaction")
  }
}
