package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import sqlImplicits._

  test("zValue2 interleaves bits: a at even positions, b at odd") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.zValue2(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // 3 = 0b011, 5 = 0b101 → interleave(a=011, b=101):
    // bit0: a0=1→pos0, b0=1→pos1; bit1: a1=1→pos2, b1=0; bit2: a2=0,
    // b2=1→pos5 → 0b100111 = 39
    got shouldBe Seq(0L, 1L, 2L, 3L, 39L)
  }

  test("z-order is monotone on the diagonal and masks high bits") {
    val z = (i: Long, j: Long) =>
      Seq((i, j)).toDF("a", "b")
        .select(ZOrder.zValue2(col("a"), col("b"), 4)).head.getLong(0)
    z(2, 2) should be < z(3, 3)
    // bit 4 is masked at bits=4: 16+x maps where x maps
    z(16L + 2L, 2L) shouldBe z(2L, 2L)
  }

  test("z-ordered layout keeps BOTH dimensions' file stats tight") {
    // a 32×32 grid; z-order into 16 files and compare total per-file
    // bounding-box area against the linear (a, b) sort layout —
    // z-order must be dramatically tighter on b
    val grid = for { a <- 0 until 32; b <- 0 until 32 }
      yield (a.toLong, b.toLong)
    val df = grid.toDF("a", "b")
    def areas(dir: String): Long =
      spark.read.parquet(dir)
        .select(col("a"), col("b"), input_file_name().as("f"))
        .groupBy("f")
        .agg(((max("a") - min("a") + 1) *
          (max("b") - min("b") + 1)).as("area"))
        .agg(sum("area")).head.getLong(0)
    val zDir = Files.createTempDirectory("zord").toString
    ZOrder.writeZOrdered(df, "a", "b", zDir, nFiles = 16, bits = 5)
    val linDir = Files.createTempDirectory("lin").toString
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.mode("overwrite").parquet(linDir)
    val (zArea, linArea) = (areas(zDir), areas(linDir))
    // 16 z-files of a 32×32 grid are 16 8×8 tiles (area 64 each) in
    // the ideal split; the linear sort gives 2×32 stripes (area 64
    // too) for a — but b spans the full 32 in every file when
    // filtering... compare PER-DIMENSION spans instead of area:
    val zbSpan = spark.read.parquet(zDir)
      .select(col("b"), input_file_name().as("f"))
      .groupBy("f").agg((max("b") - min("b") + 1).as("s"))
      .agg(sum("s")).head.getLong(0)
    val linbSpan = spark.read.parquet(linDir)
      .select(col("b"), input_file_name().as("f"))
      .groupBy("f").agg((max("b") - min("b") + 1).as("s"))
      .agg(sum("s")).head.getLong(0)
    // every linear file spans all of b (32 each); z files span ~8
    zbSpan.toDouble should be < linbSpan.toDouble * 0.5
    (zArea + linArea) should be > 0L // both layouts materialized
  }

  test("the z-value projection is map-only") {
    val df = ZOrder.withZValue(
      (0L until 50L).map(i => (i, i * 3 % 17)).toDF("a", "b"), "a", "b")
    df.queryExecution.executedPlan.toString should not include "Exchange"
  }
}
