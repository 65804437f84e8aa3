package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CappedCollectList.cappedCollectList

class CappedCollectListSpec extends SparkSpec {
  import sqlImplicits._

  test("under-cap groups collect every value (collect_list semantics)") {
    val df = Seq((1, 10L), (1, 11L), (2, 20L)).toDF("g", "v")
    val got = df.groupBy("g").agg(cappedCollectList(col("v"), 5).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).sorted).toMap
    got(1) shouldBe Seq(10L, 11L)
    got(2) shouldBe Seq(20L)
  }

  test("groups exceeding the cap evaluate to null; exactly-cap groups are kept") {
    val rows = (1 to 7).map(i => (1, i.toLong)) ++ (1 to 5).map(i => (2, i.toLong))
    val df = rows.toDF("g", "v")
    val got = df.groupBy("g").agg(cappedCollectList(col("v"), 5).as("vs"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    got(1) shouldBe None // 7 > cap: dropped
    got(2).get.asInstanceOf[collection.Seq[Long]].sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  test("null inputs are skipped, like collect_list") {
    val df = Seq((1, Some(10L)), (1, None), (1, Some(11L))).toDF("g", "v")
    val got = df.groupBy("g").agg(cappedCollectList(col("v"), 5).as("vs"))
      .collect().head.getSeq[Long](1).sorted
    got shouldBe Seq(10L, 11L)
  }

  test("the cap holds across partial/merge paths (many input partitions)") {
    // 30 values in one group spread over 8 partitions: each partial buffer
    // is small, the merged buffer must still stop at cap+1 and evaluate
    // to null. A second group of 6 values must survive intact.
    val rows = (1 to 30).map(i => (1, i.toLong)) ++ (101 to 106).map(i => (2, i.toLong))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g").agg(cappedCollectList(col("v"), 10).as("vs"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    got(1) shouldBe None
    got(2).get.asInstanceOf[collection.Seq[Long]].sorted shouldBe (101L to 106L)
  }

  test("string elements round-trip through buffer serialization") {
    val rows = (1 to 20).map(i => (i % 4, s"value_$i"))
    val df = rows.toDF("g", "v").repartition(6)
    val got = df.groupBy("g").agg(cappedCollectList(col("v"), 100).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).sorted).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got shouldBe want
  }

  test("struct elements are collected and their fields preserved") {
    val rows = Seq((1, 10L, 0xAAL), (1, 11L, 0xBBL), (2, 20L, 0xCCL))
    val df = rows.toDF("g", "id", "fp")
      .select(col("g"), struct(col("id"), col("fp")).as("m"))
      .repartition(3)
    val got = df.groupBy("g").agg(cappedCollectList(col("m"), 5).as("ms"))
      .select(col("g"), explode(col("ms")).as("m"))
      .select(col("g"), col("m.id"), col("m.fp"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    got.toSeq shouldBe Seq((1, 10L, 0xAAL), (1, 11L, 0xBBL), (2, 20L, 0xCCL))
  }

  test("aggregation plan is a partial+final aggregate") {
    val df = Seq((1, 1L)).toDF("g", "v")
    val plan = df.groupBy("g").agg(cappedCollectList(col("v"), 5))
      .queryExecution.executedPlan.toString
    plan should include("Aggregate")
  }
}
