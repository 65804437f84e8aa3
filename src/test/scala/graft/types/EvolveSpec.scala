package graft.types

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class EvolveSpec extends SparkSpec {
  import sqlImplicits._

  test("integer family widens, float widens to double") {
    Evolve.widen(IntegerType, LongType) shouldBe Some(LongType)
    Evolve.widen(ByteType, ShortType) shouldBe Some(ShortType)
    Evolve.widen(FloatType, DoubleType) shouldBe Some(DoubleType)
    Evolve.widen(LongType, LongType) shouldBe Some(LongType)
  }

  test("lossy promotions are refused") {
    Evolve.widen(LongType, DoubleType) shouldBe None
    Evolve.widen(StringType, IntegerType) shouldBe None
    Evolve.widen(DecimalType(10, 2), DecimalType(10, 3)) shouldBe None
  }

  test("decimal widens precision at fixed scale") {
    Evolve.widen(DecimalType(10, 2), DecimalType(20, 2)) shouldBe
      Some(DecimalType(20, 2))
  }

  test("arrays and structs reconcile element-wise") {
    Evolve.widen(ArrayType(IntegerType), ArrayType(LongType)) shouldBe
      Some(ArrayType(LongType))
    val a = StructType(Seq(StructField("x", IntegerType, nullable = false)))
    val b = StructType(Seq(StructField("x", LongType, nullable = false),
      StructField("y", StringType)))
    val w = Evolve.widenStruct(a, b)
    w("x").dataType shouldBe LongType
    w("x").nullable shouldBe false
    w("y").nullable shouldBe true // missing in generation a
  }

  test("union reads three generations under the reconciled schema") {
    val gen1 = Seq((1, 10.0f)).toDF("id", "score") // int id, float score
    val gen2 = Seq((2L, 20.0, "b")).toDF("id", "score", "tag")
    val gen3 = Seq((3L, "c")).toDF("id", "tag") // score column dropped
    val out = Evolve.unionByNameWidened(Seq(gen1, gen2, gen3))
    out.schema.map(f => (f.name, f.dataType)) shouldBe Seq(
      ("id", LongType), ("score", DoubleType), ("tag", StringType))
    out.orderBy($"id").as[(Long, Option[Double], Option[String])]
      .collect().toSeq shouldBe Seq(
      (1L, Some(10.0), None), (2L, Some(20.0), Some("b")),
      (3L, None, Some("c")))
  }

  test("an unpromotable column names its path in the error") {
    val a = Seq((1L, 1.5)).toDF("id", "v")
    val b = Seq((2L, "x")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Evolve.unionByNameWidened(Seq(a, b))
    }
    e.getMessage should include("column v")
    e.getMessage should (include("double") and include("string"))
  }

  test("the union plans no shuffle and keeps scans prunable") {
    val gen1 = Seq((1, 10.0f)).toDF("id", "score")
    val gen2 = Seq((2L, 20.0, "b")).toDF("id", "score", "tag")
    val plan = Evolve.unionByNameWidened(Seq(gen1, gen2))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("column order is first appearance across generations") {
    val a = Seq((1, "x")).toDF("one", "two")
    val b = Seq(("y", 2L, 3.0)).toDF("two", "one", "three")
    Evolve.unionByNameWidened(Seq(a, b)).columns.toSeq shouldBe
      Seq("one", "two", "three")
  }
}
