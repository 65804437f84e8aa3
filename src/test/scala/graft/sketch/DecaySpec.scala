package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecaySpec extends SparkSpec {
  import sqlImplicits._

  private def rows(gs: (String, Long)*) = gs.toDF("g", "age")

  test("contributions are exact powers of two; zero past the shift") {
    val sk = Decay.halfLifeCounts(
      rows("a" -> 0L, "a" -> 1L, "a" -> 3L, "a" -> 25L), "g", "age",
      shift = 20)
    sk.head().getLong(1) shouldBe
      ((1L << 20) + (1L << 19) + (1L << 17) + 0L)
  }

  test("age 63+ clamps to zero instead of wrapping the long shift") {
    val sk = Decay.halfLifeCounts(
      rows("a" -> 64L, "a" -> 100L, "a" -> 0L), "g", "age", shift = 20)
    sk.head().getLong(1) shouldBe (1L << 20)
  }

  test("merge equals the sketch of the concatenation") {
    val a = rows("x" -> 0L, "y" -> 2L)
    val b = rows("x" -> 5L, "z" -> 1L)
    val merged = Decay.mergeCounts(
      Decay.halfLifeCounts(a, "g", "age"),
      Decay.halfLifeCounts(b, "g", "age"))
    val whole = Decay.halfLifeCounts(a.unionAll(b), "g", "age")
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("advance equals re-aged rows while everything stays young") {
    val data = rows((1 to 40).map(i => s"g${i % 3}" -> (i % 10).toLong): _*)
    val advanced = Decay.advance(
      Decay.halfLifeCounts(data, "g", "age", shift = 20), 4)
    val reaged = Decay.halfLifeCounts(
      data.withColumn("age", col("age") + 4L), "g", "age", shift = 20)
    advanced.collect().toSet shouldBe reaged.collect().toSet
  }

  test("advance keeps aggregate dust that per-row re-aging floors away") {
    // 8 rows at the very edge: age = shift → contribution 1 each.
    // advance(…, 3) keeps floor(8/8) = 1; re-aged rows floor to 0 each.
    val data = rows((1 to 8).map(_ => "g" -> 20L): _*)
    val advanced = Decay.advance(
      Decay.halfLifeCounts(data, "g", "age", shift = 20), 3)
      .head().getLong(1)
    val reaged = Decay.halfLifeCounts(
      data.withColumn("age", col("age") + 3L), "g", "age", shift = 20)
      .head().getLong(1)
    advanced shouldBe 1L
    reaged shouldBe 0L
  }

  test("NULL and negative ages raise") {
    val df = Seq(("g", Some(1L)), ("g", None)).toDF("g", "age")
    val ex = intercept[Exception] {
      Decay.halfLifeCounts(df, "g", "age").collect()
    }
    ex.getMessage should include("NULL or negative age")
    val ex2 = intercept[Exception] {
      Decay.halfLifeCounts(rows("g" -> -1L), "g", "age").collect()
    }
    ex2.getMessage should include("NULL or negative age")
  }
}
