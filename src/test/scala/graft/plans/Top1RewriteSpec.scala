package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Top1RewriteSpec extends SparkSpec {
  import sqlImplicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ Top1WindowToAggregate
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  private val data = Seq(
    (1L, "a", 10.0), (2L, "a", 11.0), (3L, "b", 5.0),
    (4L, "b", 4.0), (5L, "c", 7.0), (6L, "a", 9.0))

  private def top1(df: DataFrame, desc: Boolean = false) = {
    val order = if (desc) col("id").desc else col("id")
    val w = Window.partitionBy(col("grp")).orderBy(order)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  test("row_number-top-1 rewrites to an aggregate with identical results") {
    val df = data.toDF("id", "grp", "v").repartition(4)
    val expected = top1(df).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    withRule {
      val q = top1(df)
      val plan = q.queryExecution.executedPlan.toString
      plan should not include "Window"
      plan should include("Aggregate")
      q.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq shouldBe expected.toSeq
    }
  }

  test("descending order rewrites through max_by") {
    val df = data.toDF("id", "grp", "v")
    val expected = top1(df, desc = true).collect().map(r =>
      (r.getLong(0), r.getString(1))).sortBy(_._1)
    withRule {
      val q = top1(df, desc = true)
      q.queryExecution.executedPlan.toString should not include "Window"
      q.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        .toSeq shouldBe expected.toSeq
    }
  }

  test("keeping the rn column still resolves (literal 1, original exprId)") {
    val df = data.toDF("id", "grp", "v")
    withRule {
      val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      val q = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("grp"), col("rn") + 100)
      q.queryExecution.executedPlan.toString should not include "Window"
      q.collect().map(_.getInt(1)).toSet shouldBe Set(101)
    }
  }

  test("guards: rank>1 filters and nullable order keys keep the window") {
    val df = data.toDF("id", "grp", "v")
    val nullable = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "b"))
      .toDF("id", "grp")
    withRule {
      val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      // rn <= 2 is not top-1
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .queryExecution.executedPlan.toString should include("Window")
      // nullable key: NULLS FIRST under the window, ignored by min_by
      val wn = Window.partitionBy(col("grp")).orderBy(col("id"))
      val q = nullable.withColumn("rn", row_number().over(wn)).filter(col("rn") === 1)
      q.queryExecution.executedPlan.toString should include("Window")
      // and the window semantics (null wins group a) are preserved
      q.drop("rn").collect().map(r =>
        (Option(if (r.isNullAt(0)) null else r.getLong(0)), r.getString(1))).toSet shouldBe
        Set((Some(null), "a"), (Some(3L), "b")).map {
          case (Some(null), g) => (None, g)
          case (Some(v: Long), g) => (Some(v), g)
          case other => other
        }
    }
  }

  test("exactDedupWindowed under the rule matches exactDedup") {
    val df = Seq(
      (1L, "Hello World"), (2L, "hello   world"),
      (3L, "hello world"), (4L, "other text")).toDF("doc_id", "text")
    withRule {
      val windowed = graft.dedup.Dedup.exactDedupWindowed(df, "text", "doc_id")
      windowed.queryExecution.executedPlan.toString should not include "Window"
      windowed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
        Seq(1L, 4L)
    }
  }
}
