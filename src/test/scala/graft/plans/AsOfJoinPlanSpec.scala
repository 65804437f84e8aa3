package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOf

/** The custom as-of operator must (a) appear in the physical plan, (b)
  * agree with the composed built-ins form on randomized data, and (c)
  * handle the edge shapes: no-match keys, ts-equal matches, empty sides.
  */
class AsOfJoinPlanSpec extends SparkSpec {
  import sqlImplicits._

  private val left = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 3L, "l-c"),
    (2L, 50L, "l-d"), (3L, 7L, "l-e")).toDF("k", "ts", "lv")
  private val right = Seq(
    (1L, 5L, 0.5), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 40L, 4.0))
    .toDF("k", "ts", "rv")

  test("custom as-of join matches the golden expectations") {
    val got = AsOfJoinPlan.joinAsOfExec(left, right, Seq("k"), "ts")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(r.fieldIndex("rv"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("ts_right"))).map(_.asInstanceOf[Long])))
    got.toSeq shouldBe Seq(
      (1L, 3L, "l-c", None, None),
      (1L, 10L, "l-a", Some(0.5), Some(5L)),
      (1L, 20L, "l-b", Some(2.0), Some(20L)),
      (2L, 50L, "l-d", Some(4.0), Some(40L)),
      (3L, 7L, "l-e", None, None))
  }

  test("the physical plan contains AsOfJoinExec with exchanges inserted") {
    val df = AsOfJoinPlan.joinAsOfExec(
      left.repartition(5), right.repartition(3), Seq("k"), "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("AsOfJoin") // nodeName strips the Exec suffix
    plan should include("Sort")
    plan should include("Exchange hashpartitioning(k")
  }

  test("custom operator agrees with the composed form on randomized data") {
    val rng = new scala.util.Random(17)
    val l = (1 to 2000).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, rng.nextInt(100)))
      .toDF("k", "ts", "lv").repartition(7)
    // unique (k, ts) on the right so tie behavior can't differ
    val r = (1 to 1500).map(i =>
      (rng.nextInt(25).toLong, i.toLong * 2, rng.nextDouble()))
      .distinct.toDF("k", "ts", "rv").repartition(4)

    def normalize(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "ts", "lv", "rv", "ts_right")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getInt(2),
        Option(row.get(3)).map(_.asInstanceOf[Double]),
        Option(row.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2, t._3))

    val viaExec = normalize(AsOfJoinPlan.joinAsOfExec(l, r, Seq("k"), "ts"))
    val viaComposed = normalize(AsOf.joinAsOf(l, r, Seq("k"), "ts"))
    viaExec.length shouldBe 2000
    viaExec.toSeq shouldBe viaComposed.toSeq
  }

  test("empty right side yields all-null right columns") {
    val emptyRight = Seq.empty[(Long, Long, Double)].toDF("k", "ts", "rv")
    val got = AsOfJoinPlan.joinAsOfExec(left, emptyRight, Seq("k"), "ts")
    got.count() shouldBe 5L
    got.filter(col("rv").isNotNull).count() shouldBe 0L
  }

  test("self-join lineage: both sides from the same base DataFrame") {
    // regression: shared exprIds between the sides made DeduplicateRelations
    // re-alias the right child while the custom node's right keys kept the
    // old ids, resolving against the left side and breaking pruning
    val base = Seq(
      (1L, 10L, "click", 0.0), (1L, 5L, "purchase", 9.5),
      (1L, 20L, "purchase", 1.5), (2L, 30L, "click", 0.0))
      .toDF("k", "ts", "kind", "v")
    val clicks = base.filter(col("kind") === "click").select("k", "ts")
    val purchases = base.filter(col("kind") === "purchase")
      .select(col("k"), col("ts"), col("v"))
    val got = AsOfJoinPlan.joinAsOfExec(clicks, purchases, Seq("k"), "ts")
      .select(col("k"), col("ts"), col("v"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    got.toSeq shouldBe Seq(
      (1L, 10L, Some(9.5)),
      (2L, 30L, None))
  }

  test("GraftExtensions injects the as-of planner strategy and SQL functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ExpressionBridge
      .plannerStrategies(ext, spark) should contain(AsOfJoinStrategy)
  }

  test("missing key column is rejected") {
    an[IllegalArgumentException] should be thrownBy {
      AsOfJoinPlan.joinAsOfExec(left, right, Seq("nope"), "ts")
    }
  }
}
