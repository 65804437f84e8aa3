package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnumerateSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((1 to n).toList).map(i => (i.toLong, s"g${i % 7}"))
      .toDF("id", "g")
  }

  test("ids are dense 0..n-1 and follow the declared total order") {
    val df = corpus(500, 1)
    val out = Enumerate.denseIds(df, Seq("g", "id")).collect()
    out.map(_.getAs[Long]("dense_id")).sorted shouldBe (0L until 500L).toArray
    val inOrder = out.sortBy(_.getAs[Long]("dense_id"))
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id")))
    inOrder shouldBe inOrder.sorted
  }

  test("assignment is a pure function of the data, not the layout") {
    val df = corpus(400, 2)
    val a = Enumerate.denseIds(df, Seq("id")).orderBy($"id").collect()
    val b = Enumerate.denseIds(df.repartition(17), Seq("id"))
      .orderBy($"id").collect()
    val c = Enumerate.denseIds(df.coalesce(1), Seq("id"))
      .orderBy($"id").collect()
    a shouldBe b
    a shouldBe c
  }

  test("no single-partition window: the plan contains no Window at all") {
    val plan = Enumerate.denseIds(corpus(100, 3), Seq("id"))
      .queryExecution.optimizedPlan.toString
    plan should not include "Window"
  }

  test("existing column name and empty order fail loudly") {
    val df = corpus(10, 4)
    an[IllegalArgumentException] should be thrownBy
      Enumerate.denseIds(df, Seq("id"), idCol = "g")
    an[IllegalArgumentException] should be thrownBy
      Enumerate.denseIds(df, Seq.empty)
  }

  test("empty input enumerates to nothing") {
    Enumerate.denseIds(corpus(10, 5).filter($"id" < 0), Seq("id"))
      .count() shouldBe 0
  }
}
