package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import sqlImplicits._

  // K4 on {1,2,3,4}: 4 triangles, each vertex in 3
  private def k4 = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    .toDF("s", "d")

  test("K4 has four triangles, three per vertex") {
    val pv = Triangles.perVertex(k4, "s", "d")
      .orderBy($"vertex").as[(Long, Long)].collect()
    pv.toSeq shouldBe Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
    Triangles.total(k4, "s", "d").as[Long].head() shouldBe 4L
  }

  test("a triangle with a pendant: pendant counts zero") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val pv = Triangles.perVertex(g, "s", "d")
      .orderBy($"vertex").as[(Long, Long)].collect()
    pv.toSeq shouldBe Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L))
  }

  test("a path and a star have no triangles") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    Triangles.total(path, "s", "d").as[Long].head() shouldBe 0L
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "d")
    Triangles.total(star, "s", "d").as[Long].head() shouldBe 0L
  }

  test("duplicate edges, reversed edges and self-loops do not multiply") {
    val noisy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // dup + reverse
      (2L, 3L), (3L, 1L),
      (1L, 1L)) // self-loop
      .toDF("s", "d")
    Triangles.total(noisy, "s", "d").as[Long].head() shouldBe 1L
  }

  test("the hub of a wheel emits bounded wedges (orientation works)") {
    // wheel: hub 0 connected to a 10-cycle -> 10 triangles, hub in all
    val rim = (0 until 10).map(i => (i + 1L, (i + 1) % 10 + 1L))
    val spokes = (1 to 10).map(i => (0L, i.toLong))
    val g = (rim ++ spokes).toDF("s", "d")
    val hub = Triangles.perVertex(g, "s", "d")
      .filter($"vertex" === 0L).select($"triangles").as[Long].head()
    hub shouldBe 10L
    Triangles.total(g, "s", "d").as[Long].head() shouldBe 10L
  }

  test("counts are partitioning-independent") {
    val a = Triangles.perVertex(k4.repartition(5), "s", "d")
      .orderBy($"vertex").collect().toSeq
    val b = Triangles.perVertex(k4.repartition(1), "s", "d")
      .orderBy($"vertex").collect().toSeq
    a shouldBe b
  }

  test("no cartesian or nested-loop join in the plan") {
    val plan = Triangles.perVertex(k4, "s", "d")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
