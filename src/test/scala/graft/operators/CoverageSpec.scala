package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CoverageSpec extends SparkSpec {
  import sqlImplicits._

  // masses: a=50, b=30, c=15, d=5 (total 100)
  private def rows = Seq(
    ("a", 20L), ("a", 30L), ("b", 30L), ("c", 15L), ("d", 5L))
    .toDF("g", "m")

  test("the head is the minimal prefix reaching the target") {
    val out = Coverage.headCoverage(rows, Seq("g"), "m", 80L, 100L)
      .orderBy($"rank").as[(String, Long, Long, Long, Boolean)].collect()
    out.toSeq shouldBe Seq(
      ("a", 50L, 0L, 50L, true),
      ("b", 30L, 1L, 80L, true), // crosses the 80 target
      ("c", 15L, 2L, 95L, false),
      ("d", 5L, 3L, 100L, false))
  }

  test("the crossing group itself is included (ceil semantics)") {
    // target = ceil(0.51 * 100) = 51 > 50, so b is still needed
    val out = Coverage.headCoverage(rows, Seq("g"), "m", 51L, 100L)
      .filter($"in_head").select($"g").as[String].collect().sorted
    out.toSeq shouldBe Seq("a", "b")
  }

  test("p=1 keeps every group with mass; p=0 keeps none") {
    Coverage.headCoverage(rows, Seq("g"), "m", 1L, 1L)
      .filter($"in_head").count() shouldBe 4L
    Coverage.headCoverage(rows, Seq("g"), "m", 0L, 1L)
      .filter($"in_head").count() shouldBe 0L
  }

  test("equal-mass groups cut deterministically by group order") {
    val tied = Seq(("x", 10L), ("y", 10L), ("z", 10L)).toDF("g", "m")
    val out = Coverage.headCoverage(tied, Seq("g"), "m", 40L, 100L)
      .orderBy($"rank").select($"g", $"in_head")
      .as[(String, Boolean)].collect()
    out.toSeq shouldBe Seq(("x", true), ("y", true), ("z", false))
  }

  test("a NULL mass raises") {
    val bad = Seq(("a", Some(1L)), ("b", None: Option[Long])).toDF("g", "m")
    intercept[Exception] {
      Coverage.headCoverage(bad, Seq("g"), "m", 1L, 2L).collect()
    }.getMessage should include("NULL or negative")
  }

  test("small bucketWidth crosses bucket boundaries correctly") {
    val out = Coverage.headCoverage(
      rows, Seq("g"), "m", 95L, 100L, bucketWidth = 2L)
      .orderBy($"rank").as[(String, Long, Long, Long, Boolean)].collect()
    out.map(_._4).toSeq shouldBe Seq(50L, 80L, 95L, 100L) // cum across buckets
    out.map(_._5).toSeq shouldBe Seq(true, true, true, false)
  }

  test("result is partitioning-independent") {
    val a = Coverage.headCoverage(
      rows.repartition(5), Seq("g"), "m", 80L, 100L)
      .orderBy($"rank").collect().toSeq
    val b = Coverage.headCoverage(
      rows.repartition(1), Seq("g"), "m", 80L, 100L)
      .orderBy($"rank").collect().toSeq
    a shouldBe b
  }

  test("no global single-partition window in the plan") {
    val plan = Coverage.headCoverage(rows, Seq("g"), "m", 80L, 100L)
      .queryExecution.executedPlan.toString
    // the only window is PARTITIONED by the scan bucket — a global
    // cumsum would show windowspecdefinition(rank ...) with no
    // partition column and a single-partition exchange
    "windowspecdefinition\\(__b".r.findAllIn(plan).nonEmpty shouldBe true
    plan should not include "SinglePartition"
  }

  private def gini(ms: Seq[(String, Long)]) =
    Coverage.giniConcentration(ms.toDF("g", "m"), Seq("g"), "m")
      .collect().head match {
        case r => (r.getAs[Long]("n_groups"), r.getAs[Long]("total_mass"),
          Option(r.get(2)).map(_.asInstanceOf[Double]))
      }

  test("gini: hand values — skewed, even, and one-group-takes-all") {
    gini(Seq("a" -> 50L, "b" -> 30L, "c" -> 15L, "d" -> 5L)) shouldBe
      ((4L, 100L, Some(0.375)))
    gini(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 10L)) shouldBe
      ((4L, 40L, Some(0.0)))
    // maximum for n groups is (n-1)/n
    gini(Seq("a" -> 100L, "b" -> 0L, "c" -> 0L, "d" -> 0L)) shouldBe
      ((4L, 100L, Some(0.75)))
  }

  test("gini: zero total mass yields NULL; rows pre-aggregate by group") {
    gini(Seq("a" -> 0L, "b" -> 0L))._3 shouldBe None
    // two rows of one group merge before ranking
    gini(Seq("a" -> 30L, "a" -> 20L, "b" -> 50L)) shouldBe
      ((2L, 100L, Some(0.0)))
  }

  test("gini: tie-order-free and layout-independent") {
    val ms = (0 until 40).map(i => (s"g$i", ((i % 5) * 10 + 1).toLong))
    val a = gini(ms)
    Coverage.giniConcentration(
      ms.toDF("g", "m").repartition(7), Seq("g"), "m")
      .collect().head.getAs[Double]("gini") shouldBe a._3.get
  }

  test("gini: negative mass raises") {
    intercept[Exception] {
      Coverage.giniConcentration(
        Seq(("a", -1L)).toDF("g", "m"), Seq("g"), "m").collect()
    }
  }
}
