package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KrHash

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def kr(s: String): Long = {
    val h = KrHash.hash(s.getBytes("UTF-8"))
    val m = Kmv.Modulus
    val x2 = (h * h) % m
    val x4 = (x2 * x2) % m
    (x4 * h) % m
  }

  test("sketch keeps the k smallest distinct hashes per group") {
    val df = Seq(
      ("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t2"), // dup collapses
      ("b", "t1"))
      .toDF("g", "tok")
    val got = Kmv.sketch(df, Seq("g"), col("tok"), k = 2)
      .orderBy("g", "h").collect().map(r => (r.getString(0), r.getLong(1)))
    val aAll = Seq("t1", "t2", "t3").map(kr).sorted.take(2)
    got shouldBe Array(("a", aAll(0)), ("a", aAll(1)), ("b", kr("t1")))
  }

  test("distinctEstimate is exact below k and sane when full") {
    val toks = (0 until 2000).map(i => ("big", s"tok$i")) ++
      (0 until 5).map(i => ("small", s"s$i"))
    val sk = Kmv.sketch(toks.toDF("g", "tok"), Seq("g"), col("tok"), k = 128)
    val est = Kmv.distinctEstimate(sk, Seq("g"), k = 128)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    est("small") shouldBe 5L // not full -> exact
    est("big").toDouble shouldBe 2000.0 +- 600.0 // KMV error ~1/sqrt(k)
  }

  test("pairwiseJaccard is exact when the union sketch is not full") {
    // a = {x,y,z}, b = {y,z,w}: J = 2/4
    val df = Seq(("a", "x"), ("a", "y"), ("a", "z"),
      ("b", "y"), ("b", "z"), ("b", "w")).toDF("g", "tok")
    val sk = Kmv.sketch(df, Seq("g"), col("tok"), k = 16)
    val row = Kmv.pairwiseJaccard(sk, "g", k = 16).head()
    (row.getString(0), row.getString(1)) shouldBe ("a", "b")
    row.getLong(2) shouldBe 4L // k_used = |union|
    row.getLong(3) shouldBe 2L // n_common
    row.getDouble(6) shouldBe 0.5
  }

  test("pairwiseJaccard: disjoint -> 0, identical -> 1, all pairs present") {
    val df = (Seq("p", "q", "r").flatMap(g => Seq((g, "c1"), (g, "c2"))) ++
      Seq(("s", "only1"), ("s", "only2"))).toDF("g", "tok")
    val sk = Kmv.sketch(df, Seq("g"), col("tok"), k = 8)
    val got = Kmv.pairwiseJaccard(sk, "g", k = 8)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(6)))
      .toMap
    got.size shouldBe 6 // C(4,2), zero-overlap pairs included
    got(("p", "q")) shouldBe 1.0
    got(("p", "s")) shouldBe 0.0
  }

  test("pair construction plans a broadcast hash join, never a nested loop") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("g", "tok")
    val sk = Kmv.sketch(df, Seq("g"), col("tok"), k = 4)
    val plan = Kmv.pairwiseJaccard(sk, "g", k = 4)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("pairwiseSetAlgebra is EXACT when no sketch is full") {
    // A = {x, y, z, w}, B = {y, z, q} → |A∪B| = 5, |A∩B| = 2,
    // |A\B| = 2, |B\A| = 1; sketches of k = 8 hold everything
    val df = (Seq("x", "y", "z", "w").map(("a", _)) ++
      Seq("y", "z", "q").map(("b", _))).toDF("g", "tok")
    val sk = Kmv.sketch(df, Seq("g"), col("tok"), k = 8)
    val r = Kmv.pairwiseSetAlgebra(sk, "g", k = 8).head()
    r.getAs[Long]("union_est") shouldBe 5L
    r.getAs[Double]("inter_est") shouldBe 2.0
    r.getAs[Double]("diff_a_est") shouldBe 2.0
    r.getAs[Double]("diff_b_est") shouldBe 1.0
  }

  test("pairwiseSetAlgebra estimates land near truth on full sketches") {
    // two overlapping 600-element sets, k = 64: estimates within ~35%
    val a = (0 until 600).map(i => ("a", s"tok$i"))
    val b = (300 until 900).map(i => ("b", s"tok$i"))
    val sk = Kmv.sketch((a ++ b).toDF("g", "tok"), Seq("g"), col("tok"), k = 64)
    val r = Kmv.pairwiseSetAlgebra(sk, "g", k = 64).head()
    r.getAs[Long]("union_est").toDouble shouldBe 900.0 +- 320.0
    r.getAs[Double]("inter_est") shouldBe 300.0 +- 160.0
  }

  test("estimator arithmetic is pure integer division") {
    // force a full sketch with known h_(k): hashes of 3 tokens, k=2
    val df = Seq(("g", "t1"), ("g", "t2"), ("g", "t3")).toDF("g", "tok")
    val sk = Kmv.sketch(df, Seq("g"), col("tok"), k = 2)
    val hk = Seq("t1", "t2", "t3").map(kr).sorted.apply(1)
    val est = Kmv.distinctEstimate(sk, Seq("g"), k = 2).head().getLong(2)
    est shouldBe (1L * Kmv.Modulus) / hk
  }
}
