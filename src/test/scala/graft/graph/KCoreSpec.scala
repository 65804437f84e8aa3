package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import sqlImplicits._

  /** Local replay of the fixed-round peel. */
  private def local(
      es: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var e = (es ++ es.map(_.swap)).distinct.filter(p => p._1 != p._2)
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).map { case (v, xs) => v -> xs.size }
      val s = deg.filter(_._2 >= k).keySet
      e = e.filter(p => s(p._1) && s(p._2))
    }
    e.groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
  }

  private def run(es: Seq[(Long, Long)], k: Int, rounds: Int = 10) =
    KCore.kCore(es.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a triangle with pendant tails peels to the triangle at k=2") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), // triangle
      (3L, 4L), (4L, 5L)) // tail needing two peel layers
    run(es, 2) shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    run(es, 2) shouldBe local(es, 2, 10)
    // k=3: the triangle itself dies (degree 2 everywhere)
    run(es, 3) shouldBe Map.empty
  }

  test("the peel is layer-by-layer: one round only removes one layer") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    // after ONE round only vertex 5's edge is gone; 4 still hangs on
    run(es, 2, rounds = 1) shouldBe local(es, 2, 1)
    run(es, 2, rounds = 1).keySet should contain(4L)
    run(es, 2, rounds = 2) shouldBe local(es, 2, 2)
  }

  test("self-loops are not support; duplicates count once") {
    val es = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L))
    run(es, 2) shouldBe Map.empty // deg(1)=deg(2)=1 without loops/dups
  }

  test("matches the local replay on a clique-plus-fringe graph") {
    val clique = for (a <- 0L until 6L; b <- 0L until 6L if a < b)
      yield (a, b)
    val fringe = (0L until 30L).map(i => (i % 6, 100L + i))
    val es = clique ++ fringe
    val got = run(es, 5)
    got shouldBe local(es, 5, 10)
    got.keySet shouldBe (0L until 6L).toSet // the 6-clique is the 5-core
  }

  test("layout-independent") {
    val es = (0L until 120L).map(i => (i, (i * 7 + 1) % 120)) ++
      (0L until 120L).map(i => (i, (i * 13 + 5) % 120))
    run(es, 3) shouldBe
      KCore.kCore(es.toDF("src", "dst").repartition(11),
        "src", "dst", 3, 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("convergence: a deep path graph peels fully once rounds allow") {
    // a 30-node path at k=2 loses its two endpoints per round — 15
    // layers, past the default 10: the convergence-aware peel with
    // enough rounds reaches the (empty) core and STOPS, instead of
    // returning a partially-peeled superset forever
    val path = (0L until 29L).map(i => (i, i + 1))
    KCore.kCore(path.toDF("src", "dst"), "src", "dst", k = 2,
      rounds = 20).count() shouldBe 0L
    // and matches the local fixed-round replay when rounds bind
    run(path, 2, rounds = 10) shouldBe local(path, 2, 10)
  }

  test("failOnNonConverged raises on a partial peel, passes converged") {
    val path = (0L until 29L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      KCore.kCore(path.toDF("src", "dst"), "src", "dst", k = 2,
        rounds = 5, failOnNonConverged = true)
    }
    // a converged peel under the same flag returns normally (triangle
    // plus tail converges in 2 rounds)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    KCore.kCore(es.toDF("src", "dst"), "src", "dst", k = 2,
      rounds = 10, failOnNonConverged = true)
      .collect().map(r => r.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)
  }

  test("non-integer node ids raise (no silent cast to NULL)") {
    val df = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    intercept[Exception] {
      KCore.kCore(df, "src", "dst", k = 1, rounds = 1).collect()
    }
  }
}
