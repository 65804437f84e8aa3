package graft.graph

import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import sqlImplicits._

  /** Local replay of the pinned synchronous rule. */
  private def local(
      es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val undirected = (es ++ es.map(_.swap)).distinct
    val adj = undirected.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    val vs = undirected.map(_._1).distinct
    var labels = vs.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = vs.map { v =>
        val votes = (adj(v).map(labels) :+ labels(v))
          .groupBy(identity).map { case (l, xs) => l -> xs.size }
        val mx = votes.values.max
        v -> votes.filter(_._2 == mx).keys.min
      }.toMap
    }
    labels
  }

  private def run(es: Seq[(Long, Long)], rounds: Int) =
    Communities.labelPropagation(es.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge edge stay two communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val es = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L))
    val got = run(es, 4)
    got shouldBe local(es, 4)
    // each clique collapses to its smallest member's label
    Seq(1L, 2L, 3L, 4L).map(got).toSet shouldBe Set(1L)
    Seq(10L, 11L, 12L, 13L).map(got).toSet shouldBe Set(10L)
  }

  test("matches the local replay on a mixed graph, layout-independent") {
    val es = (0L until 200L).flatMap { i =>
      Seq((i, (i * 3 + 1) % 200), (i, (i + 40) % 200))
    }
    val a = run(es, 3)
    a shouldBe local(es, 3)
    a shouldBe Communities.labelPropagation(
      es.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("self-vote damps the two-vertex oscillation") {
    // plain synchronous LPA swaps labels on a single edge forever;
    // the self-vote makes both adopt the smaller id and stay there
    run(Seq((1L, 2L)), 1) shouldBe Map(1L -> 1L, 2L -> 1L)
    run(Seq((1L, 2L)), 2) shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  test("NULL endpoints raise") {
    intercept[Exception] {
      Communities.labelPropagation(
        Seq((Some(1L), Option.empty[Long])).toDF("src", "dst"),
        "src", "dst", 1).collect()
    }
  }

  test("maxChanged converged-or-raise: long path raises early, " +
    "settles with enough rounds") {
    // labels on a path drain toward the min id one hop per round:
    // after 2 rounds a 12-vertex path is still moving
    val es = (1L to 11L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Communities.labelPropagation(es.toDF("src", "dst"),
        "src", "dst", rounds = 2, maxChanged = Some(0L)).collect()
    }
    ex.getMessage should include("have not settled")
    // enough rounds reach the synchronous fixed point; gated ≡ ungated
    val gated = Communities.labelPropagation(es.toDF("src", "dst"),
        "src", "dst", rounds = 30, maxChanged = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gated shouldBe Communities.labelPropagation(es.toDF("src", "dst"),
        "src", "dst", rounds = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
}
