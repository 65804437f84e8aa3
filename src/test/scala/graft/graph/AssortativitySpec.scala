package graft.graph

import graft.SparkSpec

class AssortativitySpec extends SparkSpec {
  import sqlImplicits._

  private def run(es: Seq[(Long, Long)]) = {
    val r = Assortativity.degreeAssortativity(
      es.toDF("src", "dst"), "src", "dst").collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("sum_x"),
      Option(r.get(r.fieldIndex("r"))).map(_.asInstanceOf[Double]))
  }

  /** Local replay over the undirected closure. */
  private def local(es: Seq[(Long, Long)]): Option[Double] = {
    val e = (es ++ es.map(_.swap)).distinct
    val deg = e.groupBy(_._1).map { case (v, xs) => v -> xs.size.toLong }
    val xs = e.map { case (a, b) => (deg(a), deg(b)) }
    val n = xs.size.toLong
    val sx = xs.map(_._1).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val den = n * sxx - sx * sx
    if (den == 0L) None else Some((n * sxy - sx * sx).toDouble / den.toDouble)
  }

  test("a star is maximally disassortative (r = -1)") {
    val es = (1L to 5L).map(i => (0L, i))
    val (n, _, r) = run(es)
    n shouldBe 10L
    r shouldBe Some(-1.0)
  }

  test("a disjoint union of equal cliques is degenerate (NULL r)") {
    // all degrees equal -> zero variance
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    run(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)))._3 shouldBe None
  }

  test("matches the local replay on a mixed graph") {
    val es = (0L until 80L).map(i => (i, (i * 7 + 3) % 80)) ++
      (0L until 20L).map(i => (0L, 100L + i)) // hub with leaves
    run(es)._3 shouldBe local(es)
    run(es)._3.get should be < 0.0 // the hub drags it disassortative
  }

  test("layout-independent and NULL-guarded") {
    val es = (0L until 60L).map(i => (i, (i * 11 + 1) % 60))
    run(es) shouldBe {
      val r = Assortativity.degreeAssortativity(
        es.toDF("src", "dst").repartition(9), "src", "dst")
        .collect().head
      (r.getAs[Long]("n_edges"), r.getAs[Long]("sum_x"),
        Option(r.get(r.fieldIndex("r"))).map(_.asInstanceOf[Double]))
    }
    intercept[Exception] {
      Assortativity.degreeAssortativity(
        Seq((Some(1L), Option.empty[Long])).toDF("src", "dst"),
        "src", "dst").collect()
    }
  }
}
