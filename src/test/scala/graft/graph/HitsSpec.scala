package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import sqlImplicits._

  /** Local replay of the integer max-normalized iteration. */
  private def local(
      es: Seq[(String, String)], iters: Int,
      scale: Long = 1000000L): Map[String, (Long, Long)] = {
    val e = es.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    def half(in: Map[String, Long], from: ((String, String)) => String,
        to: ((String, String)) => String): Map[String, Long] = {
      val sums = e.groupBy(to).map { case (v, xs) =>
        v -> xs.map(x => in(from(x))).sum
      }
      val mx = sums.values.max
      vs.map(v => v -> sums.getOrElse(v, 0L) * scale / mx).toMap
    }
    var hubs = vs.map(_ -> scale).toMap
    var auth = vs.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      auth = half(hubs, _._1, _._2)
      hubs = half(auth, _._2, _._1)
    }
    vs.map(v => v -> ((hubs(v), auth(v)))).toMap
  }

  private def run(es: Seq[(String, String)], iters: Int) =
    Hits.scores(es.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("hub"), r.getAs[Long]("authority"))))
      .toMap

  test("matches the local integer replay; hub/authority split shows") {
    // d is a pure hub (points at everything), c a pure authority
    val es = Seq("d" -> "a", "d" -> "b", "d" -> "c",
      "a" -> "c", "b" -> "c")
    val got = run(es, 3)
    got shouldBe local(es, 3)
    got("d")._1 shouldBe 1000000L // max hub, pinned at scale
    got("c")._2 shouldBe 1000000L // max authority
    got("d")._2 shouldBe 0L       // nothing points at the hub
  }

  test("layout-independent") {
    val es = (1 to 150).map(i => s"v${i % 19}" -> s"v${(i * 5) % 19}")
    run(es, 4) shouldBe
      Hits.scores(es.toDF("src", "dst").repartition(11), "src", "dst", 4)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("hub"), r.getAs[Long]("authority"))))
        .toMap
    run(es, 4) shouldBe local(es, 4)
  }

  test("maxDeg·scale² past the exact long range raises at build") {
    // a 10-in-degree hub with scale = 1e9: 10 · 10^18 > 2^63 − 1, so
    // the half-step's __sum · scale product would silently wrap — the
    // guard must refuse (the weaker |V|·scale bound would admit it)
    val es = (1 to 10).map(i => s"u$i" -> "hub")
    intercept[IllegalArgumentException] {
      Hits.scores(es.toDF("src", "dst"), "src", "dst", 1,
        scale = 1000000000L)
    }
    // same graph at the default scale is fine
    Hits.scores(es.toDF("src", "dst"), "src", "dst", 1)
      .count() shouldBe 11L
  }

  test("NULL endpoints and empty graphs raise") {
    intercept[Exception] {
      Hits.scores(Seq((Some("a"), Option.empty[String])).toDF("src", "dst"),
        "src", "dst", 1).collect()
    }
    intercept[IllegalArgumentException] {
      Hits.scores(
        Seq(("a", "b")).toDF("src", "dst").filter("src = 'zzz'"),
        "src", "dst", 1)
    }
  }

  test("maxResidual converged-or-raise on a slow-mixing path") {
    val es = (1 to 20).map(i => s"v$i" -> s"v${i + 1}")
    val ex = intercept[IllegalArgumentException] {
      Hits.scores(es.toDF("src", "dst"), "src", "dst",
        iterations = 1, maxResidual = Some(0L)).collect()
    }
    ex.getMessage should include("has not settled")
    // a symmetric pair settles to the normalized fixed point fast;
    // the gated result equals the ungated one
    val pair = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val gated = Hits.scores(pair, "src", "dst",
        iterations = 5, maxResidual = Some(0L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Hits.scores(pair, "src", "dst", iterations = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    gated shouldBe plain
  }
}
