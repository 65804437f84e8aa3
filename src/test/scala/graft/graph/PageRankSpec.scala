package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import sqlImplicits._

  private def edges(es: (String, String)*) = es.toDF("src", "dst")

  /** Local replay of the exact integer iteration. */
  private def local(
      es: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000L): Map[String, Long] = {
    val e = es.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = vs.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map(x => r(x._1) / outdeg(x._1)).sum
      }
      r = vs.map(v =>
        v -> (scale * 15L / 100L + in.getOrElse(v, 0L) * 85L / 100L)).toMap
    }
    r
  }

  test("matches the exact integer iteration on a hand graph") {
    val es = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "d" -> "c")
    val got = PageRank.ranks(edges(es: _*), "src", "dst", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe local(es, 5)
    // the hub c outranks the dangling-ish d
    got("c") should be > got("d")
  }

  test("dangling vertices keep base rank; their mass is dropped") {
    // b has no outlinks: it receives but never sends
    val es = Seq("a" -> "b")
    val got = PageRank.ranks(edges(es: _*), "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe local(es, 3)
    got("a") shouldBe 150000000L // base only after round 1
  }

  test("duplicate edge rows count once") {
    val once = PageRank.ranks(
      edges("a" -> "b", "b" -> "a"), "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dup = PageRank.ranks(
      edges("a" -> "b", "a" -> "b", "b" -> "a"), "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    dup shouldBe once
  }

  test("self-loops are legal and deterministic") {
    val es = Seq("a" -> "a", "a" -> "b", "b" -> "a")
    PageRank.ranks(edges(es: _*), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      local(es, 3)
  }

  test("result is partitioning- and order-independent") {
    val es = (1 to 200).map(i => s"v${i % 23}" -> s"v${(i * 7) % 23}")
    val base = PageRank.ranks(edges(es: _*), "src", "dst", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shuffled = PageRank.ranks(
      edges(scala.util.Random.shuffle(es): _*).repartition(13),
      "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    shuffled shouldBe base
  }

  test("weightedRanks with equal weights reproduces plain ranks") {
    val es = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a")
    val plain = PageRank.ranks(edges(es: _*), "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weighted = PageRank.weightedRanks(
      es.map { case (s, d) => (s, d, 7L) }.toDF("src", "dst", "w"),
      "src", "dst", "w", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weighted shouldBe plain
  }

  test("weightedRanks splits mass by weight; duplicate edges sum") {
    // a -> b (w 3), a -> c (w 1): b gets 3/4 of a's damped share
    val df = Seq(("a", "b", 2L), ("a", "b", 1L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.weightedRanks(df, "src", "dst", "w", 1,
      scale = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r1(b) = 150 + (1000*3 div 4)*85 div 100 = 150 + 637 = 787
    // r1(c) = 150 + (1000*1 div 4)*85 div 100 = 150 + 212 = 362
    got shouldBe Map("a" -> 150L, "b" -> 787L, "c" -> 362L)
  }

  test("weightedRanks rejects NULL and non-positive weights") {
    intercept[Exception] {
      PageRank.weightedRanks(
        Seq(("a", "b", 0L)).toDF("src", "dst", "w"),
        "src", "dst", "w", 1).collect()
    }
  }

  /** Local replay of the seeded iteration. */
  private def localSeeded(
      es: Seq[(String, String)], seeds: Set[String], iters: Int,
      scale: Long = 1000000000L): Map[String, Long] = {
    val e = es.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    def grant(v: String, g: Long) = if (seeds(v)) g else 0L
    var r = vs.map(v => v -> grant(v, scale)).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map(x => r(x._1) / outdeg(x._1)).sum
      }
      r = vs.map(v =>
        v -> (grant(v, scale * 15L / 100L) +
          in.getOrElse(v, 0L) * 85L / 100L)).toMap
    }
    r
  }

  private def seeded(
      es: Seq[(String, String)], seeds: Seq[String], iters: Int) =
    PageRank.seededRanks(
      edges(es: _*), "src", "dst", seeds.toDF("s"), "s", iters)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Boolean]("is_seed"), r.getAs[Long]("rank"))))
      .toMap

  test("seeded ranks match the local replay; trust decays with distance") {
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a", "a" -> "c")
    val got = seeded(es, Seq("a"), 3)
    got.map { case (v, (_, r)) => v -> r } shouldBe
      localSeeded(es, Set("a"), 3)
    got("a")._1 shouldBe true
    got("b")._1 shouldBe false
    // c receives from both a (direct) and b; b only gets half of a's
    got("c")._2 should be > got("b")._2
    // non-seeds still accumulate flowing trust
    got("d")._2 should be > 0L
  }

  test("vertices unreachable from seeds rank zero; foreign seeds ignored") {
    val es = Seq("a" -> "b", "x" -> "y") // x/y disconnected from seed a
    val got = seeded(es, Seq("a", "not_in_graph"), 4)
    got("x")._2 shouldBe 0L
    got("y")._2 shouldBe 0L
    got("b")._2 should be > 0L
    got.contains("not_in_graph") shouldBe false
  }

  test("seeding every vertex reproduces plain ranks") {
    val es = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "a")
    val plain = PageRank.ranks(edges(es: _*), "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    seeded(es, Seq("a", "b", "c"), 3)
      .map { case (v, (_, r)) => v -> r } shouldBe plain
  }

  test("NULL endpoints raise instead of silently dropping") {
    val df = Seq((Some("a"), Some("b")), (Some("a"), None))
      .toDF("src", "dst")
    val ex = intercept[Exception] {
      PageRank.ranks(df, "src", "dst", 1).collect()
    }
    ex.getMessage should include("NULL dst")
  }

  test("overflow guard fail-louds on |V|·scale past the long budget") {
    val es = (1 to 300).map(i => s"v$i" -> s"v${i + 1}")
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(edges(es: _*), "src", "dst", 1,
        scale = 1000000000000000L) // 301 · 10^15 > 10^17
    }
    ex.getMessage should include("exceeds the exact long range")
  }

  test("maxResidual converged-or-raise: slow-mixing path raises early, " +
    "settles with enough iterations") {
    // a long directed path mixes slowly: mass takes ~length rounds to
    // drain, so the residual after 2 iterations is large
    val es = (1 to 30).map(i => s"v$i" -> s"v${i + 1}")
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(edges(es: _*), "src", "dst",
        iterations = 2, maxResidual = Some(0L)).collect()
    }
    ex.getMessage should include("has not settled")
    // with enough rounds the exact integer iteration hits a fixed
    // point (damping contracts, truncation quantizes) and the same
    // gate passes; result equals the ungated run
    val gated = PageRank.ranks(edges(es: _*), "src", "dst",
        iterations = 60, maxResidual = Some(0L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gated shouldBe local(es, 60)
    // weighted + seeded variants share the gate
    intercept[IllegalArgumentException] {
      PageRank.weightedRanks(
        es.map { case (a, b) => (a, b, 2L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 2, maxResidual = Some(0L)).collect()
    }.getMessage should include("has not settled")
    intercept[IllegalArgumentException] {
      PageRank.seededRanks(edges(es: _*), "src", "dst",
        Seq("v1").toDF("seed"), "seed",
        iterations = 2, maxResidual = Some(0L)).collect()
    }.getMessage should include("has not settled")
  }
}
