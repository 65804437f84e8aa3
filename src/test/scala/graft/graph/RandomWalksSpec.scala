package graft.graph

import graft.SparkSpec

class RandomWalksSpec extends SparkSpec {
  import sqlImplicits._

  /** Local replay of the step rule: kr-hash fold, square mod p,
    * mod out-degree over dst-ordered neighbors.
    */
  private def kr(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 257 + (b & 0xFF)) % 2147483647L)

  private def localWalks(
      edges: Seq[(Long, Long)], walksPerNode: Int, walkLen: Int,
      salt: String = ""): Set[(Long, Long, Long, Long)] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).sorted }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for (s <- nodes; w <- 0 until walksPerNode) {
      var cur = s
      out += ((s, w.toLong, 0L, s))
      var t = 1
      var alive = true
      while (t <= walkLen && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val key = s"$s#$w#$t" + (if (salt.isEmpty) "" else ":" + salt)
            val h = kr(key)
            cur = nbrs(((h * h) % 2147483647L % nbrs.size).toInt)
            out += ((s, w.toLong, t.toLong, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  private def run(
      edges: Seq[(Long, Long)], walksPerNode: Int, walkLen: Int,
      salt: String = "", repartition: Option[Int] = None) = {
    val df0 = edges.toDF("src", "dst")
    val df = repartition.map(df0.repartition(_)).getOrElse(df0)
    RandomWalks.walks(df, "src", "dst", walksPerNode, walkLen, salt)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("matches the local hash-step replay on a small graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L))
    run(edges, 2, 4) shouldBe localWalks(edges, 2, 4)
  }

  test("walks truncate at dangling nodes") {
    val edges = Seq((1L, 2L)) // 2 is dangling
    val got = run(edges, 1, 3)
    got shouldBe Set((1L, 0L, 0L, 1L), (1L, 0L, 1L, 2L), (2L, 0L, 0L, 2L))
  }

  test("layout-independent and duplicate-edge-insensitive") {
    val edges = (0L until 50L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 50), (i, (i * 11 + 7) % 50), (i, (i * 3 + 1) % 50)))
    val a = run(edges, 2, 5)
    a shouldBe run(edges, 2, 5, repartition = Some(13))
    a shouldBe localWalks(edges, 2, 5)
  }

  test("distinct salts give different walk sets") {
    val edges = (0L until 30L).map(i => (i, (i + 1) % 30)) ++
      (0L until 30L).map(i => (i, (i + 7) % 30))
    run(edges, 1, 6, salt = "a") should not be
      run(edges, 1, 6, salt = "b")
    run(edges, 1, 6, salt = "a") shouldBe localWalks(edges, 1, 6, "a")
  }

  test("NULL endpoints raise") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L))).toDF("src", "dst")
    intercept[Exception] {
      RandomWalks.walks(df, "src", "dst", 1, 1).collect()
    }
  }

  /** Local replay of the second-order biased step rule. */
  private def localNode2vec(
      edges: Seq[(Long, Long)], walksPerNode: Int, walkLen: Int,
      wReturn: Long, wIn: Long, wOut: Long,
      salt: String = ""): Set[(Long, Long, Long, Long)] = {
    val e = edges.distinct
    val eSet = e.toSet
    val adj = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for (s <- nodes; w <- 0 until walksPerNode) {
      var prev = -1L
      var cur = s
      out += ((s, w.toLong, 0L, s))
      var t = 1
      var alive = true
      while (t <= walkLen && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val key = s"$s#$w#$t" + (if (salt.isEmpty) "" else ":" + salt)
            val h = kr(key); val h2 = (h * h) % 2147483647L
            if (t == 1) {
              prev = cur
              cur = nbrs((h2 % nbrs.size).toInt)
              out += ((s, w.toLong, t.toLong, cur))
            } else {
              val weighted = nbrs.map { x =>
                x -> (if (x == prev) wReturn
                else if (eSet((prev, x))) wIn else wOut)
              }.filter(_._2 > 0L)
              if (weighted.isEmpty) alive = false
              else {
                val tot = weighted.map(_._2).sum
                val r = h2 % tot
                var acc = 0L
                var picked = -1L
                weighted.foreach { case (x, wt) =>
                  if (picked < 0 && r < acc + wt) picked = x
                  acc += wt
                }
                prev = cur; cur = picked
                out += ((s, w.toLong, t.toLong, cur))
              }
            }
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  private def runN2v(
      edges: Seq[(Long, Long)], walksPerNode: Int, walkLen: Int,
      wR: Long, wI: Long, wO: Long, salt: String = "",
      repartition: Option[Int] = None,
      maxDegree: Int = Int.MaxValue) = {
    val df0 = edges.toDF("src", "dst")
    val df = repartition.map(df0.repartition(_)).getOrElse(df0)
    RandomWalks.node2vecWalks(df, "src", "dst", walksPerNode, walkLen,
      wR, wI, wO, salt, maxDegree)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  /** The cap's reference semantics: truncate each node's adjacency to
    * its `cap` lowest-id neighbors. (Test graphs below keep every
    * node a src, so the capped graph's node set equals the input's
    * and the local replay's walk starts line up with Spark's.)
    */
  private def capEdges(edges: Seq[(Long, Long)], cap: Int): Seq[(Long, Long)] =
    edges.distinct.groupBy(_._1).toSeq.flatMap { case (s, es) =>
      es.map(_._2).distinct.sorted.take(cap).map(s -> _)
    }

  test("node2vec maxDegree: capped run ≡ node2vec on the capped graph") {
    // hub 0 points at everyone; ring keeps every node a src
    val edges = (1L until 25L).map(h => (0L, h)) ++
      (0L until 25L).flatMap(i =>
        Seq((i, (i + 1) % 25), ((i + 1) % 25, i)))
    val got = runN2v(edges, 1, 4, 1L, 2L, 4L, maxDegree = 3)
    got shouldBe localNode2vec(capEdges(edges, 3), 1, 4, 1L, 2L, 4L)
    // and the hub's capped fan-out really binds: only its 3 lowest-id
    // neighbors are ever reached FROM the hub at step 1
    val fromHub = got.filter(s => s._1 == 0L && s._3 == 1L).map(_._4)
    fromHub.foreach(n => n should be <= 3L)
  }

  test("node2vec maxDegree ≥ max degree is bit-identical to uncapped") {
    val edges = (0L until 20L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 20), ((i * 3 + 1) % 20, i),
        (i, (i * 7 + 2) % 20)))
    runN2v(edges, 2, 4, 1L, 2L, 4L, maxDegree = 100) shouldBe
      runN2v(edges, 2, 4, 1L, 2L, 4L)
  }

  test("node2vec maxDegree keeps dst-only nodes as walk starts") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)) // 2,3,4 dangling
    val got = runN2v(edges, 1, 2, 1L, 2L, 4L, maxDegree = 1)
    // all four nodes emit step 0; node 1 walks only to neighbor 2
    got.filter(_._3 == 0L).map(_._4) shouldBe Set(1L, 2L, 3L, 4L)
    got.filter(s => s._1 == 1L && s._3 == 1L).map(_._4) shouldBe Set(2L)
  }

  test("node2vec matches the local second-order replay") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 1L), (3L, 1L),
      (3L, 4L), (4L, 3L), (2L, 4L), (4L, 2L))
    runN2v(edges, 2, 4, wR = 1L, wI = 2L, wO = 4L) shouldBe
      localNode2vec(edges, 2, 4, 1L, 2L, 4L)
  }

  test("node2vec: zero return weight never revisits prev at step 2+") {
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i + 1) % 30), ((i + 1) % 30, i),
        (i, (i + 9) % 30), ((i + 9) % 30, i)))
    val got = runN2v(edges, 1, 5, wR = 0L, wI = 1L, wO = 3L)
    got shouldBe localNode2vec(edges, 1, 5, 0L, 1L, 3L)
    // reconstruct paths and assert no immediate backtracking
    got.groupBy(s => (s._1, s._2)).foreach { case (_, steps) =>
      val path = steps.toSeq.sortBy(_._3).map(_._4)
      path.sliding(3).foreach { w =>
        if (w.length == 3) w(0) should not be w(2)
      }
    }
  }

  test("node2vec is layout-independent and salt-sensitive") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 3 + 1) % 40), ((i * 3 + 1) % 40, i)))
    val a = runN2v(edges, 1, 4, 1L, 2L, 4L, salt = "s1")
    a shouldBe runN2v(edges, 1, 4, 1L, 2L, 4L, salt = "s1",
      repartition = Some(13))
    a should not be runN2v(edges, 1, 4, 1L, 2L, 4L, salt = "s2")
    a shouldBe localNode2vec(edges, 1, 4, 1L, 2L, 4L, "s1")
  }

  test("node2vec hub guard: empty edge set passes and walks are empty") {
    // max(nbr_rank) over zero rows is NULL — the guard must treat an
    // empty graph as trivially under the limit, not NPE
    val none = Seq((1L, 2L)).toDF("src", "dst").filter("src < 0")
    RandomWalks.node2vecWalks(none, "src", "dst",
      walksPerNode = 1, walkLen = 2,
      wReturn = 1L, wIn = 2L, wOut = 4L).count() shouldBe 0L
  }

  test("node2vec hub guard: uncapped run on a hub-heavy graph raises") {
    // one hub past the documented ceiling: the uncapped default must
    // fail loud BEFORE fanning out, not own the plan with Σ deg(cur)
    val hubDeg = RandomWalks.DefaultHubDegreeLimit + 1L
    val hub = (1L to hubDeg).map(i => (0L, i)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      RandomWalks.node2vecWalks(hub, "src", "dst",
        walksPerNode = 1, walkLen = 2, wReturn = 1L, wIn = 2L, wOut = 4L)
    }
    ex.getMessage should include("hub limit")
    // setting maxDegree takes the capped production path — no raise
    RandomWalks.node2vecWalks(hub, "src", "dst",
      walksPerNode = 1, walkLen = 2, wReturn = 1L, wIn = 2L, wOut = 4L,
      maxDegree = 8).count() should be > 0L
    // the explicit eyes-open opt-out also runs
    RandomWalks.node2vecWalks(hub, "src", "dst",
      walksPerNode = 1, walkLen = 1, wReturn = 1L, wIn = 2L, wOut = 4L,
      allowUncapped = true).count() should be > 0L
  }
}
