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
}
