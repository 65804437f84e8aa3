package graft.sim

import graft.SparkSpec

class SemDeDupSpec extends SparkSpec {
  import sqlImplicits._

  // two well-separated blobs; within blob A, ids 0/1/2 are near-parallel
  // (cosine ~1) while id 3 points elsewhere; blob B is all-distinct
  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.999f, 0.001f, 0.0f)),
    (2L, Array(0.998f, 0.002f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (50L, Array(100.0f, 100.0f, 0.0f)),
    (51L, Array(100.0f, 100.0f, 1.0f)),
    (52L, Array(-100.0f, 100.0f, 50.0f))
  ).toDF("id", "v")

  private def run(tau: Double) =
    SemDeDup.semDeDup(corpus, "id", "v", k = 2, iters = 2, tau = tau)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("keeps one representative per near-parallel group, smallest id") {
    val got = run(tau = 0.999)
    // 0,1,2 collapse into group 0 (only 0 survives); 3 is a singleton
    got(0L) shouldBe ((got(0L)._1, 0L, true))
    got(1L)._2 shouldBe 0L
    got(1L)._3 shouldBe false
    got(2L)._2 shouldBe 0L
    got(2L)._3 shouldBe false
    got(3L)._3 shouldBe true
    got(3L)._2 shouldBe 3L
  }

  test("cross-cluster near-parallel vectors are NOT paired") {
    // 50 and 51 have cosine ~0.999998/1.41... actually cos((1,1,0),(1,1,.01))
    // is ~0.99997 — high; but if k-means separates them from blob A they
    // still pair only if they share a cluster. With k=2 both land in the
    // big-norm cluster together; the real cross-cluster assertion is that
    // blob-A ids never group with blob-B ids even at tau=-1.
    val got = run(tau = -1.0)
    val groupOf = got.view.mapValues(_._2).toMap
    val aGroups = Set(0L, 1L, 2L, 3L).map(groupOf)
    val bGroups = Set(50L, 51L, 52L).map(groupOf)
    aGroups.intersect(bGroups) shouldBe empty
  }

  test("tau above every similarity keeps everything") {
    val got = run(tau = 1.0) // no distinct pair here reaches cosine == 1.0
    got.values.forall(_._3) shouldBe true
    got.foreach { case (id, (_, g, _)) => g shouldBe id }
  }

  test("maxClusterSize fails loudly when a cluster outgrows the bound") {
    val ex = intercept[IllegalArgumentException] {
      SemDeDup.semDeDup(corpus, "id", "v", k = 2, iters = 1, tau = 0.9,
        maxClusterSize = Some(2L))
    }
    ex.getMessage should include("maxClusterSize")
    // generous bound passes and results match the unguarded run
    val guarded = SemDeDup.semDeDup(corpus, "id", "v", 2, 2, 0.999,
      maxClusterSize = Some(100L)).collect().map(_.toSeq).sortBy(_.toString)
    val free = SemDeDup.semDeDup(corpus, "id", "v", 2, 2, 0.999)
      .collect().map(_.toSeq).sortBy(_.toString)
    guarded shouldBe free
  }

  test("agrees with a driver-side reference on random corpora") {
    val rng = new scala.util.Random(31)
    for (round <- 1 to 3) {
      val n = 40
      val dim = 6
      val data = (0L until n.toLong).map { i =>
        // planted structure: near-clones of 5 base directions (tight
        // jitter) mixed with loose noise around the same directions
        val jitter = if (i > 5 && rng.nextBoolean()) 0.01f else 2f
        (i, Array.tabulate(dim)(d =>
          (math.sin((i % 5) * 7 + d) * 10).toFloat
            + rng.nextGaussian().toFloat * jitter))
      }
      val df = data.toDF("id", "v").repartition(3 + round)
      val k = 3
      val iters = 2
      val tau = 0.999
      val got = SemDeDup.semDeDup(df, "id", "v", k, iters, tau)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap

      // reference: same quantized k-means via the library (bit-exact by
      // its own spec), then exact pairwise cosine + union-find in Scala
      val cents = KMeans.fit(df, "id", "v", k, iters)
      def cluster(v: Array[Float]): Int =
        cents.zipWithIndex.minBy { case (c, ci) =>
          // double arithmetic, sequential dimension order — the same
          // fold the native assignment expression computes
          var d = 0.0
          var j = 0
          while (j < c.length) {
            val diff = v(j).toDouble - c(j); d += diff * diff; j += 1
          }
          (d, ci)
        }._2
      val byCluster = data.groupBy { case (_, v) => cluster(v) }
      val parent = scala.collection.mutable.Map[Long, Long]()
      data.foreach { case (i, _) => parent(i) = i }
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      byCluster.values.foreach { members =>
        for {
          (a, va) <- members; (b, vb) <- members if a < b
          if Similarity.cosine(va.toSeq, vb.toSeq) >= tau
        } parent(find(a)) = find(b)
      }
      val groupOf = data.map { case (i, _) =>
        i -> data.map(_._1).filter(j => find(j) == find(i)).min
      }.toMap
      got.view.mapValues(_._2).toMap shouldBe groupOf
      got.foreach { case (i, (c, _)) =>
        c shouldBe cluster(data.find(_._1 == i).get._2)
      }
    }
  }

  test("deterministic under repartitioning") {
    val base = SemDeDup.semDeDup(corpus, "id", "v", 2, 2, 0.999)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val re = SemDeDup.semDeDup(corpus.repartition(13), "id", "v", 2, 2, 0.999)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    base shouldBe re
  }
}
