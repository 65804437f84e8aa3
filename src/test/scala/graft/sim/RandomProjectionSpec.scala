package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  test("projection matches the naive driver-side fold") {
    val dim = 24
    val k = 6
    val data = corpus(40, dim, seed = 9)
    val got = RandomProjection.project(
      data.toDF("vec_id", "embedding").repartition(5),
      "embedding", dim, k, salt = "s")
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val m = RandomProjection.signMatrix(dim, k, "s")
    data.foreach { case (id, v) =>
      val want = (0 until k).map { j =>
        var acc = 0.0
        (0 until dim).foreach(i => acc += v(i).toDouble * m(j)(i))
        acc
      }
      got(id) shouldBe want
    }
  }

  test("matrix is deterministic and salt-dependent") {
    val a = RandomProjection.signMatrix(16, 4, "one")
    val b = RandomProjection.signMatrix(16, 4, "one")
    val c = RandomProjection.signMatrix(16, 4, "two")
    a.map(_.toSeq).toSeq shouldBe b.map(_.toSeq).toSeq
    a.map(_.toSeq).toSeq should not be c.map(_.toSeq).toSeq
    // signs are roughly balanced (a constant-sign matrix would be a
    // broken hash, not a projection)
    val flat = a.flatten
    math.abs(flat.sum) should be < (flat.length / 2)
  }

  test("JL property: pairwise distances are approximately preserved") {
    val dim = 64
    val k = 32
    val data = corpus(30, dim, seed = 4)
    val proj = RandomProjection.project(
      data.toDF("vec_id", "embedding"), "embedding", dim, k)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Float], b: Seq[Float]) = Select.sqDist(a, b)
    def p2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // ratio ||Py||² / (k·||y||²) concentrates around 1; at k=32 allow
    // a wide band but require the bulk inside it
    val ratios = for {
      i <- data.indices; j <- data.indices if i < j
    } yield p2(proj(data(i)._1), proj(data(j)._1)) /
      (k * d2(data(i)._2, data(j)._2))
    val inBand = ratios.count(r => r > 0.4 && r < 2.0)
    inBand.toDouble / ratios.size should be > 0.9
  }
}
