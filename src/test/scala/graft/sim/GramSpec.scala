package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GramSpec extends SparkSpec {
  import sqlImplicits._

  private def vecs = Seq(
    Seq(1.0f, 0.0f), Seq(2.0f, 0.0f), Seq(3.0f, 0.0f),
    Seq(1.0f, 0.5f), Seq(2.0f, -0.5f)).toDF("v")

  test("accumulation carries exact quantized sums") {
    val acc = Gram.accumulate(vecs, "v", dim = 2, decimals = 1)
      .orderBy($"i", $"j").as[(Int, Int, Long, Long)].collect()
    // q values: (10,0) (20,0) (30,0) (10,5) (20,-5)
    acc.toSeq shouldBe Seq(
      (0, -1, 5L, 90L), // sum q0
      (0, 0, 5L, 1900L), // 100+400+900+100+400
      (0, 1, 5L, -50L), // 0+0+0+50-100
      (1, -1, 5L, 0L), // sum q1
      (1, 1, 5L, 50L)) // 25+25
  }

  test("principal component of a 2D line is the line direction") {
    // points along y = x
    val line = Seq(Seq(1.0f, 1.0f), Seq(2.0f, 2.0f), Seq(3.0f, 3.0f),
      Seq(4.0f, 4.0f)).toDF("v")
    val acc = Gram.accumulate(line, "v", dim = 2, decimals = 3)
    val Seq((ev1, v1), (ev2, _)) =
      Gram.principalComponents(acc, dim = 2, decimals = 3, k = 2)
    ev1 should be > 0.9 // variance along the line: 1.25
    ev2.abs should be < 1e-9 // nothing orthogonal
    v1(0) shouldBe v1(1) +- 1e-9 // direction (1,1)/sqrt2
    v1(0) shouldBe (1.0 / math.sqrt(2)) +- 1e-6
  }

  test("eigenvalues match the hand covariance on a small case") {
    val acc = Gram.accumulate(vecs, "v", dim = 2, decimals = 3)
    val pcs = Gram.principalComponents(acc, 2, 3, 2)
    // mean = (1.8, 0.0); var_x = 0.56, var_y = 0.1, cov_xy = -0.1
    val tr = pcs.map(_._1).sum
    tr shouldBe (0.56 + 0.1) +- 1e-6 // trace preserved
    (pcs(0)._1 * pcs(1)._1) shouldBe (0.56 * 0.1 - 0.1 * 0.1) +- 1e-6
  }

  test("a ragged or null vector raises") {
    val bad = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("v")
    intercept[Exception] {
      Gram.accumulate(bad, "v", dim = 2).collect()
    }.getMessage should include("not 2-dimensional")
  }

  test("accumulation is partitioning-independent (exact integers)") {
    val a = Gram.accumulate(vecs.repartition(5), "v", 2, 2)
      .orderBy($"i", $"j").collect().toSeq
    val b = Gram.accumulate(vecs.repartition(1), "v", 2, 2)
      .orderBy($"i", $"j").collect().toSeq
    a shouldBe b
  }

  test("PCA projection preserves neighborhoods on low-rank data") {
    // 200 vectors in 16 dims with a 4-dim signal subspace + small noise:
    // the top-4 PCs recover the subspace, so 4-dim distances rank
    // neighbors nearly as the 16-dim ones do — the "project before the
    // cheaper ANN layout" claim, measured.
    val rnd = new scala.util.Random(7)
    val basis = Array.fill(4, 16)(rnd.nextGaussian())
    val data = (0 until 200).map { _ =>
      val coef = Array.fill(4)(rnd.nextGaussian() * 3)
      (0 until 16).map { d =>
        (0 until 4).map(s => coef(s) * basis(s)(d)).sum.toFloat +
          (rnd.nextGaussian() * 0.01).toFloat
      }
    }
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val acc = Gram.accumulate(df, "v", dim = 16, decimals = 4)
    val pcs = Gram.principalComponents(acc, 16, 4, k = 4)
    val means = Gram.meanVector(acc, 16, 4)
    // signal variance dominates: top-4 eigenvalues >> 5th
    val all = Gram.principalComponents(acc, 16, 4, k = 5)
    all(3)._1 / all(4)._1 should be > 100.0

    val proj = Gram.projectTo(df, "v", "p", pcs.map(_._2), means)
      .select($"id", $"p").as[(Long, Seq[Double])].collect()
      .toMap.map { case (k2, v) => k2 -> v.toArray }
    def dist(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val full = data.map(_.map(_.toDouble).toArray)
    val recalls = (0 until 10).map { qi =>
      def top5(d: Int => Double) =
        (0 until 200).filter(_ != qi).sortBy(d).take(5).toSet
      val tFull = top5(j => dist(full(qi), full(j)))
      val tProj = top5(j => dist(proj(qi.toLong), proj(j.toLong)))
      tFull.intersect(tProj).size / 5.0
    }
    (recalls.sum / recalls.size) should be > 0.9
  }

  test("accumulations merge by summing (mergeable form)") {
    val ids = vecs.withColumn("id", monotonically_increasing_id())
    val h1 = Gram.accumulate(ids.filter($"id" % 2 === 0), "v", 2, 1)
    val h2 = Gram.accumulate(ids.filter($"id" % 2 =!= 0), "v", 2, 1)
    val merged = Gram.merge(h1, h2).orderBy($"i", $"j").collect().toSeq
    val whole = Gram.accumulate(vecs, "v", 2, 1)
      .orderBy($"i", $"j").collect().toSeq
    merged shouldBe whole
  }
}
