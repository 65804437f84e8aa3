package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizeSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  private def d2(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < a.length) { val d = a(j) - b(j); acc += d * d; j += 1 }
    acc
  }

  /** Driver-side PQ encode: first-minimum argmin per subspace. */
  private def refCodes(
      v: Seq[Float], cb: ProductQuantize.Codebooks): Seq[Int] =
    (0 until cb.nSub).map { s =>
      val sub = v.slice(s * cb.subDim, (s + 1) * cb.subDim).map(_.toDouble)
      val dists = cb.codes(s).map(c => d2(sub, c))
      dists.indexOf(dists.min)
    }

  test("codebooksFromRows takes the lowest-id rows, sub-split") {
    val data = corpus(40, 12, seed = 3)
    val df = data.toDF("vec_id", "embedding").repartition(4)
    val cb = ProductQuantize.codebooksFromRows(df, "vec_id", "embedding",
      nSub = 3, nCodes = 8)
    assert(cb.nSub === 3 && cb.subDim === 4 && cb.nCodes === 8)
    val want = data.take(8).map(_._2.map(_.toDouble))
    (0 until 8).foreach { c =>
      (0 until 3).foreach { s =>
        assert(cb.codes(s)(c) === want(c).slice(s * 4, (s + 1) * 4))
      }
    }
  }

  test("encode matches the driver-side argmin, any partitioning") {
    val data = corpus(200, 16, seed = 11)
    val cb = ProductQuantize.codebooksFromRows(
      data.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nSub = 4, nCodes = 12)
    val got = ProductQuantize.encode(
      data.toDF("vec_id", "embedding").repartition(7),
      "vec_id", "embedding", cb)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    assert(got.length === 200)
    got.foreach { case (id, codes) =>
      assert(codes === refCodes(data(id.toInt)._2, cb), s"vec $id")
    }
  }

  test("adcTopK matches a driver-side ADC scan exactly") {
    val data = corpus(150, 16, seed = 23)
    val df = data.toDF("vec_id", "embedding")
    val cb = ProductQuantize.codebooksFromRows(df, "vec_id", "embedding",
      nSub = 4, nCodes = 10)
    val enc = ProductQuantize.encode(df.repartition(5), "vec_id", "embedding", cb)
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }

    val got = ProductQuantize.adcTopK(enc, "vec_id", queries, cb, k = 8)
      .orderBy(col("query_id"), col("adist"), col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val want = queries.flatMap { case (qid, qv) =>
      val luts = (0 until cb.nSub).map { s =>
        val qs = qv.slice(s * cb.subDim, (s + 1) * cb.subDim).map(_.toDouble).toSeq
        cb.codes(s).map(c => d2(qs, c))
      }
      data.map { case (id, v) =>
        val codes = refCodes(v, cb)
        val adist = (0 until cb.nSub).map(s => luts(s)(codes(s))).reduceLeft(_ + _)
        (qid, id, adist)
      }.sortBy { case (_, id, a) => (a, id) }.take(8)
    }
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gq, gi, ga), (wq, wi, wa)) =>
      assert(gq === wq); assert(gi === wi)
      assert(math.abs(ga - wa) < 1e-12)
    }
  }

  test("ADC recall against exact L2 is high on clustered data") {
    // 8 well-separated centers, 25 points each: PQ codes preserve the
    // neighborhood structure, so ADC top-10 should mostly agree with
    // exact top-10
    val rng = new Random(42)
    val centers = Seq.fill(8)(Array.fill(16)(rng.nextGaussian() * 10))
    val data = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.toSeq.map(x => (x + rng.nextGaussian() * 0.5).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val cb = ProductQuantize.codebooksFromRows(df, "vec_id", "embedding",
      nSub = 4, nCodes = 16)
    val enc = ProductQuantize.encode(df, "vec_id", "embedding", cb)
    val queries = data.take(5).map { case (id, v) => (id, v.toArray) }

    val adc = ProductQuantize.adcTopK(enc, "vec_id", queries, cb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = queries.map { case (qid, qv) =>
      val top = data.map { case (id, v) =>
        (id, d2(qv.map(_.toDouble).toSeq, v.map(_.toDouble)))
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      qid -> top
    }.toMap

    val recall = queries.map { case (qid, _) =>
      adc(qid).intersect(exact(qid)).size.toDouble / 10.0
    }.sum / queries.length
    assert(recall >= 0.6, s"ADC recall@10 too low: $recall")
  }

  test("IVF-PQ round-trips and exhaustive probing equals full ADC") {
    val data = corpus(160, 16, seed = 31)
    val df = data.toDF("vec_id", "embedding")
    val cb = ProductQuantize.codebooksFromRows(df, "vec_id", "embedding", 4, 12)
    val centroids = data.take(8).map { case (id, v) =>
      (id.toInt, v.map(_.toFloat).toArray)
    }
    val ivf = Similarity.buildIvfWithCentroids(df, "vec_id", "embedding", centroids)
    val path = java.nio.file.Files.createTempDirectory("pq_ivf_").toString
    ProductQuantize.writeIvfPq(ivf, cb, path)
    val loaded = ProductQuantize.readIvfPq(spark, path, "vec_id")

    assert(loaded.cb === cb)
    assert(loaded.centroids.map(_._1) === centroids.map(_._1))
    loaded.centroids.zip(centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq)
    }

    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }
    val exhaustive = ProductQuantize.ivfAdcTopK(loaded, queries, k = 7,
      nProbe = centroids.length)
      .orderBy(col("query_id"), col("adist"), col("vec_id")).collect().toSeq
    val full = ProductQuantize.adcTopK(
      ProductQuantize.encode(df, "vec_id", "embedding", cb),
      "vec_id", queries, cb, k = 7)
      .orderBy(col("query_id"), col("adist"), col("vec_id")).collect().toSeq
    assert(exhaustive === full)

    // pruned probe: results come only from the probed cells, and the
    // cell filter reaches the scan as partition pruning
    val pruned = ProductQuantize.ivfAdcTopK(loaded, queries, k = 7, nProbe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val cellOf = loaded.cells.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probesOf = queries.map { case (qid, qv) =>
      qid -> loaded.centroids
        .sortBy { case (c, cv) => (-Similarity.cosine(qv, cv), c) }
        .take(2).map(_._1).toSet
    }.toMap
    pruned.collect().foreach { r =>
      assert(probesOf(r.getLong(0)).contains(cellOf(r.getLong(1))))
    }
  }

  test("adcTopK plans a broadcast hash join, not a nested loop") {
    val data = corpus(50, 16, seed = 1)
    val df = data.toDF("vec_id", "embedding")
    val cb = ProductQuantize.codebooksFromRows(df, "vec_id", "embedding", 4, 8)
    val enc = ProductQuantize.encode(df, "vec_id", "embedding", cb)
    val plan = ProductQuantize.adcTopK(
      enc, "vec_id", Seq((0L, data.head._2.toArray)), cb, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
