package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectSpec extends SparkSpec {
  import sqlImplicits._

  private def randomVec(rng: Random, dim: Int): Seq[Float] =
    Seq.fill(dim)(rng.nextGaussian().toFloat)

  private def corpus(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new Random(seed)
    (0L until n.toLong).map(i => (i, randomVec(rng, dim)))
  }

  /** Driver-side MMR greedy — the definition, straight off the paper. */
  private def naiveMmr(
      data: Seq[(Long, Seq[Float])], qv: Seq[Float],
      candidateK: Int, selectK: Int, lambda: Double): Seq[(Long, Double)] = {
    val cand = data.map { case (id, v) => (id, v, Similarity.cosine(v, qv)) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(candidateK)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(cand.sortBy(_._1): _*)
    while (out.length < math.min(selectK, cand.length)) {
      var best = -1
      var bestScore = 0.0
      remaining.zipWithIndex.foreach { case ((id, v, rel), i) =>
        val score =
          if (selected.isEmpty) lambda * rel
          else lambda * rel - (1.0 - lambda) *
            selected.map(s => Similarity.cosine(v, s._2)).max
        if (best < 0 || score > bestScore) { best = i; bestScore = score }
      }
      val (id, v, _) = remaining.remove(best)
      selected += ((id, v))
      out += ((id, bestScore))
    }
    out.toSeq
  }

  test("mmrDiversify matches the naive driver-side greedy") {
    val data = corpus(120, 12, seed = 11)
    val df = data.toDF("vec_id", "embedding").repartition(5)
    val queries = data.take(3).map { case (id, v) => (id, v.toArray) }

    val got = Select.mmrDiversify(
      df, "vec_id", "embedding", queries,
      candidateK = 15, selectK = 6, lambda = 0.7)
      .orderBy(col("query_id"), col("sel_rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))

    val expected = queries.flatMap { case (qid, qv) =>
      naiveMmr(data, qv.toSeq, candidateK = 15, selectK = 6, lambda = 0.7)
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
    }
    got.toSeq shouldBe expected.toSeq
  }

  test("lambda=1 degenerates to relevance order (plain top-k prefix)") {
    val data = corpus(60, 8, seed = 5)
    val df = data.toDF("vec_id", "embedding")
    val queries = Seq(data.head).map { case (id, v) => (id, v.toArray) }
    val got = Select.mmrDiversify(
      df, "vec_id", "embedding", queries,
      candidateK = 10, selectK = 10, lambda = 1.0)
      .orderBy(col("sel_rank")).collect()
      .map(r => r.getLong(2))
    val topk = Similarity.bruteForceTopK(df, "vec_id", "embedding", queries, 10)
      .orderBy(col("score").desc, col("vec_id")).collect().map(_.getLong(1))
    got.toSeq shouldBe topk.toSeq
  }

  test("mmrFromCandidates with brute-force candidates equals mmrDiversify") {
    val data = corpus(80, 8, seed = 21)
    val df = data.toDF("vec_id", "embedding").repartition(3)
    val queries = data.take(2).map { case (id, v) => (id, v.toArray) }
    val direct = Select.mmrDiversify(
      df, "vec_id", "embedding", queries,
      candidateK = 10, selectK = 5, lambda = 0.7)
      .orderBy(col("query_id"), col("sel_rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    val cand = Similarity.bruteForceTopK(
      df, "vec_id", "embedding", queries, k = 10)
    val seamed = Select.mmrFromCandidates(
      df, "vec_id", "embedding", cand, selectK = 5, lambda = 0.7)
      .orderBy(col("query_id"), col("sel_rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    seamed.toSeq shouldBe direct.toSeq
  }

  test("mmr picks are distinct and bounded by selectK") {
    val data = corpus(40, 6, seed = 2)
    val df = data.toDF("vec_id", "embedding")
    val queries = data.take(2).map { case (id, v) => (id, v.toArray) }
    val rows = Select.mmrDiversify(
      df, "vec_id", "embedding", queries,
      candidateK = 8, selectK = 4, lambda = 0.5)
      .collect()
    rows.length shouldBe 8
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      g.map(_.getLong(2)).distinct.length shouldBe 4
    }
  }

  /** Driver-side farthest-point greedy. */
  private def naiveKCenter(
      pts: Seq[(Long, Seq[Float])], k: Int): Seq[(Long, Double)] = {
    val sorted = pts.sortBy(_._1)
    val selected = scala.collection.mutable.ArrayBuffer(sorted.head)
    val out = scala.collection.mutable.ArrayBuffer((sorted.head._1, 0.0))
    while (out.length < math.min(k, pts.length)) {
      val cands = sorted.filterNot(p => selected.exists(_._1 == p._1))
      val scored = cands.map { case (id, v) =>
        (id, selected.map(s => Select.sqDist(v, s._2)).min)
      }
      val best = scored.reduceLeft { (a, b) =>
        if (b._2 > a._2) b else a // strict >: earliest id wins ties
      }
      selected += sorted.find(_._1 == best._1).get
      out += best
    }
    out.toSeq
  }

  test("kCenterPerGroup matches the naive greedy per group") {
    val data = corpus(90, 10, seed = 7)
    val df = data.toDF("vec_id", "embedding")
      .withColumn("grp", expr("vec_id DIV 30"))
    val got = Select.kCenterPerGroup(df, "grp", "vec_id", "embedding", k = 4)
      .orderBy(col("grp"), col("sel_rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val expected = data.groupBy(_._1 / 30).toSeq.sortBy(_._1).flatMap {
      case (g, pts) =>
        naiveKCenter(pts, 4).zipWithIndex.map {
          case ((id, d), i) => (g, i + 1, id, d)
        }
    }
    got.toSeq shouldBe expected.toSeq
  }

  test("k-center radii are monotone non-increasing after the seed") {
    val data = corpus(64, 8, seed = 13)
    val df = data.toDF("vec_id", "embedding").withColumn("grp", lit(0L))
    val radii = Select.kCenterPerGroup(df, "grp", "vec_id", "embedding", k = 8)
      .orderBy(col("sel_rank")).collect().map(_.getDouble(3))
    radii.head shouldBe 0.0
    radii.drop(1).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"radius grew: $a -> $b")
      case _ =>
    }
  }

  test("group above maxGroupSize fails fast") {
    val data = corpus(30, 4, seed = 3)
    val df = data.toDF("vec_id", "embedding").withColumn("grp", lit(0L))
    val ex = intercept[org.apache.spark.SparkException] {
      Select.kCenterPerGroup(
        df, "grp", "vec_id", "embedding", k = 2, maxGroupSize = 10).collect()
    }
    ex.getMessage should include("maxGroupSize")
  }

  test("hardNegatives: excludes self and positives, two-stage truncation") {
    val data = corpus(40, 8, seed = 7)
    val df = data.toDF("vec_id", "embedding")
    val queries = data.take(3)
      .map { case (id, v) => (id, v.toArray) }
    // positives: ids congruent mod 4 to the query
    val pos = (for ((q, _) <- queries; p <- 0L until 40L if p % 4 == q % 4)
      yield (q, p)).toDF("q", "p")
    val got = Select.hardNegatives(
      df, "vec_id", "embedding", queries, pos, "q", "p",
      k = 5, fetchK = 20)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rank")))

    // local replay of the pinned two-stage rule
    val expect = queries.flatMap { case (q, qv) =>
      val top = data
        .map { case (id, v) => (id, Similarity.cosine(v, qv.toSeq)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(20)
      top.filter { case (id, _) => id != q && id % 4 != q % 4 }
        .take(5).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1L) }
    }.toSet
    got.toSet shouldBe expect
    // no positive and no self leaked
    got.foreach { case (q, id, _, _) =>
      id should not be q
      (id % 4) should not be (q % 4)
    }
  }
}
