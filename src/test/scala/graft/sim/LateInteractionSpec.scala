package graft.sim

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LateInteractionSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rng = new Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  /** The definition, straight off the paper: Σ_i max_j cos(q_i, d_j). */
  private def naiveMaxSim(
      q: Seq[Seq[Float]], d: Seq[Seq[Float]]): Double =
    q.map(qi => d.map(dj => Similarity.cosine(qi, dj)).max).sum

  test("subVectors splits contiguously and round-trips") {
    val v = (0 until 12).map(_.toFloat)
    val sub = LateInteraction.subVectors(3)(v)
    assert(sub.length === 3)
    assert(sub(0).toSeq === Seq(0f, 1f, 2f, 3f))
    assert(sub(2).toSeq === Seq(8f, 9f, 10f, 11f))
    assert(sub.flatten.toSeq === v)
    intercept[IllegalArgumentException] {
      LateInteraction.subVectors(5)(v)
    }
  }

  test("maxSim matches the naive definition") {
    val rng = new Random(7)
    val q = Array.fill(4)(Array.fill(8)(rng.nextGaussian().toFloat))
    val d = Array.fill(6)(Array.fill(8)(rng.nextGaussian().toFloat))
    val got = LateInteraction.maxSim(q, d)
    val want = naiveMaxSim(q.map(_.toSeq), d.map(_.toSeq))
    assert(math.abs(got - want) < 1e-12)
  }

  test("maxSimTopK matches a driver-side scan, any partitioning") {
    val data = corpus(150, 16, seed = 21)
    val df = data.toDF("vec_id", "embedding").repartition(7)
    val queries = data.take(3).map { case (id, v) =>
      (id, LateInteraction.subVectors(4)(v))
    }

    val got = LateInteraction.maxSimTopK(
      df, "vec_id", "embedding", queries, nSub = 4, k = 10)
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val want = queries.flatMap { case (qid, qt) =>
      data.map { case (id, v) =>
        (qid, id,
          naiveMaxSim(qt.map(_.toSeq), LateInteraction.subVectors(4)(v).map(_.toSeq)))
      }.sortBy { case (_, id, s) => (-s, id) }.take(10)
    }
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gq, gi, gs), (wq, wi, ws)) =>
      assert(gq === wq); assert(gi === wi)
      assert(math.abs(gs - ws) < 1e-9)
    }
  }

  test("maxSimFromCandidates over the full corpus ≡ maxSimTopK") {
    val data = corpus(90, 16, seed = 5)
    val df = data.toDF("vec_id", "embedding").repartition(4)
    val queries = data.take(2).map { case (id, v) =>
      (id, LateInteraction.subVectors(4)(v))
    }
    val allPairs = queries.flatMap { case (qid, _) =>
      data.map { case (id, _) => (qid, id) }
    }.toDF("query_id", "vec_id")

    val direct = LateInteraction.maxSimTopK(
      df, "vec_id", "embedding", queries, nSub = 4, k = 7)
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
      .collect().toSeq
    val viaCand = LateInteraction.maxSimFromCandidates(
      df, "vec_id", "embedding", allPairs, queries, nSub = 4, k = 7)
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
      .collect().toSeq
    assert(direct === viaCand)
  }

  test("maxSimFromCandidates scores only the candidate pairs") {
    val data = corpus(60, 16, seed = 9)
    val df = data.toDF("vec_id", "embedding")
    val queries = Seq((0L, LateInteraction.subVectors(4)(data.head._2)))
    // restrict to even ids — the top-k must come from the even set only
    val cand = data.map(_._1).filter(_ % 2 == 0)
      .map(id => (0L, id)).toDF("query_id", "vec_id")
    val got = LateInteraction.maxSimFromCandidates(
      df, "vec_id", "embedding", cand, queries, nSub = 4, k = 5)
      .collect().map(_.getLong(1))
    assert(got.nonEmpty)
    assert(got.forall(_ % 2 == 0))
  }
}
