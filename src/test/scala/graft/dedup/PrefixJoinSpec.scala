package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def bruteForce(
      docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int): Set[(Long, Long)] = {
    val sets = docs.map { case (id, ts) => (id, ts.distinct.toSet) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = sa.size.toLong + sb.size.toLong - inter
      if tDen.toLong * inter >= tNum.toLong * uni
    } yield (a, b)).toSet
  }

  private def randomCorpus(n: Int, seed: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    val base = (1 to 40).map(i => s"w$i")
    (1L to n.toLong).map { id =>
      val sz = 3 + rnd.nextInt(10)
      (id, Seq.fill(sz)(base(rnd.nextInt(base.length))))
    }
  }

  test("prefix path equals brute force on random corpora (lossless)") {
    for (seed <- Seq(1, 2, 3)) {
      val corpus = randomCorpus(120, seed)
      val df = corpus.toDF("id", "toks")
      val got = PrefixJoin.prefixJaccardJoin(df, "id", $"toks", 3, 5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      got shouldBe bruteForce(corpus, 3, 5)
    }
  }

  test("integer rational threshold handles the float-ceil boundary exactly") {
    // |a| = |b| = 5, overlap 3 → J = 3/7 < 3/5; overlap 4 → 4/6 = 2/3 ≥ 3/5.
    // And the q23-style boundary: two 5-sets sharing EXACTLY ceil(0.6·5)=3
    // tokens must still be candidate-generated (float ceil would say 4).
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "f", "g")), // overlap 3, J = 3/7
      (3L, Seq("a", "b", "c", "d", "x"))) // vs 1: overlap 4, J = 4/6
      .toDF("id", "toks")
    val pairs = PrefixJoin.prefixJaccardJoin(docs, "id", $"toks", 3, 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 3L))
    pairs should not contain ((1L, 2L))
    // exact equality at the threshold: J = 3/5 itself must be kept
    val eq = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e"))) // J = 3/5 exactly
      .toDF("id", "toks")
    PrefixJoin.prefixJaccardJoin(eq, "id", $"toks", 3, 5)
      .count() shouldBe 1
  }

  test("identical and disjoint sets behave; empty sets never pair") {
    val docs = Seq(
      (1L, Seq("x", "y")), (2L, Seq("x", "y")),
      (3L, Seq("p", "q")), (4L, Seq.empty[String]),
      (5L, Seq.empty[String]))
      .toDF("id", "toks")
    val out = PrefixJoin.prefixJaccardJoin(docs, "id", $"toks", 1, 2)
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    out.head.getDouble(2) shouldBe 1.0
  }

  test("layout-independent") {
    val corpus = randomCorpus(80, 9)
    val df = corpus.toDF("id", "toks")
    val a = PrefixJoin.prefixJaccardJoin(df, "id", $"toks", 7, 10)
      .orderBy($"id_a", $"id_b").collect()
    val b = PrefixJoin.prefixJaccardJoin(df.repartition(11), "id", $"toks", 7, 10)
      .orderBy($"id_a", $"id_b").collect()
    a shouldBe b
  }

  test("invalid thresholds fail loudly") {
    val df = Seq((1L, Seq("a"))).toDF("id", "toks")
    an[IllegalArgumentException] should be thrownBy
      PrefixJoin.prefixJaccardJoin(df, "id", $"toks", 0, 5)
    an[IllegalArgumentException] should be thrownBy
      PrefixJoin.prefixJaccardJoin(df, "id", $"toks", 6, 5)
  }
}
