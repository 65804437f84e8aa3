package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import sqlImplicits._

  test("docBigrams emits consecutive token pairs, none below two tokens") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val got = NgramLm.docBigrams(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.toSet shouldBe Set((1L, "a", "b"), (1L, "b", "c"))
  }

  test("score matches a hand-computed add-one bigram model") {
    val target = Seq((0L, "a b a b")).toDF("doc_id", "text")
    // train bigrams: (a,b) x2, (b,a) x1; contexts: a->2, b->1; V = 2+1
    val lm = NgramLm.fit(target, "text")
    lm.v shouldBe 3L
    val raw = Seq((10L, "a b z")).toDF("doc_id", "text")
    val row = NgramLm.score(raw, "doc_id", "text", lm).collect().head
    row.getLong(0) shouldBe 10L
    row.getLong(1) shouldBe 2L // bigrams (a,b), (b,z)
    // p(b|a) = (2+1)/(2+3) = 3/5; p(z|b) = (0+1)/(1+3) = 1/4
    val expected =
      -Dsir.ilog2Q20(3L * Dsir.Scale / 5L) - Dsir.ilog2Q20(Dsir.Scale / 4L)
    row.getLong(2) shouldBe expected
  }

  test("target-like documents score lower nll than alien ones") {
    val target = (0L until 20L)
      .map(i => (i, "spark shuffle join stage executor task spark shuffle"))
      .toDF("doc_id", "text")
    val lm = NgramLm.fit(target, "text")
    val raw = Seq(
      (100L, "spark shuffle join stage"),
      (101L, "cat dog fish bird")).toDF("doc_id", "text")
    val scores = NgramLm.score(raw, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    // per-bigram average, both docs have 3 bigrams
    scores(100L)._2 shouldBe scores(101L)._2
    scores(100L)._1 should be < scores(101L)._1
  }

  test("scores are exact integers, stable under repartitioning") {
    val rng = new scala.util.Random(21)
    val words = Seq("alpha", "beta", "gamma", "delta")
    def doc(n: Int) = (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    val target = (0L until 8L).map(i => (i, doc(40))).toDF("doc_id", "text")
    val raw = (100L until 130L).map(i => (i, doc(30))).toDF("doc_id", "text")
    def scores(r: org.apache.spark.sql.DataFrame) = {
      val lm = NgramLm.fit(target, "text")
      NgramLm.score(r, "doc_id", "text", lm)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    }
    scores(raw.repartition(1)) shouldBe scores(raw.repartition(11))
  }

  test("Kneser-Ney matches a hand-computed interpolated model") {
    // train: "a b a b" -> bigrams (a,b) c=2, (b,a) c=1
    // contexts: a -> (cu=2, fol=1), b -> (cu=1, fol=1)
    // continuations: b -> pre=1, a -> pre=1; N = 2 distinct bigrams
    val lm = NgramLm.fitKneserNey(
      Seq((0L, "a b a b")).toDF("doc_id", "text"), "text",
      dNum = 3L, dDen = 4L)
    lm.nBi shouldBe 2L
    val row = NgramLm.scoreKneserNey(
      Seq((10L, "a b z")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    row.getLong(1) shouldBe 2L
    // p(b|a) = [max(2*4-3,0)*2 + 3*1*1] / (4*2*2) = 13/16
    // p(z|b): z unseen as v -> pre=0; num = max(0*4-3,0)*2 + 3*1*0 = 0
    //   -> Q20 clamp to 1 ulp
    val expected =
      -Dsir.ilog2Q20(13L * Dsir.Scale / 16L) - Dsir.ilog2Q20(1L)
    row.getLong(2) shouldBe expected
  }

  test("Kneser-Ney: unseen context backs off to continuation probability") {
    val lm = NgramLm.fitKneserNey(
      Seq((0L, "a b c b")).toDF("doc_id", "text"), "text")
    // bigram (z, b): z never a context -> p = pre(b)/N = 2/3
    val row = NgramLm.scoreKneserNey(
      Seq((10L, "z b")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    row.getLong(2) shouldBe -Dsir.ilog2Q20(2L * Dsir.Scale / 3L)
  }

  test("Kneser-Ney discriminates target-like from alien text") {
    val target = (0L until 20L)
      .map(i => (i, "spark shuffle join stage executor task spark shuffle"))
      .toDF("doc_id", "text")
    val lm = NgramLm.fitKneserNey(target, "text")
    val raw = Seq(
      (100L, "spark shuffle join stage"),
      (101L, "cat dog fish bird")).toDF("doc_id", "text")
    val scores = NgramLm.scoreKneserNey(raw, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    scores(100L) should be < scores(101L)
  }

  test("native ilog2_q20 expression matches the scalar under forced codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val vals = Seq(1L, 7L, 1L << 20, 3L << 19, (1L << 20) + 12345L, 1L << 40)
      val got = vals.toDF("s")
        .select(graft.functions.ILog2Q20.ilog2Q20(col("s")).as("l"))
        .collect().map(_.getLong(0))
      got.toSeq shouldBe vals.map(Dsir.ilog2Q20)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
